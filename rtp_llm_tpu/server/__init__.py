"""Serving runtime: engine loop thread + server wiring.

Analog of the reference's backend process layer (rtp_llm/start_backend_server.py,
server/backend_manager.py, cpp engine loop thread NormalEngine.cc:398).
"""

from rtp_llm_tpu.server.engine_runner import EngineRunner

__all__ = ["EngineRunner"]
