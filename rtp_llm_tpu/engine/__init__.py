"""Continuous-batching inference engine.

TPU-native analog of the reference C++ engine layer (rtp_llm/cpp/normal_engine/
NormalEngine.cc, engine_base/): host-side scheduler + stream state machine
driving jitted device programs (prefill per seq bucket, one fused
decode+sample program at fixed batch). The fixed-shape programs are the TPU
analog of the reference's CUDA-graph runner (cpp/cuda_graph/cuda_graph_runner.h),
promoted to the core design.
"""

from rtp_llm_tpu.engine.stream import GenerateStream, StreamState
from rtp_llm_tpu.engine.scheduler import FIFOScheduler, ScheduleResult
from rtp_llm_tpu.engine.engine import LlmEngine

__all__ = [
    "GenerateStream",
    "StreamState",
    "FIFOScheduler",
    "ScheduleResult",
    "LlmEngine",
]
