"""Engine loop thread.

Analog of the reference NormalEngine::loop (cpp/normal_engine/NormalEngine.cc:398):
a dedicated thread steps the engine whenever streams exist; enqueue is
thread-safe and wakes the loop. Consumers (HTTP handlers) block on each
stream's output queue from their own threads/event loop.
"""

from __future__ import annotations

import logging
import threading
from typing import List, Optional

from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine.engine import LlmEngine
from rtp_llm_tpu.engine.stream import GenerateStream

logger = logging.getLogger(__name__)


class EngineRunner:
    def __init__(self, engine: LlmEngine):
        self.engine = engine
        self._cond = threading.Condition()
        self._stop = False
        self._paused = False
        self._thread: Optional[threading.Thread] = None
        self.steps = 0

    def start(self):
        self._thread = threading.Thread(target=self._loop, name="engine-loop", daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 10.0):
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        if self._thread:
            self._thread.join(timeout=timeout)

    def enqueue(
        self,
        prompt_token_ids: List[int],
        config: Optional[GenerateConfig] = None,
        stop_token_sequences=None,
        mm=None,
    ) -> GenerateStream:
        with self._cond:
            stream = self.engine.enqueue(
                prompt_token_ids, config,
                stop_token_sequences=stop_token_sequences, mm=mm,
            )
            self._cond.notify_all()
        return stream

    def kick(self):
        """Wake the loop after enqueueing a stream directly on the engine
        (e.g. PD enqueue_preloaded)."""
        with self._cond:
            self._cond.notify_all()

    def pause(self):
        """Stop stepping (in-flight step completes); streams stay queued.
        Reference: engine pause() for RL weight swap (RtpLLMOp.cc:384)."""
        with self._cond:
            self._paused = True

    def resume(self):
        with self._cond:
            self._paused = False
            self._cond.notify_all()

    @property
    def paused(self) -> bool:
        return self._paused

    def update_weights(self, model_path: str):
        """Swap model weights in place without restarting (reference:
        UpdateWeights RPC, proto :700 + WeightsLoader). Engine must be paused
        or idle; KV cache contents remain valid only if the model is the same
        architecture — in-flight streams keep generating with the new weights,
        matching the reference's RL semantics."""
        from rtp_llm_tpu.loader import CheckpointLoader
        from rtp_llm_tpu.quant import make_quant_transform

        eng = self.engine
        transform = make_quant_transform(eng.config.quant)
        shard_fn = None
        if eng.mesh is not None:
            from rtp_llm_tpu.parallel import make_weight_shard_fn

            shard_fn = make_weight_shard_fn(eng.mesh, eng.model.cfg,
                                            afd=eng.config.parallel.afd_mode)
        new_weights = CheckpointLoader(
            eng.model.cfg, transform=transform, shard_fn=shard_fn
        ).load(model_path)
        if eng.fuse_eligible and not (
            eng.lora_manager and eng.lora_manager.names()
        ):
            new_weights = eng.model.fuse_weights(new_weights)
        new_weights = eng._inject_aux_weights(new_weights)
        if eng.config.parallel.eplb_redundant > 0:
            # mirror LlmEngine.__init__: without re-expansion a live update
            # would swap in [L,E,...] stacks missing eplb_log2phy /
            # eplb_rep_count — dropping the replicated tier and invalidating
            # every warmed E+R-shaped program (ADVICE r4)
            from rtp_llm_tpu.parallel import eplb as _eplb

            shards = (eng.mesh.shape.get("tp", 1)
                      if eng.mesh is not None else 1)
            new_weights = _eplb.expand_expert_stacks(
                new_weights, eng.config.parallel.eplb_redundant, shards)
        with eng.device_lock:
            eng.weights = new_weights
        logger.info("weights updated from %s", model_path)

    def _loop(self):
        logger.info("engine loop started")
        while True:
            with self._cond:
                while not self._stop and (
                    self._paused or not self.engine.has_work()
                ):
                    self._cond.wait(timeout=0.5)
                if self._stop:
                    break
            try:
                self.engine.step()
                self.steps += 1
            except Exception:  # engine errors must not kill the loop silently
                logger.exception("engine step failed; aborting running streams")
                for s in list(self.engine.scheduler.running):
                    s.abort("engine step error")
                    self.engine._release_stream(s)
                while self.engine.scheduler.waiting:
                    s = self.engine.scheduler.waiting.popleft()
                    s.abort("engine step error")
        logger.info("engine loop stopped")
