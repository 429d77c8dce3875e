"""FIFO continuous-batching scheduler with KV-memory admission.

Analog of the reference FIFOScheduler (cpp/engine_base/schedulers/FIFOScheduler.h:11,
FIFOSchedulerBase.h:21): waiting queue + running set; admission checks that the
KV pool can cover a new stream's peak need (estimatePeakNeedBlocks) plus a
watermark; running decode streams that outgrow their allocation pause back to
WAITING (reference: evaluateRunningMemory evict path).

Also provides BatchDecodeScheduler semantics (accumulate-to-fixed-batch,
reference BatchDecodeScheduler.h:22) via ``min_batch`` for perf benchmarking.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Deque, List, Optional

from rtp_llm_tpu.cache.kv_cache_manager import KVCacheManager
from rtp_llm_tpu.config.engine_config import SchedulerConfig
from rtp_llm_tpu.engine.stream import FinishReason, GenerateStream, StreamState


@dataclasses.dataclass
class ScheduleResult:
    new_streams: List[GenerateStream]  # admitted this step (need prefill)
    running: List[GenerateStream]  # decode set (includes new after prefill)


class FIFOScheduler:
    def __init__(
        self,
        config: SchedulerConfig,
        cache_manager: KVCacheManager,
        min_batch: int = 0,  # >0 => hold prefills until this many waiting (perf mode)
    ):
        self.config = config
        self.cache = cache_manager
        self.min_batch = min_batch
        self.waiting: Deque[GenerateStream] = deque()
        self.running: List[GenerateStream] = []
        # victims evicted by running-memory pressure this step; the engine
        # drains this to clear their decode slots
        self.preempted_this_step: List[GenerateStream] = []
        # PD-fusion ratio control (reference: PDFusionRatioScheduler):
        # decode-only steps executed since the last prefill round
        self._steps_since_prefill = 0
        # SLA admission guard: recent admission timestamps (30 s window)
        # estimate the drain rate for projected-TTFT shedding
        self._admit_events: Deque[float] = deque()

    # ---- enqueue / cancel ----

    def projected_wait_s(self) -> float:
        """Estimated queue wait for a NEW request: queued PROMPT TOKENS
        ahead of it over the observed admission token rate (30 s window) —
        prefill service time is what the queue actually serializes on, so
        token-weighting tracks long-prompt backlogs that a depth-only
        estimate understates."""
        import time as _time

        now = _time.time()
        while self._admit_events and now - self._admit_events[0][0] > 30.0:
            self._admit_events.popleft()
        depth = len(self.waiting)
        if depth == 0:
            return 0.0
        # divide by the ACTUAL observation span, not a fixed 30 s: during
        # the first seconds of a burst a fixed divisor underestimates the
        # drain rate up to ~30x and sheds requests that would have met the
        # SLO (ADVICE r4)
        span = 30.0
        if self._admit_events:
            span = min(30.0, max(1.0, now - self._admit_events[0][0]))
        tok_rate = sum(n for _, n in self._admit_events) / span
        if tok_rate <= 0.0:
            # no drain observed: only call it overload once the queue
            # exceeds a full batch (cold start / brief stall tolerance)
            return float("inf") if depth > self.config.max_batch_size else 0.0
        queued_tokens = sum(
            max(s.prompt_len, 1) for s in self.waiting)
        return queued_tokens / tok_rate

    def enqueue(self, stream: GenerateStream) -> bool:
        if len(self.waiting) >= self.config.max_queue_size:
            stream.abort("overloaded: queue full")
            return False
        slo = self.config.ttft_slo_ms
        if slo > 0:
            wait_s = self.projected_wait_s()
            if wait_s * 1e3 > slo:
                from rtp_llm_tpu.utils.metrics import METRICS

                METRICS.inc("scheduler.sla_rejections")
                stream.abort(
                    f"overloaded: projected queue wait {wait_s:.1f}s "
                    f"exceeds ttft_slo_ms={slo}")
                return False
        if stream.prompt_len + 1 > self.config.max_seq_len:
            stream.abort(
                f"prompt length {stream.prompt_len} exceeds max_seq_len "
                f"{self.config.max_seq_len}"
            )
            return False
        self.waiting.append(stream)
        return True

    @property
    def pending(self) -> int:
        return len(self.waiting)

    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    # ---- the per-step scheduling decision ----

    def schedule(self) -> ScheduleResult:
        """Evict finished, admit waiting streams under KV + slot budget."""
        self.running = [s for s in self.running if not s.is_finished()]

        new_streams: List[GenerateStream] = []
        if self.min_batch and len(self.waiting) + len(self.running) < self.min_batch:
            return ScheduleResult([], self.running)

        # ratio control: space prefill rounds apart while decodes are running
        spacing = self.config.decode_steps_per_prefill
        if (spacing and self.running
                and self._steps_since_prefill < spacing):
            self._steps_since_prefill += 1
            return ScheduleResult([], self.running)

        watermark = max(
            1, int(self.cache.pool.num_blocks * self.config.watermark_frac)
        )
        cap = self.config.max_prefills_per_step
        # mixed-load prefill budget: with decodes running, bound the prompt
        # tokens dispatched this step so decode TPOT is stalled by at most
        # one small prefill group (see SchedulerConfig)
        tok_budget = (self.config.max_prefill_tokens_per_step
                      if self.running else 0)
        admitted_tokens = 0
        while self.waiting:
            if cap and len(new_streams) >= cap:
                break
            if len(self.running) + len(new_streams) >= self.config.max_batch_size:
                break
            s = self.waiting[0]
            if s.is_finished():  # cancelled while waiting
                self.waiting.popleft()
                continue
            # preempted streams recompute their full generated context
            # (vLLM-style recompute): context = all tokens except the pending
            # last one, which re-enters decode directly
            ctx_len = s.total_len - 1 if s.output_token_ids else s.prompt_len
            if tok_budget and new_streams and (
                    admitted_tokens + ctx_len > tok_budget):
                # budget spent; always admit at least one stream. The check
                # uses GROSS ctx_len while admitted_tokens accumulates NET
                # (ctx - reuse) — deliberately conservative: reuse_len is
                # only known after allocate(), and a deferred nearly-cached
                # prompt just waits one step (never over-admits compute).
                break
            need = self.cache.estimate_peak_blocks(
                ctx_len,
                min(s.config.max_new_tokens - len(s.output_token_ids),
                    self.config.max_seq_len - ctx_len),
            ) * max(1, s.config.max_num_beams)  # beams fork the KV footprint
            if need + watermark > self.cache.free_blocks:
                break  # strict FIFO: do not skip ahead (reference behavior)
            alloc = self.cache.allocate(s.all_token_ids,
                                        allow_reuse=s.mm is None)
            if alloc is None:
                break
            self.waiting.popleft()
            s.alloc = alloc
            s.reuse_len = min(alloc.reuse_len, ctx_len - 1)
            s.state = StreamState.RUNNING
            new_streams.append(s)
            admitted_tokens += ctx_len - s.reuse_len
            from rtp_llm_tpu.utils.metrics import METRICS

            METRICS.inc("cache.prefix_reused_tokens", s.reuse_len)
            METRICS.inc("cache.prefill_context_tokens", ctx_len)

        if new_streams:
            self._steps_since_prefill = 0
            import time as _time

            now = _time.time()
            self._admit_events.extend(
                (now, max(s.prompt_len, 1)) for s in new_streams)
        else:
            self._steps_since_prefill += 1
        self.running.extend(new_streams)
        return ScheduleResult(new_streams, self.running)

    # ---- decode-time growth ----

    def grow_for_decode(self, stream: GenerateStream, extra: int = 0) -> bool:
        """Ensure stream's allocation covers this step's writes (+``extra``
        speculative draft positions). On OOM, evict the NEWEST running
        stream first (reference: FIFOScheduler::evaluateRunningMemory —
        running-memory eviction preserves FIFO order for the oldest work)
        and retry; only if ``stream`` itself is the newest does it preempt.
        Returns False if ``stream`` was preempted; evicted victims are
        reported via ``self.preempted_this_step``."""
        if stream.alloc is None:
            return False  # already evicted as a running-memory victim
        if self.cache.extend(stream.alloc, stream.total_len + extra):
            return True
        # evict newest-first among OTHER running streams with allocations
        victims = [s for s in self.running
                   if s is not stream and s.alloc is not None]
        victims.sort(key=lambda s: s.enqueue_time, reverse=True)
        for v in victims:
            if stream.enqueue_time > v.enqueue_time:
                break  # stream itself is newer: it should yield instead
            self._preempt(v)
            self.preempted_this_step.append(v)
            if self.cache.extend(stream.alloc, stream.total_len + extra):
                return True
        self._preempt(stream)
        self.preempted_this_step.append(stream)
        return False

    def _preempt(self, stream: GenerateStream):
        """Release blocks and requeue at the front (vLLM-style recompute)."""
        self.cache.free(stream.alloc)
        stream.alloc = None
        stream.state = StreamState.WAITING
        self.waiting.appendleft(stream)
        self.running = [s for s in self.running if s is not stream]

    def release(self, stream: GenerateStream):
        """Free a finished stream's blocks (offering them to the prefix cache)."""
        if stream.alloc is not None:
            self.cache.free(
                stream.alloc,
                token_ids=stream.all_token_ids if stream.mm is None else None,
            )
            stream.alloc = None
