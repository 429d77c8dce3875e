"""Per-request stream state machine.

Analog of the reference GenerateStream (cpp/engine_base/stream/GenerateStream.h:90)
+ NormalGenerateStream: token accumulation, stop criteria, incremental output
queue for streaming consumers, block allocation handle, timing metrics.
"""

from __future__ import annotations

import dataclasses
import enum
import queue
import threading
import time
from typing import Any, List, Optional

from rtp_llm_tpu.cache.kv_cache_manager import BlockAllocation
from rtp_llm_tpu.config.generate_config import GenerateConfig


class StreamState(enum.Enum):
    """Reference: GenerateTypes.h:136."""

    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"
    STOPPED = "stopped"  # error / cancel


class FinishReason(str, enum.Enum):
    STOP = "stop"  # eos or stop word / stop token
    LENGTH = "length"  # max_new_tokens or max_seq_len
    CANCELLED = "cancelled"
    ERROR = "error"


@dataclasses.dataclass
class StreamOutput:
    """One incremental output chunk pushed to the consumer."""

    new_tokens: List[int]
    finished: bool
    finish_reason: Optional[FinishReason] = None
    logprobs: Optional[List[float]] = None
    error: Optional[str] = None


class GenerateStream:
    _next_id = 0
    _id_lock = threading.Lock()

    def __init__(
        self,
        prompt_token_ids: List[int],
        config: Optional[GenerateConfig] = None,
        request_id: Optional[int] = None,
        stop_token_sequences: Optional[List[List[int]]] = None,
    ):
        if request_id is None:
            with GenerateStream._id_lock:
                GenerateStream._next_id += 1
                request_id = GenerateStream._next_id
        self.request_id = request_id
        self.prompt_token_ids = list(prompt_token_ids)
        self.output_token_ids: List[int] = []
        self.output_logprobs: List[float] = []
        self.config = config or GenerateConfig()
        self.state = StreamState.WAITING
        self.finish_reason: Optional[FinishReason] = None
        self.error: Optional[str] = None
        # token-id sequences that terminate generation (stop_words tokenized
        # by the frontend; reference: stop words list in GenerateConfig.h:60)
        self.stop_token_sequences = [
            list(s) for s in (stop_token_sequences or []) if s
        ]

        # engine-owned runtime fields
        self.alloc: Optional[BlockAllocation] = None
        self.slot: int = -1  # decode batch slot, -1 = none
        self.reuse_len: int = 0
        self.mm = None  # MMInputs payload (multimodal/processor.py)
        # think-mode budget tracking (reference: ThinkModeLogitsProcessor)
        self.thinking = False
        self.think_tokens = 0
        # trie-constrained decode walk (engine/logits_processors.py); set by
        # the engine at enqueue when a TreeDecodeConfig is loaded
        self.tree_state = None

        # output side
        self._out_q: "queue.Queue[StreamOutput]" = queue.Queue()
        self._emit_lock = threading.Lock()
        self._aloop = None  # asyncio consumer (register_async)
        self._aq = None
        # metrics (reference: GenerateStream metrics)
        self.enqueue_time = time.time()
        self.first_token_time: Optional[float] = None
        self.finish_time: Optional[float] = None

    # ---- engine-side API ----

    @property
    def prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def total_len(self) -> int:
        return self.prompt_len + len(self.output_token_ids)

    @property
    def all_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def is_recompute(self) -> bool:
        """True when re-admitted after preemption with generated output: the
        prefill must cover the generated tokens too (vLLM-style recompute)."""
        return bool(self.output_token_ids)

    @property
    def context_token_ids(self) -> List[int]:
        """Tokens the prefill must compute KV for: the full history minus the
        pending last generated token (which re-enters decode directly). Equals
        the prompt for fresh streams."""
        if self.output_token_ids:
            return self.all_token_ids[:-1]
        return self.prompt_token_ids

    def is_finished(self) -> bool:
        return self.state in (StreamState.FINISHED, StreamState.STOPPED)

    def forced_next_token(self) -> int:
        """-1 = no forcing; otherwise the token id the sampler must emit
        next (think budget exhausted => think_end_token_id)."""
        cfg = self.config
        if (
            cfg.max_thinking_tokens
            and cfg.think_end_token_id is not None
            and self.thinking
            and self.think_tokens >= cfg.max_thinking_tokens
        ):
            return int(cfg.think_end_token_id)
        return -1

    def needs_eos_ban(self) -> bool:
        return (
            self.config.ignore_eos
            or len(self.output_token_ids) < self.config.min_new_tokens
        )

    def append_token(
        self, token: int, eos_token_ids: list, logprob: Optional[float] = None,
        max_seq_len: int = 0,
    ) -> bool:
        """Engine dispatch: record one generated token, evaluate stop criteria,
        and push an incremental chunk. Returns True if the stream finished.
        (Reference: GenerateStream::update / NormalBatchStreamProcessor::dispatch.)
        """
        if self.first_token_time is None:
            self.first_token_time = time.time()
        self.output_token_ids.append(int(token))
        if self.tree_state is not None:
            self.tree_state.update(int(token))
        cfg0 = self.config
        if cfg0.think_start_token_id is not None:
            if token == cfg0.think_start_token_id:
                self.thinking = True
                self.think_tokens = 0
            elif self.thinking:
                if token == cfg0.think_end_token_id:
                    self.thinking = False
                else:
                    self.think_tokens += 1
        if logprob is not None:
            self.output_logprobs.append(float(logprob))

        reason = None
        cfg = self.config
        n_out = len(self.output_token_ids)
        below_min = n_out < cfg.min_new_tokens
        eos_hit = (not cfg.ignore_eos) and (not below_min) and token in eos_token_ids
        stop_hit = (not below_min) and token in cfg.stop_token_ids
        if eos_hit or stop_hit:
            reason = FinishReason.STOP
        elif self._hits_stop_sequence():
            reason = FinishReason.STOP
        elif n_out >= cfg.max_new_tokens:
            reason = FinishReason.LENGTH
        elif max_seq_len and self.total_len >= max_seq_len:
            reason = FinishReason.LENGTH
        elif cfg.timeout_ms and (time.time() - self.enqueue_time) * 1000 > cfg.timeout_ms:
            reason = FinishReason.CANCELLED

        if reason is not None:
            self.finish(reason)
            return True
        self._emit(StreamOutput(new_tokens=[int(token)], finished=False,
                                     logprobs=[logprob] if logprob is not None else None))
        return False

    def _hits_stop_sequence(self) -> bool:
        if not self.stop_token_sequences:
            return False
        out = self.output_token_ids
        for seq in self.stop_token_sequences:
            if len(out) >= len(seq) and out[-len(seq):] == seq:
                return True
        return False

    def finish(self, reason: FinishReason, emit_all: bool = False):
        """emit_all: push the full output in the final chunk (beam search
        delivers whole sequences, not incremental tokens)."""
        self.state = StreamState.FINISHED if reason in (
            FinishReason.STOP, FinishReason.LENGTH
        ) else StreamState.STOPPED
        self.finish_reason = reason
        self.finish_time = time.time()
        if self.first_token_time is None:
            self.first_token_time = self.finish_time
        last = (list(self.output_token_ids) if emit_all
                else self.output_token_ids[-1:]) if self.output_token_ids else []
        self._emit(StreamOutput(new_tokens=last, finished=True, finish_reason=reason))

    def abort(self, error: Optional[str] = None):
        self.state = StreamState.STOPPED
        self.finish_reason = FinishReason.ERROR if error else FinishReason.CANCELLED
        self.error = error
        self.finish_time = time.time()
        self._emit(
            StreamOutput(new_tokens=[], finished=True,
                         finish_reason=self.finish_reason, error=error)
        )

    # ---- consumer-side API ----

    def _emit(self, out: "StreamOutput"):
        """Route one output chunk to the consumer. With an asyncio consumer
        registered, deliver straight into its event loop (no blocking thread
        per stream — at hundreds of concurrent SSE streams a thread-pool
        next_output() starves and dominates TTFT); otherwise the thread
        queue."""
        with self._emit_lock:
            if self._aloop is not None:
                try:
                    self._aloop.call_soon_threadsafe(self._aq.put_nowait, out)
                    return
                except RuntimeError:  # loop closed: fall back
                    self._aloop = None
            self._out_q.put(out)

    def register_async(self, loop):
        """Bridge this stream's outputs into an asyncio.Queue owned by
        ``loop``. Must be awaited from that loop. Returns the queue."""
        import asyncio

        aq = asyncio.Queue()
        with self._emit_lock:
            self._aloop = loop
            self._aq = aq
            while True:  # re-route anything already queued
                try:
                    aq.put_nowait(self._out_q.get_nowait())
                except queue.Empty:
                    break
        return aq

    def next_output(self, timeout: Optional[float] = None) -> StreamOutput:
        """Block for the next incremental chunk (reference: pollStreamOutput,
        LocalRpcServer.cc:80)."""
        return self._out_q.get(timeout=timeout)

    def drain(self) -> List[StreamOutput]:
        out = []
        while True:
            try:
                out.append(self._out_q.get_nowait())
            except queue.Empty:
                return out
