"""Per-request generation config.

Analog of the reference GenerateConfig (cpp/engine_base/stream/GenerateConfig.h:31-90):
sampling controls, stopping criteria, and return options carried by every request.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional


@dataclasses.dataclass
class GenerateConfig:
    max_new_tokens: int = 512
    min_new_tokens: int = 0
    no_repeat_ngram_size: int = 0  # ban repeating n-grams (0 = off)
    logit_bias: Optional[dict] = None  # token_id -> additive bias (OpenAI)
    # sampling
    temperature: float = 1.0
    top_k: int = 0  # 0 => disabled (full softmax)
    top_p: float = 1.0
    do_sample: bool = True  # False => greedy
    seed: Optional[int] = None
    # penalties
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # stopping
    stop_words: List[str] = dataclasses.field(default_factory=list)
    stop_token_ids: List[int] = dataclasses.field(default_factory=list)
    ignore_eos: bool = False
    # fan-out
    num_return_sequences: int = 1
    num_beams: int = 1  # beam search: future round
    # per-step beam widths (reference: GenerateStream::numBeams,
    # engine_base/stream/GenerateStream.cc:217-230): width at output step i
    # is variable_num_beams[min(i-1, len-1)]; empty = constant num_beams
    variable_num_beams: List[int] = dataclasses.field(default_factory=list)
    # returns
    return_logprobs: bool = False
    top_logprobs: int = 0
    return_hidden_states: bool = False
    # teacher-forced prompt loss return (reference: GenerateConfig
    # calculate_loss, GenerateConfig.h:56): 1 = mean NLL over the prompt,
    # 2 = per-token NLL list
    calculate_loss: int = 0
    # think-mode budget (reference: ThinkModeLogitsProcessor,
    # cpp/models/logits_processor/): once the model has emitted
    # think_start_token_id, after max_thinking_tokens the end token is forced
    max_thinking_tokens: int = 0  # 0 = unlimited / disabled
    think_start_token_id: Optional[int] = None
    think_end_token_id: Optional[int] = None
    # stream control
    timeout_ms: int = 0  # 0 = no timeout
    # adapters (multi-LoRA, future round)
    adapter_name: Optional[str] = None
    # per-request profiling (reference: gen_timeline GenerateConfig flag,
    # NormalEngine.cc:477-487 + TorchProfiler.h): capture a jax.profiler
    # trace for the first N engine steps this request participates in.
    # 0 = off. One trace window at a time engine-wide.
    gen_timeline: int = 0
    timeline_dir: str = ""  # "" = /tmp/rtp_llm_timeline/<request-id>

    def __post_init__(self):
        self.validate()

    def validate(self):
        if self.max_new_tokens < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {self.max_new_tokens}")
        if self.temperature < 0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if not (0.0 < self.top_p <= 1.0):
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}")
        if self.repetition_penalty <= 0:
            raise ValueError("repetition_penalty must be > 0")
        if self.num_return_sequences < 1:
            raise ValueError("num_return_sequences must be >= 1")
        if self.temperature == 0.0:
            # reference semantics: temperature 0 == greedy
            self.do_sample = False
            self.temperature = 1.0

    @property
    def max_num_beams(self) -> int:
        return (max(self.variable_num_beams) if self.variable_num_beams
                else self.num_beams)

    def beam_width_at(self, out_len: int) -> int:
        """Beam width once ``out_len`` output tokens exist (reference:
        GenerateStream::numBeams). out_len 0 is always width 1."""
        if out_len <= 0:
            return 1
        if not self.variable_num_beams:
            return self.num_beams
        idx = min(out_len - 1, len(self.variable_num_beams) - 1)
        return self.variable_num_beams[idx]

    @classmethod
    def from_dict(cls, d: dict) -> "GenerateConfig":
        """Build from a request json, ignoring unknown keys (OpenAI extras)."""
        # reference: ChatCompletionRequest.extra_configs nests a
        # GenerateConfig (api_datatype.py:150) — nested keys merge under
        # the top-level ones
        if isinstance(d.get("extra_configs"), dict):
            # explicit nulls at the top level (clients serializing unset
            # fields) must not clobber nested values
            d = {**d["extra_configs"],
                 **{k: v for k, v in d.items()
                    if k != "extra_configs" and v is not None}}
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs: dict[str, Any] = {k: v for k, v in d.items() if k in fields and v is not None}
        # OpenAI aliases
        if "max_tokens" in d and d["max_tokens"] is not None:
            kwargs.setdefault("max_new_tokens", d["max_tokens"])
        if "max_completion_tokens" in d and d["max_completion_tokens"] is not None:
            kwargs["max_new_tokens"] = d["max_completion_tokens"]
        if "stop" in d and d["stop"] is not None:
            stop = d["stop"]
            kwargs.setdefault("stop_words", [stop] if isinstance(stop, str) else list(stop))
        if "n" in d and d["n"] is not None:
            kwargs.setdefault("num_return_sequences", d["n"])
        if "logprobs" in d and isinstance(d["logprobs"], bool):
            kwargs.setdefault("return_logprobs", d["logprobs"])
        return cls(**kwargs)
