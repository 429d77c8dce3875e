"""Host-side logits processors: trie-constrained ("tree") decode.

Analog of the reference's TreeLogitsProcessor + PrefixToCandidateTokens
(cpp/models/logits_processor/TreeLogitsProcessor.h:38,
PrefixToCandidateTokens.h:24): a TreeDecodeConfig JSON defines a trie over
token ids — once ``start_token_id`` is generated, each next token must come
from ``prefix_dict[path]`` (path = generated ids since the start token,
joined by ``sep``) until ``end_token_id`` closes the region.

TPU-native split: the per-stream trie walk is tiny host state (this module);
masking happens inside the fused device sampler through a fixed-shape
[B, MAX_ALLOW] allow-list (ops/sampling.py), the same mechanism the
no-repeat-ngram bans use. Steps with an active constraint run synchronously
(like ngram bans) because the allow-list depends on the latest token.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)

MAX_ALLOW = 64  # fixed device-side allow-list width


@dataclasses.dataclass
class TreeDecodeConfig:
    """Reference: TreeDecodeConfig (PrefixToCandidateTokens.h:24-37)."""

    start_token_id: int = 225
    end_token_id: int = 2
    sep: str = "_"
    prefix_dict: Dict[str, List[int]] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_file(cls, path: str) -> "TreeDecodeConfig":
        with open(path) as f:
            d = json.load(f)
        return cls(
            start_token_id=int(d.get("start_token_id", 225)),
            end_token_id=int(d.get("end_token_id", 2)),
            sep=d.get("sep", "_"),
            prefix_dict={k: [int(t) for t in v]
                         for k, v in d.get("prefix_dict", {}).items()},
        )


class TreeDecodeState:
    """Per-stream trie walk. ``allowed()`` returns the candidate set for the
    NEXT token (None = unconstrained); ``update(tok)`` advances on each
    generated token."""

    def __init__(self, config: TreeDecodeConfig):
        self.cfg = config
        self.active = False
        self.path: List[int] = []

    def update(self, token: int):
        cfg = self.cfg
        if not self.active:
            if token == cfg.start_token_id:
                self.active = True
                self.path = []
            return
        if token == cfg.end_token_id:
            self.active = False
            self.path = []
            return
        self.path.append(int(token))

    def allowed(self) -> Optional[List[int]]:
        if not self.active:
            return None
        key = self.cfg.sep.join(str(t) for t in self.path)
        cands = self.cfg.prefix_dict.get(key)
        if cands is None:
            # dead end: only the end token may close the region (reference
            # behavior: empty candidate set degrades to stop)
            return [self.cfg.end_token_id]
        out = list(cands[: MAX_ALLOW - 1])
        if self.cfg.end_token_id not in out:
            out.append(self.cfg.end_token_id)
        return out
