"""Multimodal input preparation: MRoPE positions + embedding splice plan.

Reference analog: the C++ MultimodalProcessor (cpp/multimodal_processor/ —
"applies precomputed VIT embeddings into token stream, MM hashes for cache
reuse") and PositionIdsGenerator's MRoPE sections
(cpp/models/position_ids/PositionIdsGenerator.h).

The tokenizer-side processor (HF AutoProcessor) expands each image into a run
of ``image_token_id`` placeholders; this module computes the qwen2-vl 3D
MRoPE position streams (temporal/height/width per vision block, flat text
positions elsewhere — semantics of HF Qwen2VLModel.get_rope_index) and packs
the per-image embeddings into a dense [T, H] override buffer for the prefill
program.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class MMInputs:
    """Per-stream multimodal payload carried by GenerateStream."""

    embeds: np.ndarray  # [T, H] rows valid where mask
    mask: np.ndarray  # [T] bool — placeholder positions
    positions3: np.ndarray  # [3, T] i32 MRoPE streams
    delta: int  # decode position offset: pos = kv_len + delta


def mrope_positions(
    token_ids: Sequence[int],
    image_grids: List[tuple],  # per image (t, h, w) AFTER spatial merge
    image_token_id: int,
) -> tuple:
    """3D position streams for a prompt with expanded image placeholder runs.
    Returns (positions3 [3, T] i32, delta). Matches HF
    Qwen2VLModel.get_rope_index for image inputs."""
    toks = np.asarray(token_ids, np.int64)
    n = len(toks)
    pos = np.zeros((3, n), np.int64)
    img_iter = iter(image_grids)
    st = 0  # next position value
    i = 0
    while i < n:
        if toks[i] == image_token_id:
            t, h, w = next(img_iter)
            cnt = t * h * w
            t_idx = np.repeat(np.arange(t), h * w)
            h_idx = np.tile(np.repeat(np.arange(h), w), t)
            w_idx = np.tile(np.arange(w), t * h)
            pos[0, i : i + cnt] = st + t_idx
            pos[1, i : i + cnt] = st + h_idx
            pos[2, i : i + cnt] = st + w_idx
            st = int(pos[:, i : i + cnt].max()) + 1
            i += cnt
        else:
            j = i
            while j < n and toks[j] != image_token_id:
                j += 1
            span = np.arange(st, st + (j - i))
            pos[:, i:j] = span[None, :]
            st = st + (j - i)
            i = j
    delta = int(pos.max()) + 1 - n if n else 0
    return pos.astype(np.int32), delta


class MultimodalProcessor:
    def __init__(self, cfg):
        self.image_token_id = cfg.image_token_id
        self.hidden_size = cfg.hidden_size
        # qwen3_vl deepstack: K extra feature sets pack channel-wise
        ds = (getattr(cfg, "vision_config", None) or {}).get(
            "deepstack_visual_indexes") or ()
        if ds and cfg.model_type in ("qwen3_vl", "qwen3_vl_moe"):
            self.hidden_size = cfg.hidden_size * (1 + len(ds))

    def prepare(self, token_ids: Sequence[int],
                image_embeds: List[np.ndarray],
                image_grids: List[tuple]) -> Optional[MMInputs]:
        """image_embeds: per image [n_tokens, H] (n_tokens = t*h*w after
        merge); image_grids: matching merged (t, h, w)."""
        toks = np.asarray(token_ids, np.int64)
        mask = toks == self.image_token_id
        if not mask.any():
            return None
        n = len(toks)
        embeds = np.zeros((n, self.hidden_size), np.float32)
        flat = np.concatenate([np.asarray(e, np.float32) for e in image_embeds])
        if flat.shape[0] != int(mask.sum()):
            raise ValueError(
                f"vision embeddings cover {flat.shape[0]} tokens but prompt "
                f"has {int(mask.sum())} image placeholders"
            )
        embeds[mask] = flat
        pos3, delta = mrope_positions(token_ids, image_grids,
                                      self.image_token_id)
        return MMInputs(embeds=embeds, mask=mask, positions3=pos3,
                        delta=delta)

    def prepare_flat(self, token_ids: Sequence[int],
                     image_embeds: List[np.ndarray]) -> Optional[MMInputs]:
        """Flat-position variant for models without MRoPE (llava): vision
        tokens take ordinary sequential positions; only the embedding
        splice matters."""
        toks = np.asarray(token_ids, np.int64)
        mask = toks == self.image_token_id
        if not mask.any():
            return None
        n = len(toks)
        embeds = np.zeros((n, self.hidden_size), np.float32)
        flat = np.concatenate([np.asarray(e, np.float32) for e in image_embeds])
        if flat.shape[0] != int(mask.sum()):
            raise ValueError(
                f"vision embeddings cover {flat.shape[0]} tokens but prompt "
                f"has {int(mask.sum())} image placeholders"
            )
        embeds[mask] = flat
        pos3 = np.tile(np.arange(n, dtype=np.int32), (3, 1))
        return MMInputs(embeds=embeds, mask=mask, positions3=pos3, delta=0)
