"""Megatron-LM checkpoint loading (name translation to HF conventions).

Reference analog: the Megatron branch of the reference loader
(`rtp_llm/model_loader/loader.py` multi-format load; SURVEY.md §2.2 "Model
loader ... Megatron"). A Megatron-core GPT/llama checkpoint directory looks
like::

    <root>/latest_checkpointed_iteration.txt   (e.g. "release" or "1000")
    <root>/iter_0001000/mp_rank_00/model_optim_rng.pt
    <root>/release/mp_rank_00/model_optim_rng.pt

with the state dict under ``["model"]["language_model"]`` (older) or
``["model"]`` (megatron-core), parameter names like
``embedding.word_embeddings.weight`` /
``encoder.layers.N.self_attention.query_key_value.weight``.

We translate those to HF llama/qwen names and hand the result to the normal
weight-map pipeline, so every downstream feature (quant transforms, fusion,
weights cache, TP shard fns) works unchanged. Only tensor-parallel size 1
dumps are supported (merge shards offline first — the reference makes the
same assumption for its convert path).

QKV de-interleave: megatron-core packs query_key_value per KV GROUP as
``[(q_1..q_{q_per_group}, k, v) * n_groups]`` along the output dim; HF
stores q/k/v separately with all q heads contiguous.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np

_LAYER_RE = re.compile(r"^(?:encoder|decoder)\.layers\.(\d+)\.(.+)$")

_DIRECT = {
    "input_layernorm.weight": "input_layernorm.weight",
    "post_attention_layernorm.weight": "post_attention_layernorm.weight",
    "self_attention.dense.weight": "self_attn.o_proj.weight",
    "self_attention.linear_proj.weight": "self_attn.o_proj.weight",
    "mlp.dense_4h_to_h.weight": "mlp.down_proj.weight",
    "mlp.linear_fc2.weight": "mlp.down_proj.weight",
}


def find_megatron_checkpoint(model_path: str) -> Optional[str]:
    """Return the rank-0 .pt path if ``model_path`` is a Megatron dump."""
    root = model_path
    tracker = os.path.join(root, "latest_checkpointed_iteration.txt")
    sub = None
    if os.path.exists(tracker):
        tag = open(tracker).read().strip()
        sub = tag if tag == "release" else f"iter_{int(tag):07d}"
    else:
        # no tracker: prefer "release", else the LATEST iter_* (Megatron's
        # convention — picking the first sorted entry would load the OLDEST
        # checkpoint, ADVICE r4)
        cands = [c for c in (os.listdir(root) if os.path.isdir(root) else [])
                 if c == "release" or c.startswith("iter_")]
        if "release" in cands:
            sub = "release"
        elif cands:
            sub = sorted(cands)[-1]
    if sub is None:
        return None
    rank_dir = os.path.join(root, sub, "mp_rank_00")
    for fname in ("model_optim_rng.pt", "model_rng.pt"):
        p = os.path.join(rank_dir, fname)
        if os.path.exists(p):
            return p
    return None


def _split_qkv(qkv: np.ndarray, n_heads: int, n_kv: int, head_dim: int):
    """[(q.. k v) * groups, H] -> (q [nq*d, H], k, v)."""
    h = qkv.shape[-1]
    qpg = n_heads // n_kv
    g = qkv.reshape(n_kv, (qpg + 2) * head_dim, h)
    q = g[:, : qpg * head_dim, :].reshape(n_heads * head_dim, h)
    k = g[:, qpg * head_dim: (qpg + 1) * head_dim, :].reshape(
        n_kv * head_dim, h)
    v = g[:, (qpg + 1) * head_dim:, :].reshape(n_kv * head_dim, h)
    return q, k, v


def load_megatron_as_hf(pt_path: str, cfg) -> dict:
    """Load a rank-0 Megatron .pt and return {hf_name: torch tensor}."""
    import torch

    sd = torch.load(pt_path, map_location="cpu", weights_only=False)
    model = sd.get("model", sd)
    if "language_model" in model:
        model = model["language_model"]
        # older layout nests embedding/encoder one level down
        flat = {}
        for section, sub in model.items():
            if isinstance(sub, dict):
                for k, v in sub.items():
                    flat[f"{section}.{k}"] = v
            else:
                flat[section] = sub
        model = flat

    hq, hkv, d = (cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim)
    out = {}
    for name, t in model.items():
        if t is None or not hasattr(t, "shape"):
            continue
        if name in ("embedding.word_embeddings.weight",
                    "word_embeddings.weight",
                    "embedding.word_embeddings"):
            out["model.embed_tokens.weight"] = t
            continue
        if name in ("encoder.final_layernorm.weight",
                    "decoder.final_layernorm.weight",
                    "final_layernorm.weight", "encoder.final_norm.weight"):
            out["model.norm.weight"] = t
            continue
        if name in ("output_layer.weight", "lm_head.weight"):
            out["lm_head.weight"] = t
            continue
        m = _LAYER_RE.match(name)
        if not m:
            continue
        li, rest = int(m.group(1)), m.group(2)
        pre = f"model.layers.{li}."
        if rest in _DIRECT:
            out[pre + _DIRECT[rest]] = t
            continue
        if rest in ("self_attention.query_key_value.weight",
                    "self_attention.linear_qkv.weight"):
            q, k, v = _split_qkv(np.asarray(t.float().numpy()), hq, hkv, d)
            import torch as _torch

            out[pre + "self_attn.q_proj.weight"] = _torch.from_numpy(q)
            out[pre + "self_attn.k_proj.weight"] = _torch.from_numpy(k)
            out[pre + "self_attn.v_proj.weight"] = _torch.from_numpy(v)
            continue
        if rest in ("self_attention.query_key_value.bias",
                    "self_attention.linear_qkv.bias"):
            qb, kb, vb = _split_qkv(
                np.asarray(t.float().numpy())[:, None], hq, hkv, d)
            import torch as _torch

            out[pre + "self_attn.q_proj.bias"] = _torch.from_numpy(qb[:, 0])
            out[pre + "self_attn.k_proj.bias"] = _torch.from_numpy(kb[:, 0])
            out[pre + "self_attn.v_proj.bias"] = _torch.from_numpy(vb[:, 0])
            continue
        if rest in ("mlp.dense_h_to_4h.weight", "mlp.linear_fc1.weight"):
            # swiglu: [2I, H] stored as contiguous [gate; up] halves
            tw = t
            half = tw.shape[0] // 2
            out[pre + "mlp.gate_proj.weight"] = tw[:half]
            out[pre + "mlp.up_proj.weight"] = tw[half:]
            continue
    return out
