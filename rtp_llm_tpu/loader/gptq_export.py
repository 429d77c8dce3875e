"""Export a plain HF checkpoint as a GPTQ-format quantized checkpoint.

Inverse of quant/gptq_awq.py's ingestion: packs every projection weight into
AutoGPTQ's on-disk layout (qweight i32 [in/8, out] LSB-first nibbles, qzeros
i32 [in/g, out/8] with the stored = z - 1 offset, scales f16 [in/g, out],
g_idx [in] for act-order) plus a ``quantization_config`` stanza so
ModelConfig.from_pretrained + CheckpointLoader take the REAL packed-GPTQ
load path end-to-end.

Purpose: the north-star config is "Qwen2-7B GPTQ-INT4 (HF checkpoint)" and
no checkpoints ship in this environment (zero egress), so the ppl harness
emits one from the trained tiny LM (VERDICT r4 weak #6). Quantization here
is round-to-nearest asymmetric min/max per input-dim group with act-order
(descending column norm) — the format and load path are exactly what a real
GPTQ checkpoint exercises; only the rounding solver differs (GPTQ's Hessian
solver would land slightly tighter ppl).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np


def pack_gptq_qweight(q: np.ndarray) -> np.ndarray:
    """[in, out] u8 (0..15) -> [in/8, out] i32, LSB-first nibbles."""
    k, n = q.shape
    q = q.reshape(k // 8, 8, n).astype(np.uint32)
    shifts = (np.arange(8) * 4).reshape(1, 8, 1)
    return (q << shifts).sum(axis=1, dtype=np.uint32).view(np.int32)


def pack_gptq_qzeros(z: np.ndarray) -> np.ndarray:
    """[in/g, out] u8 -> [in/g, out/8] i32, LSB-first nibbles."""
    g, n = z.shape
    z = z.reshape(g, n // 8, 8).astype(np.uint32)
    shifts = (np.arange(8) * 4).reshape(1, 1, 8)
    return (z << shifts).sum(axis=2, dtype=np.uint32).view(np.int32)


AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def pack_awq(vals: np.ndarray) -> np.ndarray:
    """[in, out] u8 -> [in, out/8] i32, AWQ interleaved nibble order
    (logical column j of each 8-group lands in nibble AWQ_ORDER[j])."""
    k, n = vals.shape
    v = vals.reshape(k, n // 8, 8)[:, :, AWQ_ORDER].astype(np.uint32)
    shifts = (np.arange(8) * 4).reshape(1, 1, 8)
    return (v << shifts).sum(axis=2, dtype=np.uint32).view(np.int32)


def quantize_awq_tensor(w: np.ndarray, group_size: int):
    """Quantize W [out, in] -> AWQ tensor dict (RTN asym, no act-order —
    AWQ checkpoints are monotonic by construction)."""
    wt = np.asarray(w, np.float32).T  # [in, out]
    k, n = wt.shape
    ng = k // group_size
    blk = wt.reshape(ng, group_size, n)
    mn, mx = blk.min(axis=1), blk.max(axis=1)
    s = np.maximum((mx - mn) / 15.0, 1e-10)
    z = np.clip(np.round(-mn / s), 0, 15).astype(np.uint8)
    q = np.clip(np.round(blk / s[:, None, :] + z[:, None, :]), 0, 15
                ).astype(np.uint8).reshape(k, n)
    return {
        "qweight": pack_awq(q),
        "qzeros": pack_awq(z),
        "scales": s.astype(np.float16),
    }


def quantize_gptq_tensor(w: np.ndarray, group_size: int, act_order: bool):
    """Quantize W [out, in] -> GPTQ tensor dict (round-to-nearest asym).

    act_order: inputs are grouped in descending-importance order (column
    norm of W — the GPTQ desc_act heuristic), recorded via g_idx."""
    wt = np.asarray(w, np.float32).T  # [in, out]
    k, n = wt.shape
    if act_order:
        order = np.argsort(-np.linalg.norm(wt, axis=1), kind="stable")
    else:
        order = np.arange(k)
    g_idx = np.empty((k,), np.int32)
    g_idx[order] = np.arange(k, dtype=np.int32) // group_size
    ng = (k + group_size - 1) // group_size

    q = np.empty((k, n), np.uint8)
    scales = np.empty((ng, n), np.float32)
    zeros = np.empty((ng, n), np.uint8)
    for g in range(ng):
        rows = order[g * group_size: (g + 1) * group_size]
        blk = wt[rows]  # [g, out]
        mn, mx = blk.min(axis=0), blk.max(axis=0)
        s = np.maximum((mx - mn) / 15.0, 1e-10)
        # clamp z >= 1: the AutoGPTQ stored = z - 1 convention wraps at
        # z = 0 (all-positive groups); losing one code level there costs
        # less than a 16-off zero point
        z = np.clip(np.round(-mn / s), 1, 15)
        scales[g] = s
        zeros[g] = z.astype(np.uint8)
        q[rows] = np.clip(np.round(blk / s + z), 0, 15).astype(np.uint8)
    return {
        "qweight": pack_gptq_qweight(q),
        # AutoGPTQ stores z - 1 (gptq_to_canonical adds it back)
        "qzeros": pack_gptq_qzeros(
            (zeros.astype(np.int16) - 1).astype(np.uint8) & 0xF),
        "scales": scales.astype(np.float16),
        "g_idx": g_idx,
    }


def export_gptq_checkpoint(src_dir: str, dst_dir: str, cfg,
                           group_size: int = 64,
                           act_order: bool = True,
                           method: str = "gptq") -> str:
    """Convert the checkpoint at ``src_dir`` into GPTQ or AWQ format at
    ``dst_dir``. Projection weights (q/k/v/o, MLP, experts) become packed
    tensors; embeddings/norms/lm_head/biases stay as-is (GPTQ convention).
    ``method='awq'`` writes the AWQ interleaved layout (no g_idx; AWQ is
    monotonic) with its quantization_config stanza."""
    from safetensors.numpy import save_file

    from rtp_llm_tpu.loader.loader import _TensorSource
    from rtp_llm_tpu.loader.weight_maps import get_weight_specs, hf_names_for

    os.makedirs(dst_dir, exist_ok=True)
    src = _TensorSource(src_dir, model_config=cfg)
    packed_names = set()
    for spec in get_weight_specs(cfg):
        if spec.shard_axis not in ("out", "in", "expert"):
            continue
        if spec.name == "lm_head":
            continue  # GPTQ keeps the head in full precision
        for (_l, _e, hf_name) in hf_names_for(
                spec, cfg.num_layers, cfg.num_experts, cfg):
            if hf_name.endswith(".weight"):
                packed_names.add(hf_name)

    tensors = {}
    # REAL tensor names only: _TensorSource.names() appends legacy-alias
    # spellings (model.language_model.* etc.) for loader-side resolution —
    # exporting those would write every tensor twice (a 15 GB checkpoint
    # exported to 19.8 GB with full-precision duplicates, round-5 bug)
    real_names = (list(src._torch_state) if src._torch_state is not None
                  else list(src._name_to_file))
    for name in real_names:
        arr = np.asarray(src.get(name))
        if name in packed_names and arr.ndim == 2 \
                and arr.shape[1] % 8 == 0 and arr.shape[0] % 8 == 0 \
                and arr.shape[1] % group_size == 0:
            base = name[: -len(".weight")]
            t = (quantize_awq_tensor(arr, group_size) if method == "awq"
                 else quantize_gptq_tensor(arr, group_size, act_order))
            for suffix, v in t.items():
                # safetensors serializes the RAW buffer: a non-contiguous
                # view (e.g. reductions over transposed views) writes
                # scrambled bytes SILENTLY (found via a corrupted AWQ
                # export — every tensor must be C-contiguous)
                tensors[f"{base}.{suffix}"] = np.ascontiguousarray(v)
        else:
            tensors[name] = np.ascontiguousarray(arr)
    save_file(tensors, os.path.join(dst_dir, "model.safetensors"))

    with open(os.path.join(src_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    hf_cfg["quantization_config"] = {
        "quant_method": method, "bits": 4, "group_size": group_size,
        "desc_act": bool(act_order) and method == "gptq",
    }
    with open(os.path.join(dst_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f)
    for extra in ("tokenizer.json", "tokenizer_config.json",
                  "generation_config.json"):
        p = os.path.join(src_dir, extra)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(dst_dir, extra))
    src.close()
    return dst_dir
