"""Rotary position embeddings.

TPU-native equivalent of the reference rotary kernels
(models_py/bindings/common/kernels rotary embedding header). Frequencies are
precomputed once on host; application is pure jnp (fused by XLA into the QKV
projection epilogue). Supports llama/qwen "neox-style" rotation (rotate halves)
plus linear / dynamic-NTK / yarn rope_scaling variants from HF configs.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def compute_rope_freqs(
    head_dim: int,
    max_len: int,
    theta: float = 10000.0,
    rope_scaling: Optional[dict] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Return (cos, sin) tables of shape [max_len, head_dim//2] in fp32.

    Returned as HOST numpy arrays on purpose: models build these at
    construction time, outside jit. If they were device arrays, every jitted
    program that closes over them would force MLIR lowering to fetch them
    back from the device to embed as constants (~16 MB per program variant
    for a 7B model at 32k positions) — bloating HLO, slowing every compile,
    and blocking lowering entirely on a degraded device link (the round-3
    bench hang). The engine threads them into the weights pytree
    (LlmEngine._inject_aux_weights) so compiled programs receive them as
    arguments; direct callers fall back to embedding the host constant."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    attn_factor = 1.0
    if rope_scaling:
        rtype = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
        factor = float(rope_scaling.get("factor", 1.0))
        if rtype == "linear":
            inv_freq = inv_freq / factor
        elif rtype in ("dynamic", "dynamic_ntk"):
            orig_max = rope_scaling.get("original_max_position_embeddings", max_len)
            alpha = factor * max_len / orig_max - (factor - 1)
            theta2 = theta * alpha ** (head_dim / (head_dim - 2))
            inv_freq = 1.0 / (
                theta2 ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
            )
        elif rtype == "yarn":
            orig_max = rope_scaling.get("original_max_position_embeddings", 4096)
            beta_fast = rope_scaling.get("beta_fast", 32.0)
            beta_slow = rope_scaling.get("beta_slow", 1.0)
            inv_freq = _yarn_inv_freq(
                inv_freq, head_dim, theta, orig_max, factor, beta_fast, beta_slow
            )
            attn_factor = float(
                rope_scaling.get("attention_factor")
                or (0.1 * math.log(factor) + 1.0)
            )
        elif rtype == "llama3":
            inv_freq = _llama3_inv_freq(inv_freq, rope_scaling)
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    cos = np.cos(freqs) * attn_factor
    sin = np.sin(freqs) * attn_factor
    return cos.astype(np.float32), sin.astype(np.float32)


def _yarn_inv_freq(inv_freq, head_dim, theta, orig_max, factor, beta_fast, beta_slow):
    def find_dim(num_rot):
        return (head_dim * math.log(orig_max / (num_rot * 2 * math.pi))) / (
            2 * math.log(theta)
        )

    low = max(math.floor(find_dim(beta_fast)), 0)
    high = min(math.ceil(find_dim(beta_slow)), head_dim // 2 - 1)
    dims = np.arange(head_dim // 2, dtype=np.float64)
    ramp = np.clip((dims - low) / max(high - low, 1e-3), 0.0, 1.0)
    mask = 1.0 - ramp  # 1 = interpolate (low freq), 0 = extrapolate (high freq)
    return inv_freq / factor * mask + inv_freq * (1.0 - mask)


def _llama3_inv_freq(inv_freq, rope_scaling):
    factor = float(rope_scaling.get("factor", 8.0))
    low_factor = float(rope_scaling.get("low_freq_factor", 1.0))
    high_factor = float(rope_scaling.get("high_freq_factor", 4.0))
    orig_max = float(rope_scaling.get("original_max_position_embeddings", 8192))
    wavelen = 2 * math.pi / inv_freq
    low_wavelen = orig_max / low_factor
    high_wavelen = orig_max / high_factor
    out = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (orig_max / wavelen - low_factor) / (high_factor - low_factor)
    smoothed = (1 - smooth) * inv_freq / factor + smooth * inv_freq
    is_mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return np.where(is_mid, smoothed, out)


def apply_rope_partial_interleaved(
    x: jnp.ndarray, positions: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
    rotary_dim: int,
) -> jnp.ndarray:
    """GLM4-style rope: only the first rotary_dim dims rotate, in GPT-J
    pairwise fashion — pair (2i, 2i+1) rotates by angle theta_i (HF glm4
    rotate_half is the interleaved variant). cos/sin: [T, rotary_dim//2]."""
    half = rotary_dim // 2
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    c = cos[positions][..., None, :half].astype(jnp.float32)  # [..,1,half]
    s = sin[positions][..., None, :half].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    x_rot, x_pass = xf[..., :rotary_dim], xf[..., rotary_dim:]
    even, odd = x_rot[..., 0::2], x_rot[..., 1::2]  # [.., half]
    out_even = even * c - odd * s
    out_odd = odd * c + even * s
    rot = jnp.stack([out_even, out_odd], axis=-1).reshape(x_rot.shape)
    return jnp.concatenate([rot, x_pass], axis=-1).astype(x.dtype)


def apply_rope_interleave(
    x: jnp.ndarray, positions: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Interleaved (GPT-J pair) rotary, deepseek style: de-interleave pairs
    into halves, then neox rotation. Matches HF apply_rotary_pos_emb_interleave
    (output stays in the permuted order — consistent across q and k, so
    attention scores are unaffected)."""
    half = x.shape[-1] // 2
    x_perm = jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)
    return apply_rope(x_perm, positions, cos, sin)


def apply_rope(
    x: jnp.ndarray, positions: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply neox-style rotary embedding.

    x: [..., heads, head_dim]; positions: broadcastable to x.shape[:-2].
    Rotation pairs (i, i + head_dim//2) — matches HF llama/qwen.
    """
    half = x.shape[-1] // 2
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    c = cos[positions][..., None, :].astype(jnp.float32)  # [..., 1, half]
    s = sin[positions][..., None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def apply_rope_partial_neox(
    x: jnp.ndarray, positions: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
    rotary_dim: int,
) -> jnp.ndarray:
    """Neox-style (half-split) rotation over only the first ``rotary_dim``
    dims of the head; the rest passes through (qwen3-next: head_dim*0.25,
    HF apply_rotary_pos_emb with rotary_dim = cos.shape[-1])."""
    rot, rest = x[..., :rotary_dim], x[..., rotary_dim:]
    rot = apply_rope(rot, positions, cos, sin)
    return jnp.concatenate([rot, rest], axis=-1)


def apply_mrope(
    x: jnp.ndarray,  # [B, T, heads, D]
    positions3: jnp.ndarray,  # [B, 3, T] (t / h / w position streams)
    cos: jnp.ndarray, sin: jnp.ndarray,  # [P, D//2] tables
    secmap: jnp.ndarray,  # [D//2] i32 in {0,1,2}: section id per pair
) -> jnp.ndarray:
    """Multimodal 3D rotary embedding (qwen2-vl MRoPE): rotation pair j takes
    its angle from position stream secmap[j] (HF apply_multimodal_rotary_pos_emb
    with mrope_section; text rows have identical t/h/w so this reduces to
    standard neox rope)."""
    half = x.shape[-1] // 2
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    c3 = jnp.moveaxis(cos[positions3], 1, -1)  # [B, T, half, 3]
    s3 = jnp.moveaxis(sin[positions3], 1, -1)
    sel = jnp.asarray(secmap)[None, None, :, None]
    c = jnp.take_along_axis(c3, sel, axis=-1)[..., 0][:, :, None, :]  # [B,T,1,half]
    s = jnp.take_along_axis(s3, sel, axis=-1)[..., 0][:, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    c = c.astype(jnp.float32)
    s = s.astype(jnp.float32)
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)
