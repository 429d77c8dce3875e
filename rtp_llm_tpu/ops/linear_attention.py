"""Linear-attention (gated DeltaNet) ops for hybrid models (qwen3-next).

Reference analog: the FLA triton kernels + torch fallbacks used by the
reference's hybrid linear-attention models (models_py/model_desc/
qwen3_next.py, kimi_linear.py; triton_kernels/fla/). TPU-native design:

  * the recurrent state is a fixed per-decode-slot tensor — no paging. The
    cache rows are indexed by the stream's decode slot, the state-space
    analog of the paged pool (reference: LinearKVCacheGroup,
    cpp/cache/KVCacheAllocator.h);
  * prefill and decode share ONE formulation: a ``lax.scan`` over the token
    axis carrying (conv tail, recurrent state). T=1 decode is the same
    program at a 1-step scan — fixed shapes, no separate "recurrent" path;
  * all state math runs in fp32 (the delta-rule update is numerically
    sensitive); activations stay in model dtype outside the scan.

Semantics match HF transformers' torch fallbacks
(torch_causal_conv1d_update / torch_recurrent_gated_delta_rule,
transformers/models/qwen3_next/modeling_qwen3_next.py) so checkpoints are
logit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)


def causal_conv1d(
    x: jnp.ndarray,  # [B, T, C] (invalid positions must be pre-zeroed)
    conv_w: jnp.ndarray,  # [K, C] depthwise kernel (HF conv1d.weight[:, 0, :].T)
    conv_state: jnp.ndarray,  # [B, K-1, C] previous inputs (zeros at seq start)
    t_real: jnp.ndarray,  # [B] number of valid tokens this call
):
    """Depthwise causal conv + silu. Returns (y [B,T,C], new_state [B,K-1,C]).

    The new state holds the last K-1 *valid* inputs — gathered by t_real, not
    by array tail, so right-padded prefill buckets stay correct."""
    b, t, c = x.shape
    k = conv_w.shape[0]
    ext = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)  # [B,K-1+T,C]
    extf = ext.astype(jnp.float32)
    y = sum(
        extf[:, j : j + t, :] * conv_w[j].astype(jnp.float32)[None, None, :]
        for j in range(k)
    )
    y = jax.nn.silu(y)
    # new tail = ext rows [t_real .. t_real+K-2] (ends at the last valid input)
    idx = t_real[:, None] + jnp.arange(k - 1, dtype=jnp.int32)[None, :]
    new_state = jnp.take_along_axis(ext, idx[:, :, None], axis=1)
    return y.astype(x.dtype), new_state.astype(conv_state.dtype)


def gated_delta_rule(
    q: jnp.ndarray,  # [B, T, Hv, Dk] (already l2-normed + head-repeated)
    k: jnp.ndarray,  # [B, T, Hv, Dk]
    v: jnp.ndarray,  # [B, T, Hv, Dv]
    g: jnp.ndarray,  # [B, T, Hv] log decay (fp32)
    beta: jnp.ndarray,  # [B, T, Hv] write strength
    state: jnp.ndarray,  # [B, Hv, Dk, Dv] fp32 recurrent state
    valid: jnp.ndarray,  # [B, T] bool — padded rows leave state untouched
):
    """Recurrent gated delta rule (scan over T):
        S   <- S * exp(g_t)
        d   <- (v_t - S^T k_t) * beta_t
        S   <- S + k_t (x) d
        o_t <- S^T q_t
    Returns (out [B,T,Hv,Dv], final state)."""
    scale = q.shape[-1] ** -0.5

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)

    def step(S, xs):
        q_t, k_t, v_t, g_t, b_t, valid_t = xs  # [B,Hv,*]
        S_dec = S * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.sum(S_dec * k_t[..., :, None], axis=-2)  # [B,Hv,Dv]
        delta = (v_t - kv_mem) * b_t[..., None]
        S_new = S_dec + k_t[..., :, None] * delta[..., None, :]
        out_t = jnp.sum(S_new * q_t[..., :, None], axis=-2)  # [B,Hv,Dv]
        S_new = jnp.where(valid_t[:, None, None, None], S_new, S)
        return S_new, out_t

    xs = (
        jnp.moveaxis(qf, 1, 0), jnp.moveaxis(kf, 1, 0), jnp.moveaxis(vf, 1, 0),
        jnp.moveaxis(gf, 1, 0), jnp.moveaxis(bf, 1, 0),
        jnp.moveaxis(valid, 1, 0),
    )
    state, out = jax.lax.scan(step, state.astype(jnp.float32), xs)
    return jnp.moveaxis(out, 0, 1), state  # [B,T,Hv,Dv]


def kda_rule(
    q: jnp.ndarray,  # [B, T, H, Dk] (already l2-normed)
    k: jnp.ndarray,  # [B, T, H, Dk]
    v: jnp.ndarray,  # [B, T, H, Dv]
    g: jnp.ndarray,  # [B, T, H, Dk] per-CHANNEL log decay (fp32)
    beta: jnp.ndarray,  # [B, T, H] write strength (sigmoid applied)
    state: jnp.ndarray,  # [B, H, Dk, Dv] fp32 recurrent state
    valid: jnp.ndarray,  # [B, T] bool
):
    """Kimi Delta Attention recurrence — the gated delta rule with a
    per-key-channel (diagonal) decay instead of a per-head scalar
    (reference: triton_kernels/kimi_kda/fused_recurrent.py:140-155):
        S   <- S * exp(g_t)[:, None]          # Diag(a_t) on the K axis
        d   <- (v_t - S^T k_t) * beta_t
        S   <- S + k_t (x) d
        o_t <- S^T q_t
    Returns (out [B,T,H,Dv], final state)."""
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)

    def step(S, xs):
        q_t, k_t, v_t, g_t, b_t, valid_t = xs  # [B,H,*]
        S_dec = S * jnp.exp(g_t)[..., :, None]  # [B,H,Dk,Dv]
        kv_mem = jnp.sum(S_dec * k_t[..., :, None], axis=-2)  # [B,H,Dv]
        delta = (v_t - kv_mem) * b_t[..., None]
        S_new = S_dec + k_t[..., :, None] * delta[..., None, :]
        out_t = jnp.sum(S_new * q_t[..., :, None], axis=-2)
        S_new = jnp.where(valid_t[:, None, None, None], S_new, S)
        return S_new, out_t

    xs = (
        jnp.moveaxis(qf, 1, 0), jnp.moveaxis(kf, 1, 0), jnp.moveaxis(vf, 1, 0),
        jnp.moveaxis(gf, 1, 0), jnp.moveaxis(bf, 1, 0),
        jnp.moveaxis(valid, 1, 0),
    )
    state, out = jax.lax.scan(step, state.astype(jnp.float32), xs)
    return jnp.moveaxis(out, 0, 1), state


def kda_gate(g_raw: jnp.ndarray, a_log: jnp.ndarray,
             dt_bias: jnp.ndarray) -> jnp.ndarray:
    """KDA forget gate: -exp(A_log_h) * softplus(g + dt_bias), per channel
    (reference: kimi_kda/gate.py fused_kda_gate). g_raw [B,T,H*Dk],
    a_log [H] (checkpoints ship [1,1,H,1]), dt_bias [H*Dk]
    -> [B, T, H, Dk] fp32."""
    a_log = a_log.reshape(-1)
    dt_bias = dt_bias.reshape(-1)
    h = a_log.shape[0]
    b, t, hd = g_raw.shape
    d = hd // h
    g = g_raw.astype(jnp.float32) + dt_bias.astype(jnp.float32)
    g = g.reshape(b, t, h, d)
    return -jnp.exp(a_log.astype(jnp.float32))[None, None, :, None] \
        * jax.nn.softplus(g)


def rms_norm_gated(x: jnp.ndarray, w: jnp.ndarray, gate: jnp.ndarray,
                   eps: float, activation: str = "silu") -> jnp.ndarray:
    """Gated RMSNorm over the last dim: rmsnorm(x) * w * act(gate).
    Plain (ones-init) weight — NOT the zero-centered variant. qwen3-next
    gates with silu; kimi KDA's o_norm gates with sigmoid (reference:
    kimi_linear.py \"o_norm with sigmoid activation (not SwiGLU)\")."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    normed = normed * w.astype(jnp.float32)
    act = jax.nn.sigmoid if activation == "sigmoid" else jax.nn.silu
    return (normed * act(gate.astype(jnp.float32))).astype(x.dtype)
