"""Normalization ops.

TPU-native equivalents of the reference's fused norm kernels
(models_py/bindings/common/kernels — ``fused_add_rmsnorm``, rtp_llm_ops.pyi:268).
On TPU these are expressed in jnp and fused by XLA into surrounding ops; the
accumulations are done in fp32 regardless of input dtype (matching the CUDA
kernels' fp32 accumulators).
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with fp32 accumulation, output in x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm_nobias(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Mean-centered, weight-only LayerNorm (cohere family)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    normed = (xf - mu) * jnp.reciprocal(jnp.sqrt(var + eps))
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """Standard LayerNorm (mean-centered, with bias) in fp32 — bert family."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    normed = (xf - mu) * jnp.reciprocal(jnp.sqrt(var + eps))
    return (normed * weight.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def fused_add_rms_norm(
    x: jnp.ndarray, residual: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6
):
    """residual' = x + residual; y = rms_norm(residual').

    Returns (y, residual'). Mirrors the reference fused_add_rmsnorm contract.
    """
    new_residual = x + residual
    return rms_norm(new_residual, weight, eps), new_residual
