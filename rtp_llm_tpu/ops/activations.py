"""Activation ops (reference: silu_and_mul kernel, rtp_llm_ops.pyi:350)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU elementwise: silu(gate) * up. XLA fuses this into the GEMM epilogue."""
    return jax.nn.silu(gate) * up
