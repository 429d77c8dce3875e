#!/usr/bin/env python
"""MoE expert-GEMM micro-probe: does the batched (vmap) int8 dot fuse the
s8->bf16 convert into the operand read like the 2D case does?

Chain methodology per docs/PERF_NOTES.md: iterations chained through the
activations, concrete scalar fetch, marginal timing. Each call runs L=24
"layers" of E=16 expert FFNs (gate/up/down) at the bench MoE geometry —
the weight-byte traffic of one qwen2-moe-16e decode step's expert path.

Usage (TPU): python benchmarks/moe_gemm_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

E, C, H, I, L = 16, 16, 2048, 1408, 24


def make_weights(key):
    ks = jax.random.split(key, 3)
    wg = jax.random.randint(ks[0], (L, E, H, I), -127, 128, jnp.int32).astype(jnp.int8)
    wu = jax.random.randint(ks[1], (L, E, H, I), -127, 128, jnp.int32).astype(jnp.int8)
    wd = jax.random.randint(ks[2], (L, E, I, H), -127, 128, jnp.int32).astype(jnp.int8)
    sg = jnp.full((L, E, I), 2e-4, jnp.float32)
    sd = jnp.full((L, E, H), 2e-4, jnp.float32)
    return wg, wu, wd, sg, sd


def ffn_vmap(buf, wg, wu, wd, sg, su, sd):
    """Current production path: vmap over experts of quantized_matmul."""
    from rtp_llm_tpu.quant.weight_only import quantized_matmul

    def one(xb, g_, u_, d_, sg_, su_, sd_):
        g = quantized_matmul(xb, g_, sg_)
        u = quantized_matmul(xb, u_, su_)
        return quantized_matmul((jax.nn.silu(g) * u).astype(xb.dtype), d_, sd_)

    return jax.vmap(one)(buf, wg, wu, wd, sg, su, sd)


def ffn_einsum(buf, wg, wu, wd, sg, su, sd):
    """One batched einsum per projection (explicit dot_general batching)."""
    g = jnp.einsum("ech,ehi->eci", buf, wg.astype(buf.dtype)) * sg[:, None, :]
    u = jnp.einsum("ech,ehi->eci", buf, wu.astype(buf.dtype)) * su[:, None, :]
    a = (jax.nn.silu(g) * u).astype(buf.dtype)
    return jnp.einsum("eci,eih->ech", a, wd.astype(buf.dtype)) * sd[:, None, :]


def ffn_unrolled(buf, wg, wu, wd, sg, su, sd):
    """E separate 2D dots (the layout the round-2 convert-fusion finding
    was measured on)."""
    outs = []
    for e in range(E):
        g = (buf[e] @ wg[e].astype(buf.dtype)) * sg[e]
        u = (buf[e] @ wu[e].astype(buf.dtype)) * su[e]
        a = (jax.nn.silu(g) * u).astype(buf.dtype)
        outs.append((a @ wd[e].astype(buf.dtype)) * sd[e])
    return jnp.stack(outs)


def run(name, ffn, weights):
    wg, wu, wd, sg, sd = weights

    @jax.jit
    def chain(x, wg, wu, wd, sg, sd):
        def body(x, l):
            y = ffn(x, wg[l], wu[l], wd[l],
                    sg[l], sg[l][..., : I], sd[l])
            return (y * 1e-3).astype(x.dtype), None

        x, _ = lax.scan(body, x, jnp.arange(L))
        return x

    bytes_per_call = (2 * L * E * H * I + L * E * I * H)  # int8 bytes

    def t(n):
        x = jnp.ones((E, C, H), jnp.bfloat16)
        x = chain(x, wg, wu, wd, sg, sd)
        float(x[0, 0, 0])
        t0 = time.time()
        for _ in range(n):
            x = chain(x, wg, wu, wd, sg, sd)
        float(x[0, 0, 0])
        return time.time() - t0

    t2, t8 = t(2), t(8)
    dt = (t8 - t2) / 6
    gbps = bytes_per_call / dt / 1e9
    print(f"{name:12s}: {dt * 1e3:7.2f} ms/call  {gbps:6.1f} GB/s effective "
          f"(weight bytes {bytes_per_call / 1e9:.2f} GB)", flush=True)


def ffn_fused(buf, wgu, wd, sgu, sd):
    """gate|up stacked into ONE [E,H,2I] operand: one batched GEMM + split
    (halves the launch/fusion boundaries of the up-projection pair)."""
    gu = jnp.einsum("ech,ehi->eci", buf, wgu.astype(buf.dtype)) * sgu[:, None, :]
    g, u = gu[..., :I], gu[..., I:]
    a = (jax.nn.silu(g) * u).astype(buf.dtype)
    return jnp.einsum("eci,eih->ech", a, wd.astype(buf.dtype)) * sd[:, None, :]


def run_fused(weights):
    wg, wu, wd, sg, sd = weights
    wgu = jnp.concatenate([wg, wu], axis=-1)  # [L,E,H,2I]
    sgu = jnp.concatenate([sg, sg], axis=-1)

    @jax.jit
    def chain(x, wgu, wd, sgu, sd):
        def body(x, l):
            y = ffn_fused(x, wgu[l], wd[l], sgu[l], sd[l])
            return (y * 1e-3).astype(x.dtype), None

        x, _ = lax.scan(body, x, jnp.arange(L))
        return x

    bytes_per_call = (2 * L * E * H * I + L * E * I * H)

    def t(n):
        x = jnp.ones((E, C, H), jnp.bfloat16)
        x = chain(x, wgu, wd, sgu, sd)
        float(x[0, 0, 0])
        t0 = time.time()
        for _ in range(n):
            x = chain(x, wgu, wd, sgu, sd)
        float(x[0, 0, 0])
        return time.time() - t0

    t2, t8 = t(2), t(8)
    dt = (t8 - t2) / 6
    print(f"{'fused gate|up':12s}: {dt * 1e3:7.2f} ms/call  "
          f"{bytes_per_call / dt / 1e9:6.1f} GB/s effective", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    weights = make_weights(key)
    jax.block_until_ready(weights)
    for name, fn in (("vmap", ffn_vmap), ("einsum", ffn_einsum),
                     ("unrolled", ffn_unrolled)):
        run(name, fn, weights)
    run_fused(weights)


if __name__ == "__main__":
    main()
