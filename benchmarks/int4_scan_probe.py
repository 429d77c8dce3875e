#!/usr/bin/env python
"""[SUPERSEDED by int4_chain_bench.py — this probe predates the
scalar-fetch sync rule and under-counts; see PERF_NOTES measurement
rules.] Isolate why the e2e int4 decode step costs ~3.3x its roofline while the
dequant kernels measure near-floor in isolation.

Emulates the decode weight-matmul chain (28 layers x 4 projections at
Qwen2-7B geometry, b=64) three ways inside ONE jit each:

  unrolled  — python loop, layer weights as separate arrays
  stacked   — python loop over dynamic_index_in_dim slices of [L, ...]
              stacks (what the engine's scan-over-layers does per layer)
  scan      — lax.scan over the layer index with dynamic slices (the
              engine's actual decode program shape)

If `stacked`/`scan` blow up vs `unrolled`, the dynamic-sliced operands are
being copied (or worse) before each pallas_call — the e2e gap's source.
Prints one JSON line. Methodology: one dispatch per timed call, scalar sync.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from rtp_llm_tpu.ops.quant_gemm import groupwise_matmul_packed

L = 28
H = 3584
QKV_N = 4608
INTER = 18944
GROUP = 128


def make_weights(rng, stacked: bool):
    def mk(k, n):
        p = rng.integers(0, 256, ((L, k // 2, n) if stacked
                                  else (k // 2, n))).astype(np.uint8)
        s = np.full((L, k // GROUP, n) if stacked else (k // GROUP, n),
                    3e-3, np.float32)
        return jnp.asarray(p), jnp.asarray(s)

    qkv = mk(H, QKV_N)
    o = mk(H, H)
    gu = mk(H, 2 * INTER)
    dn = mk(INTER, H)
    return qkv, o, gu, dn


def layer(x, qkv, o, gu, dn):
    y = groupwise_matmul_packed(x, qkv[0], qkv[1])
    y = groupwise_matmul_packed(y[:, :H], o[0], o[1])
    z = groupwise_matmul_packed(y, gu[0], gu[1])
    z = groupwise_matmul_packed(z[:, :INTER], dn[0], dn[1])
    return (x + z).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((64, H)), jnp.bfloat16)

    results = {}

    # ---- unrolled: ONE un-stacked weight set reused for all layers
    # (HBM-friendly; per-call traffic is what matters, and XLA cannot
    # hoist anything: x changes every layer) ----
    per_layer = make_weights(rng, stacked=False)

    @jax.jit
    def unrolled(x, ws):
        for _ in range(L):
            x = layer(x, *ws)
        return x

    # ---- stacked + dynamic slices, python loop ----
    stacks = make_weights(rng, stacked=True)

    def sliced(ws, i):
        return tuple((jax.lax.dynamic_index_in_dim(p, i, 0, keepdims=False),
                      jax.lax.dynamic_index_in_dim(s, i, 0, keepdims=False))
                     for p, s in ws)

    @jax.jit
    def stacked_loop(x, ws):
        for li in range(L):
            x = layer(x, *sliced(ws, li))
        return x

    # ---- lax.scan over the layer index (engine decode shape) ----
    @jax.jit
    def scanned(x, ws):
        def body(x, i):
            return layer(x, *sliced(ws, i)), ()

        x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return x

    def timeit(fn, *args, iters=20):
        fn(*args).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters * 1e3

    bytes_per_call = L * (H * QKV_N + H * H + H * 2 * INTER + INTER * H) / 2
    floor_ms = bytes_per_call / 819e9 * 1e3

    results["unrolled_ms"] = round(timeit(unrolled, x0, per_layer), 3)
    results["stacked_ms"] = round(timeit(stacked_loop, x0, stacks), 3)
    results["scan_ms"] = round(timeit(scanned, x0, stacks), 3)
    results["floor_ms"] = round(floor_ms, 3)
    for k in ("unrolled_ms", "stacked_ms", "scan_ms"):
        results[k.replace("_ms", "_x_floor")] = round(
            results[k] / floor_ms, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
