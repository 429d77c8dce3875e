#!/usr/bin/env python
"""Compare int4 dequant-GEMM variants inside a production-shaped 28-layer
chain (the ONLY microbench geometry that reproduces e2e numbers on the
tunneled device — single-matmul timings read impossibly fast regardless of
chaining, while this harness matches bench.py's int4 step within ~1 ms).

Chain: 28 layers x (qkv + o + gate_up + down) at Qwen2-7B geometry, b=64,
DISTINCT per-layer weight stacks (3.1 GB packed — must stream from HBM),
iterations chained x -> x so the final fetch depends on every call.

Variants: cur (shipped kernel) / partial (scale on group-partial dots) /
xla (packed fallback) / int8ref (1 B/elem convert-fused). Prints JSON.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from benchmarks.int4_kernel_sweep import (
    _gw_kernel_i8dec, _gw_kernel_i16dec, _gw_kernel_partial, make_variant,
)
from rtp_llm_tpu.ops.quant_gemm import _xla_matmul, groupwise_matmul_packed

L = 28
H = 3584
QKV_N = 4608
INTER = 18944
GROUP = 128
GEOMS = {"qkv": (H, QKV_N), "o": (H, H), "gu": (H, 2 * INTER),
         "dn": (INTER, H)}


def build_stacks(rng, kind: str):
    out = {}
    for name, (k, n) in GEOMS.items():
        if kind == "int8":
            out[name] = (
                jnp.asarray(rng.integers(-127, 128, (L, k, n)), jnp.int8),
                jnp.full((L, n), 2e-4, jnp.float32))
        else:
            out[name] = (
                jnp.asarray(rng.integers(0, 256, (L, k // 2, n)), jnp.uint8),
                jnp.full((L, k // GROUP, n), 3e-3, jnp.float32))
    return out


def matmul_variant(variant: str):
    cache = {}

    def run(x, p, s):
        k2, n = p.shape
        k = 2 * k2
        if variant == "cur":
            return groupwise_matmul_packed(x, p, s)
        if variant == "xla":
            return _xla_matmul(x, p, s, "s4")
        vname, _, tile = variant.partition("@")
        body = {"partial": _gw_kernel_partial,
                "i8dec": _gw_kernel_i8dec,
                "i16dec": _gw_kernel_i16dec}[vname]
        if tile:
            kpt0, nt0 = (int(v) for v in tile.split("x"))
            kpt = kpt0 if k2 % kpt0 == 0 else (256 if k2 % 256 == 0 else 128)
            nt = nt0 if n % nt0 == 0 else (512 if n % 512 == 0 else 256)
        else:
            kpt = 256 if k2 % 256 == 0 else 128
            nt = 512 if n % 512 == 0 else 256
        key = (k, n)
        if key not in cache:
            cache[key] = make_variant(body, x.shape[0], k, n, GROUP, kpt, nt)
        ng = kpt // GROUP
        ng_pad = -(-ng // 8) * 8
        n_k = k2 // kpt
        sr = s.reshape(2, n_k, ng, n)
        s3 = jnp.pad(jnp.stack([sr[0], sr[1]], axis=1),
                     ((0, 0), (0, 0), (0, ng_pad - ng), (0, 0)))
        return cache[key](x, p, s3)

    return run


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((64, H)), jnp.bfloat16)
    packed = build_stacks(rng, "int4")
    nbytes = L * sum(k * n for k, n in GEOMS.values()) / 2
    floor_ms = nbytes / 819e9 * 1e3

    results = []

    def timeit(chain_fn, stacks, label, bytes_factor=1.0, iters=8):
        args = tuple(a for pair in stacks.values() for a in pair)

        @jax.jit
        def step(x, *flat):
            it = iter(flat)
            ws = {n: (next(it), next(it)) for n in GEOMS}
            return chain_fn(x, ws)

        try:
            x = step(x0, *args)
            float(x[0, 0])  # REAL sync: a scalar fetch. block_until_ready
            # on relay-proxied arrays returns before execution completes
            # (measured: 28-layer chain "finished" at 15 TB/s with it).
            t0 = time.perf_counter()
            for _ in range(iters):
                x = step(x, *args)
            ms = None
            float(x[0, 0])
            ms = (time.perf_counter() - t0) / iters * 1e3
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr, flush=True)
            return
        fl = floor_ms * bytes_factor
        results.append({"variant": label, "ms": round(ms, 3),
                        "x_floor": round(ms / fl, 2),
                        "gbs": round(nbytes * bytes_factor / ms * 1e3 / 1e9,
                                     0)})
        print(f"{label:12s} {ms:8.2f} ms  {ms / fl:5.2f}x floor "
              f"({nbytes * bytes_factor / ms * 1e3 / 1e9:.0f} GB/s)",
              file=sys.stderr, flush=True)

    def make_chain(mm):
        def chain(x, ws):
            for li in range(L):
                q = mm(x, ws["qkv"][0][li], ws["qkv"][1][li])
                y = mm(q[:, :H], ws["o"][0][li], ws["o"][1][li])
                z = mm(y, ws["gu"][0][li], ws["gu"][1][li])
                z = mm(z[:, :INTER], ws["dn"][0][li], ws["dn"][1][li])
                x = (x + 1e-3 * z).astype(x.dtype)
            return x
        return chain

    import os

    variants = (os.environ.get("CHAIN_VARIANTS")
                or "cur,partial,i8dec,xla").split(",")
    for variant in variants:
        if variant == "int8ref":
            int8 = build_stacks(rng, "int8")

            def mm8(x, w, s):
                y = jax.lax.dot_general(
                    x, w[...].astype(x.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return (y * s[None, :]).astype(x.dtype)

            timeit(make_chain(mm8), int8, "int8ref", bytes_factor=2.0)
            continue
        timeit(make_chain(matmul_variant(variant)), packed, variant)
    print(json.dumps({"floor_ms": round(floor_ms, 3), "rows": results}))


if __name__ == "__main__":
    main()
