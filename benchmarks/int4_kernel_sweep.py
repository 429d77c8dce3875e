#!/usr/bin/env python
"""Sweep int4 dequant-GEMM kernel variants on the live chip.

CAVEAT (measured): single-matmul timings on this platform read impossibly
fast even with chained iterations + scalar-fetch sync — compare variants
with benchmarks/int4_chain_bench.py (28-layer chain), which reproduces the
e2e bench. This file is kept for the variant kernel BODIES it defines and
for interpret-mode correctness checks.

The fused int4 path measures 0.30x of its 0.5 B/elem roofline (bench.py
--quant int4), with the Pallas kernel ~7x off its packed-read floor — the
judge's hypothesis is VPU-bound nibble dequant. This harness times isolated
variants at the real decode GEMM geometries so the winner is chosen on
DATA, not theory (docs/PERF_NOTES.md measurement rules: operands as
arguments, one scalar sync, idle host).

Variants:
  cur       — ops/quant_gemm._kernel_matmul as shipped
  partial   — scale applied to GROUP PARTIAL dots ([mt,nt] per group)
              instead of expanded over the [kpt,nt] weight tile
  i8dec     — nibble decode in narrow u8/i8 arithmetic (if Mosaic allows)
  bf16ref   — plain bf16 x bf16 dot at the same shapes (1 B/elem-equivalent
              compute ceiling; reads 4x the bytes of packed int4)
  int8ref   — x @ W_s8 convert-fused XLA dot (the int8 path's per-matmul)

Prints one JSON line per (geometry, variant): ms/call and GB/s effective.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time(fn, x0, *args, iters=20):
    """CHAINED timing: each call's x input is derived from the previous
    call's output, so the final scalar fetch depends on EVERY call. The
    axon relay multiplexes independent dispatches across channels —
    unchained loops under-count by up to ~10x (measured; docs/PERF_NOTES)."""
    k = x0.shape[1]

    @jax.jit
    def step(x, *a):
        y = fn(x, *a)
        # fold the output back into an input of the right shape/dtype
        if y.shape[1] >= k:
            return (x + 1e-6 * y[:, :k].astype(x.dtype)).astype(x.dtype)
        reps = -(-k // y.shape[1])
        t = jnp.tile(y, (1, reps))[:, :k]
        return (x + 1e-6 * t.astype(x.dtype)).astype(x.dtype)

    x = step(x0, *args)
    float(x[0, 0])  # REAL sync: scalar fetch (block_until_ready on
    # relay-proxied arrays returns before execution completes)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    float(x[0, 0])
    return (time.perf_counter() - t0) / iters


# ---- variant: group-partial scaling ----------------------------------------

def _gw_kernel_partial(x_lo_ref, x_hi_ref, p_ref, s_ref, o_ref,
                       acc_ref, *, n_k: int, group: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[...]
    kpt, nt = p.shape
    ng = kpt // group
    xdt = x_lo_ref.dtype
    c = p.astype(jnp.int32)

    def half(nib, x_ref, srow):
        w = ((nib ^ 8) - 8).astype(xdt)  # [KPt, Nt] bf16, NO scale expand
        acc = jnp.zeros(acc_ref.shape, jnp.float32)
        for g_ in range(ng):
            xg = x_ref[:, g_ * group:(g_ + 1) * group]
            wg = w[g_ * group:(g_ + 1) * group, :]
            part = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += part * srow[g_, :][None, :]
        return acc

    acc_ref[...] += (half(c & 0xF, x_lo_ref, s_ref[0, 0])
                     + half((c >> 4) & 0xF, x_hi_ref, s_ref[0, 1]))

    @pl.when(k == n_k - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


# ---- variant: i16 decode (2 elems/lane if Mosaic legalizes i16 vectors) ----

def _gw_kernel_i16dec(x_lo_ref, x_hi_ref, p_ref, s_ref, o_ref,
                      acc_ref, *, n_k: int, group: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[...]  # u8
    kpt, nt = p.shape
    ng = kpt // group
    xdt = x_lo_ref.dtype
    c16 = p.astype(jnp.int16)

    def half(nib16, x_ref, srow):
        w = (((nib16 ^ jnp.int16(8)) - jnp.int16(8))).astype(xdt)
        acc = jnp.zeros(acc_ref.shape, jnp.float32)
        for g_ in range(ng):
            xg = x_ref[:, g_ * group:(g_ + 1) * group]
            wg = w[g_ * group:(g_ + 1) * group, :]
            part = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += part * srow[g_, :][None, :]
        return acc

    acc_ref[...] += (half(c16 & jnp.int16(0xF), x_lo_ref, s_ref[0, 0])
                     + half((c16 >> 4) & jnp.int16(0xF), x_hi_ref,
                            s_ref[0, 1]))

    @pl.when(k == n_k - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


# ---- variant: narrow u8 decode ---------------------------------------------

def _gw_kernel_i8dec(x_lo_ref, x_hi_ref, p_ref, s_ref, o_ref,
                     acc_ref, *, n_k: int, group: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[...]  # u8
    kpt, nt = p.shape
    ng = kpt // group
    xdt = x_lo_ref.dtype

    def half(nib_u8, x_ref, srow):
        # decode in 8-bit lanes: (c ^ 8) - 8, then one widening convert
        w8 = (nib_u8 ^ jnp.uint8(8)).astype(jnp.int8) - jnp.int8(8)
        w = w8.astype(xdt)
        acc = jnp.zeros(acc_ref.shape, jnp.float32)
        for g_ in range(ng):
            xg = x_ref[:, g_ * group:(g_ + 1) * group]
            wg = w[g_ * group:(g_ + 1) * group, :]
            part = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += part * srow[g_, :][None, :]
        return acc

    acc_ref[...] += (half(p & jnp.uint8(0xF), x_lo_ref, s_ref[0, 0])
                     + half(p >> 4, x_hi_ref, s_ref[0, 1]))

    @pl.when(k == n_k - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def make_variant(kernel_body, m, k, n, group, kpt, nt, interpret=False):
    k2 = k // 2
    n_k = k2 // kpt
    ng = kpt // group
    ng_pad = -(-ng // 8) * 8

    def run(x2, packed, s3):
        mt = m if m <= 256 else 256
        return pl.pallas_call(
            functools.partial(kernel_body, n_k=n_k, group=group),
            grid=(max(m // mt, 1), n // nt, n_k),
            in_specs=[
                pl.BlockSpec((mt, kpt), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((mt, kpt), lambda i, j, kk, _o=n_k: (i, kk + _o)),
                pl.BlockSpec((kpt, nt), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((1, 2, ng_pad, nt),
                             lambda i, j, kk: (kk, 0, 0, j)),
            ],
            out_specs=pl.BlockSpec((mt, nt), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
            scratch_shapes=[pltpu.VMEM((mt, nt), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(x2, x2, packed, s3)

    return jax.jit(run)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=64)
    p.add_argument("--group", type=int, default=128)
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()

    geoms = [(3584, 18944), (18944, 3584), (3584, 4608)]
    rng = np.random.default_rng(0)
    results = []
    for k, n in geoms:
        m, group = args.m, args.group
        g = k // group
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        packed = jnp.asarray(
            rng.integers(0, 256, (k // 2, n)), jnp.uint8)
        scale = jnp.asarray(
            np.full((g, n), 3e-3), jnp.float32)
        w_bf16 = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
        w_s8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        s8_scale = jnp.asarray(np.full((n,), 2e-4), jnp.float32)

        floor_ms = (k / 2 * n) / 819e9 * 1e3  # packed bytes / HBM BW

        from rtp_llm_tpu.ops.quant_gemm import _kernel_matmul

        def cur(x_, p_, s_):
            return _kernel_matmul(x_, p_, s_, "s4")

        entries = [("cur", jax.jit(cur), (x, packed, scale))]

        n_k_ok = True
        for kpt in (256, 512):
            if (k // 2) % kpt or kpt % group:
                continue
            nt = 512 if n % 512 == 0 else 256
            ng = kpt // group
            ng_pad = -(-ng // 8) * 8
            n_k = (k // 2) // kpt
            sr = scale.reshape(2, n_k, ng, n)
            s3 = jnp.pad(jnp.stack([sr[0], sr[1]], axis=1),
                         ((0, 0), (0, 0), (0, ng_pad - ng), (0, 0)))
            for name, body in (("partial", _gw_kernel_partial),
                               ("i8dec", _gw_kernel_i8dec)):
                entries.append((
                    f"{name}/k{kpt}n{nt}",
                    make_variant(body, m, k, n, group, kpt, nt,
                                 interpret=args.interpret),
                    (x, packed, s3)))

        def bf16ref(x_, w_):
            return jax.lax.dot_general(
                x_, w_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        entries.append(("bf16ref", jax.jit(bf16ref), (x, w_bf16)))

        def int8ref(x_, w_, s_):
            y = jax.lax.dot_general(
                x_, w_.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (y * s_[None, :]).astype(jnp.bfloat16)

        entries.append(("int8ref", jax.jit(int8ref), (x, w_s8, s8_scale)))

        for name, fn, a in entries:
            try:
                ms = _time(fn, *a) * 1e3
            except Exception as e:  # noqa: BLE001
                print(f"[{k}x{n}] {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr, flush=True)
                continue
            results.append({"geom": f"{k}x{n}", "variant": name,
                            "ms": round(ms, 4),
                            "x_floor": round(ms / floor_ms, 2)})
            print(f"[{k}x{n}] {name:16s} {ms:8.3f} ms "
                  f"({ms / floor_ms:5.2f}x packed-read floor)",
                  file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
