#!/usr/bin/env python
"""Targeted perf experiments for the two decode bottlenecks found by
profile_decode.py (b=64, kv=512, int8 weights):

  kvwrite: 17.2 ms/step for 56 per-layer scatters (slice + scatter + DUS
           materializes full [NS, HD] slab copies)
  attn   : 13.1 ms/step through the Pallas decode kernel (~5x off the
           2.4 ms KV-bandwidth bound)

Variants:
  kv_dus     : current pattern  kv[i,0] -> scatter -> kv.at[i,0].set(...)
  kv_3d      : direct scatter   kv.at[i, 0, slots].set(rows)
  kv_defer   : one batched scatter for all layers (engine deferred path)
  attn_cN_bM : Pallas kernel with chunk_blocks=N, nbuf=M
  attn_rows  : XLA ref attention for comparison
"""

import argparse
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from benchmarks.profile_decode import timeit  # slope-aware timing helper


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--kv-len", type=int, default=512)
    p.add_argument("--layers", type=int, default=28)
    p.add_argument("--block-size", type=int, default=32)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--hkv", type=int, default=4)
    p.add_argument("--hq", type=int, default=28)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--variants",
                   default="kv_dus,kv_3d,kv_defer,attn_c4_b2,attn_c8_b2,"
                           "attn_c16_b2,attn_c8_b4,attn_ref")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    b, L, bs = args.batch, args.layers, args.block_size
    hkv, hq, d = args.hkv, args.hq, args.d
    hd = hkv * d
    max_seq = args.kv_len + 256
    per = math.ceil(max_seq / bs)
    nblocks = b * per + 8
    ns = nblocks * bs

    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((L, 2, ns, hd)) * 0.1, jnp.bfloat16)
    bt = np.zeros((b, per), np.int32)
    for i in range(b):
        bt[i] = 1 + np.arange(i * per, (i + 1) * per) % (nblocks - 1)
    bt = jnp.asarray(bt)
    kv_lens = jnp.full((b,), args.kv_len, jnp.int32)
    rows = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)

    from rtp_llm_tpu.ops.kv_cache import token_slots, write_kv

    K1, K2 = args.steps, args.steps * 4
    results = {}
    want = args.variants.split(",")

    def slots_of(st_kv_lens):
        active = st_kv_lens > 0
        return token_slots(st_kv_lens[:, None], bt, bs,
                           active[:, None]).reshape(-1)

    def kv_dus_k(K):
        def f(kv, kv_lens, rows):
            def body(carry, _):
                kv, kl = carry
                slots = slots_of(kl)
                for i in range(L):
                    kc, vc = kv[i, 0], kv[i, 1]
                    kc, vc = write_kv(kc, vc, rows, rows, slots)
                    kv = kv.at[i, 0].set(kc).at[i, 1].set(vc)
                return (kv, kl + 1), None
            (kv, kv_lens), _ = jax.lax.scan(body, (kv, kv_lens), None,
                                            length=K)
            return kv, kv_lens
        return jax.jit(f, donate_argnums=(0, 1))

    def kv_3d_k(K):
        def f(kv, kv_lens, rows):
            flat = rows.reshape(b, hd)
            def body(carry, _):
                kv, kl = carry
                slots = slots_of(kl)
                for i in range(L):
                    kv = kv.at[i, 0, slots].set(flat, mode="drop")
                    kv = kv.at[i, 1, slots].set(flat, mode="drop")
                return (kv, kl + 1), None
            (kv, kv_lens), _ = jax.lax.scan(body, (kv, kv_lens), None,
                                            length=K)
            return kv, kv_lens
        return jax.jit(f, donate_argnums=(0, 1))

    def kv_defer_k(K):
        def f(kv, kv_lens, rows):
            flat = rows.reshape(b, hd)
            def body(carry, _):
                kv, kl = carry
                slots = slots_of(kl)  # [B]
                base = (jnp.arange(L, dtype=jnp.int32) * 2)[:, None] * ns
                idx_k = (base + slots[None, :]).reshape(-1)
                idx_v = (base + ns + slots[None, :]).reshape(-1)
                kw = jnp.broadcast_to(flat, (L, b, hd)).reshape(-1, hd)
                fl = kv.reshape(L * 2 * ns, hd)
                fl = fl.at[jnp.concatenate([idx_k, idx_v])].set(
                    jnp.concatenate([kw, kw]), mode="drop")
                return (fl.reshape(kv.shape), kl + 1), None
            (kv, kv_lens), _ = jax.lax.scan(body, (kv, kv_lens), None,
                                            length=K)
            return kv, kv_lens
        return jax.jit(f, donate_argnums=(0, 1))

    def attn_k(K, c, nb, ref=False):
        from rtp_llm_tpu.ops.attention import paged_attention_ref
        from rtp_llm_tpu.ops.attention.pallas_decode import (
            paged_decode_attention,
        )

        def f(kv, q):
            def body(acc, _):
                qq = q + (acc * 0).astype(q.dtype)
                for i in range(L):
                    if ref:
                        o = paged_attention_ref(
                            qq[:, None], kv[i, 0], kv[i, 1], bt, kv_lens,
                            kv_lens - 1, d ** -0.5, bs)[:, 0]
                    else:
                        o = paged_decode_attention(
                            qq, kv[i, 0], kv[i, 1], bt, kv_lens,
                            d ** -0.5, bs, chunk_blocks=c, nbuf=nb)
                    acc = acc + o.astype(jnp.float32).mean()
                return acc, None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=K)
            return acc
        return jax.jit(f)

    for name in want:
        try:
            ts = {}
            for K in (K1, K2):
                if name == "kv_dus":
                    fn = kv_dus_k(K)
                    t, out = timeit(fn, kv, kv_lens, rows,
                                    donate_chain=((0, 0), (1, 1)))
                    kv, kv_lens = out
                    kv_lens = kv_lens - K  # keep lengths stable
                elif name == "kv_3d":
                    fn = kv_3d_k(K)
                    t, out = timeit(fn, kv, kv_lens, rows,
                                    donate_chain=((0, 0), (1, 1)))
                    kv, kv_lens = out
                    kv_lens = kv_lens - K
                elif name == "kv_defer":
                    fn = kv_defer_k(K)
                    t, out = timeit(fn, kv, kv_lens, rows,
                                    donate_chain=((0, 0), (1, 1)))
                    kv, kv_lens = out
                    kv_lens = kv_lens - K
                elif name.startswith("attn_c"):
                    c, nb = name[len("attn_c"):].split("_b")
                    fn = attn_k(K, int(c), int(nb))
                    t, _ = timeit(fn, kv, q)
                elif name == "attn_ref":
                    fn = attn_k(K, 0, 0, ref=True)
                    t, _ = timeit(fn, kv, q)
                ts[K] = t
                print(f"  {name} K={K}: {t*1e3:.1f} ms", file=sys.stderr,
                      flush=True)
            slope = (ts[K2] - ts[K1]) / (K2 - K1)
            results[name] = slope
        except Exception as e:
            print(f"  {name} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            results[name] = None

    print("\n=== per-step device time (slope, ms) ===")
    for k, v in results.items():
        print(f"{k:12s} {'FAIL' if v is None else f'{v*1e3:8.2f}'}")


if __name__ == "__main__":
    main()
