#!/usr/bin/env python
"""Can XLA's TPU backend read NATIVE s4 weights at the packed-byte rate?

If yes, the int4 speed-of-light path is the same shape as the int8 one —
`x @ w_s4` with the convert fused into the matmul operand, no Pallas dequant
kernel at all — and groupwise scales become the only open question.

Chain: 28 layers x (gate_up + down), distinct per-layer s4 stacks CREATED
ON DEVICE (device_put of packed s4 host buffers fails on this platform, but
an in-jit astype(int4) materializes a true s4 HBM array). Variants:

  s4dot      — x @ w_s4 with per-out-channel scale (int8-path shape)
  s4dot_g    — groupwise scales via reshaped batched einsum partials
  i16dec     — Pallas kernel decoding nibbles in i16 arithmetic

Timing: chained x->x, scalar-fetch sync. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

L = 28
H = 3584
INTER = 18944
GROUP = 128


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((64, H)), jnp.bfloat16)

    # build s4 stacks ON DEVICE from jitted int8->int4 converts
    @jax.jit
    def mk_s4(key):
        ks = jax.random.split(key, 2)
        gu = jax.random.randint(ks[0], (L, H, 2 * INTER), -8, 8,
                                jnp.int8).astype(jnp.int4)
        dn = jax.random.randint(ks[1], (L, INTER, H), -8, 8,
                                jnp.int8).astype(jnp.int4)
        return gu, dn

    try:
        gu4, dn4 = mk_s4(jax.random.PRNGKey(0))
        _ = float(jnp.sum(gu4[0, 0, :8].astype(jnp.float32)))
        s4_ok = True
    except Exception as e:  # noqa: BLE001
        print(f"s4 storage FAILED: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)
        s4_ok = False

    results = []
    nbytes = L * (H * 2 * INTER + INTER * H) / 2
    floor_ms = nbytes / 819e9 * 1e3

    def timeit(step, label, *args, iters=8):
        try:
            x = step(x0, *args)
            float(x[0, 0])
            t0 = time.perf_counter()
            for _ in range(iters):
                x = step(x, *args)
            float(x[0, 0])
            ms = (time.perf_counter() - t0) / iters * 1e3
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            return
        results.append({"variant": label, "ms": round(ms, 2),
                        "x_floor": round(ms / floor_ms, 2),
                        "gbs": round(nbytes / ms * 1e3 / 1e9)})
        print(f"{label:10s} {ms:8.2f} ms  {ms / floor_ms:5.2f}x floor "
              f"({nbytes / ms * 1e3 / 1e9:.0f} GB/s)",
              file=sys.stderr, flush=True)

    if s4_ok:
        sc_gu = jnp.full((L, 2 * INTER), 3e-3, jnp.float32)
        sc_dn = jnp.full((L, H), 3e-3, jnp.float32)

        @jax.jit
        def s4dot(x, gu, dn, sg, sd):
            for li in range(L):
                z = jax.lax.dot_general(
                    x, gu[li].astype(x.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * sg[li][None, :]
                z = jax.lax.dot_general(
                    z[:, :INTER].astype(x.dtype), dn[li].astype(x.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * sd[li][None, :]
                x = (x + 1e-3 * z).astype(x.dtype)
            return x

        timeit(s4dot, "s4dot", gu4, dn4, sc_gu, sc_dn)

        g_gu = jnp.full((L, H // GROUP, 2 * INTER), 3e-3, jnp.float32)
        g_dn = jnp.full((L, INTER // GROUP, H), 3e-3, jnp.float32)

        @jax.jit
        def s4dot_g(x, gu, dn, sg, sd):
            def gw(xi, w4, s):
                k, n = w4.shape
                g = s.shape[0]
                xg = xi.reshape(xi.shape[0], g, k // g)
                wg = w4.reshape(g, k // g, n)
                part = jnp.einsum("bgk,gkn->bgn", xg.astype(jnp.bfloat16),
                                  wg.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
                return jnp.einsum("bgn,gn->bn", part, s)

            for li in range(L):
                z = gw(x, gu[li], sg[li])
                z = gw(z[:, :INTER].astype(x.dtype), dn[li], sd[li])
                x = (x + 1e-3 * z).astype(x.dtype)
            return x

        timeit(s4dot_g, "s4dot_g", gu4, dn4, g_gu, g_dn)

    print(json.dumps({"floor_ms": round(floor_ms, 3), "rows": results}))


if __name__ == "__main__":
    main()
