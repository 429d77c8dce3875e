#!/usr/bin/env python
"""Decompose the multi-step decode program's step time on real hardware.

Round-1 left a 27.3 ms measured vs 11.7 ms roofline gap at b=64 (BENCH_r01).
This harness times ablated variants of the decode scan body with all large
operands passed as ARGUMENTS (PERF_NOTES: closed-over constants give wildly
wrong timings on this stack):

  full       : the engine's real _decode_multi_impl (forward + sampler + state)
  fwd        : model forward only (fixed token, KV writes included)
  fwd_nokv   : forward with KV writes AND attention's cache read dropped
  matmuls    : per-layer qkv/o/mlp matmuls only (weight-read floor)
  sampler    : penalties + argmax + logprob on a fixed [B,V] logits
  lmhead     : final-norm + lm_head gather only

Usage: python benchmarks/profile_decode.py [--batch 64] [--steps 16] ...
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _sync(out):
    """Force completion of the whole program by fetching ONE element derived
    from an output leaf. On the tunneled axon platform block_until_ready can
    return before execution and big-array fetches run at tunnel bandwidth, so
    a scalar fetch is the only trustworthy sync."""
    import jax
    import numpy as np

    leaf = [l for l in jax.tree.leaves(out) if hasattr(l, "ravel")][-1]
    np.asarray(leaf.ravel()[-1:])


def timeit(fn, *args, n=3, donate_chain=None):
    """Time fn(*args) with a forced scalar fetch; if donate_chain is given,
    outputs replace the donated args between calls. Returns (best_s, out).

    NOTE: each measurement includes a fixed per-dispatch tunnel overhead
    (~30 ms on this stack) — callers must difference two K values (slope)
    to get true per-iteration device time."""
    out = fn(*args)
    _sync(out)  # compile + 1 run
    best = float("inf")
    cur_args = list(args)
    if donate_chain:
        outs = out if isinstance(out, tuple) else (out,)
        for ai, oi in donate_chain:
            cur_args[ai] = outs[oi]
    for _ in range(n):
        t0 = time.time()
        out = fn(*cur_args)
        _sync(out)
        best = min(best, time.time() - t0)
        if donate_chain:
            outs = out if isinstance(out, tuple) else (out,)
            for ai, oi in donate_chain:
                cur_args[ai] = outs[oi]
    return best, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen2-7b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--prompt-len", type=int, default=512)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--block-size", type=int, default=32)
    p.add_argument("--variants", default="full,fwd,matmuls,sampler")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import MODELS, build_device_weights
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, QuantConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.model_config import ModelConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.engine import device_state as ds
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.models.batch import ModelInputs

    mc = ModelConfig(model_type="qwen2", **MODELS[args.model])
    model = create_model(mc)
    t0 = time.time()
    weights = build_device_weights(mc, args.quant)
    jax.block_until_ready(weights)
    print(f"weights built in {time.time()-t0:.1f}s", file=sys.stderr)

    b = args.batch
    import math
    max_seq = args.prompt_len + 256
    blocks_needed = b * math.ceil(max_seq / args.block_size) + 8
    econf = EngineConfig(
        cache=CacheConfig(block_size=args.block_size,
                          test_num_blocks=blocks_needed,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(
            max_batch_size=b, max_seq_len=max_seq,
            prefill_buckets=(args.prompt_len,),
            decode_steps=args.steps,
        ),
        quant=QuantConfig(method="int8" if args.quant == "int8" else "none"),
    )
    eng = LlmEngine(model, weights, econf)
    weights = eng.weights  # engine may have applied load-time QKV fusion

    # synthetic decode state: slot i active at kv_len=prompt_len with a
    # disjoint block range (KV contents are garbage — irrelevant for timing)
    mb = eng.max_blocks_per_seq
    bt = np.zeros((b, mb), np.int32)
    per = math.ceil(max_seq / args.block_size)
    for i in range(b):
        bt[i, :per] = 1 + np.arange(i * per, (i + 1) * per) % (blocks_needed - 1)
    state = eng.state._replace(
        last_tokens=jnp.asarray(np.random.randint(0, mc.vocab_size, b), jnp.int32),
        kv_lens=jnp.full((b,), args.prompt_len, jnp.int32),
        block_tables=jnp.asarray(bt),
    )
    kv = eng.kv
    K1 = args.steps
    K2 = args.steps * 4
    results = {}
    want = args.variants.split(",")

    def fwd_only_k(K):
        def fwd_only(weights, kv, state):
            def body(carry, _):
                kv, st = carry
                active = st.kv_lens > 0
                kv_lens_new = jnp.where(active, st.kv_lens + 1, 0)
                inputs = ModelInputs(
                    tokens=st.last_tokens[:, None],
                    positions=jnp.where(active, st.kv_lens, 0)[:, None],
                    block_tables=st.block_tables,
                    kv_lens=kv_lens_new,
                    q_offsets=st.kv_lens,
                )
                out, kv = model.forward(weights, kv, inputs)
                st = st._replace(
                    kv_lens=kv_lens_new,
                    last_tokens=out.logits[:, 0].astype(jnp.int32) % 7 + 3,
                )
                return (kv, st), None
            (kv, state), _ = jax.lax.scan(body, (kv, state), None, length=K)
            return kv, state
        return jax.jit(fwd_only, donate_argnums=(1, 2))

    def fwd_nosample_k(K):
        """Forward + argmax only (drop penalties/logsoftmax/counts)."""
        def f(weights, kv, state):
            def body(carry, _):
                kv, st = carry
                active = st.kv_lens > 0
                kv_lens_new = jnp.where(active, st.kv_lens + 1, 0)
                inputs = ModelInputs(
                    tokens=st.last_tokens[:, None],
                    positions=jnp.where(active, st.kv_lens, 0)[:, None],
                    block_tables=st.block_tables,
                    kv_lens=kv_lens_new,
                    q_offsets=st.kv_lens,
                )
                out, kv = model.forward(weights, kv, inputs)
                toks = jnp.argmax(out.logits, axis=-1).astype(jnp.int32)
                st = st._replace(kv_lens=kv_lens_new, last_tokens=toks)
                return (kv, st), toks
            (kv, state), toks = jax.lax.scan(body, (kv, state), None, length=K)
            return kv, state, toks
        return jax.jit(f, donate_argnums=(1, 2))

    def fwd_noattn_k(K):
        """Real forward with the attention op replaced by identity (q
        passthrough): fwd - fwd_noattn = in-program attention cost;
        fwd_noattn - matmuls = rope/norms/embeds/reshapes overhead."""
        import rtp_llm_tpu.models.llama_family as lf
        real = lf.paged_attention

        def stub(q, k_cache, v_cache, block_tables, kv_lens, q_offsets,
                 sm_scale, **kw):
            return q

        fwd = fwd_only_k(K)

        def f(weights, kv, state):
            lf.paged_attention = stub
            try:
                return fwd(weights, kv, state)
            finally:
                lf.paged_attention = real
        return f

    def matmuls_k(K):
        hqd = mc.num_attention_heads * mc.head_dim

        def mm_only(weights, x):
            def body(x, _):
                for i in range(mc.num_layers):
                    if "qkv_proj" in weights:  # load-time fusion applied
                        qkv = model._linear(weights, "qkv_proj", i, x)
                        q = qkv[..., :hqd]
                        rest = qkv[..., hqd:]
                        a = q + rest.sum(-1, keepdims=True).astype(q.dtype)
                    else:
                        q = model._linear(weights, "q_proj", i, x)
                        k = model._linear(weights, "k_proj", i, x)
                        v = model._linear(weights, "v_proj", i, x)
                        a = q + (k.sum(-1, keepdims=True)
                                 + v.sum(-1, keepdims=True)).astype(q.dtype)
                    x = model._linear(weights, "o_proj", i, a)
                    if "gate_up_proj" in weights:
                        gu = model._linear(weights, "gate_up_proj", i, x)
                        g, u = jnp.split(gu, 2, axis=-1)
                    else:
                        g = model._linear(weights, "gate_proj", i, x)
                        u = model._linear(weights, "up_proj", i, x)
                    x = model._linear(weights, "down_proj", i,
                                      jax.nn.silu(g) * u)
                    x = jnp.tanh(x)  # keep magnitudes sane across iterations
                return x, None
            x, _ = jax.lax.scan(body, x, None, length=K)
            return x
        return jax.jit(mm_only)

    def attn_k(K):
        from rtp_llm_tpu.ops.attention import paged_attention

        def attn_only(kv, state, q0):
            def body(acc, _):
                q = q0 + (acc * 0).astype(q0.dtype)
                for i in range(mc.num_layers):
                    # full_cache mode, like the engine's forward: the kernel
                    # DMAs at a static layer offset (per-layer kv[i, 0]
                    # slices would materialize slab copies XLA-side)
                    o = paged_attention(
                        q, kv[i, 0], kv[i, 1],
                        state.block_tables, state.kv_lens, state.kv_lens - 1,
                        mc.head_dim ** -0.5, block_size=args.block_size,
                        backend=model.attn_backend,
                        full_cache=kv, layer=i,
                    )
                    acc = acc + o.astype(jnp.float32).mean()
                return acc, None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=K)
            return acc
        return jax.jit(attn_only)

    def attn_dyn_k(K):
        """attn with a TRACED layer index (the scan-over-layers kernel
        mode): isolates the dynamic-layer DMA addressing cost."""
        from rtp_llm_tpu.ops.attention import paged_attention

        def attn_only(kv, state, q0):
            def body(acc, _):
                q = q0 + (acc * 0).astype(q0.dtype)
                for i in range(mc.num_layers):
                    o = paged_attention(
                        q, kv[i, 0], kv[i, 1],
                        state.block_tables, state.kv_lens, state.kv_lens - 1,
                        mc.head_dim ** -0.5, block_size=args.block_size,
                        backend=model.attn_backend,
                        full_cache=kv, layer=jnp.int32(i),
                    )
                    acc = acc + o.astype(jnp.float32).mean()
                return acc, None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=K)
            return acc
        return jax.jit(attn_only)

    def kvwrite_k(K):
        """Per-layer KV writes only (direct 3D scatters on the donated pool,
        matching the engine's in-layer write path)."""
        from rtp_llm_tpu.ops.kv_cache import token_slots

        def f(kv, state, rows_k, rows_v):
            def body(carry, _):
                kv, st = carry
                active = st.kv_lens > 0
                kv_lens_new = jnp.where(active, st.kv_lens + 1, 0)
                slots = token_slots(
                    st.kv_lens[:, None], st.block_tables,
                    args.block_size, active[:, None],
                ).reshape(-1)
                k2d = rows_k.reshape(-1, rows_k.shape[-2] * rows_k.shape[-1])
                v2d = rows_v.reshape(-1, rows_v.shape[-2] * rows_v.shape[-1])
                for i in range(mc.num_layers):
                    kv = (kv.at[i, 0, slots].set(k2d.astype(kv.dtype),
                                                 mode="drop")
                            .at[i, 1, slots].set(v2d.astype(kv.dtype),
                                                 mode="drop"))
                st = st._replace(kv_lens=kv_lens_new)
                return (kv, st), None
            (kv, state), _ = jax.lax.scan(body, (kv, state), None, length=K)
            return kv, state
        return jax.jit(f, donate_argnums=(0, 1))

    def sampler_k(K):
        from rtp_llm_tpu.ops.sampling import sample_tokens

        def sampler_only(logits, state):
            def body(st, _):
                rng, key = jax.random.split(st.rng)
                toks, lps, counts = sample_tokens(
                    logits + st.last_tokens[:, None].astype(jnp.float32) * 0,
                    st.params, st.prompt_mask, st.output_counts,
                    eng.eos_ids, key, need_sampling=False,
                    forced_tokens=st.forced_tokens,
                    bias_ids=st.bias_ids, bias_vals=st.bias_vals,
                )
                st = st._replace(last_tokens=toks, output_counts=counts,
                                 rng=rng)
                return st, (toks, lps)
            st, outs = jax.lax.scan(body, state, None, length=K)
            return st, outs
        return jax.jit(sampler_only, donate_argnums=(1,))

    hq, d, hkv = mc.num_attention_heads, mc.head_dim, mc.num_kv_heads
    variants = {
        "full": lambda K: (
            lambda kv, state: eng._decode_multi_jit(weights, kv, state,
                                                    False, K),
            "kvstate"),
        # the serving fast path (no penalties / logprobs in the batch)
        "full_fast": lambda K: (
            lambda kv, state: eng._decode_multi_jit(weights, kv, state,
                                                    False, K,
                                                    need_stats=False),
            "kvstate"),
        "fwd": lambda K: (functools.partial(fwd_only_k(K), weights),
                          "kvstate"),
        "fwd_nosample": lambda K: (
            functools.partial(fwd_nosample_k(K), weights), "kvstate"),
        "fwd_noattn": lambda K: (
            functools.partial(fwd_noattn_k(K), weights), "kvstate"),
        "matmuls": lambda K: (matmuls_k(K), "x"),
        "attn": lambda K: (attn_k(K), "attn"),
        "attn_dyn": lambda K: (attn_dyn_k(K), "attn"),
        "kvwrite": lambda K: (kvwrite_k(K), "kvrows"),
        "sampler": lambda K: (sampler_k(K), "logits"),
    }

    x0 = jax.device_put(
        jnp.asarray(np.random.standard_normal((b, 1, mc.hidden_size)) * 0.02,
                    jnp.bfloat16))
    q0 = jax.device_put(
        jnp.asarray(np.random.standard_normal((b, 1, hq, d)), jnp.bfloat16))
    logits0 = jax.device_put(
        jnp.asarray(np.random.standard_normal((b, mc.vocab_size)),
                    jnp.float32))
    rows0 = jax.device_put(
        jnp.asarray(np.random.standard_normal((b, hkv, d)), jnp.bfloat16))

    for name in want:
        mk = variants[name]
        ts = {}
        for K in (K1, K2):
            fn, kind = mk(K)
            if kind == "kvstate":
                t, out = timeit(fn, kv, state, donate_chain=((0, 0), (1, 1)))
                kv, state = out[0], out[1]
            elif kind == "x":
                t, _ = timeit(fn, weights, x0)
            elif kind == "attn":
                t, _ = timeit(fn, kv, state, q0)
            elif kind == "kvrows":
                t, out = timeit(fn, kv, state, rows0, rows0,
                                donate_chain=((0, 0), (1, 1)))
                kv, state = out[0], out[1]
            elif kind == "logits":
                t, out = timeit(fn, logits0, state, donate_chain=((1, 0),))
                state = out[0]
            ts[K] = t
            print(f"  {name} K={K}: total {t*1e3:.1f} ms", file=sys.stderr)
        slope = (ts[K2] - ts[K1]) / (K2 - K1)
        fixed = ts[K1] - slope * K1
        results[name] = (slope, fixed)

    print("\n=== per-step device time (slope) ===")
    print(f"{'variant':14s} {'ms/step':>8s} {'fixed ms/dispatch':>18s}")
    for k, (sl, fx) in results.items():
        print(f"{k:14s} {sl*1e3:8.2f} {fx*1e3:18.1f}")


if __name__ == "__main__":
    main()
