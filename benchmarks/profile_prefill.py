#!/usr/bin/env python
"""Decompose single-request prefill time (TTFT) on hardware.

TTFT p50 at 512 tokens measures ~106 ms on v5e while the compute roofline is
~40-50 ms (7.8 TFLOP bf16 at ~60% MXU + one weight stream). Variants (same
operands-as-arguments discipline as profile_decode.py):

  full      : the engine's real prefill program (one row, bucket T)
  fwd       : model.forward on a T-token row (KV writes included)
  matmuls   : per-layer projection/MLP matmuls only at [T, H] (MXU floor)
  attn_ref  : XLA ref paged attention per layer at T tokens
  attn_pl   : pallas flash prefill kernel per layer

Usage: python benchmarks/profile_prefill.py [--prompt-len 512] ...
"""

import argparse
import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _sync(out):
    import jax
    leaf = [l for l in jax.tree.leaves(out) if hasattr(l, "ravel")][-1]
    np.asarray(leaf.ravel()[-1:])


def timeit(fn, *args, n=5):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen2-7b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--prompt-len", type=int, default=512)
    p.add_argument("--block-size", type=int, default=64)
    p.add_argument("--variants", default="full,fwd,matmuls,attn_ref,attn_pl")
    p.add_argument("--batch", type=int, default=1)
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
    from rtp_llm_tpu.models.batch import ModelInputs

    mc = ModelConfig(model_type="qwen2", **MODELS[args.model])
    from rtp_llm_tpu.models import create_model
    model = create_model(mc)
    weights = build_device_weights(mc, args.quant)
    jax.block_until_ready(weights)

    t = args.prompt_len
    bs = args.block_size
    max_seq = t + 128
    mbs = math.ceil(max_seq / bs)
    nb = args.batch
    blocks_needed = max(4, nb) * mbs + 8
    econf = EngineConfig(
        cache=CacheConfig(block_size=bs, test_num_blocks=blocks_needed,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(max_batch_size=max(4, nb), max_seq_len=max_seq,
                                  prefill_buckets=(t,), decode_steps=1),
        quant=QuantConfig(method="int8" if args.quant == "int8" else "none"),
    )
    eng = LlmEngine(model, weights, econf)
    weights = eng.weights
    kv = eng.kv

    bt = np.zeros((nb, mbs), np.int32)
    for r in range(nb):
        bt[r] = 1 + r * mbs + np.arange(mbs)
    bt_j = jnp.asarray(bt)
    tokens = jnp.asarray(np.random.randint(10, mc.vocab_size - 10, (nb, t)),
                         jnp.int32)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (nb, 1))
    kv_lens = jnp.full((nb,), t, jnp.int32)
    q_off = jnp.zeros((nb,), jnp.int32)

    results = {}
    want = args.variants.split(",")

    if "full" in want:
        fn = eng._get_prefill_fn(t)
        # the engine program donates kv — thread it through the timing loop
        def full_loop(kv, n=5):
            kv, logits = fn(weights, kv, tokens, positions, bt_j, kv_lens,
                            q_off)
            _sync(logits)
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                kv, logits = fn(weights, kv, tokens, positions, bt_j,
                                kv_lens, q_off)
                _sync(logits)
                best = min(best, time.time() - t0)
            return best, kv
        results["full"], kv = full_loop(kv)

    if "fwd" in want:
        @jax.jit
        def fwd(weights, kv, tokens):
            inputs = ModelInputs(tokens=tokens, positions=positions,
                                 block_tables=bt_j, kv_lens=kv_lens,
                                 q_offsets=q_off)
            out, kv = model.forward(weights, kv, inputs)
            return out.logits
        results["fwd"] = timeit(fwd, weights, kv, tokens)

    if "matmuls" in want:
        hqd = mc.num_attention_heads * mc.head_dim

        @jax.jit
        def mm_only(weights, x):
            for i in range(mc.num_layers):
                if "qkv_proj" in weights:
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
                x = model._linear(weights, "down_proj", i, jax.nn.silu(g) * u)
                x = jnp.tanh(x)
            return x
        x0 = jax.device_put(jnp.asarray(
            np.random.standard_normal((nb, t, mc.hidden_size)) * 0.02,
            jnp.bfloat16))
        results["matmuls"] = timeit(mm_only, weights, x0)

    hq, hkv, d = mc.num_attention_heads, mc.num_kv_heads, mc.head_dim
    q0 = jax.device_put(jnp.asarray(
        np.random.standard_normal((nb, t, hq, d)), jnp.bfloat16))

    if "attn_ref" in want:
        from rtp_llm_tpu.ops.attention.ref import paged_attention_ref

        @jax.jit
        def attn_ref(kv, q):
            acc = jnp.zeros((), jnp.float32)
            for i in range(mc.num_layers):
                o = paged_attention_ref(
                    q, kv[i, 0], kv[i, 1], bt_j, kv_lens, q_off,
                    d ** -0.5, block_size=bs)
                acc = acc + o.astype(jnp.float32).mean()
            return acc
        results["attn_ref"] = timeit(attn_ref, kv, q0)

    if "attn_pl" in want:
        from rtp_llm_tpu.ops.attention.pallas_prefill import (
            paged_prefill_attention,
        )

        @jax.jit
        def attn_pl(kv, q):
            # loop all nb rows (the kernel is single-sequence) so the table
            # compares like-for-like with the batched variants at --batch>1
            acc = jnp.zeros((), jnp.float32)
            for i in range(mc.num_layers):
                for r in range(q.shape[0]):
                    o = paged_prefill_attention(
                        q[r], kv[i, 0], kv[i, 1], bt_j[r], q_off[r],
                        kv_lens[r], d ** -0.5, bs)
                    acc = acc + o.astype(jnp.float32).mean()
            return acc
        try:
            results["attn_pl"] = timeit(attn_pl, kv, q0)
        except Exception as e:  # noqa: BLE001
            print(f"attn_pl failed: {e}", file=sys.stderr)

    print(f"\n=== prefill time at T={t} (best of 5) ===")
    for k, v in results.items():
        print(f"{k:10s} {v*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
