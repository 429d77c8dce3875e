#!/usr/bin/env python
"""Perplexity-delta table: quantization fidelity vs BF16 (north-star metric).

No model checkpoints or corpora ship in this environment (zero egress), so
the table measures the DELTA from quantizing one fixed, seeded synthetic
checkpoint — the same weights in every row — on a token stream sampled from
the BF16 model itself (in-distribution continuations, not uniform noise).
Absolute ppl is meaningless on synthetic weights; the delta isolates exactly
the quantization error the north star asks about (BASELINE.json: ppl delta
of INT8 / INT4 / KV-quant vs BF16). Swap --model-path to a real checkpoint
when one is available — the harness is identical.

Writes docs/PPL_TABLE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", default="", help="real ckpt dir (optional)")
    p.add_argument("--weights", default="trained",
                   choices=["trained", "iid"],
                   help="synthetic checkpoint source when no --model-path: "
                        "'trained' = tiny LM trained on the seeded phrase "
                        "task (benchmarks/train_tiny_lm.py — deltas predict "
                        "trained-model behavior); 'iid' = legacy random "
                        "weights (deltas overstate low-bit damage)")
    p.add_argument("--train-steps", type=int, default=1200)
    p.add_argument("--platform", default=None)
    p.add_argument("--seq-len", type=int, default=256)
    p.add_argument("--n-tokens", type=int, default=2048)
    p.add_argument("--out", default="docs/PPL_TABLE.md")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from benchmarks.ppl_eval import compute_ppl
    from rtp_llm_tpu.config.engine_config import QuantConfig
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.quant import make_quant_transform

    trained = False
    if args.model_path:
        path = args.model_path
        from rtp_llm_tpu.config.model_config import ModelConfig

        cfg0 = ModelConfig.from_pretrained(path)
        synthetic = False
        geom = {}
    elif args.weights == "trained":
        # TRAINED tiny LM on the seeded phrase task: weights sit in a real
        # flat minimum with confident margins, so low-bit deltas land in
        # the regime trained checkpoints show instead of the +60..600%
        # chaos of random weights (VERDICT r3 #4; train_tiny_lm.py)
        from benchmarks.train_tiny_lm import GEOM, train

        geom = dict(GEOM)
        cfg0 = tiny_config("qwen2", **geom)
        path = "/tmp/rtp_tiny_trained_v2"
        if not os.path.exists(os.path.join(path, "model.safetensors")):
            info = train(path, steps=args.train_steps, seq_len=128,
                         log=lambda m: print(m, file=sys.stderr))
            print(f"trained: {info}", file=sys.stderr)
        synthetic = trained = True
    else:
        # legacy: seeded iid synthetic qwen2-small
        geom = dict(hidden_size=256, intermediate_size=768, num_layers=8,
                    num_attention_heads=8, num_kv_heads=4, head_dim=32,
                    vocab_size=2048)
        cfg0 = tiny_config("qwen2", **geom)
        path = "/tmp/ppl_ckpt"
        if not os.path.exists(os.path.join(path, "model.safetensors")):
            write_fake_checkpoint(path, cfg0, seed=3, scale=0.08)
        synthetic = True

    def build(quant: str, kv: str = "bfloat16"):
        cfg = (tiny_config("qwen2", **geom) if synthetic else
            __import__("rtp_llm_tpu.config.model_config",
                       fromlist=["ModelConfig"]).ModelConfig.from_pretrained(path))
        cfg.dtype = "float32" if jax.default_backend() == "cpu" else "bfloat16"
        lmh = quant.endswith("_lmh")
        if lmh:
            quant = quant[: -len("_lmh")]
        qc = QuantConfig(method=quant if quant != "none" else "none",
                         kv_cache_dtype=kv, group_size=64,
                         quantize_lm_head=lmh)
        transform = make_quant_transform(qc) if quant != "none" else None
        weights = CheckpointLoader(cfg, transform=transform).load(path)
        model = create_model(cfg)
        return model, weights, qc

    if trained:
        # held-out samples of the TASK the model was trained on — a real
        # "corpus" with ground-truth structure (not self-generated text)
        from benchmarks.train_tiny_lm import PhraseTask

        task = PhraseTask(cfg0.vocab_size, seed=7)
        stream_toks = task.sample(args.n_tokens + args.seq_len,
                                  seed=999).tolist()
        return _run_rows(args, build, stream_toks, path, synthetic, trained)

    # token stream: greedy+sampled continuations from the BF16 model
    model, weights, _ = build("none")
    rng = np.random.default_rng(0)
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine

    econf = EngineConfig(
        cache=CacheConfig(block_size=32, test_num_blocks=128,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(max_batch_size=4,
                                  max_seq_len=args.seq_len + 64,
                                  prefill_buckets=(32, args.seq_len)),
    )
    if jax.default_backend() == "cpu":
        econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(model, weights, econf)
    stream_toks: list = []
    while len(stream_toks) < args.n_tokens + args.seq_len:
        seed = rng.integers(10, cfg0.vocab_size - 10, size=8).tolist()
        s = eng.generate(seed, GenerateConfig(
            max_new_tokens=120, do_sample=True, temperature=1.0, top_p=0.95,
            ignore_eos=True))
        stream_toks.extend(seed + s.output_token_ids)
    del eng
    return _run_rows(args, build, stream_toks, path, synthetic, trained)


def _run_rows(args, build, stream_toks, path, synthetic, trained):
    import jax
    import jax.numpy as jnp

    from benchmarks.ppl_eval import compute_ppl

    rows = []
    configs = [
        ("bf16 (baseline)", "none", "bfloat16"),
        ("int8 weight-only", "int8", "bfloat16"),
        ("w8a8 (per-token act s8)", "w8a8", "bfloat16"),
        ("fp8 e4m3 weights (b=128)", "fp8", "bfloat16"),
        ("int4 groupwise (g=64)", "int4", "bfloat16"),
        ("gptq int4 (g=64, act-order ckpt)", "gptq", "bfloat16"),
        ("awq int4 (g=64 ckpt)", "awq", "bfloat16"),
        ("fp4 e2m1 (g=32)", "fp4", "bfloat16"),
        ("w4a8 (int4 w x s8 act)", "w4a8", "bfloat16"),
        ("int8 + int8 lm_head", "int8_lmh", "bfloat16"),
        ("int8 + int8 KV", "int8", "int8"),
        ("int8 + fp8 KV", "int8", "fp8"),
    ]

    def build_packed(method):
        """GPTQ/AWQ rows: EMIT a packed checkpoint from ``path`` and load
        it through the real packed-quant path (VERDICT r4 weak #6: the
        north star is 'Qwen2-7B GPTQ-INT4 (HF checkpoint) + AWQ variant')."""
        import jax as _jax

        from rtp_llm_tpu.config.model_config import ModelConfig
        from rtp_llm_tpu.loader import CheckpointLoader
        from rtp_llm_tpu.loader.gptq_export import export_gptq_checkpoint
        from rtp_llm_tpu.models import create_model

        gdir = path.rstrip("/") + "_" + method
        if not os.path.exists(os.path.join(gdir, "model.safetensors")):
            src_cfg = ModelConfig.from_pretrained(path)
            export_gptq_checkpoint(path, gdir, src_cfg, group_size=64,
                                   act_order=method == "gptq", method=method)
        cfg = ModelConfig.from_pretrained(gdir)
        cfg.dtype = ("float32" if _jax.default_backend() == "cpu"
                     else "bfloat16")
        weights = CheckpointLoader(cfg).load(gdir)
        model = create_model(cfg)
        return model, weights, None

    base_ppl = None
    for label, quant, kv in configs:
        model, weights, qc = (build_packed(quant)
                              if quant in ("gptq", "awq")
                              else build(quant, kv))
        kv_dtype = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn}.get(kv)
        if jax.default_backend() == "cpu" and kv == "fp8":
            kv_dtype = jnp.float8_e4m3fn
        ppl, nll, n = compute_ppl(
            model, weights, stream_toks[: args.n_tokens + args.seq_len],
            seq_len=args.seq_len, kv_dtype=kv_dtype,
        )
        if base_ppl is None:
            base_ppl = ppl
        rows.append((label, ppl, ppl - base_ppl, (ppl / base_ppl - 1) * 100))
        print(f"{label:24s} ppl={ppl:.4f} delta={ppl-base_ppl:+.4f}",
              file=sys.stderr)

    if trained:
        desc = [
            f"Model: tiny qwen2 TRAINED to its task's entropy floor on the "
            f"seeded phrase task (benchmarks/train_tiny_lm.py); stream: "
            f"{args.n_tokens} HELD-OUT task tokens, window {args.seq_len}.",
            "",
            "The checkpoint sits in a real flat minimum with confident",
            "(ppl ~2-3) predictions, so the deltas below are in the regime",
            "trained LLM checkpoints show for these bit widths — unlike",
            "random weights, whose chaotic sensitivity overstated int4 by",
            "+60..600% across constructions (see git history). The rows run",
            "the FULL loader -> quant transform -> model forward path on an",
            "HF-format checkpoint directory. Rerun with --model-path for a",
            "real downloaded checkpoint; the harness is identical.",
        ]
    else:
        desc = [
            f"Model: {'seeded synthetic qwen2-small (8L/256H/2048V)' if synthetic else path}; "
            f"stream: {args.n_tokens} self-generated tokens, window {args.seq_len}.",
            "",
            "Absolute ppl on synthetic weights is not meaningful; the DELTA",
            "isolates quantization error on identical weights (north-star",
            "metric, BASELINE.json). Rerun with --model-path for a real ckpt.",
            "NOTE: random weights have no redundancy, so low-bit rows (int4,",
            "and especially fp4's 8-level e2m1 codebook) overstate the delta a",
            "trained checkpoint would show — use --weights trained.",
        ]
    lines = [
        "# Perplexity delta vs BF16 (quantization fidelity)",
        "",
        *desc,
        "",
        "| config | ppl | delta | delta % |",
        "|---|---|---|---|",
    ]
    for label, ppl, d, pct in rows:
        lines.append(f"| {label} | {ppl:.4f} | {d:+.4f} | {pct:+.2f}% |")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({
        "metric": "ppl_delta_int8_vs_bf16_pct",
        "value": round(rows[1][3], 3),
        "unit": "%",
        "rows": [
            {"config": l, "ppl": round(p, 4), "delta_pct": round(c, 3)}
            for l, p, _d, c in rows
        ],
    }))


if __name__ == "__main__":
    main()
