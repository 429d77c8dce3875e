#!/usr/bin/env python
"""Perplexity evaluation harness: quantization quality vs BF16.

North-star metric (BASELINE.json): perplexity delta of INT8 / INT4(GPTQ/AWQ) /
fp8-KV configurations vs the BF16 baseline, on the same token stream.
Reference analog: the accuracy deltas RTP-LLM reports per QuantMethod.

Usage:
  python benchmarks/ppl_eval.py --model-path /path/to/ckpt \
      --text-file corpus.txt --quant none,int8,int4 [--kv fp8]

Without --text-file, token ids can be supplied with --token-file (one id per
line) — useful in closed environments with no corpus.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def compute_ppl(model, weights, token_ids, seq_len=512, block_size=32,
                kv_dtype=None, batch_cap=8):
    """Sliding non-overlapping windows; returns (ppl, nll, n_tokens)."""
    import jax
    import jax.numpy as jnp

    from rtp_llm_tpu.models.batch import ModelInputs

    n = (len(token_ids) - 1) // seq_len
    if n == 0:
        raise ValueError(f"need more than {seq_len} tokens, got {len(token_ids)}")
    mb = math.ceil(seq_len / block_size)

    @jax.jit
    def window_nll(cache, tokens, targets, valid):
        t = tokens.shape[1]
        inputs = ModelInputs(
            tokens=tokens,
            positions=jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (tokens.shape[0], 1)),
            block_tables=jnp.tile(
                jnp.arange(1, mb + 1, dtype=jnp.int32)[None], (tokens.shape[0], 1)
            ) + jnp.arange(tokens.shape[0], dtype=jnp.int32)[:, None] * mb,
            kv_lens=jnp.full((tokens.shape[0],), t, jnp.int32),
            q_offsets=jnp.zeros((tokens.shape[0],), jnp.int32),
        )
        out, cache = model.forward(weights, cache, inputs, need_all_logits=True)
        logp = jax.nn.log_softmax(out.all_logits, axis=-1)
        tok_lp = jnp.take_along_axis(logp[:, :-1], targets[:, 1:, None], axis=-1)[..., 0]
        nll = -jnp.sum(tok_lp * valid[:, 1:])
        return cache, nll, jnp.sum(valid[:, 1:])

    total_nll, total_tok = 0.0, 0
    b = 1  # one window per call keeps memory flat; cache reused
    cache = model.init_cache(b * mb + 1, block_size,
                             kv_dtype if kv_dtype is not None else jnp.bfloat16)
    import jax.numpy as jnp

    for i in range(n):
        w = token_ids[i * seq_len : (i + 1) * seq_len + 1][:seq_len]
        toks = np.zeros((1, seq_len), np.int32)
        toks[0, : len(w)] = w
        valid = np.zeros((1, seq_len), np.float32)
        valid[0, : len(w)] = 1.0
        cache, nll, ntok = window_nll(
            cache, jnp.asarray(toks), jnp.asarray(toks), jnp.asarray(valid)
        )
        total_nll += float(nll)
        total_tok += int(ntok)
    ppl = math.exp(total_nll / max(total_tok, 1))
    return ppl, total_nll, total_tok


def build(model_path, quant: str, dtype="bfloat16"):
    from rtp_llm_tpu.config.engine_config import QuantConfig
    from rtp_llm_tpu.config.model_config import ModelConfig
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.quant import make_quant_transform

    cfg = ModelConfig.from_pretrained(model_path)
    cfg.dtype = dtype
    transform = None
    if quant not in ("none", ""):
        transform = make_quant_transform(QuantConfig(method=quant))
    weights = CheckpointLoader(cfg, transform=transform).load(model_path)
    return create_model(cfg), weights


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--text-file")
    p.add_argument("--token-file")
    p.add_argument("--quant", default="none,int8",
                   help="comma list: none,int8,int4")
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--max-tokens", type=int, default=16384)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    if args.token_file:
        token_ids = [int(l) for l in open(args.token_file) if l.strip()]
    elif args.text_file:
        from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory

        tok = TokenizerFactory.create(args.model_path)
        token_ids = tok.encode(open(args.text_file).read())
    else:
        p.error("--text-file or --token-file required")
    token_ids = token_ids[: args.max_tokens]

    results = {}
    base_ppl = None
    for quant in args.quant.split(","):
        model, weights = build(args.model_path, quant, args.dtype)
        ppl, _, ntok = compute_ppl(model, weights, token_ids, args.seq_len)
        results[quant or "none"] = round(ppl, 4)
        if quant in ("none", ""):
            base_ppl = ppl
    out = {"ppl": results, "tokens": len(token_ids)}
    if base_ppl:
        out["delta_vs_bf16"] = {
            k: round(v - base_ppl, 4) for k, v in results.items() if k != "none"
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
