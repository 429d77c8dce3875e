#!/usr/bin/env python
"""Train a tiny LM on a seeded synthetic task to produce a TRAINED
checkpoint for quantization-fidelity evaluation.

Why: random (even statistically-structured) weights sit in chaotic sharp
minima — weight perturbations of any kind produce wildly amplified ppl
deltas (measured +60..600% for int4 across constructions), which says
nothing about how quantization affects a trained model. No corpora or
checkpoints ship in this environment (zero egress), so we MAKE a trained
model: a seeded order-2 Markov source (next token depends on the previous
TWO tokens, so the transformer must use attention — all layers train, not
just the embedding/head) is learnable to its entropy floor in a few hundred
optimizer steps on CPU. The resulting checkpoint has the properties that
matter for quant fidelity — flat minimum, redundancy, confident margins —
and writes out in real HF directory format, so the ppl harness exercises
the FULL loader -> quant transform -> engine forward path end-to-end
(reference anchor: model_loader/group_wise_quant_weight.py's claims are
about trained checkpoints; VERDICT r3 #4).

Usage: python benchmarks/train_tiny_lm.py --out /tmp/rtp_tiny_trained \
           [--steps 300] [--platform cpu]
Prints one JSON line with the final train/eval loss and the task entropy
floor.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

# group-size-aligned dims (hidden % 128 == 0) so every projection takes the
# REAL packed-int4 / groupwise path instead of a fallback
GEOM = dict(hidden_size=256, intermediate_size=768, num_layers=4,
            num_attention_heads=8, num_kv_heads=8, head_dim=32,
            vocab_size=1024, max_position_embeddings=512)


class PhraseTask:
    """Compositional synthetic language: a seeded phrasebook whose phrases
    repeat across the stream. Inside a phrase the continuation is (nearly)
    deterministic but findable only by MATCHING the running prefix against
    earlier occurrences — i.e. the induction-head mechanism trained LLMs
    actually use — so the attention/MLP stacks genuinely train rather than
    idling behind a memorizable bigram table. Phrase-to-phrase transitions
    are a first-order Markov chain over the book (local entropy at phrase
    boundaries) and a small substitution noise keeps the floor nonzero."""

    def __init__(self, vocab: int, seed: int = 7, n_phrases: int = 256,
                 plen=(6, 18), branch: int = 8, noise: float = 0.03):
        rng = np.random.default_rng(seed)
        self.vocab = vocab
        self.noise = noise
        # phrase contents: cluster-structured tokens (adjacent ids close)
        self.phrases = []
        for _ in range(n_phrases):
            n = int(rng.integers(plen[0], plen[1] + 1))
            base = int(rng.integers(vocab))
            toks = (base + np.cumsum(rng.integers(1, 9, size=n))) % vocab
            self.phrases.append(toks.astype(np.int64))
        # first-order chain over phrases: ~branch likely successors each
        self.succ = [rng.choice(n_phrases, branch, replace=False)
                     for _ in range(n_phrases)]
        self.succ_p = rng.dirichlet(np.ones(branch) * 2.0, size=n_phrases)
        lens = np.array([len(p) for p in self.phrases], np.float64)
        # approximate entropy floor (nats/token): phrase-choice entropy
        # amortized over the mean phrase length + substitution noise
        h_choice = float(np.mean([
            -(p * np.log(p + 1e-12)).sum() for p in self.succ_p]))
        h_noise = (-(1 - noise) * math.log(1 - noise)
                   - noise * math.log(noise / max(vocab - 1, 1))
                   if noise > 0 else 0.0)
        self.entropy = h_choice / float(lens.mean()) + h_noise

    def sample(self, n_tokens: int, seed: int = 0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        out = np.empty(n_tokens + 32, np.int64)
        i = 0
        cur = int(rng.integers(len(self.phrases)))
        while i < n_tokens:
            ph = self.phrases[cur]
            n = min(len(ph), len(out) - i)
            out[i: i + n] = ph[:n]
            i += n
            cur = int(rng.choice(self.succ[cur], p=self.succ_p[cur]))
        sub = rng.random(n_tokens) < self.noise
        out[:n_tokens][sub] = rng.integers(
            self.vocab, size=int(sub.sum()))
        return out[:n_tokens]


def train(out_dir: str, steps: int = 300, seq_len: int = 96, batch: int = 8,
          lr: float = 3e-3, seed: int = 7, geom=None, log=print):
    import jax
    import jax.numpy as jnp
    import optax

    from rtp_llm_tpu.config.model_config import ModelConfig
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        save_canonical_as_hf, tiny_config, write_realistic_checkpoint,
    )
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.models.batch import ModelInputs

    g = dict(GEOM)
    g.update(geom or {})
    cfg = tiny_config("qwen2", **g)
    cfg.dtype = "float32"
    v = cfg.vocab_size
    task = PhraseTask(v, seed=seed)
    entropy = task.entropy

    # init: realistic-statistics weights (structured spectra) — training
    # from this init converges faster than iid and keeps the spectra shape
    init_dir = os.path.join(out_dir + "_init")
    write_realistic_checkpoint(init_dir, cfg, seed=seed)
    weights = CheckpointLoader(cfg).load(init_dir)
    weights = {k: jnp.asarray(np.asarray(w), jnp.float32)
               for k, w in weights.items()}
    model = create_model(cfg)

    bs = 32
    mb = math.ceil(seq_len / bs)
    cache_shape_blocks = batch * mb + 1

    def loss_fn(w, tokens):
        cache = model.init_cache(cache_shape_blocks, bs, jnp.float32)
        b, t = tokens.shape
        inputs = ModelInputs(
            tokens=tokens,
            positions=jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (b, 1)),
            block_tables=jnp.tile(
                jnp.arange(1, mb + 1, dtype=jnp.int32)[None], (b, 1))
            + jnp.arange(b, dtype=jnp.int32)[:, None] * mb,
            kv_lens=jnp.full((b,), t, jnp.int32),
            q_offsets=jnp.zeros((b,), jnp.int32),
        )
        out, _ = model.forward(w, cache, inputs, need_all_logits=True)
        logp = jax.nn.log_softmax(out.all_logits, axis=-1)
        tok_lp = jnp.take_along_axis(
            logp[:, :-1], tokens[:, 1:, None], axis=-1)[..., 0]
        return -jnp.mean(tok_lp)

    opt = optax.adamw(optax.cosine_decay_schedule(lr, steps), b1=0.9,
                      b2=0.95, weight_decay=1e-4)
    opt_state = opt.init(weights)

    @jax.jit
    def step(w, s, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(w, tokens)
        updates, s = opt.update(grads, s, w)
        return optax.apply_updates(w, updates), s, loss

    data = task.sample(steps * batch * seq_len // 4 + batch * seq_len,
                       seed=seed + 1)
    n_win = len(data) // seq_len
    rng = np.random.default_rng(seed + 2)
    import time

    t0 = time.time()
    loss = float("nan")
    for i in range(steps):
        idx = rng.integers(0, n_win, size=batch)
        toks = np.stack([data[j * seq_len: (j + 1) * seq_len] for j in idx])
        weights, opt_state, loss = step(
            weights, opt_state, jnp.asarray(toks, jnp.int32))
        if i % 25 == 0 or i == steps - 1:
            log(f"step {i:4d} loss {float(loss):.4f} "
                f"(entropy floor {entropy:.4f}) {time.time()-t0:.0f}s")
    save_canonical_as_hf(out_dir, cfg,
                         {k: np.asarray(w) for k, w in weights.items()})
    return {"final_loss": float(loss), "entropy_floor": entropy,
            "steps": steps, "train_s": round(time.time() - t0, 1),
            "ckpt": out_dir}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/rtp_tiny_trained")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--seq-len", type=int, default=96)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    info = train(args.out, steps=args.steps, seq_len=args.seq_len,
                 batch=args.batch, log=lambda m: print(m, file=sys.stderr))
    print(json.dumps(info))


if __name__ == "__main__":
    main()
