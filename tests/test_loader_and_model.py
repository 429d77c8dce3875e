"""Loader + model forward tests.

Parity strategy (reference analog: fake_model_loader.py tiny-checkpoint tests):
write a tiny HF-format checkpoint, load it through our real loader, run our
paged-KV forward, and compare logits against HuggingFace transformers' torch
implementation of the same architecture, in float32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import ModelInputs, create_model


def _prefill_inputs(prompt, num_blocks=8, block_size=16, max_blocks=4):
    t = len(prompt)
    tokens = jnp.asarray([prompt], jnp.int32)
    positions = jnp.arange(t, dtype=jnp.int32)[None, :]
    # blocks 1..max_blocks (block 0 = null)
    bt = jnp.asarray([[i + 1 for i in range(max_blocks)]], jnp.int32)
    return ModelInputs(
        tokens=tokens,
        positions=positions,
        block_tables=bt,
        kv_lens=jnp.asarray([t], jnp.int32),
        q_offsets=jnp.asarray([0], jnp.int32),
    )


def _run_ours(cfg, ckpt_dir, prompt):
    cfg.dtype = "float32"
    loader = CheckpointLoader(cfg)
    weights = loader.load(ckpt_dir)
    model = create_model(cfg)
    cache = model.init_cache(num_blocks=8, block_size=16, dtype=jnp.float32)
    inputs = _prefill_inputs(prompt)
    out, cache = model.forward(weights, cache, inputs, need_all_logits=True)
    return np.asarray(out.all_logits[0]), weights, model, cache


def _run_hf(ckpt_dir, prompt):
    import torch
    from transformers import AutoModelForCausalLM

    m = AutoModelForCausalLM.from_pretrained(ckpt_dir, torch_dtype=torch.float32)
    m.eval()
    with torch.no_grad():
        out = m(torch.tensor([prompt])).logits[0].numpy()
    return out


ARCHS = {
    "qwen2": "Qwen2ForCausalLM",
    "qwen3": "Qwen3ForCausalLM",
    "llama": "LlamaForCausalLM",
}


@pytest.mark.parametrize("model_type", ["qwen2", "qwen3", "llama"])
def test_forward_matches_hf(tmp_path, model_type):
    cfg = tiny_config(model_type)
    ckpt = write_fake_checkpoint(
        str(tmp_path / model_type), cfg,
        extra_config={"architectures": [ARCHS[model_type]]},
    )
    prompt = [1, 5, 9, 42, 7, 100, 3]
    ours, *_ = _run_ours(cfg, ckpt, prompt)
    theirs = _run_hf(ckpt, prompt)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_forward_matches_hf_qwen2_moe(tmp_path):
    cfg = tiny_config(
        "qwen2_moe",
        num_shared_experts=1,
        moe_norm_topk_prob=False,  # HF qwen2_moe default
    )
    ckpt = write_fake_checkpoint(
        str(tmp_path / "moe"), cfg,
        extra_config={
            "architectures": ["Qwen2MoeForCausalLM"],
            "shared_expert_intermediate_size": cfg.intermediate_size,
            "decoder_sparse_step": 1,
            "mlp_only_layers": [],
            "norm_topk_prob": False,
        },
    )
    prompt = [3, 17, 2, 88, 41]
    ours, *_ = _run_ours(cfg, ckpt, prompt)
    theirs = _run_hf(ckpt, prompt)
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_decode_step_matches_prefill(tmp_path):
    """Prefill N tokens then decode one-by-one must equal full prefill logits."""
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "d"), cfg)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)

    prompt = [1, 5, 9, 42, 7, 100, 3, 55]
    # full prefill
    cache = model.init_cache(8, 16, jnp.float32)
    out_full, _ = model.forward(
        weights, cache, _prefill_inputs(prompt), need_all_logits=True
    )
    full_logits = np.asarray(out_full.all_logits[0])

    # prefill 4, then decode the rest one at a time
    cache = model.init_cache(8, 16, jnp.float32)
    out, cache = model.forward(weights, cache, _prefill_inputs(prompt[:4]))
    np.testing.assert_allclose(
        np.asarray(out.logits[0]), full_logits[3], rtol=1e-5, atol=1e-5
    )
    for i in range(4, len(prompt)):
        inp = ModelInputs(
            tokens=jnp.asarray([[prompt[i]]], jnp.int32),
            positions=jnp.asarray([[i]], jnp.int32),
            block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
            kv_lens=jnp.asarray([i + 1], jnp.int32),
            q_offsets=jnp.asarray([i], jnp.int32),
        )
        out, cache = model.forward(weights, cache, inp)
        np.testing.assert_allclose(
            np.asarray(out.logits[0]), full_logits[i], rtol=1e-5, atol=1e-5
        )


def test_padded_rows_are_inert(tmp_path):
    """Batch with an inactive row (kv_len=0) must not disturb the active row,
    and must not write into the cache."""
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "p"), cfg)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)

    prompt = [1, 5, 9, 42]
    cache = model.init_cache(8, 16, jnp.float32)
    out1, cache1 = model.forward(weights, cache, _prefill_inputs(prompt))

    padded = ModelInputs(
        tokens=jnp.asarray([prompt, [0] * len(prompt)], jnp.int32),
        positions=jnp.asarray(
            [list(range(len(prompt))), [0] * len(prompt)], jnp.int32
        ),
        block_tables=jnp.asarray([[1, 2, 3, 4], [0, 0, 0, 0]], jnp.int32),
        kv_lens=jnp.asarray([len(prompt), 0], jnp.int32),
        q_offsets=jnp.asarray([0, 0], jnp.int32),
    )
    cache = model.init_cache(8, 16, jnp.float32)
    out2, cache2 = model.forward(weights, cache, padded)
    np.testing.assert_allclose(
        np.asarray(out1.logits[0]), np.asarray(out2.logits[0]), rtol=1e-5, atol=1e-5
    )
    # non-null blocks identical; row written only via the active row's blocks
    np.testing.assert_allclose(np.asarray(cache1), np.asarray(cache2))


def test_missing_tensor_raises(tmp_path):
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    import os

    # rewrite the safetensors without one tensor
    from safetensors.numpy import load_file, save_file

    path = os.path.join(ckpt, "model.safetensors")
    tensors = load_file(path)
    tensors.pop("model.layers.0.self_attn.q_proj.weight")
    save_file(tensors, path)
    with pytest.raises(KeyError):
        CheckpointLoader(cfg).load(ckpt)
