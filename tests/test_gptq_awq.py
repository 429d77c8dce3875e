"""GPTQ / AWQ packed-checkpoint ingestion tests."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.loader.weight_maps import get_weight_specs, hf_names_for
from rtp_llm_tpu.models import ModelInputs, create_model
from rtp_llm_tpu.quant.gptq_awq import (
    AWQ_ORDER,
    dequant_reference,
    unpack_awq_qweight,
    unpack_gptq_qweight,
    unpack_gptq_qzeros,
)
from rtp_llm_tpu.quant.weight_only import quantized_matmul


def pack_gptq_qweight(q: np.ndarray) -> np.ndarray:
    k, n = q.shape
    q = q.astype(np.uint32).reshape(k // 8, 8, n)
    out = np.zeros((k // 8, n), np.uint32)
    for j in range(8):
        out |= q[:, j, :] << (4 * j)
    return out.view(np.int32)


def pack_gptq_qzeros(z: np.ndarray) -> np.ndarray:
    g, n = z.shape
    z = z.astype(np.uint32).reshape(g, n // 8, 8)
    out = np.zeros((g, n // 8), np.uint32)
    for j in range(8):
        out |= z[:, :, j] << (4 * j)
    return out.view(np.int32)


def pack_awq(vals: np.ndarray) -> np.ndarray:
    k, n = vals.shape
    v = vals.astype(np.uint32).reshape(k, n // 8, 8)
    out = np.zeros((k, n // 8), np.uint32)
    for j in range(8):
        out |= v[:, :, AWQ_ORDER[j]] << (4 * j)
    return out.view(np.int32)


def test_gptq_pack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, (64, 16)).astype(np.uint8)
    np.testing.assert_array_equal(unpack_gptq_qweight(pack_gptq_qweight(q)), q)
    z = rng.integers(0, 16, (4, 16)).astype(np.uint8)
    np.testing.assert_array_equal(unpack_gptq_qzeros(pack_gptq_qzeros(z)), z)


def test_awq_pack_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 16, (8, 32)).astype(np.uint8)
    np.testing.assert_array_equal(unpack_awq_qweight(pack_awq(q)), q)


def test_asymmetric_matmul_matches_dequant():
    rng = np.random.default_rng(2)
    k, n, g = 64, 32, 2
    group = k // g
    q = rng.integers(0, 16, (k, n)).astype(np.int8)
    z = rng.integers(6, 10, (g, n)).astype(np.float32)
    s = (rng.random((g, n)).astype(np.float32) + 0.5) * 0.1
    x = rng.standard_normal((4, k)).astype(np.float32)
    want = x @ dequant_reference(q.astype(np.uint8), z, s, group)
    got = quantized_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def _quantize_and_pack(w, group_size, method, act_order=False, seed=7):
    """fp32 [out, in] HF-layout -> packed gptq/awq tensors dict + dequant [in, out].

    act_order: scatter rows into groups by a random activation order and emit
    a ``g_idx`` tensor (AutoGPTQ desc_act=True layout)."""
    wt = w.T  # [in, out]
    k, n = wt.shape
    g = k // group_size
    if act_order:
        order = np.random.default_rng(seed).permutation(k)
        g_idx = np.empty(k, np.int32)
        g_idx[order] = np.arange(k, dtype=np.int32) // group_size
        wg = wt[order].reshape(g, group_size, n)
    else:
        g_idx = None
        wg = wt.reshape(g, group_size, n)
    wmin, wmax = wg.min(axis=1), wg.max(axis=1)
    s = ((wmax - wmin) / 15.0).clip(1e-8)
    z = np.clip(np.round(-wmin / s), 0, 15)
    if act_order:
        q = np.empty((k, n), np.uint8)
        q[order] = np.clip(
            np.round(wg / s[:, None, :]) + z[:, None, :], 0, 15
        ).astype(np.uint8).reshape(k, n)
        deq = (q.astype(np.float32) - z[g_idx]) * s[g_idx]
    else:
        q = np.clip(
            np.round(wg / s[:, None, :]) + z[:, None, :], 0, 15
        ).astype(np.uint8).reshape(k, n)
        deq = dequant_reference(q, z, s, group_size)
    if method == "gptq":
        packed = {
            "qweight": pack_gptq_qweight(q),
            "qzeros": pack_gptq_qzeros(np.clip(z - 1, 0, 15).astype(np.uint8)),
            "scales": s.astype(np.float16),
        }
        if g_idx is not None:
            packed["g_idx"] = g_idx
    else:
        packed = {
            "qweight": pack_awq(q),
            "qzeros": pack_awq(z.astype(np.uint8)),
            "scales": s.astype(np.float16),
        }
    # safetensors writes raw buffers: every tensor must be C-contiguous
    packed = {k: np.ascontiguousarray(v) for k, v in packed.items()}
    return packed, deq


@pytest.mark.parametrize("method", ["gptq", "gptq_act_order", "awq"])
def test_packed_checkpoint_forward(tmp_path, method):
    """Write a fake GPTQ/AWQ checkpoint, load through the real loader, and
    compare the forward against the dense model built from the dequantized
    weights."""
    from safetensors.numpy import load_file, save_file

    cfg = tiny_config("qwen2", intermediate_size=64)  # dims divisible by 8
    ckpt = write_fake_checkpoint(str(tmp_path / method), cfg)
    group_size = 16

    # rewrite matmul weights as packed tensors; keep a dequantized copy.
    # (copy: load_file returns mmap-backed arrays that would be invalidated
    # when we overwrite the file below)
    st = {
        k: np.array(v)
        for k, v in load_file(os.path.join(ckpt, "model.safetensors")).items()
    }
    deq_st = dict(st)
    new_st = {}
    quant_names = set()
    for spec in get_weight_specs(cfg):
        if spec.shard_axis in ("out", "in") and spec.name != "lm_head" \
                and not spec.name.endswith("_bias"):
            for (_l, _e, name) in hf_names_for(spec, cfg.num_layers, 0):
                quant_names.add(name)
    act_order = method == "gptq_act_order"
    method = "gptq" if act_order else method
    for name, w in st.items():
        if name in quant_names:
            packed, deq = _quantize_and_pack(w, group_size, method,
                                             act_order=act_order)
            base = name[: -len(".weight")]
            for k2, v2 in packed.items():
                new_st[f"{base}.{k2}"] = v2
            # back to HF [out, in]; ascontiguousarray because safetensors
            # writes the raw buffer (an F-ordered .T view would scramble)
            deq_st[name] = np.ascontiguousarray(deq.T.astype(np.float32))
        else:
            new_st[name] = w
    save_file(new_st, os.path.join(ckpt, "model.safetensors"))
    with open(os.path.join(ckpt, "config.json")) as f:
        hf_cfg = json.load(f)
    hf_cfg["quantization_config"] = {
        "quant_method": method, "bits": 4, "group_size": group_size,
        "desc_act": act_order,
    }
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump(hf_cfg, f)

    # dense reference checkpoint from dequantized weights
    dense_dir = str(tmp_path / (method + "_dense"))
    os.makedirs(dense_dir, exist_ok=True)
    save_file(deq_st, os.path.join(dense_dir, "model.safetensors"))
    with open(os.path.join(dense_dir, "config.json"), "w") as f:
        cfg_plain = dict(hf_cfg)
        cfg_plain.pop("quantization_config")
        json.dump(cfg_plain, f)

    from rtp_llm_tpu.config.model_config import ModelConfig

    qcfg = ModelConfig.from_pretrained(ckpt)
    qcfg.dtype = "float32"
    assert qcfg.quantization and qcfg.quantization["method"] == method
    wq = CheckpointLoader(qcfg).load(ckpt)
    # split-half packed nibble storage (u8, 2 vals/byte; ops/quant_gemm.py)
    assert wq["q_proj"].dtype == jnp.uint8 and "q_proj.int4p" in wq
    assert "q_proj.zero" in wq and "q_proj.scale" in wq

    dcfg = ModelConfig.from_pretrained(dense_dir)
    dcfg.dtype = "float32"
    wd = CheckpointLoader(dcfg).load(dense_dir)

    model = create_model(qcfg)
    prompt = [1, 5, 9, 42, 7]
    t = len(prompt)
    inp = ModelInputs(
        tokens=jnp.asarray([prompt], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32)[None],
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_offsets=jnp.asarray([0], jnp.int32),
    )
    out_q, _ = model.forward(wq, model.init_cache(4, 16, jnp.float32), inp)
    model_d = create_model(dcfg)
    out_d, _ = model_d.forward(wd, model_d.init_cache(4, 16, jnp.float32), inp)
    np.testing.assert_allclose(
        np.asarray(out_q.logits), np.asarray(out_d.logits), rtol=2e-3, atol=2e-3
    )


def test_gptq_export_roundtrip():
    """export (RTN asym, act-order) -> ingest -> dequant recovers W within
    one quantization step; act_perm de-permutes correctly."""
    from rtp_llm_tpu.loader.gptq_export import quantize_gptq_tensor
    from rtp_llm_tpu.quant.gptq_awq import gptq_to_canonical

    rng = np.random.default_rng(0)
    g = 16
    w = rng.standard_normal((24, 64)).astype(np.float32)  # [out, in]
    t = quantize_gptq_tensor(w, group_size=g, act_order=True)
    v, s, z, perm = gptq_to_canonical(
        t["qweight"], t["qzeros"], t["scales"], t["g_idx"])
    assert perm is not None  # act-order produced a non-monotonic g_idx
    k = w.shape[1]
    gi = np.arange(k) // g
    deq_sorted = (v.astype(np.float32) - z[gi]) * s[gi]  # [in, out] sorted
    # y = x[:, perm] @ W_sorted must equal x @ W.T: W.T[perm] == deq_sorted
    err = np.abs(w.T[perm] - deq_sorted)
    step = (s[gi] / 1.9)[np.argsort(perm)]  # half a quant step tolerance
    assert float(np.median(err)) < float(np.median(s)) * 0.6
    assert float(err.max()) <= float(s.max()) * 1.01


def test_gptq_export_e2e_forward(tmp_path):
    """Full path: trained-format checkpoint -> GPTQ export -> ModelConfig
    detects quantization_config -> CheckpointLoader packed path -> forward
    agrees with the bf16 model within int4 tolerance."""
    import jax.numpy as jnp

    from rtp_llm_tpu.config.model_config import ModelConfig
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.loader.gptq_export import export_gptq_checkpoint
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.models.batch import ModelInputs

    cfg = tiny_config("qwen2", hidden_size=128, intermediate_size=256,
                      num_layers=2, num_attention_heads=4, num_kv_heads=2,
                      head_dim=32, vocab_size=256)
    cfg.dtype = "float32"
    src = str(tmp_path / "src")
    write_fake_checkpoint(src, cfg, seed=5, scale=0.05)
    dst = str(tmp_path / "gptq")
    export_gptq_checkpoint(src, dst, cfg, group_size=32, act_order=True)

    qcfg = ModelConfig.from_pretrained(dst)
    assert qcfg.quantization and qcfg.quantization["method"] == "gptq"
    qcfg.dtype = "float32"

    def fwd(c, path):
        model = create_model(c)
        weights = CheckpointLoader(c).load(path)
        toks = jnp.arange(8, dtype=jnp.int32)[None, :] + 3
        cache = model.init_cache(4, 8, jnp.float32)
        inputs = ModelInputs(
            tokens=toks, positions=jnp.arange(8, dtype=jnp.int32)[None, :],
            block_tables=jnp.arange(2, dtype=jnp.int32)[None, :] + 1,
            kv_lens=jnp.asarray([8], jnp.int32),
            q_offsets=jnp.asarray([0], jnp.int32),
        )
        out, _ = model.forward(weights, cache, inputs)
        return np.asarray(out.logits, np.float32)

    cfg2 = tiny_config("qwen2", hidden_size=128, intermediate_size=256,
                       num_layers=2, num_attention_heads=4, num_kv_heads=2,
                       head_dim=32, vocab_size=256)
    cfg2.dtype = "float32"
    ref = fwd(cfg2, src)
    got = fwd(qcfg, dst)
    # int4 RTN on random weights: strong logit correlation and bounded
    # relative drift (argmax is meaningless here — random-weight logits are
    # nearly flat, see train_tiny_lm.py's rationale)
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.95, corr
    rel = float(np.mean(np.abs(ref - got)) / np.mean(np.abs(ref)))
    assert rel < 0.35, rel


def test_awq_export_roundtrip_and_forward(tmp_path):
    """AWQ emitter -> ingest roundtrip + e2e forward through the real
    packed path (north-star 'AWQ variant')."""
    import jax.numpy as jnp

    from rtp_llm_tpu.config.model_config import ModelConfig
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.loader.gptq_export import (
        export_gptq_checkpoint, quantize_awq_tensor,
    )
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.models.batch import ModelInputs
    from rtp_llm_tpu.quant.gptq_awq import awq_to_canonical

    rng = np.random.default_rng(3)
    g = 16
    w = rng.standard_normal((24, 64)).astype(np.float32)  # [out, in]
    t = quantize_awq_tensor(w, group_size=g)
    v, s, z = awq_to_canonical(t["qweight"], t["qzeros"], t["scales"])
    gi = np.arange(w.shape[1]) // g
    deq = (v.astype(np.float32) - z[gi]) * s[gi]
    err = np.abs(w.T - deq)
    assert float(err.max()) <= float(s.max()) * 1.01

    cfg = tiny_config("qwen2", hidden_size=128, intermediate_size=256,
                      num_layers=2, num_attention_heads=4, num_kv_heads=2,
                      head_dim=32, vocab_size=256)
    cfg.dtype = "float32"
    src = str(tmp_path / "src")
    write_fake_checkpoint(src, cfg, seed=5, scale=0.05)
    dst = str(tmp_path / "awq")
    export_gptq_checkpoint(src, dst, cfg, group_size=32, method="awq")
    qcfg = ModelConfig.from_pretrained(dst)
    assert qcfg.quantization and qcfg.quantization["method"] == "awq"
    qcfg.dtype = "float32"

    def fwd(c, path):
        model = create_model(c)
        weights = CheckpointLoader(c).load(path)
        toks = jnp.arange(8, dtype=jnp.int32)[None, :] + 3
        cache = model.init_cache(4, 8, jnp.float32)
        inputs = ModelInputs(
            tokens=toks, positions=jnp.arange(8, dtype=jnp.int32)[None, :],
            block_tables=jnp.arange(2, dtype=jnp.int32)[None, :] + 1,
            kv_lens=jnp.asarray([8], jnp.int32),
            q_offsets=jnp.asarray([0], jnp.int32),
        )
        out, _ = model.forward(weights, cache, inputs)
        return np.asarray(out.logits, np.float32)

    cfg2 = tiny_config("qwen2", hidden_size=128, intermediate_size=256,
                       num_layers=2, num_attention_heads=4, num_kv_heads=2,
                       head_dim=32, vocab_size=256)
    cfg2.dtype = "float32"
    ref = fwd(cfg2, src)
    got = fwd(qcfg, dst)
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.95, corr
