"""Converted-weights cache (reference: ft-style dump/reload,
model_loader/loader.py:121,189): name mapping + transposes + load-time
quantization run once; later loads read the converted dump."""

import numpy as np

import jax.numpy as jnp

from rtp_llm_tpu.config.engine_config import QuantConfig
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.quant import make_quant_transform


def _load(ckpt, method=None):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32" if method is None else "bfloat16"
    transform = (make_quant_transform(QuantConfig(method=method, group_size=32))
                 if method else None)
    return CheckpointLoader(cfg, transform=transform).load(ckpt)


def test_cache_roundtrip_exact(tmp_path, monkeypatch):
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), tiny_config("qwen2"))
    monkeypatch.setenv("RTP_WEIGHTS_CACHE_DIR", str(tmp_path / "wc"))

    first = _load(ckpt)
    cached = _load(ckpt)  # second load: cache hit
    assert set(first) == set(cached)
    for k in first:
        assert first[k].dtype == cached[k].dtype, k
        np.testing.assert_array_equal(np.asarray(first[k]),
                                      np.asarray(cached[k]))
    # the cache dir was created with a manifest
    import os

    runs = os.listdir(str(tmp_path / "wc"))
    assert len(runs) == 1


def test_cache_keys_quant_scheme(tmp_path, monkeypatch):
    """int8 and int4 loads must land in DIFFERENT cache entries, and the
    quantized dtypes (s8, packed s4) must survive the dump."""
    import os

    ckpt = write_fake_checkpoint(str(tmp_path / "m"), tiny_config("qwen2"))
    monkeypatch.setenv("RTP_WEIGHTS_CACHE_DIR", str(tmp_path / "wc"))

    w8 = _load(ckpt, "int8")
    w4 = _load(ckpt, "int4")
    assert len(os.listdir(str(tmp_path / "wc"))) == 2
    assert w8["q_proj"].dtype == jnp.int8
    c8 = _load(ckpt, "int8")  # hit
    assert c8["q_proj"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(c8["q_proj"]),
                                  np.asarray(w8["q_proj"]))
    c4 = _load(ckpt, "int4")
    assert c4["q_proj"].dtype == w4["q_proj"].dtype
    np.testing.assert_array_equal(
        np.asarray(c4["q_proj"].astype(jnp.int8)),
        np.asarray(w4["q_proj"].astype(jnp.int8)))


def test_cache_invalidated_by_checkpoint_change(tmp_path, monkeypatch):
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), tiny_config("qwen2"))
    monkeypatch.setenv("RTP_WEIGHTS_CACHE_DIR", str(tmp_path / "wc"))
    _load(ckpt)
    import os
    import time as _t

    # touch the checkpoint: mtime/size key must miss
    _t.sleep(1.1)
    write_fake_checkpoint(str(tmp_path / "m"), tiny_config("qwen2"), seed=9)
    _load(ckpt)
    assert len(os.listdir(str(tmp_path / "wc"))) == 2
