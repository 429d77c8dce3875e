"""Groupwise dequant-GEMM over split-half nibble-packed weights
(ops/quant_gemm.py): packing layout, XLA fallback, Pallas kernel (interpret
mode on CPU), zero-point correction, and the end-to-end int4 model path."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.ops.quant_gemm import (
    _decode_nibble,
    _xla_matmul,
    groupwise_matmul_packed,
    pack_split_half,
)


def _mk(code, K, N, G, B, seed=0):
    rng = np.random.default_rng(seed)
    if code == "s4":
        q = rng.integers(-8, 8, (K, N)).astype(np.int8)
        vals = q.astype(np.float32)
    else:
        q = rng.integers(0, 16, (K, N)).astype(np.uint8)
        vals = np.asarray(_decode_nibble(jnp.asarray(q), "e2m1", jnp.float32))
    s = ((rng.random((K // G, N)) + 0.5) * 0.01).astype(np.float32)
    x = rng.standard_normal((B, K)).astype(np.float32)
    ref = x @ (vals * np.repeat(s, G, axis=0))
    return q, s, x, ref


def test_pack_split_half_layout():
    q = np.arange(-8, 8, dtype=np.int8).reshape(8, 2)
    p = pack_split_half(q)
    assert p.shape == (4, 2) and p.dtype == np.uint8
    # low nibble = row k, high nibble = row k + K/2; s4 values store as
    # OFFSET codes (v + 8) so the kernel decodes with one FMA
    lo = (p & 0xF).astype(np.int8)
    hi = (p >> 4).astype(np.int8)
    dec = lambda c: c.astype(np.int16) - 8
    np.testing.assert_array_equal(dec(lo), q[:4])
    np.testing.assert_array_equal(dec(hi), q[4:])


@pytest.mark.parametrize("code,K,N,G", [
    ("s4", 256, 384, 64),
    ("s4", 1024, 512, 128),
    ("e2m1", 512, 640, 32),
])
@pytest.mark.parametrize("path", ["xla", "kernel"])
def test_parity_vs_dequant(code, K, N, G, path):
    q, s, x, ref = _mk(code, K, N, G, B=8)
    p, sj = jnp.asarray(pack_split_half(q, code=code)), jnp.asarray(s)
    if path == "xla":
        y = _xla_matmul(jnp.asarray(x), p, sj, code)
    else:
        y = groupwise_matmul_packed(
            jnp.asarray(x), p, sj, code=code, interpret=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=5e-5, atol=5e-5)


def test_zero_point_correction():
    K, N, G, B = 256, 384, 64, 8
    q, s, x, ref = _mk("s4", K, N, G, B)
    rng = np.random.default_rng(1)
    z = rng.integers(-8, 8, (K // G, N)).astype(np.float32)
    ref_z = ref - (x.reshape(B, K // G, G).sum(-1) @ (z * s))
    y = groupwise_matmul_packed(
        jnp.asarray(x), jnp.asarray(pack_split_half(q)), jnp.asarray(s),
        code="s4", zero=jnp.asarray(z), interpret=True)
    np.testing.assert_allclose(np.asarray(y), ref_z, rtol=5e-5, atol=5e-5)


def test_3d_x_and_irregular_m():
    K, N, G = 256, 384, 64
    q, s, x, ref = _mk("s4", K, N, G, B=1)
    rng = np.random.default_rng(2)
    x3 = rng.standard_normal((2, 5, K)).astype(np.float32)
    vals = q.astype(np.float32) * np.repeat(s, G, axis=0)
    ref3 = (x3.reshape(-1, K) @ vals).reshape(2, 5, N)
    y3 = groupwise_matmul_packed(
        jnp.asarray(x3), jnp.asarray(pack_split_half(q)), jnp.asarray(s),
        code="s4", interpret=True)
    np.testing.assert_allclose(np.asarray(y3), ref3, rtol=5e-5, atol=5e-5)


def test_fallback_when_untileable():
    # N=96 has no 128-divisible tile: groupwise_matmul_packed must fall back
    # to the XLA path silently and still be exact
    K, N, G = 256, 96, 64
    q, s, x, ref = _mk("s4", K, N, G, B=4)
    y = groupwise_matmul_packed(
        jnp.asarray(x), jnp.asarray(pack_split_half(q)), jnp.asarray(s),
        code="s4", interpret=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=5e-5, atol=5e-5)


def test_stacked_kernel_matches_sliced():
    """Stacked mode (full [L, K/2, N] + layer index, scalar-prefetch DMA —
    the no-copy path the decode program uses) must match slicing + 2D call
    for every layer."""
    import numpy as np

    from rtp_llm_tpu.ops.quant_gemm import groupwise_matmul_packed

    rng = np.random.default_rng(0)
    L, m, k, n, group = 3, 8, 512, 256, 128
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    packed = jnp.asarray(rng.integers(0, 256, (L, k // 2, n)), jnp.uint8)
    scale = jnp.asarray(rng.uniform(1e-3, 5e-3, (L, k // group, n)),
                        jnp.float32)
    for li in range(L):
        ref = groupwise_matmul_packed(x, packed[li], scale[li],
                                      interpret=True)
        got = groupwise_matmul_packed(x, packed, scale[li],
                                      layer=jnp.int32(li), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_pipelined_kernel_matches(monkeypatch):
    """RTP_INT4_PIPELINE=1 (skewed decode/dot grid, revolving VMEM slots)
    must be numerically identical to the baseline kernel in both plain and
    stacked modes."""
    import numpy as np

    from rtp_llm_tpu.config import runtime_flags
    from rtp_llm_tpu.ops.quant_gemm import (
        groupwise_matmul_packed, pack_split_half,
    )

    rng = np.random.default_rng(1)
    L, m, k, n, group = 2, 8, 512, 256, 128
    q = rng.integers(-8, 8, (L, k, n)).astype(np.int8)
    packed = jnp.asarray(pack_split_half(q))
    scale = jnp.asarray(rng.uniform(1e-3, 5e-3, (L, k // group, n)),
                        jnp.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)

    refs = [groupwise_matmul_packed(x, packed[li], scale[li], interpret=True)
            for li in range(L)]
    monkeypatch.setattr(runtime_flags, "_OVERRIDES",
                        {**runtime_flags._OVERRIDES, "int4_pipeline": True})
    for li in range(L):
        got = groupwise_matmul_packed(x, packed[li], scale[li],
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(refs[li]),
                                   rtol=1e-5, atol=1e-5)
        got_st = groupwise_matmul_packed(x, packed, scale[li],
                                         layer=jnp.int32(li), interpret=True)
        np.testing.assert_allclose(np.asarray(got_st), np.asarray(refs[li]),
                                   rtol=1e-5, atol=1e-5)
