"""Weight-only INT8 (per-channel) and INT4 (groupwise) quantization.

Reference analogs:
  INT8 per-channel  — model_loader/weight_only_quant_weight.py (auto at load)
  INT4 groupwise    — model_loader/group_wise_quant_weight.py (GPTQ/AWQ)

Storage conventions (canonical kernels are [..., in, out]):
  INT8: {name: int8 [..., in, out], name.scale: f32 [..., out]}
  INT4: {name: int4 [..., in, out] (XLA s4 dtype — 2 values/byte in HBM),
         name.scale: f32 [..., in/G, out]} — symmetric groupwise over the
         *in* dim. XLA reads the packed s4 operand directly and fuses the
         convert into the matmul (same mechanism as the s8 path), so no
         hand-written dequant-GEMM kernel is needed. GPTQ/AWQ asymmetric
         values shift by -8 into s4 range (q-z is shift-invariant).
         RTP_INT4_UNPACKED=1 falls back to int8 storage.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from rtp_llm_tpu.config.engine_config import QuantConfig, QuantMethod
from rtp_llm_tpu.loader.weight_maps import WeightSpec


from rtp_llm_tpu.quant.marker import MARKER, QuantMarker  # noqa: F401

# canonical names never quantized (embeddings feed gathers; norms are tiny)
_NEVER = {"embed_tokens", "final_norm", "input_norm", "post_attn_norm",
          "q_norm", "k_norm", "router", "router_bias", "shared_expert_gate"}


def int8_quantize(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-out-channel int8: w ~= q * scale, scale [., out].

    Minimal-memory-pass formulation (one upcasting multiply + in-place
    rint/clip): the 7B from-disk load was quantize-bound at ~6.5 s per
    68M-element tensor with the naive round(w/scale) chain — ~1.5 s now
    (round-5; the load path runs on one host core)."""
    w = np.asarray(w)
    if w.dtype not in (np.float16, np.float32):
        w = np.asarray(w, np.float32)  # bf16/ml_dtypes: upcast once
    amax = np.abs(w).max(axis=-2)
    scale = np.maximum(np.asarray(amax, np.float32), 1e-10) / 127.0
    q32 = np.multiply(w, (1.0 / scale)[..., None, :], dtype=np.float32)
    np.rint(q32, out=q32)
    np.clip(q32, -127, 127, out=q32)
    return q32.astype(np.int8), scale.astype(np.float32)


FP8_MAX = 448.0  # float8_e4m3fn

def int4_packed() -> bool:
    """Config-aware (kernel.int4_packed / RTP_INT4_UNPACKED negated)."""
    from rtp_llm_tpu.config import runtime_flags

    return bool(runtime_flags.get("int4_packed"))


def to_int4(q: np.ndarray) -> np.ndarray:
    """int8 values in [-8, 7] -> ml_dtypes int4 numpy array (device_put
    produces a packed s4 buffer on TPU: half the HBM bytes of int8)."""
    import ml_dtypes

    return np.asarray(q, dtype=ml_dtypes.int4)


def fp8_quantize(w: np.ndarray, block: int = 0):
    """FP8 (e4m3) weight quantization (reference: QuantMethod FP8Quant /
    per-block fp8, model_loader/per_block_fp8_quant_weight.py).

    block == 0: per-tensor scale (scalar).
    block == -1: per-out-channel scale [out] — the FAST serving layout: it
    rides the same convert-fused per-channel matmul branch as int8 (one
    multiply on the [.., out] result), measured 2x faster at decode than
    the groupwise path the per-block layout requires (round-5 hardware:
    17.9 vs 37.1 ms/step on the 7B).
    block > 0 : per-(in-block, out-block) scales, stored pre-expanded to
    [in/block, out] so the groupwise dequant-matmul path applies unchanged
    (the per-out-block structure is a repeat along out columns).
    Returns (q fp8 [..., in, out], scale f32)."""
    import jax.numpy as jnp  # noqa: F811 (module alias for dtype only)

    wf = np.asarray(w, np.float32)
    if block == -1:
        amax = np.maximum(np.abs(wf).max(axis=-2), 1e-8)  # [..., out]
        scale = (amax / FP8_MAX).astype(np.float32)
        q = np.asarray(jnp.asarray(wf / scale[..., None, :])
                       .astype(jnp.float8_e4m3fn))
        return q, scale
    if block <= 0:
        amax = float(np.max(np.abs(wf))) or 1e-8
        scale = np.float32(amax / FP8_MAX)
        q = np.asarray(
            jnp.asarray(wf / scale).astype(jnp.float8_e4m3fn))
        return q, np.asarray(scale, np.float32)
    *lead, k, n = wf.shape
    gi = max(k // block, 1)
    go = max(n // block, 1)
    bi, bo = k // gi, n // go
    wb = wf.reshape(*lead, gi, bi, go, bo)
    amax = np.maximum(np.abs(wb).max(axis=(-3, -1), keepdims=True), 1e-8)
    scale = (amax / FP8_MAX).astype(np.float32)  # [..., gi, 1, go, 1]
    q = np.asarray(jnp.asarray(wb / scale).astype(jnp.float8_e4m3fn))
    q = q.reshape(*lead, k, n)
    # expand to [.., gi, out]: repeat each out-block's scale across its cols
    scale = np.repeat(scale[..., :, 0, :, 0], bo, axis=-1)
    return q, scale


def int4_quantize_groupwise(
    w: np.ndarray, group_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric groupwise int4 (stored as int8 in [-7, 7]): per (group, out)
    scale. w shape [..., in, out], in % group_size == 0."""
    *lead, k, n = w.shape
    g = k // group_size
    wg = w.reshape(*lead, g, group_size, n)
    amax = np.max(np.abs(wg), axis=-2, keepdims=True)
    scale = (amax / 7.0).astype(np.float32)
    q = np.clip(np.round(wg / np.maximum(scale, 1e-10)), -7, 7).astype(np.int8)
    return q.reshape(*lead, k, n), np.squeeze(scale, axis=-2)


def int4_pack(q: np.ndarray) -> np.ndarray:
    """Pack int4 values (int8 storage) pairwise along the *in* dim into uint8."""
    *lead, k, n = q.shape
    u = (q.astype(np.int16) & 0xF).astype(np.uint8)
    lo = u[..., 0::2, :]
    hi = u[..., 1::2, :]
    return (lo | (hi << 4)).astype(np.uint8)


def int4_unpack(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of int4_pack (jnp; usable inside jit)."""
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    *lead, k2, n = p.shape
    out = jnp.stack([lo, hi], axis=-2)  # [..., k2, 2, n]
    return out.reshape(*lead, 2 * k2, n)


# ---- W4A8: int4 weights x per-token int8 activations ------------------------
# Reference analog: QuantMethod W4A8INT4PTPC (QuantInfo.h:6-19) — per-token
# activation quantization over per-channel/groupwise int4 weights. On TPU the
# MXU consumes s8 x s8 (and s8 x s4) operands with int32 accumulation at
# higher throughput than bf16, so COMPUTE-bound phases (prefill, large-batch
# decode) gain on top of int4's HBM savings. The per-token activation scale
# and the per-(group, out) weight scale factor out of the contraction.


def quantize_activations_per_token(x: jnp.ndarray):
    """bf16/f32 activations [..., K] -> (s8 values, f32 per-token scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return q, scale


def w4a8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                scale: jnp.ndarray) -> jnp.ndarray:
    """y = x @ dequant(w) with the contraction in INTEGERS.

    x  [..., K] bf16/f32 (quantized per token here),
    w  [K, N] int4 (or int8) symmetric-groupwise, scale [K/G, N] f32.
    Per k-group the int32 partial sums scale by (x_scale * w_scale)."""
    xq, xs = quantize_activations_per_token(x)
    k = w.shape[-2]
    g = scale.shape[-2]
    group = k // g
    xg = xq.reshape(*xq.shape[:-1], g, group)
    wg = w.reshape(*w.shape[:-2], g, group, w.shape[-1])
    part = jnp.einsum("...gk,gkn->...gn",
                      xg.astype(jnp.int8), wg.astype(jnp.int8),
                      preferred_element_type=jnp.int32)  # [..., g, N]
    y = jnp.einsum("...gn,gn->...n", part.astype(jnp.float32),
                   scale.astype(jnp.float32))
    return (y * xs.astype(jnp.float32)).astype(x.dtype)


def w8a8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8: per-token int8 activations x per-out-channel int8 weights,
    int32-accumulated (SmoothQuant / PerTensorQuant analog,
    QuantInfo.h:6-19 — the calibrated smoother folds into the checkpoint;
    runtime scales are dynamic per token). One ungrouped s8 x s8 einsum:
    both scales factor out of the contraction.

    Decode (T=1, static shape) skips activation quantization: the integer
    contraction reads the same 1 B/elem of weights as the bf16 x s8
    convert-fused dot, so at decode batch sizes it only ADDS the dynamic
    per-token quant passes — measured +2.8 ms/step at b=64 on v5e. The
    int8 MXU path pays off where the GEMMs are compute-bound (prefill)."""
    if x.shape[-2] == 1:  # decode: weight-only semantics at equal fidelity+
        return quantized_matmul(x, w, scale, None)
    xq, xs = quantize_activations_per_token(x)
    part = jnp.einsum("...k,kn->...n", xq, w.astype(jnp.int8),
                      preferred_element_type=jnp.int32)
    y = part.astype(jnp.float32) * scale.astype(jnp.float32)
    return (y * xs.astype(jnp.float32)).astype(x.dtype)


# ---- FP4 (e2m1) groupwise --------------------------------------------------
# Reference analogs: QuantMethod ModelOptFP4 (e2m1 + per-16-group fp8 scales)
# and QuarkMXFP4 (e2m1 + per-32-group e8m0 scales), QuantInfo.h:6-19.
# TPU storage: the tunneled platform cannot pass float4_e2m1fn arrays across
# the jit boundary, so codes are packed two-per-uint8 with SPLIT-HALF rows
# along the *in* dim (ops/quant_gemm.pack_split_half) and dequantized by the
# Pallas groupwise dequant-GEMM kernel, which reads only the packed bytes
# (0.5 B/elem HBM). The earlier bitcast_convert_type(float4_e2m1fn) in-graph
# scheme measured 204 ms/step (VPU-bound, whole-weight materialization), and
# the groupwise-scale einsum gets hoisted out of decode scans as ~14 GB of
# bf16 weights — see ops/quant_gemm.py.

E2M1_VALUES = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)
FP4_GROUP = 32  # MXFP4 group size


def _e2m1_encode(mag: np.ndarray) -> np.ndarray:
    """Nearest-value e2m1 magnitude code (0..7) for non-negative inputs."""
    mids = (E2M1_VALUES[1:] + E2M1_VALUES[:-1]) / 2.0
    return np.searchsorted(mids, mag, side="right").astype(np.uint8)


def fp4_quantize_groupwise(
    w: np.ndarray, group_size: int = FP4_GROUP, e8m0_scales: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """w [..., in, out] -> (packed u8 [..., in, out/2], scale [..., in/G, out]).

    Per-(group, out) scale (group over the *in* dim) maps the group amax
    onto e2m1's max (6.0); e8m0_scales=True rounds scales to powers of two
    (MXFP4 semantics).

    Packing: split-half along the *in* dim (quant_gemm.pack_split_half) —
    byte[i, n] = code(w[i, n]) | code(w[i + K/2, n]) << 4 — consumed by the
    Pallas groupwise dequant-GEMM. Returns u8 [..., in/2, out]."""
    from rtp_llm_tpu.ops.quant_gemm import pack_split_half

    *lead, k, n = w.shape
    g = k // group_size
    wf = np.asarray(w, np.float32)
    wg = wf.reshape(*lead, g, group_size, n)
    amax = np.maximum(np.max(np.abs(wg), axis=-2, keepdims=True), 1e-10)
    scale = amax / 6.0
    if e8m0_scales:
        scale = np.exp2(np.ceil(np.log2(scale)))
    scaled = wg / scale
    sign = (scaled < 0).astype(np.uint8)
    code = (_e2m1_encode(np.abs(scaled)) | (sign << 3)).astype(np.uint8)
    code = code.reshape(*lead, k, n)
    return (pack_split_half(code, code="e2m1"),
            np.squeeze(scale, axis=-2).astype(np.float32))


def _e2m1_decode(code: jnp.ndarray, dtype) -> jnp.ndarray:
    """4-bit e2m1 code -> value, arithmetically (jit-safe, no gathers):
    sign s = c>>3, exponent e = (c>>1)&3, mantissa m = c&1;
    value = (-1)^s * (e == 0 ? 0.5*m : 2^(e-1) * (1 + 0.5*m))."""
    c = code.astype(jnp.int32)
    s = (c >> 3) & 1
    e = (c >> 1) & 3
    m = (c & 1).astype(dtype)
    mag = jnp.where(
        e == 0, jnp.asarray(0.5, dtype) * m,
        jnp.exp2((e - 1).astype(dtype)) * (1 + jnp.asarray(0.5, dtype) * m))
    return jnp.where(s == 1, -mag, mag)


def fp4_matmul(x: jnp.ndarray, packed: jnp.ndarray,
               scale: jnp.ndarray, layer=None) -> jnp.ndarray:
    """y = x @ dequant(packed e2m1). packed u8 [in/2, out] split-half rows
    (quant_gemm.pack_split_half) — or the full [L, in/2, out] stack with a
    ``layer`` index (no-copy scalar-prefetch path, see
    quant_gemm._kernel_matmul). scale [in/G, out]. Pallas dequant-GEMM on
    single-device TPU; grouped-2-step XLA fallback elsewhere."""
    from rtp_llm_tpu.ops.quant_gemm import groupwise_matmul_packed

    return groupwise_matmul_packed(x, packed, scale, code="e2m1",
                                   layer=layer)


def make_quant_transform(quant: QuantConfig):
    """Loader transform implementing QuantConfig (None for no-op)."""
    if not quant.is_quantized:
        return None

    def transform(spec: WeightSpec, arr: np.ndarray) -> Optional[dict]:
        quantize = (
            spec.name not in _NEVER
            and not spec.name.endswith("_bias")
            and not spec.name.endswith("_norm")
            and arr.ndim >= 2
            and spec.shard_axis in ("out", "in", "expert")
            and spec.name != "lm_head"
        )
        if spec.name == "lm_head" and quant.quantize_lm_head:
            # always per-channel int8 regardless of body method (the head
            # matmul consumes [H, V] + scale [V] via quantized_matmul)
            q, s = int8_quantize(arr)
            return {"": q, ".scale": s}
        if not quantize:
            return {"": arr.astype(jnp.bfloat16)}
        if quant.method in (QuantMethod.WEIGHT_ONLY_INT8, QuantMethod.W8A8):
            q, s = int8_quantize(arr)
            out = {"": q, ".scale": s}
            if (quant.method == QuantMethod.W8A8
                    and spec.shard_axis != "expert"):
                # routed experts run the batched capacity path (weight-only
                # int8 there); everything else contracts in integers
                out[".w8a8"] = MARKER
            return out
        if quant.method in (QuantMethod.WEIGHT_ONLY_INT4, QuantMethod.W4A8):
            k = arr.shape[-2]
            if k % (2 * quant.group_size) != 0:
                q, s = int8_quantize(arr)
                return {"": q, ".scale": s}
            q, s = int4_quantize_groupwise(
                np.asarray(arr, np.float32), quant.group_size
            )
            if quant.method == QuantMethod.W4A8:
                # runtime per-token activation quant (integer contraction):
                # the s8 x s8 einsum consumes unpacked int8 values
                return {"": q, ".scale": s, ".w4a8": MARKER}
            if not int4_packed() or spec.shard_axis == "expert":
                # routed-expert stacks run the batched _expert_linear /
                # ep_moe vmap paths (XLA groupwise matmul on int8 values)
                return {"": q, ".scale": s}
            from rtp_llm_tpu.ops.quant_gemm import pack_split_half

            # split-half nibble packing + Pallas dequant-GEMM (0.5 B/elem
            # HBM reads; see ops/quant_gemm.py for why not native s4)
            return {"": pack_split_half(q), ".scale": s,
                    ".int4p": MARKER}
        if quant.method == QuantMethod.FP4:
            k = arr.shape[-2]
            # routed-expert stacks run the batched _expert_linear path,
            # which consumes int8/int4 layouts; irregular in-dims can't
            # group — both fall back to per-channel int8
            if k % (2 * FP4_GROUP) != 0 or spec.shard_axis == "expert":
                q, s = int8_quantize(arr)
                return {"": q, ".scale": s}
            q, s = fp4_quantize_groupwise(np.asarray(arr, np.float32))
            return {"": q, ".scale": s, ".fp4": MARKER}
        if quant.method == QuantMethod.FP8:
            block = quant.fp8_block_size
            if block and arr.shape[-2] % block != 0:
                block = 0  # irregular shapes fall back to per-tensor
            q, s = fp8_quantize(np.asarray(arr, np.float32), block)
            return {"": q, ".scale": s}
        return {"": arr.astype(jnp.bfloat16)}

    # converted-weights cache key (loader ft-dump analog): the transform's
    # output is fully determined by these knobs
    # "-p3": offset-code (v+8) s4 packing (invalidates two's-complement
    # dumps; see quant_gemm.pack_split_half)
    transform.cache_key = (f"{quant.method.value}-g{quant.group_size}"
                           f"-b{quant.fp8_block_size}-p3"
                           + ("-lmh" if quant.quantize_lm_head else ""))
    return transform


def quantized_matmul(
    x: jnp.ndarray, w: jnp.ndarray, scale: Optional[jnp.ndarray],
    zero: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """y = x @ dequant(w). Handles bf16 (scale None), int8 per-channel
    ([out] scale), symmetric int4 groupwise ([in/G, out] scale) and
    asymmetric GPTQ/AWQ int4 (scale + zero [in/G, out]: W = (q - z) * s).

    XLA keeps w int8 in HBM and fuses the convert into the matmul operand —
    HBM reads are the quantized bytes, which is the whole point on a
    bandwidth-bound decode step. The asymmetric zero term factors out of the
    contraction: y = (x @ q)·s - (sum_g x)·(z·s).
    """
    if scale is None:
        return x @ w
    if scale.ndim == 0 or scale.size == 1:  # per-tensor fp8
        y = jnp.matmul(x, w.astype(x.dtype))
        return y * jnp.asarray(scale, x.dtype).reshape(())
    if scale.ndim == w.ndim - 1:  # per-out-channel int8
        y = jnp.matmul(x, w.astype(x.dtype))
        return y * scale.astype(x.dtype)
    # groupwise: scale [in/G, out]. Two-step form (per-group partial sums,
    # then scale): the one-einsum `x_gk, w_gkn, s_gn` materializes the
    # dequantized bf16 weights, which XLA hoists out of the K-step decode
    # scan as a loop invariant — ~14 GB for a 7B model, OOMs 16 GB HBM
    # (measured; see ops/quant_gemm.py module docstring).
    k = w.shape[-2]
    g = scale.shape[-2]
    group = k // g
    xg = x.reshape(*x.shape[:-1], g, group)
    wg = w.reshape(*w.shape[:-2], g, group, w.shape[-1])
    # accumulate in x.dtype (the CPU thunk backend cannot execute
    # bf16 x bf16 -> f32 dots); scales apply in f32
    part = jnp.einsum("...gk,...gkn->...gn", xg, wg.astype(x.dtype))
    y = jnp.einsum("...gn,...gn->...n", part.astype(jnp.float32),
                   scale.astype(jnp.float32)).astype(x.dtype)
    if zero is not None:
        xsum = jnp.sum(xg, axis=-1)  # [..., g]
        y = y - jnp.einsum(
            "...g,...gn->...n", xsum, (zero * scale).astype(x.dtype)
        )
    return y
