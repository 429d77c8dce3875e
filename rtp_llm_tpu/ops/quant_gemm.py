"""Groupwise dequant-GEMM over nibble-packed weights (Pallas, TPU).

Reference analogs: cutlass int4 groupwise GEMMs consumed via
`model_loader/group_wise_quant_weight.py` (GPTQ/AWQ) and the ModelOptFP4 /
QuarkMXFP4 e2m1 paths (`rtp_llm/cpp/model_utils/QuantInfo.h:6-19`).

Why this kernel exists (measured on TPU v5e, 2026-08):
  * Packed `s4` jax arrays cannot cross the jit boundary on the tunneled
    platform (device_put of an S4 buffer fails), so "native int4 dtype"
    storage is not serviceable on hardware.
  * The XLA formulation `einsum("...gk,gkn,gn->...n", x, w.astype(bf16), s)`
    materializes the dequantized bf16 weights, and inside the K-step decode
    `lax.scan` XLA hoists them out of the loop as invariants: a Qwen2-7B
    warmup compile allocates ~14 GB of bf16 weights and OOMs 16 GB HBM
    (micro: 2.63 GB temp and 1321 ms vs 0.22 GB / 70 ms for 4 layers x 8
    steps of [64,4096]x[4096,14336]).
  * The 2-step split (partial sums per group, then scale) avoids the hoist
    but writes [B, K/G, N] f32 partials — ~470 MB of HBM traffic per matmul
    at decode geometry.
  * This kernel reads ONLY the packed bytes (0.5 B/elem) from HBM, dequants
    tiles in VMEM (VPU), and feeds the MXU — the int4/fp4 speed-of-light.

Storage layout — SPLIT-HALF nibble packing along the *in* (contraction) dim:
byte[i, n] holds code(w[i, n]) in the low nibble and code(w[i + K/2, n]) in
the high nibble. Unlike adjacent-row packing this needs NO interleave to
decode: each nibble plane is a contiguous [K/2, N] matrix that contracts
against its half of x, so both the kernel and the XLA fallback are two clean
GEMMs. The out dim stays un-packed, so out-axis splits (qkv unfuse, TP out
sharding) need no bound adjustment, and in-axis (contraction) sharding of
the packed rows still partitions the contraction exactly.

Codes: "s4" = two's-complement int4 ((c ^ 8) - 8, values -8..7);
"e2m1" = fp4 sign(1) exp(2) mant(1), decoded arithmetically.

Group scales stay [K/G, N] f32 over the ORIGINAL k rows: the lo plane uses
scale rows [0, K/2/G), the hi plane rows [K/2/G, K/G).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_split_half(q: np.ndarray, code: str = "s4") -> np.ndarray:
    """int codes [..., K, N] -> u8 [..., K/2, N], low nibble = row k, high =
    row k+K/2.

    "s4" values in [-8, 7] store as OFFSET codes (v + 8, 0..15): decode is
    then v*s = u*s - 8s — one convert + one FMA on the VPU instead of the
    xor/sub two's-complement untwist (the kernel is VPU-decode-bound; every
    per-element op removed is ~2 ms off the 7B int4 decode step).
    "e2m1" u4 codes pass through unchanged."""
    k = q.shape[-2]
    assert k % 2 == 0, q.shape
    qi = np.asarray(q).astype(np.int16)
    if code == "s4":
        qi = qi + 8
        assert qi.min() >= 0 and qi.max() <= 15, (qi.min(), qi.max())
    u = (qi & 0xF).astype(np.uint8)
    return (u[..., : k // 2, :] | (u[..., k // 2:, :] << 4)).astype(np.uint8)


def _decode_nibble(c, code: str, dtype):
    """u8 nibble values (0..15) -> weight values (jnp; kernel- and jit-safe)."""
    c = c.astype(jnp.int32)
    if code == "s4":  # OFFSET codes (v + 8) — see pack_split_half
        return (c - 8).astype(dtype)
    # e2m1 (s=(c>>3)&1, e=(c>>1)&3, m=c&1): CONSTRUCT the f32 bit pattern
    # directly — value = (-1)^s * 2^(e-1) * (1 + m/2), and the two e==0
    # codes (0, 0.5) are normal f32s too, so no exp2/transcendental and no
    # float arithmetic is needed, just integer field packing + one bitcast.
    s = (c >> 3) & 1
    e = (c >> 1) & 3
    m = c & 1
    bits = jnp.where(
        e > 0, ((e + 126) << 23) | (m << 22),
        m * (126 << 23),  # e==0: m ? 0.5 : +0.0
    ) | (s << 31)
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.int32), jnp.float32).astype(dtype)


def _gw_kernel(x_lo_ref, x_hi_ref, p_ref, s_ref, o_ref,
               acc_ref, *, code: str, n_k: int, group: int,
               stacked: bool = False):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[0] if stacked else p_ref[...]  # [KPt, Nt] u8
    kpt, nt = p.shape
    ng = kpt // group
    xdt = x_lo_ref.dtype

    def half(nib, s):
        # s: [ng, Nt] f32 scale rows for this half's k range
        if code == "s4":
            # offset codes: v*s = u*s - 8s — convert + f32 FMA, no untwist.
            # (Tried and slower/unsupported: bf16 FMA decode (22.6 vs 16.9
            # ms e2e — i32->bf16 converts don't pack on this VPU), u8/i8/i16
            # narrow arithmetic (Mosaic compile errors).)
            uf = nib.astype(jnp.float32)
            w = (uf.reshape(ng, group, nt) * s[:, None, :]
                 - (8.0 * s)[:, None, :]).reshape(kpt, nt)
            return w.astype(xdt)
        w = _decode_nibble(nib, code, jnp.float32)  # [KPt, Nt]
        w = (w.reshape(ng, group, nt) * s[:, None, :]).reshape(kpt, nt)
        return w.astype(xdt)

    # scale arrives pre-reshaped [n_k, 2, ng_pad, N] (ng rows valid; see
    # _kernel_matmul); this step's lo/hi rows are one block. Nibble math
    # runs in i32: Mosaic legalizes neither i8 shifts nor u8->f32 casts
    # (both tried; compile errors), so the one convert is unavoidable.
    c = p.astype(jnp.int32)
    w_lo = half(c & 0xF, s_ref[0, 0, :ng, :])
    w_hi = half((c >> 4) & 0xF, s_ref[0, 1, :ng, :])
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += dot(x_lo_ref[...], w_lo) + dot(x_hi_ref[...], w_hi)

    @pl.when(k == n_k - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _gw_kernel_pipe(x_lo_ref, x_hi_ref, p_ref, s_ref, o_ref,
                    acc_ref, wlo_ref, whi_ref, *, code: str, n_k: int,
                    group: int, stacked: bool = False):
    """Software-pipelined (skewed) variant: grid runs n_k+1 steps; step t
    DECODES packed tile t into the revolving VMEM slot t%2 while the MXU
    DOTS tile t-1 from slot (t-1)%2 — the independent buffers give Mosaic's
    scheduler the freedom to overlap the VPU nibble decode with the MXU
    dot instead of serializing them per tile (the round-4 int4 floor:
    ~5 wide VPU ops/element scheduled serially with the dot, PERF_NOTES)."""
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xdt = x_lo_ref.dtype

    @pl.when(t < n_k)
    def _decode():
        p = p_ref[0] if stacked else p_ref[...]  # [KPt, Nt] u8
        kpt, nt = p.shape
        ng = kpt // group

        def half(nib, s):
            if code == "s4":
                uf = nib.astype(jnp.float32)
                w = (uf.reshape(ng, group, nt) * s[:, None, :]
                     - (8.0 * s)[:, None, :]).reshape(kpt, nt)
                return w.astype(xdt)
            w = _decode_nibble(nib, code, jnp.float32)
            w = (w.reshape(ng, group, nt) * s[:, None, :]).reshape(kpt, nt)
            return w.astype(xdt)

        c = p.astype(jnp.int32)
        slot = jax.lax.rem(t, 2)
        wlo_ref[slot] = half(c & 0xF, s_ref[0, 0, :ng, :])
        whi_ref[slot] = half((c >> 4) & 0xF, s_ref[0, 1, :ng, :])

    @pl.when(t > 0)
    def _dot():
        slot = jax.lax.rem(t - 1, 2)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] += (dot(x_lo_ref[...], wlo_ref[slot])
                         + dot(x_hi_ref[...], whi_ref[slot]))

    @pl.when(t == n_k)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pipeline_enabled() -> bool:
    from rtp_llm_tpu.config import runtime_flags

    return bool(runtime_flags.get("int4_pipeline"))


def _pick_tile(total: int, candidates) -> int:
    for c in candidates:
        if c <= total and total % c == 0:
            return c
    return 0


def _kernel_matmul(x2: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                   code: str, interpret: bool = False, layer=None):
    """x2 [M, K] x packed [K/2, N] (+ scale [K/G, N]) -> [M, N] or None
    when the geometry doesn't tile (caller falls back to XLA).

    STACKED mode (``packed`` [L, K/2, N] + traced ``layer``): the kernel
    DMAs its weight blocks straight out of the per-layer stack via a
    scalar-prefetched layer index. Passing a SLICE of the stack instead
    makes XLA materialize a copy of the whole [K/2, N] operand before every
    pallas call (xprof: slice_bitcast_fusion, ~40% of the int4 decode
    step's weight-path time) — slicing must never reach this kernel."""
    stacked = packed.ndim == 3
    m, k = x2.shape
    k2, n = packed.shape[-2:]
    g = scale.shape[0]
    if k != 2 * k2 or k % g:
        return None
    group_k = k // g  # group size over original k rows
    if k2 % (g // 2 or 1) or g % 2:
        return None
    # per-half scale rows: kpt k-rows consume kpt/group_k scale rows.
    # Prefer the LARGEST tiles that divide (fewer grid steps = fewer
    # acc-init/scale-block overheads per byte); cap the packed tile at
    # ~6 MB of VMEM (measured on v5e: kpt 256 -> whole-k tiles cut the
    # int4 decode step 22.1 -> 17.9 ms).
    # nt capped at 512: wider n-tiles push the kernel's f32/bf16 decode
    # intermediates past the 16 MB scoped-vmem limit at prefill row counts
    nt = _pick_tile(n, (512, 256, 128))
    if not nt:
        return None
    pipelined = _pipeline_enabled()
    # packed-tile VMEM budget:
    # - pipelined: double-buffered DECODED bf16 tiles on top of the f32
    #   decode temporaries (measured: 1 MB tiles -> 18.8 MB scoped vmem)
    # - prefill row counts (m > 64): the x tiles grow with mt and the
    #   whole-k budget overflows scoped vmem on some K (measured: 23.55 MB
    #   at [512, 8960] x [8960, 1536] GPTQ) — prefill is MXU-bound, so the
    #   extra grid steps from smaller tiles are free
    # - decode (m <= 64): whole-k tiles are the measured win (22.1 -> 17.9
    #   ms int4 step). Budget 2.5 MB: keeps the 7B's winning kpt=4736 tile
    #   (2.42 MB) while splitting llama3-8B's kpt=7168 (3.67 MB packed,
    #   24.4 MB actual scoped vmem — compile OOM) to half-k
    if pipelined:
        cap = (512 << 10) // nt
    elif m > 64:
        cap = (1 << 20) // nt
    else:
        cap = (2560 << 10) // nt
    big = [d for d in range(k2, 0, -256)
           if k2 % d == 0 and d % group_k == 0 and d <= cap]
    kpt = _pick_tile(k2, big + [c for c in (512, 256, 128, 64, 32)
                                if c % group_k == 0])
    if not kpt and group_k <= 512 and k2 % group_k == 0:
        kpt = group_k
    if not kpt or not nt:
        return None
    mt = m if m <= 256 else _pick_tile(m, (256, 128))
    pad_m = 0
    if not mt:
        pad_m = (-m) % 128
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
        mt = 128
    mm = x2.shape[0]
    n_k = k2 // kpt
    ng = kpt // group_k  # scale rows per (half, k-step)
    ng_pad = -(-ng // 8) * 8
    # [n_k, 2, ng_pad, N]: step kk's lo-half and hi-half scale rows side by
    # side (rows kk*ng.. and (n_k+kk)*ng.. of the flat [K/G, N] array),
    # padded to a sublane multiple — Mosaic cannot prove dynamic row-slices
    # of the flat array are 8-aligned. Loop-invariant: XLA hoists this
    # transform out of decode scans.
    sr = scale.reshape(2, n_k, ng, n)
    s3 = jnp.stack([sr[0], sr[1]], axis=1)  # [n_k, 2, ng, N]
    if ng_pad != ng:
        s3 = jnp.pad(s3, ((0, 0), (0, 0), (0, ng_pad - ng), (0, 0)))

    if pipelined:
        # skewed grid: one extra drain step; packed/scale maps clamp at the
        # last real tile, x maps lag one step behind (the dot consumes the
        # PREVIOUS step's decode)
        gsteps = n_k + 1
        last = n_k - 1

        def _xlo(i, j, t, *a):
            return (i, jnp.maximum(t - 1, 0))

        def _xhi(i, j, t, *a):
            return (i, jnp.maximum(t - 1, 0) + n_k)

        def _smap(i, j, t, *a):
            return (jnp.minimum(t, last), 0, 0, j)

        body = functools.partial(_gw_kernel_pipe, code=code, n_k=n_k,
                                 group=group_k)
        scratch = [
            pltpu.VMEM((mt, nt), jnp.float32),
            pltpu.VMEM((2, kpt, nt), x2.dtype),
            pltpu.VMEM((2, kpt, nt), x2.dtype),
        ]
    else:
        gsteps, last = n_k, n_k - 1

        def _xlo(i, j, t, *a):
            return (i, t)

        def _xhi(i, j, t, *a):
            return (i, t + n_k)

        def _smap(i, j, t, *a):
            return (t, 0, 0, j)

        body = functools.partial(_gw_kernel, code=code, n_k=n_k,
                                 group=group_k)
        scratch = [pltpu.VMEM((mt, nt), jnp.float32)]

    def _pmap2(i, j, t, *a):
        return ((jnp.minimum(t, last) if pipelined else t), j)

    if stacked:
        li = jnp.asarray(layer, jnp.int32).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mm // mt, n // nt, gsteps),
            in_specs=[
                pl.BlockSpec((mt, kpt), _xlo),
                pl.BlockSpec((mt, kpt), _xhi),
                pl.BlockSpec(
                    (1, kpt, nt),
                    lambda i, j, t, li_r: (
                        li_r[0],
                        (jnp.minimum(t, last) if pipelined else t), j)),
                pl.BlockSpec((1, 2, ng_pad, nt), _smap),
            ],
            out_specs=pl.BlockSpec((mt, nt), lambda i, j, t, li_r: (i, j)),
            scratch_shapes=scratch,
        )
        def _stacked_body(li_ref, *refs):
            # scalar-prefetch operands arrive first; the index maps already
            # consumed li_ref, the body only needs the block refs
            body(*refs, stacked=True)

        out = pl.pallas_call(
            _stacked_body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mm, n), x2.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(li, x2, x2, packed, s3)
        return out[:m] if pad_m else out

    out = pl.pallas_call(
        body,
        grid=(mm // mt, n // nt, gsteps),
        in_specs=[
            pl.BlockSpec((mt, kpt), _xlo),
            pl.BlockSpec((mt, kpt), _xhi),
            pl.BlockSpec((kpt, nt), _pmap2),
            pl.BlockSpec((1, 2, ng_pad, nt), _smap),
        ],
        out_specs=pl.BlockSpec((mt, nt), lambda i, j, t: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mm, n), x2.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x2, x2, packed, s3)
    return out[:m] if pad_m else out


def _xla_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                code: str) -> jnp.ndarray:
    """Portable fallback: two grouped matmuls with f32 partial sums (the
    2-step form — slower than the kernel but never materializes the full
    dequantized weights as a scan invariant). Supports leading (expert)
    dims on `packed`/`scale` and any x rank."""
    *lead, k2, n = packed.shape
    g = scale.shape[-2]
    group = 2 * k2 // g
    g2 = g // 2

    def half(xh, nib, sh):
        # accumulate in x.dtype (the CPU thunk backend cannot execute
        # bf16 x bf16 -> f32 dots); scales apply in f32
        w = _decode_nibble(nib, code, x.dtype)
        xg = xh.reshape(*xh.shape[:-1], g2, group)
        wg = w.reshape(*lead, g2, group, n)
        part = jnp.einsum("...gk,...gkn->...gn", xg, wg)
        return jnp.einsum("...gn,...gn->...n", part.astype(jnp.float32),
                          sh.astype(jnp.float32))

    y = (half(x[..., :k2], packed & 0xF, scale[..., :g2, :])
         + half(x[..., k2:], packed >> 4, scale[..., g2:, :]))
    return y.astype(x.dtype)


def _use_kernel() -> bool:
    try:
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    except Exception:
        return False


def groupwise_matmul_packed(
    x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray, *,
    code: str = "s4", zero: jnp.ndarray | None = None,
    interpret: bool = False, layer=None,
) -> jnp.ndarray:
    """y = x @ dequant(packed) (+ GPTQ/AWQ asymmetric zero correction).

    x [..., K] bf16/f32; packed u8 [..., K/2, N] split-half nibbles;
    scale f32 [..., K/G, N]. With ``layer`` given, ``packed`` may be the
    FULL per-layer stack [L, K/2, N] — the kernel indexes it in place
    instead of the caller slicing (which copies; see _kernel_matmul).
    The asymmetric zero term factors out of the contraction exactly as in
    `quantized_matmul`: y = (x @ q)*s - (sum_over_group x) @ (z*s).
    """
    stacked = layer is not None and packed.ndim == 3
    *lead, k2, n = packed.shape
    if stacked:
        lead = []
    k = 2 * k2
    y = None
    if not lead and (interpret or _use_kernel()):
        xf = x.reshape(-1, k)
        y = _kernel_matmul(xf, packed, scale, code, interpret=interpret,
                           layer=layer if stacked else None)
        if y is not None:
            y = y.reshape(*x.shape[:-1], n)
    if y is None:
        if stacked:
            packed = jax.lax.dynamic_index_in_dim(
                packed, jnp.asarray(layer, jnp.int32), 0, keepdims=False)
        y = _xla_matmul(x, packed, scale, code)
    if zero is not None:
        g = scale.shape[-2]
        xg = x.reshape(*x.shape[:-1], g, k // g)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=-1)  # [..., g]
        y = y - jnp.einsum(
            "...g,...gn->...n", xsum,
            (zero * scale).astype(jnp.float32)).astype(y.dtype)
    return y
