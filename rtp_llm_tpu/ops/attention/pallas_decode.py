"""Pallas TPU paged decode attention (GQA/MHA, T=1).

The hot serving kernel — TPU-native replacement for the reference's decode
FMHA backends (flashinfer decode / XQA, rtp_llm/models_py/modules/factory/
attention/attn_factory.py:200).

Design notes (v3):
  * pallas grid steps execute SERIALLY on a TensorCore, so one grid step = one
    batch row with ALL kv heads, and each loop iteration covers a CHUNK of
    KV blocks (C x block_size tokens) to amortize loop/DMA overhead;
  * the pool layout [num_slots, Hkv*D] (ops/kv_cache.py) makes one block's
    slab a contiguous [block_size, Hkv*D] region (e.g. 32 KiB) — large
    aligned DMAs, no per-head strides;
  * GQA is expressed as ONE MXU matmul per chunk by zero-expanding the query:
    q_exp[h*G+g] holds q[h*G+g] in kv-head-h's lane segment and zeros
    elsewhere, so scores = q_exp @ chunk^T sums over exactly the right
    segment — no sublane-misaligned per-head slicing inside the loop.
    The PV product is one matmul into [Hq, Hkv*D] followed by an aligned
    per-segment select-accumulate;
  * double-buffered chunk DMAs (k and v in flight together), fp32 online
    softmax.

Layouts:
  q            [B, Hq, D]           (T = 1)
  k/v cache    [NS, Hkv*D]          (paged pool, stays in HBM)
  block_tables [B, MB] i32          (scalar-prefetch)
  kv_lens      [B] i32              (scalar-prefetch; includes current token)
  out          [B, Hq, D]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
NBUF = 2  # default chunk buffers in flight
CHUNK_BLOCKS = 4  # default KV blocks fetched per loop iteration


def _decode_kernel(
    # scalar prefetch: block_tables [B,MB] i32, kv_lens [B] i32, and in
    # dyn_layer mode a third [1] i32 layer index (scan-over-layers: the
    # layer offset into the full cache is a runtime scalar)
    *refs,
    bs: int,
    c: int,
    nbuf: int,
    sm_scale: float,
    window: int = 0,
    has_cur: bool = False,
    layer: int = -1,  # >= 0: kv_hbm is the full [L, 2, NS, HD] cache
    dyn_layer: bool = False,  # layer index arrives as scalar prefetch
    ns: int = 0,  # dyn mode: slots per (layer, plane) in the FLAT cache
):
    if dyn_layer:
        (block_tables_ref, kv_lens_ref, layer_ref,
         qe_ref, curk_ref, curv_ref, k_hbm, v_hbm,
         o_ref, k_buf, v_buf, sem) = refs
        # dyn mode gets the cache FLATTENED to [L*2*NS, HD] and resolves the
        # layer offset to a row base ONCE here: the kernel is DMA-issue-rate
        # bound, and a 4-D dynamic index recomputed per issue on the scalar
        # core measurably stalls the pipeline (~1.4 ms/step at b=64, 28
        # layers); a single pre-multiplied base leaves one add per issue.
        row_k = layer_ref[0] * (2 * ns)
        row_v = row_k + ns
    else:
        (block_tables_ref, kv_lens_ref,
         qe_ref, curk_ref, curv_ref, k_hbm, v_hbm,
         o_ref, k_buf, v_buf, sem) = refs
    # qe_ref [1, Hq, Hkv*D] zero-expanded query; curk/curv [1, 1, Hkv*D]
    # deferred current token; k_hbm/v_hbm [NS, Hkv*D] (or k_hbm = the full
    # [L, 2, NS, HD] cache); o_ref [1, Hq, Hkv*D]; scratch k/v_buf
    # [nbuf, C*BS, Hkv*D] VMEM + DMA sems [nbuf, C, 2]
    b = pl.program_id(0)
    hq = qe_ref.shape[1]
    hd = qe_ref.shape[2]

    kv_len = kv_lens_ref[b]
    # deferred-write mode: the cache holds kv_len-1 tokens; the current
    # token's K/V arrive in VMEM (engine batches all layers' writes into one
    # scatter after the forward)
    cached = jax.lax.max(kv_len - 1, 0) if has_cur else kv_len
    num_blocks = jax.lax.div(cached + bs - 1, bs)
    # sliding window: skip blocks entirely below the window start
    win_start = jax.lax.max(kv_len - window, 0) if window else jnp.int32(0)
    first_blk = jax.lax.div(win_start, bs)
    num_chunks = jax.lax.max(
        jax.lax.div(num_blocks - first_blk + c - 1, c), 0
    )

    def slab(which, blk_idx):
        # clamp overhang blocks of the last chunk to a valid table entry —
        # their rows are position-masked, but must hold finite values
        # (0 * NaN = NaN in the PV matmul otherwise)
        safe = jax.lax.min(blk_idx, jax.lax.max(num_blocks - 1, 0))
        start = pl.multiple_of(block_tables_ref[b, safe] * bs, bs)
        if dyn_layer:  # flat [L*2*NS, HD] cache, pre-resolved row base
            base = row_k if which == 0 else row_v
            return k_hbm.at[pl.ds(pl.multiple_of(base + start, bs), bs), :]
        if layer >= 0:  # full cache: static layer + k/v plane indices
            return k_hbm.at[layer, which, pl.ds(start, bs), :]
        return (k_hbm if which == 0 else v_hbm).at[pl.ds(start, bs), :]

    def start_chunk(slot, ci):
        for j in range(c):
            blk = first_blk + ci * c + j
            pltpu.make_async_copy(
                slab(0, blk),
                k_buf.at[slot, pl.ds(j * bs, bs), :],
                sem.at[slot, j, 0],
            ).start()
            pltpu.make_async_copy(
                slab(1, blk),
                v_buf.at[slot, pl.ds(j * bs, bs), :],
                sem.at[slot, j, 1],
            ).start()

    def wait_chunk(slot, ci):
        # symmetric with start_chunk: every issued DMA is waited exactly once
        for j in range(c):
            blk = first_blk + ci * c + j
            pltpu.make_async_copy(
                slab(0, blk),
                k_buf.at[slot, pl.ds(j * bs, bs), :],
                sem.at[slot, j, 0],
            ).wait()
            pltpu.make_async_copy(
                slab(1, blk),
                v_buf.at[slot, pl.ds(j * bs, bs), :],
                sem.at[slot, j, 1],
            ).wait()

    for j in range(nbuf):
        @pl.when(j < num_chunks)
        def _(j=j):
            start_chunk(j, j)

    qe = qe_ref[0].astype(jnp.float32) * sm_scale  # [Hq, HD]

    def body(ci, carry):
        m, l, acc = carry  # [Hq,1], [Hq,1], [Hq,HD]
        slot = jax.lax.rem(ci, nbuf)
        wait_chunk(slot, ci)
        k = k_buf[slot]  # [C*BS, HD]
        v = v_buf[slot]

        s = jax.lax.dot_general(
            qe, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, C*BS]
        pos = (first_blk + ci * c) * bs + jax.lax.broadcasted_iota(
            jnp.int32, (1, c * bs), 1
        )
        invalid = pos >= (cached if has_cur else kv_len)
        if window:
            invalid = invalid | (pos < win_start)
        s = jnp.where(invalid, NEG_INF, s)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # [Hq, C*BS]
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, HD]
        acc_new = acc * alpha + pv

        @pl.when(ci + nbuf < num_chunks)
        def _():
            start_chunk(slot, ci + nbuf)

        return m_new, l_new, acc_new

    m0 = jnp.full((hq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hq, 1), jnp.float32)
    acc0 = jnp.zeros((hq, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

    if has_cur:
        # fold the in-register current token (position kv_len-1; always
        # inside any sliding window)
        ck = curk_ref[0, 0].astype(jnp.float32)  # [HD]
        cv = curv_ref[0, 0].astype(jnp.float32)
        s_cur = jax.lax.dot_general(
            qe, ck[None, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, 1]
        m_new = jnp.maximum(m, s_cur)
        alpha = jnp.exp(m - m_new)
        p_cur = jnp.exp(s_cur - m_new)
        p_cur = jnp.where(kv_len > 0, p_cur, 0.0)
        l = l * alpha + p_cur
        acc = acc * alpha + p_cur * cv[None, :]

    out = acc / jnp.maximum(l, 1e-20)
    out = jnp.where(kv_len > 0, out, 0.0)  # inactive rows -> zeros
    o_ref[0] = out.astype(o_ref.dtype)


def _fullrow_kernel(
    # scalar prefetch: block_tables [B,MB] i32, kv_lens [B] i32, and in
    # dyn_layer mode a third [1] i32 layer index; then inputs
    #   qe_ref [1, Hq, Hkv*D] (zero-expanded query)
    #   curk/curv_ref [1, 1, Hkv*D] (deferred current token, may be unused)
    #   k_hbm [NS, Hkv*D] ANY/HBM — or the full [L, 2, NS, HD] cache
    #   v_hbm [NS, Hkv*D] ANY/HBM — ignored (same ref) in full-cache mode
    # quant mode appends ks/vs input refs, then:
    # output o_ref [1, Hq, Hkv*D] VMEM block
    # scratch (persists across the sequential grid -> cross-row pipelining):
    #   k_buf/v_buf [NB, MB*BS, Hkv*D] VMEM, sem DMA sems [NB, MB, 2]
    *refs,
    bs: int,
    mb: int,
    sm_scale: float,
    window: int = 0,
    has_cur: bool = False,
    layer: int = -1,  # >= 0: k_hbm is the full [L, 2, NS, HD] cache
    nb: int = 2,  # row buffers in flight
    quant: bool = False,  # int8 KV: ks/vs operands carry expanded scales
    dyn_layer: bool = False,  # layer index arrives as scalar prefetch
    ns: int = 0,  # dyn mode: slots per (layer, plane) in the FLAT cache
):
    """Whole-row variant: each grid step computes one batch row's attention in
    two MXU calls over the full (bucketed) context, with the NEXT row's KV
    streamed while this row computes. Used when MB*BS is small enough for
    VMEM; the engine buckets MB to the batch's max context.

    quant mode (int8 KV cache, per-(slot, head) scales — reference analog:
    KVCacheConfig int8 with per-head scales): the dispatch gathers each row's
    scales through the block table as [B, MB*BS, Hkv]; the kernel expands
    them to [Hq, MB*BS] with a one-hot MXU matmul (head h reads kv-head
    h//G) and applies dequant as two elementwise multiplies — K scale on the
    scores, V scale on the probabilities. The deferred current token stays
    bf16 in registers, so has_cur composes with quant unchanged."""
    if dyn_layer:
        block_tables_ref, kv_lens_ref, layer_ref = refs[:3]
        refs = refs[3:]
        # flat [L*2*NS, HD] cache; resolve the layer to row bases ONCE (the
        # kernel is DMA-issue-rate bound — see _decode_kernel note)
        row_k = layer_ref[0] * (2 * ns)
        row_v = row_k + ns
    else:
        block_tables_ref, kv_lens_ref = refs[:2]
        refs = refs[2:]
    qe_ref, curk_ref, curv_ref, k_hbm, v_hbm = refs[:5]
    refs = refs[5:]
    if quant:
        ks_ref, vs_ref, o_ref, k_buf, v_buf, sem = refs
    else:
        o_ref, k_buf, v_buf, sem = refs
    b = pl.program_id(0)
    nrows = pl.num_programs(0)

    def kv_slab(which, start):
        if dyn_layer:
            base = row_k if which == 0 else row_v
            return k_hbm.at[pl.ds(pl.multiple_of(base + start, bs), bs), :]
        if layer >= 0:
            return k_hbm.at[layer, which, pl.ds(start, bs), :]
        return (k_hbm if which == 0 else v_hbm).at[pl.ds(start, bs), :]

    def start_row(row):
        slot = jax.lax.rem(row, nb)
        kv_len = kv_lens_ref[row]
        nblk = jax.lax.div(kv_len + bs - 1, bs)
        for j in range(mb):
            # blocks past this row's live length are never read (position
            # masked), so skip their DMAs entirely
            @pl.when(jnp.int32(j) < nblk)
            def _(j=j, slot=slot, row=row):
                safe = jax.lax.min(jnp.int32(j), jax.lax.max(nblk - 1, 0))
                start = pl.multiple_of(block_tables_ref[row, safe] * bs, bs)
                pltpu.make_async_copy(
                    kv_slab(0, start),
                    k_buf.at[slot, pl.ds(j * bs, bs), :], sem.at[slot, j, 0],
                ).start()
                pltpu.make_async_copy(
                    kv_slab(1, start),
                    v_buf.at[slot, pl.ds(j * bs, bs), :], sem.at[slot, j, 1],
                ).start()

            # skipped V blocks must still be FINITE: the probability columns
            # there are exactly 0 after masking, but 0 * NaN = NaN in the PV
            # matmul. K garbage is harmless (scores are overwritten by the
            # positional mask), so only V is zero-filled.
            @pl.when(jnp.int32(j) >= nblk)
            def _(j=j, slot=slot):
                v_buf[slot, pl.ds(j * bs, bs), :] = jnp.zeros(
                    (bs, v_buf.shape[-1]), v_buf.dtype)

    def wait_row(row):
        slot = jax.lax.rem(row, nb)
        kv_len = kv_lens_ref[row]
        nblk = jax.lax.div(kv_len + bs - 1, bs)
        for j in range(mb):
            @pl.when(jnp.int32(j) < nblk)
            def _(j=j, slot=slot, row=row):
                safe = jax.lax.min(jnp.int32(j), jax.lax.max(nblk - 1, 0))
                start = pl.multiple_of(block_tables_ref[row, safe] * bs, bs)
                pltpu.make_async_copy(
                    kv_slab(0, start),
                    k_buf.at[slot, pl.ds(j * bs, bs), :], sem.at[slot, j, 0],
                ).wait()
                pltpu.make_async_copy(
                    kv_slab(1, start),
                    v_buf.at[slot, pl.ds(j * bs, bs), :], sem.at[slot, j, 1],
                ).wait()

    @pl.when(b == 0)
    def _():
        for r0 in range(nb):
            @pl.when(jnp.int32(r0) < nrows)
            def _(r0=r0):
                start_row(jnp.int32(r0))

    wait_row(b)
    slot = jax.lax.rem(b, nb)
    kv_len = kv_lens_ref[b]

    # compute dtype: bf16 MXU dots for bf16/int8/fp8 caches (int8 and e4m3
    # are exactly representable in bf16; elementwise casts of the whole
    # [MB*BS, HD] slab to f32 cost real VPU time). f32 caches (CPU interpret
    # tests) keep full precision.
    cdt = jnp.float32 if k_buf.dtype == jnp.float32 else jnp.bfloat16
    # the MXU consumes s8 operands directly (mixed bf16 x s8 dot) — casting
    # the whole slab to bf16 on the VPU would cost more than the int8
    # bandwidth saving
    mxu = (lambda x: x) if k_buf.dtype == jnp.int8 else (
        lambda x: x.astype(cdt))
    qe = (qe_ref[0].astype(jnp.float32) * sm_scale).astype(cdt)  # [Hq, HD]
    k = k_buf[slot]
    v = v_buf[slot]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, mb * bs), 1)
    cached = jax.lax.max(kv_len - 1, 0) if has_cur else kv_len
    invalid = pos >= cached
    s = jax.lax.dot_general(
        qe, mxu(k), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Hq, MB*BS] — garbage columns (skipped K DMAs) masked just below
    if quant:
        # one-hot head expansion: sel[h, kh] = (h // G == kh); the [Hq, Hkv]
        # x [Hkv, MB*BS] matmul is noise next to the KV DMAs, and avoids the
        # [B, Hq, MB*BS] transposed scale materialization XLA-side (measured
        # ~7 ms/step of relayouts at b=64)
        hq_ = qe.shape[0]
        hkv_ = ks_ref.shape[2]
        g_ = hq_ // hkv_
        sel = (jax.lax.broadcasted_iota(jnp.int32, (hq_, hkv_), 0) // g_
               == jax.lax.broadcasted_iota(jnp.int32, (hq_, hkv_), 1)
               ).astype(jnp.float32)
        ks_e = jax.lax.dot_general(
            sel, ks_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Hq, MB*BS]
        vs_e = jax.lax.dot_general(
            sel, vs_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * ks_e
    if window:
        invalid = invalid | (pos < jax.lax.max(kv_len - window, 0))
    s = jnp.where(invalid, NEG_INF, s)
    # current token (deferred-write mode) folds as a separate accumulation
    # — concatenating one row onto the [MB*BS, HD] V slab would copy the
    # whole slab and put an unaligned lane on the scores
    s_cur = None
    if has_cur:
        # multiply-reduce instead of an N=1 dot_general (Mosaic rejects the
        # mixed-type broadcast that lowering produces for 1-wide matmuls)
        s_cur = jnp.sum(
            qe.astype(jnp.float32) * curk_ref[0, 0].astype(jnp.float32)[None, :],
            axis=-1, keepdims=True)  # [Hq, 1]
        s_cur = jnp.where(kv_len > 0, s_cur, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    if has_cur:
        m = jnp.maximum(m, s_cur)
    m = jnp.where(m > NEG_INF / 2, m, 0.0)
    p = jnp.exp(s - m)
    p = jnp.where(s > NEG_INF / 2, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if quant:
        # V dequant: fold the per-(token, kv-head) scale into p AFTER the
        # normalizer (softmax weights are scale-free; only the PV product
        # carries the dequantized magnitudes)
        p = p * vs_e
    pv = jax.lax.dot_general(
        p.astype(cdt), mxu(v), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Hq, HD]
    if has_cur:
        p_cur = jnp.exp(s_cur - m)
        p_cur = jnp.where(s_cur > NEG_INF / 2, p_cur, 0.0)
        l = l + p_cur
        pv = pv + p_cur * curv_ref[0, 0].astype(jnp.float32)[None, :]
    out = pv / jnp.maximum(l, 1e-20)
    out = jnp.where(kv_len > 0, out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)

    # prefetch row b+nb into this slot (safe: this row's reads are done); it
    # overlaps the other slots' wait/compute
    @pl.when(b + nb < nrows)
    def _():
        start_row(b + nb)


# whole-row mode is used when the bucketed context fits comfortably in VMEM:
# 2 bufs x 2 (k,v) x MB*BS*HD*2B <= ~8 MiB. Validated on hardware (round 2):
# ~213 us/layer at b=64/768-token bucket vs ~466 us for the chunked kernel.
# RTP_DISABLE_FULLROW=1 falls back to chunked for all contexts.
import os as _os


def fullrow_max_tokens() -> int:
    """Config-aware gate (kernel.disable_fullrow / RTP_DISABLE_FULLROW)."""
    from rtp_llm_tpu.config import runtime_flags

    return 0 if runtime_flags.get("disable_fullrow") else 2048


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_size", "chunk_blocks", "nbuf",
                     "sliding_window", "interpret", "layer"),
)
def paged_decode_attention(
    q: jnp.ndarray,  # [B, Hq, D]
    k_cache: jnp.ndarray,  # [NS, Hkv*D] — or the FULL [L, 2, NS, HD] cache
    v_cache: jnp.ndarray,  # [NS, Hkv*D]    with layer >= 0 (no slab copies)
    block_tables: jnp.ndarray,  # [B, MB] i32
    kv_lens: jnp.ndarray,  # [B] i32
    sm_scale: float,
    block_size: int,
    chunk_blocks: int = CHUNK_BLOCKS,
    nbuf: int = NBUF,
    sliding_window: int = 0,
    cur_k: jnp.ndarray | None = None,  # [B, Hkv*D] current token's K
    cur_v: jnp.ndarray | None = None,  # (deferred-write mode: cache holds
    interpret: bool = False,           #  kv_len-1 tokens)
    layer: int = -1,  # >= 0: k_cache is the whole cache, v_cache unused
    k_scale_e: jnp.ndarray | None = None,  # [B, MB*BS, Hkv] gathered int8-KV
    v_scale_e: jnp.ndarray | None = None,  # scales (see _fullrow_kernel)
    layer_arr: jnp.ndarray | None = None,  # [1] i32 runtime layer index
    # (scan-over-layers: k_cache is the whole cache, layer ignored)
) -> jnp.ndarray:
    b, hq, d = q.shape
    hd = k_cache.shape[-1]
    hkv = hd // d
    kv_dtype = k_cache.dtype
    dyn_layer = layer_arr is not None
    ns_plane = 0
    if dyn_layer:
        # flatten [L, 2, NS, HD] -> [L*2*NS, HD] (free: row-major view) so
        # the kernel's per-issue address math is one scalar add off a
        # pre-multiplied row base instead of a 4-D dynamic index
        ns_plane = k_cache.shape[-2]
        k_cache = k_cache.reshape(-1, hd)
        v_cache = jnp.zeros((1, hd), kv_dtype)  # placeholder operand
    elif layer >= 0:
        # the kernel DMAs from the full cache at a static (layer, plane)
        # offset — passing the big buffer avoids XLA materializing a [NS, HD]
        # slab copy per layer to feed the pallas operand
        v_cache = jnp.zeros((1, hd), kv_dtype)  # placeholder operand
    g = hq // hkv
    bs = block_size
    c = chunk_blocks

    # zero-expand: q_exp[b, h*G+g, :] = q row placed in kv-head h's segment
    q4 = q.reshape(b, hkv, g, d)
    eye = jnp.eye(hkv, dtype=q.dtype)  # [Hkv(source), Hkv(segment)]
    q_exp = jnp.einsum("bkgd,kh->bkghd", q4, eye).reshape(b, hq, hd)

    mb = block_tables.shape[1]
    fullrow = mb * bs <= fullrow_max_tokens()
    has_cur = cur_k is not None
    if not has_cur:
        cur_k = jnp.zeros((b, hd), k_cache.dtype)
        cur_v = jnp.zeros((b, hd), v_cache.dtype)
    # [B, 1, HD]: a (1, 1, hd) block satisfies Mosaic's last-2-dims rule
    cur_k = cur_k[:, None, :]
    cur_v = cur_v[:, None, :]

    quant = k_scale_e is not None
    if quant and not fullrow:
        raise NotImplementedError(
            "int8-KV pallas decode requires the fullrow path "
            "(dispatch gates on this)")
    if fullrow:
        # buffer depth: keep ~<=RTP_FULLROW_VMEM_MB (default 12) MiB of VMEM
        # for row buffers. Measured on v5e (b=64, 768-token bucket): deeper
        # rings are noise at block 64 (2.85 vs 2.89 ms/step nb8 vs nb4) and
        # NEGATIVE at block 32 (3.79 vs 3.60) — the kernel is DMA-issue-rate
        # bound, not depth bound, so 4 buffers is the sweet spot.
        from rtp_llm_tpu.config import runtime_flags as _rtf

        vmem_mb = int(_rtf.get("fullrow_vmem_mb"))
        nbf = max(2, min(8, (vmem_mb << 20) // max(2 * mb * bs * hd * 2, 1)))
        if _rtf.get("fullrow_nb"):
            nbf = int(_rtf.get("fullrow_nb"))
        kernel = functools.partial(
            _fullrow_kernel, bs=bs, mb=mb, sm_scale=sm_scale,
            window=sliding_window, has_cur=has_cur, layer=layer, nb=nbf,
            quant=quant, dyn_layer=dyn_layer, ns=ns_plane,
        )
        scratch = [
            pltpu.VMEM((nbf, mb * bs, hd), kv_dtype),
            pltpu.VMEM((nbf, mb * bs, hd), kv_dtype),
            pltpu.SemaphoreType.DMA((nbf, mb, 2)),
        ]
    else:
        kernel = functools.partial(
            _decode_kernel, bs=bs, c=c, nbuf=nbuf, sm_scale=sm_scale,
            window=sliding_window, has_cur=has_cur, layer=layer,
            dyn_layer=dyn_layer, ns=ns_plane,
        )
        scratch = [
            pltpu.VMEM((nbuf, c * bs, hd), kv_dtype),
            pltpu.VMEM((nbuf, c * bs, hd), kv_dtype),
            pltpu.SemaphoreType.DMA((nbuf, c, 2)),
        ]
    in_specs = [
        pl.BlockSpec((1, hq, hd), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hd), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hd), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if dyn_layer:
        operands = [block_tables, kv_lens, layer_arr.astype(jnp.int32),
                    q_exp, cur_k, cur_v, k_cache, v_cache]
    else:
        operands = [block_tables, kv_lens, q_exp, cur_k, cur_v,
                    k_cache, v_cache]
    if quant:
        hkv_s = k_scale_e.shape[-1]
        in_specs += [
            pl.BlockSpec((1, mb * bs, hkv_s), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb * bs, hkv_s), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [k_scale_e, v_scale_e]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if dyn_layer else 2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hq, hd), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out_full = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, hd), q.dtype),
        interpret=interpret,
    )(*operands)

    # collapse segments: head h*G+g's output lives in segment h
    of = out_full.reshape(b, hkv, g, hkv, d)
    out = jnp.einsum("bkghd,kh->bkgd", of, eye.astype(out_full.dtype))
    return out.reshape(b, hq, d)
