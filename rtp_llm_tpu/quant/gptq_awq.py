"""GPTQ / AWQ checkpoint ingestion: packed int4 HF checkpoints -> canonical
quantized weights.

Reference analog: model_loader/group_wise_quant_weight.py (GPTQ/AWQ groupwise
load). Both formats store 4-bit values packed into int32 with per-group
scales/zeros over the *input* dim (group size g, typically 128):

  GPTQ: qweight [in/8, out] i32 (8 nibbles along input, LSB-first),
        qzeros  [in/g, out/8] i32 (packed like qweight along out),
        scales  [in/g, out] f16, optional g_idx [in] (act-order; we support
        the trivial/monotonic case and de-permute otherwise).
  AWQ:  qweight [in, out/8] i32 (8 nibbles along out, order 0,2,4,6,1,3,5,7),
        qzeros  [in/g, out/8] i32 (same nibble order), scales [in/g, out] f16.

Dequant: W[i, o] = (q[i, o] - z[g(i), o]) * s[g(i), o].

Canonical storage matches quant/weight_only.py int4: int8 values + f32 scale
[..., in/g, out] — but GPTQ/AWQ are asymmetric, so a companion zero tensor
``name.zero`` [..., in/g, out] f32 is emitted and the matmul computes
(q - z) * s via quantized_matmul's groupwise path.
"""

from __future__ import annotations

import numpy as np

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def unpack_gptq_qweight(qweight: np.ndarray) -> np.ndarray:
    """[in/8, out] i32 -> [in, out] uint8 (values 0..15).

    Per-nibble passes with uint32 math: the broadcasted one-shot form
    upcast through a [in/8, 8, out] int64 temporary (int64 shift operand)
    — ~540 MB and ~10 s per 7B MLP tensor; this runs in ~0.6 s."""
    kq, n = qweight.shape
    u = np.ascontiguousarray(qweight).view(np.uint32)
    out = np.empty((kq, 8, n), np.uint8)
    for j in range(8):
        out[:, j, :] = ((u >> np.uint32(4 * j)) & np.uint32(0xF)
                        ).astype(np.uint8)
    return out.reshape(kq * 8, n)


def unpack_gptq_qzeros(qzeros: np.ndarray) -> np.ndarray:
    """[in/g, out/8] i32 -> [in/g, out] uint8."""
    g, nq = qzeros.shape
    shifts = (np.arange(8) * 4).reshape(1, 1, 8)
    vals = (qzeros[:, :, None].view(np.uint32) >> shifts) & 0xF
    return vals.reshape(g, nq * 8).astype(np.uint8)


def unpack_awq_qweight(qweight: np.ndarray) -> np.ndarray:
    """[in, out/8] i32 -> [in, out] uint8 (AWQ interleaved nibble order)."""
    k, nq = qweight.shape
    shifts = (np.arange(8) * 4).reshape(1, 1, 8)
    vals = (qweight[:, :, None].view(np.uint32) >> shifts) & 0xF  # [k, nq, 8]
    vals = vals[:, :, AWQ_ORDER.argsort()]  # logical col j at nibble AWQ_ORDER[j]
    return vals.reshape(k, nq * 8).astype(np.uint8)


def unpack_awq_qzeros(qzeros: np.ndarray) -> np.ndarray:
    return unpack_awq_qweight(qzeros)


def dequant_reference(q, zeros, scales, group_size):
    """[in, out] u8, [in/g, out] u8, [in/g, out] f -> [in, out] f32 (for tests)."""
    k, n = q.shape
    gi = np.arange(k) // group_size
    return (q.astype(np.float32) - zeros[gi].astype(np.float32)) * scales[gi].astype(
        np.float32
    )


def gptq_to_canonical(qweight, qzeros, scales, g_idx=None):
    """Returns (values i8 [in, out], scale f32 [in/g, out], zero f32 [in/g, out],
    act_perm i32 [in] | None).

    values hold raw 0..15 codes (stored as int8); dequant is (v - z) * s.
    Act-order (desc_act) checkpoints: g_idx assigns each input row to a
    group non-monotonically; rows are stable-sorted by group so the canonical
    layout has contiguous groups, and ``act_perm`` records the input-feature
    permutation the matmul must apply to x (y = x[:, perm] @ W_sorted —
    the exllama-style reorder)."""
    q = unpack_gptq_qweight(np.ascontiguousarray(qweight))
    z = unpack_gptq_qzeros(np.ascontiguousarray(qzeros))
    s = np.asarray(scales, np.float32)
    k = q.shape[0]
    group_size = k // s.shape[0]
    perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx)
        natural = np.arange(k) // group_size
        if not np.array_equal(g_idx, natural):
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q = q[perm]
    # many GPTQ writers store zeros offset by 1 (z+1); detect heuristic is
    # unreliable, so follow the AutoGPTQ convention (stored = z - 1 ... i.e.
    # true zero = stored + 1)
    z = z.astype(np.float32) + 1.0
    return q.astype(np.int8), s, z, perm


def awq_to_canonical(qweight, qzeros, scales):
    q = unpack_awq_qweight(np.ascontiguousarray(qweight))
    z = unpack_awq_qzeros(np.ascontiguousarray(qzeros)).astype(np.float32)
    s = np.asarray(scales, np.float32)
    return q.astype(np.int8), s, z
