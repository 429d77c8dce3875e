"""Dense + MoE decoder-only transformer forward (llama architecture family).

Covers llama 1/2/3, mistral, qwen2 (qkv bias), qwen3 (per-head qk-norm),
qwen2_moe / qwen3_moe / mixtral. TPU-native counterpart of the reference model
descs (rtp_llm/models_py/model_desc/qwen3.py:82, generic_moe.py) — but written
as a pure function over a canonical weight dict with the paged KV cache
threaded through, so the engine can jit/donate/shard it as one program.

Layer structure (pre-norm):
  x -> rms_norm -> attn(paged KV) -> +res -> rms_norm -> mlp/moe -> +res
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.models.batch import ModelInputs, ModelOutputs
from rtp_llm_tpu.ops.attention import paged_attention
from rtp_llm_tpu.ops.kv_cache import token_slots, write_kv, write_kv_quant
from rtp_llm_tpu.ops.norms import layer_norm, layer_norm_nobias, rms_norm
from rtp_llm_tpu.ops.rope import (
    apply_rope, apply_rope_partial_interleaved, compute_rope_freqs,
)
from rtp_llm_tpu.quant.weight_only import quantized_matmul


def alibi_slopes(n_heads: int):
    """Standard ALiBi slope schedule (bloom): powers of 2^(-8/n) for the
    closest power-of-two head count, interpolated for the rest."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return pow2_slopes(n_heads)
    closest = 2 ** int(math.floor(math.log2(n_heads)))
    base = pow2_slopes(closest)
    extra = pow2_slopes(2 * closest)[0::2][: n_heads - closest]
    return base + extra


class LlamaFamilyModel:
    supports_deferred_kv = True  # decode writes batched into one scatter

    """Static model metadata + pure forward.

    The KV cache is one array ``[L, 2, num_blocks * block_size, Hkv * D]``
    (flat-slot rows with heads folded into lanes — see ops/kv_cache.py for
    why this layout); each layer statically slices its slab (XLA fuses the
    slice into the gather / scatter, no copy). Block 0 is the null block for
    padding tokens.
    """

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self._act = {
            "gelu_tanh": lambda v: jax.nn.gelu(v, approximate=True),
            "gelu": lambda v: jax.nn.gelu(v, approximate=False),
        }.get(cfg.hidden_act, jax.nn.silu)
        self.rotary_dim = (
            int(cfg.head_dim * cfg.partial_rotary_factor)
            if cfg.partial_rotary_factor else cfg.head_dim
        )
        self.cos, self.sin = compute_rope_freqs(
            self.rotary_dim,
            cfg.max_position_embeddings,
            cfg.rope_theta,
            cfg.rope_scaling,
        )
        self._norm = (
            layer_norm_nobias if cfg.norm_type == "layernorm_nobias" else rms_norm
        )
        # ALiBi position bias (bloom / baichuan-13b): precomputed slopes
        # replace RoPE entirely
        self.alibi_slopes = None
        if cfg.use_alibi:
            # host numpy on purpose — see compute_rope_freqs docstring
            import numpy as _np
            self.alibi_slopes = _np.asarray(
                alibi_slopes(cfg.num_attention_heads), _np.float32)
        self.sm_scale = (
            cfg.query_pre_attn_scalar ** -0.5 if cfg.query_pre_attn_scalar
            else cfg.head_dim ** -0.5
        )
        # canonical stacks for mixed dense/MoE models (glm4_moe first-K-
        # dense) cover only their own layers; map global layer -> stack pos
        self._moe_pos, self._dense_pos = {}, {}
        for i in range(cfg.num_layers):
            if cfg.is_moe_layer(i):
                self._moe_pos[i] = len(self._moe_pos)
            else:
                self._dense_pos[i] = len(self._dense_pos)
        self.block_size = 16  # set by init_cache
        self.attn_backend = "auto"  # auto | pallas | ref
        self.mesh = None  # set by the engine; enables the shard_map kernel path
        self.moe_capacity_factor = 2.0  # engine sets from ParallelConfig
        self.moe_micro_batches = 1  # engine sets from ParallelConfig
        # zig-zag ring CP prefill (engine sets under parallel.cp_ring): the
        # prefill program permutes token columns into the zig-zag layout and
        # attention runs ring-wise over the cp axis (ops/attention/ring.py)
        self.use_ring_prefill = False
        # EAGLE3 feature capture (engine sets when the draft head is an
        # EAGLE3 checkpoint): layer indices whose outputs concatenate into
        # ``all_hidden`` ([B,T,len*H]) in place of the final hidden —
        # reference: merged_eagle3_hidden, PyWrappedModel.cc:660,746
        self.spec_capture_layers = None
        # mixed global/SWA models (gemma2-style sliding_window_pattern):
        # sliding layers keep KV in a SEPARATE per-slot ring pool sized by
        # the window — the reference's hybrid SWA cache pools (cpp/cache/).
        # cache becomes {"full": [Lf,2,NS,HD], "swa": [Ls,2,NSw,HD]}.
        self.swa_split = bool(cfg.sliding_window
                              and cfg.sliding_window_pattern)
        self._swa_pos, self._full_pos = {}, {}
        if self.swa_split:
            for i in range(cfg.num_layers):
                if self.is_swa_layer(i):
                    self._swa_pos[i] = len(self._swa_pos)
                else:
                    self._full_pos[i] = len(self._full_pos)
        self.swa_nring = 0  # set by init_cache (needs block_size)
        self.max_slots = 0
        # largest prefill chunk the engine will run (engine sets this to its
        # max prefill bucket BEFORE init_cache): a chunk's queries attend
        # back `window` past the chunk start, so the ring must hold
        # window + span live tokens
        self.swa_prefill_span = 128

    def is_swa_layer(self, i: int) -> bool:
        """gemma2 pattern: every Nth layer is global, the rest slide."""
        p = self.cfg.sliding_window_pattern
        return bool(self.cfg.sliding_window) and bool(p) and (i + 1) % p != 0

    # ---- load-time weight fusion ----

    def fuse_weights(self, w: dict) -> dict:
        """Fuse q/k/v -> ``qkv_proj`` and gate/up -> ``gate_up_proj`` at load
        time (reference analog: the fused wqkv / w13 tensors many reference
        checkpoints carry natively, e.g. internlm2 / chatglm). Cuts the
        per-layer GEMM count 7 -> 5: fewer kernel-launch boundaries and
        larger N for the MXU. Measured on v5e (b=64 Qwen2-7B int8 decode):
        part of the round-2 step-time reduction, see docs/PERF_NOTES.md.

        Only applied when exact: weights as x @ W ([L, in, out]), matching
        quant scheme, no GPTQ act-order (per-tensor input perms differ), no
        per-name LoRA on the members. Engine calls this on a single-device
        mesh only — under TP the unfused per-tensor shardings keep GSPMD
        partitioning clean."""
        # only for models running the stock layer AND forward (qwen3_next
        # overrides forward and reads q_proj directly with a gated 2x out)
        if (type(self)._layer is not LlamaFamilyModel._layer
                or type(self).forward is not LlamaFamilyModel.forward):
            return w
        w = dict(w)

        def fuse(names, out_name, bias_names=None, bias_out=None):
            if not all(n in w for n in names):
                return
            for n in names:
                if f"{n}.act_perm" in w or f"{n}.lora_a" in w:
                    return
            parts = [w[n] for n in names]
            if len({p.dtype for p in parts}) != 1 or any(
                p.ndim != parts[0].ndim for p in parts
            ):
                return
            have_scale = [f"{n}.scale" in w for n in names]
            have_zero = [f"{n}.zero" in w for n in names]
            if len(set(have_scale)) != 1 or len(set(have_zero)) != 1:
                return
            if have_scale[0]:
                scales = [w[f"{n}.scale"] for n in names]
                # concat-compatible: per-out-channel [L, out] or groupwise
                # [L, in//g, out] with matching leading dims
                if any(s.shape[:-1] != scales[0].shape[:-1] for s in scales):
                    return
            have_bias = [f"{n}.bias" in w for n in names]
            if len(set(have_bias)) != 1:
                return
            have_fp4 = [f"{n}.fp4" in w for n in names]
            have_int4p = [f"{n}.int4p" in w for n in names]
            have_w4a8 = [f"{n}.w4a8" in w for n in names]
            have_w8a8 = [f"{n}.w8a8" in w for n in names]
            if (len(set(have_fp4)) != 1 or len(set(have_int4p)) != 1
                    or len(set(have_w4a8)) != 1 or len(set(have_w8a8)) != 1):
                return
            for suf in (".smoother", ".shift"):
                if len({f"{n}{suf}" in w for n in names}) != 1:
                    return
                if f"{names[0]}{suf}" in w:
                    import numpy as _np

                    first = _np.asarray(w[f"{names[0]}{suf}"])
                    if any(not _np.array_equal(
                            first, _np.asarray(w[f"{n}{suf}"]))
                            for n in names[1:]):
                        return  # differing per-input vectors: cannot fuse
            w[out_name] = jnp.concatenate(parts, axis=-1)
            if have_fp4[0]:
                w[f"{out_name}.fp4"] = w[f"{names[0]}.fp4"]
            if have_int4p[0]:
                w[f"{out_name}.int4p"] = w[f"{names[0]}.int4p"]
            if have_w4a8[0]:
                w[f"{out_name}.w4a8"] = w[f"{names[0]}.w4a8"]
            if have_w8a8[0]:
                w[f"{out_name}.w8a8"] = w[f"{names[0]}.w8a8"]
            # smoother/shift are per-IN-channel and the fused tensors share
            # one input: q/k/v (and gate/up) carry identical vectors
            for suf in (".smoother", ".shift"):
                if f"{names[0]}{suf}" in w:
                    w[f"{out_name}{suf}"] = w[f"{names[0]}{suf}"]
            if have_scale[0]:
                w[f"{out_name}.scale"] = jnp.concatenate(scales, axis=-1)
            if have_zero[0]:
                w[f"{out_name}.zero"] = jnp.concatenate(
                    [w[f"{n}.zero"] for n in names], axis=-1)
            if have_bias[0]:
                w[f"{out_name}.bias"] = jnp.concatenate(
                    [w[f"{n}.bias"] for n in names], axis=-1)
            if bias_names and all(b in w for b in bias_names):
                w[bias_out] = jnp.concatenate(
                    [w[b] for b in bias_names], axis=-1)
                for b in bias_names:
                    del w[b]
            for n in names:
                for suf in ("", ".scale", ".zero", ".bias", ".fp4", ".int4p",
                            ".w4a8", ".w8a8", ".smoother", ".shift"):
                    w.pop(n + suf, None)

        fuse(("q_proj", "k_proj", "v_proj"), "qkv_proj",
             bias_names=("q_bias", "k_bias", "v_bias"), bias_out="qkv_bias")
        fuse(("gate_proj", "up_proj"), "gate_up_proj")
        return w

    def unfuse_weights(self, w: dict) -> dict:
        """Exact inverse of :meth:`fuse_weights` (pure last-axis splits) —
        used when dynamic LoRA arrives on a fused engine: adapters target
        the per-tensor names, so the fused GEMMs give way."""
        cfg = self.cfg
        hq, hkv, d = (cfg.num_attention_heads, cfg.num_kv_heads,
                      cfg.head_dim)
        w = dict(w)
        if "qkv_proj" in w:
            if "qkv_proj.w4a8" in w:
                mark = w.pop("qkv_proj.w4a8")
                w["q_proj.w4a8"] = w["k_proj.w4a8"] = w["v_proj.w4a8"] = mark
            if "qkv_proj.w8a8" in w:
                mark = w.pop("qkv_proj.w8a8")
                w["q_proj.w8a8"] = w["k_proj.w8a8"] = w["v_proj.w8a8"] = mark
            for suf in (".smoother", ".shift"):  # per-IN: duplicate
                if "qkv_proj" + suf in w:
                    v0 = w.pop("qkv_proj" + suf)
                    w["q_proj" + suf] = w["k_proj" + suf] = \
                        w["v_proj" + suf] = v0
            # split-half nibble packing keeps the out dim un-packed, so
            # out-axis splits need no bound adjustment for fp4/int4p
            for suf in ("", ".scale", ".zero", ".bias"):
                if "qkv_proj" + suf in w:
                    bounds = (hq * d, (hq + hkv) * d)
                    q, k, v = jnp.split(w.pop("qkv_proj" + suf), bounds,
                                        axis=-1)
                    w["q_proj" + suf] = q
                    w["k_proj" + suf] = k
                    w["v_proj" + suf] = v
            for mk in (".fp4", ".int4p"):
                if "qkv_proj" + mk in w:
                    mark = w.pop("qkv_proj" + mk)
                    w["q_proj" + mk] = w["k_proj" + mk] = \
                        w["v_proj" + mk] = mark
        if "qkv_bias" in w:
            q, k, v = jnp.split(w.pop("qkv_bias"),
                                (hq * d, (hq + hkv) * d), axis=-1)
            w["q_bias"], w["k_bias"], w["v_bias"] = q, k, v
        if "gate_up_proj" in w:
            for suf in ("", ".scale", ".zero", ".bias"):
                if "gate_up_proj" + suf in w:
                    g, u = jnp.split(w.pop("gate_up_proj" + suf), 2, axis=-1)
                    w["gate_proj" + suf] = g
                    w["up_proj" + suf] = u
            for mk in (".fp4", ".int4p"):
                if "gate_up_proj" + mk in w:
                    mark = w.pop("gate_up_proj" + mk)
                    w["gate_proj" + mk] = w["up_proj" + mk] = mark
            if "gate_up_proj.w4a8" in w:
                mark = w.pop("gate_up_proj.w4a8")
                w["gate_proj.w4a8"] = w["up_proj.w4a8"] = mark
            if "gate_up_proj.w8a8" in w:
                mark = w.pop("gate_up_proj.w8a8")
                w["gate_proj.w8a8"] = w["up_proj.w8a8"] = mark
            for suf in (".smoother", ".shift"):
                if "gate_up_proj" + suf in w:
                    v0 = w.pop("gate_up_proj" + suf)
                    w["gate_proj" + suf] = w["up_proj" + suf] = v0
        return w

    # ---- cache ----

    def cache_shape(self, num_blocks: int, block_size: int) -> tuple:
        c = self.cfg
        return (c.num_layers, 2, num_blocks * block_size,
                c.num_kv_heads * c.head_dim)

    def _mk_pool(self, shape, dtype):
        if jnp.dtype(dtype) == jnp.int8:
            # int8 KV: quantized rows + per-(slot, kv-head) scales as a cache
            # pytree (reference: int8 KV cache, ConfigModules.h:146-208)
            return {
                "data": jnp.zeros(shape, jnp.int8),
                "scale": jnp.zeros(shape[:-1] + (self.cfg.num_kv_heads,),
                                   jnp.bfloat16),
            }
        return jnp.zeros(shape, dtype)

    def init_cache(
        self, num_blocks: int, block_size: int, dtype=jnp.bfloat16,
        max_slots: int = 0,
    ):
        self.block_size = block_size
        c = self.cfg
        hd = c.num_kv_heads * c.head_dim
        if self.swa_split:
            # SWA layers: per-slot static rings sized by the window (the
            # reference's hybrid SWA pool); full layers: the paged pool.
            # max_slots comes from the engine batch; direct model use
            # (tests, offline forward) defaults to a small slot count
            self.max_slots = max_slots = max_slots or 8
            # ring holds window + largest-prefill-chunk live tokens (+1
            # block so the kept span never collides modulo the ring)
            self.swa_nring = -(-(c.sliding_window + self.swa_prefill_span)
                               // block_size) + 1
            ns_swa = max_slots * self.swa_nring * block_size
            return {
                "full": self._mk_pool(
                    (len(self._full_pos), 2, num_blocks * block_size, hd),
                    dtype),
                "swa": self._mk_pool(
                    (len(self._swa_pos), 2, ns_swa, hd), dtype),
            }
        return self._mk_pool(self.cache_shape(num_blocks, block_size), dtype)

    # ---- forward ----

    def forward(
        self,
        weights: dict,
        cache: jnp.ndarray,
        inputs: ModelInputs,
        need_all_logits: bool = False,
        need_all_hidden: bool = False,
        defer_kv_writes: bool = False,
        need_moe_gating: bool = False,
    ) -> tuple[ModelOutputs, jnp.ndarray]:
        cfg = self.cfg
        b, t = inputs.tokens.shape
        hq, hkv, d = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        x = jnp.take(weights["embed_tokens"], inputs.tokens, axis=0)  # [B,T,H]
        if "embed_norm" in weights:  # bloom: word-embedding layernorm
            x = self._norm_at(weights, "embed_norm", x)
        if inputs.mm_embeds is not None:
            # splice precomputed vision embeddings over placeholder tokens
            # (reference: MultimodalProcessor, cpp/multimodal_processor/).
            # qwen3_vl packs deepstack features as extra channels: the
            # embedding override uses the first H only
            x = jnp.where(inputs.mm_mask[..., None],
                          inputs.mm_embeds[..., : x.shape[-1]].astype(x.dtype),
                          x)
        if cfg.scale_embeddings:  # gemma
            x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
        if "pos_embed" in weights:  # gpt_bigcode/starcoder: learned wpe
            x = x + jnp.take(weights["pos_embed"],
                             jnp.clip(inputs.positions, 0,
                                      weights["pos_embed"].shape[0] - 1),
                             axis=0).astype(x.dtype)

        # per-token validity + flat cache slots, computed once for all layers
        tpos = inputs.positions  # [B,T]
        if self.use_ring_prefill and t > 1:
            # zig-zag CP: columns are permuted, so validity keys on the
            # POSITION value (padded columns carry a 1<<30 sentinel)
            valid = tpos < inputs.kv_lens[:, None]
        else:
            valid = (inputs.q_offsets[:, None]
                     + jnp.arange(t, dtype=jnp.int32)[None, :]
                     ) < inputs.kv_lens[:, None]
        slots = token_slots(
            tpos, inputs.block_tables, self.block_size, valid
        ).reshape(-1)  # [B*T]
        if self.swa_split:
            # SWA layers write to per-slot static rings: ring id = decode
            # slot (state_slots when prefilling, row index when decoding).
            # Only the last (nring-1)*block_size positions are written
            # (covers window + the largest prefill chunk): older tokens are
            # never read again, and the kept span maps to DISTINCT ring
            # slots, so scatters stay duplicate-free.
            bs_, ring = self.block_size, self.swa_nring
            sids = (inputs.state_slots if inputs.state_slots is not None
                    else jnp.arange(b, dtype=jnp.int32))
            mb_ = inputs.block_tables.shape[1]
            table_swa = (sids[:, None] * ring
                         + jnp.arange(mb_, dtype=jnp.int32)[None, :] % ring)
            w_valid = valid & (
                tpos >= inputs.kv_lens[:, None] - (ring - 1) * bs_)
            slots_swa = token_slots(
                tpos, table_swa, bs_, w_valid).reshape(-1)
            slots = (slots, slots_swa, table_swa)

        cap = (tuple(self.spec_capture_layers)
               if (need_all_hidden and self.spec_capture_layers) else None)
        cap_out = {}
        kvw_out = gating_stack = None
        if self._scan_layers_ok(weights, t, cap):
            # scan over layers: one traced/compiled layer body instead of an
            # L-times-unrolled program. The unrolled decode HLO for a 7B
            # model is ~36 MB of stablehlo and costs ~20 s trace + ~13 s
            # lower + ~15 s compile PER bucketed program on a 1-core host
            # (measured round 3); scanning shrinks warmup and serving-time
            # bucket-miss compiles ~10x. Numerically identical (same ops).
            per_layer, global_w = self._split_layer_weights(weights)

            def body(carry, li):
                x, cache = carry
                w_i = dict(global_w)
                # Slice this layer's weights from the closed-over stacks via
                # dynamic_index_in_dim instead of passing them as scan xs:
                # xs become part of the XLA while-loop state and get COPIED
                # into it (measured: the 7B's ~6.5 GB of stacked int8 weights
                # duplicated -> HBM OOM at warmup); loop-invariant operands
                # read by dynamic-slice stay in place.
                for k2, v2 in per_layer.items():
                    if k2 + ".int4p" in weights or k2 + ".fp4" in weights:
                        # packed-s4 stacks stay UNSLICED: the Pallas dequant
                        # kernel indexes the stack in place via __layer_idx
                        # (slicing here copies the whole packed matrix per
                        # layer — see ops/quant_gemm._kernel_matmul). This
                        # must include zero-carrying (GPTQ/AWQ) stacks: a
                        # keepdims slice here plus __layer_idx indexing in
                        # _linear double-indexed out of bounds (round-5 bug,
                        # caught by the AWQ ppl row exploding to 21)
                        w_i[k2] = v2
                        continue
                    w_i[k2] = jax.lax.dynamic_index_in_dim(
                        v2, li, 0, keepdims=True)
                w_i["__layer_idx"] = li
                kw = ([], []) if defer_kv_writes else None
                go = [] if need_moe_gating else None
                x, cache = self._layer(w_i, cache, 0, x, inputs, slots,
                                       kv_writes=kw, gating_out=go,
                                       layer_idx=li)
                ys = (kw[0][0] if kw else None, kw[1][0] if kw else None,
                      go[0] if go else None)
                return (x, cache), ys

            idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
            (x, cache), (kw_k, kw_v, gate_counts) = jax.lax.scan(
                body, (x, cache), idx)
            if defer_kv_writes:
                kvw_out = (kw_k, kw_v)  # [L, B, HD] stacked by the scan
            if need_moe_gating:
                gating_stack = gate_counts
        else:
            kv_writes = ([], []) if defer_kv_writes else None
            gating_out = [] if need_moe_gating else None
            for i in range(cfg.num_layers):
                x, cache = self._layer(weights, cache, i, x, inputs, slots,
                                       kv_writes=kv_writes,
                                       gating_out=gating_out)
                x = self._post_layer_hook(i, x, inputs)
                if cap and i in cap:
                    cap_out[i] = x
            if kv_writes is not None:
                kvw_out = (jnp.stack(kv_writes[0]), jnp.stack(kv_writes[1]))
            if gating_out:
                gating_stack = jnp.stack(gating_out)
        # ordered (possibly repeated, for models shallower than the head's
        # capture count) concat of the captured layer outputs
        aux = [cap_out[c] for c in cap] if cap else []

        x = self._norm_at(weights, "final_norm", x)

        if cfg.tie_word_embeddings:
            lm_head = weights["embed_tokens"].T  # [H, V]
            lm_scale = None
        else:
            lm_head = weights["lm_head"]
            # opt-in per-channel int8 head (QuantConfig.quantize_lm_head):
            # the 152k-vocab head is ~11% of a 7B decode step's bytes
            lm_scale = weights.get("lm_head.scale")

        # logits only at each row's last valid token (reference lm_output_indexes,
        # PyWrappedModel.cc:714-742)
        last = jnp.clip(inputs.kv_lens - inputs.q_offsets - 1, 0, t - 1)  # [B]
        if self.use_ring_prefill and t > 1:
            # zig-zag column order: locate the last token by POSITION value
            last_pos = inputs.kv_lens - 1
            last = jnp.argmax(tpos == last_pos[:, None], axis=1).astype(
                jnp.int32)
        hidden_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]  # [B,H]
        logits = quantized_matmul(hidden_last, lm_head,
                                  lm_scale).astype(jnp.float32)
        if "lm_head.bias" in weights:  # phi-2
            logits = logits + weights["lm_head.bias"].astype(jnp.float32)
        if cfg.logit_scale:
            logits = logits * cfg.logit_scale
        if cfg.final_logit_soft_cap:
            c = cfg.final_logit_soft_cap
            logits = c * jnp.tanh(logits / c)

        all_logits = None
        if need_all_logits:
            all_logits = quantized_matmul(x, lm_head,
                                          lm_scale).astype(jnp.float32)
            if "lm_head.bias" in weights:
                all_logits = all_logits + weights["lm_head.bias"].astype(
                    jnp.float32)
            if cfg.logit_scale:
                all_logits = all_logits * cfg.logit_scale
            if cfg.final_logit_soft_cap:
                c = cfg.final_logit_soft_cap
                all_logits = c * jnp.tanh(all_logits / c)
        return ModelOutputs(
            logits=logits, hidden=hidden_last, all_logits=all_logits,
            all_hidden=(jnp.concatenate(aux, axis=-1) if aux
                        else x if need_all_hidden else None),
            kv_writes=kvw_out,
            moe_gating=gating_stack,
        ), cache

    def _post_layer_hook(self, i, x, inputs):
        """Subclass hook after layer i (qwen3_vl deepstack injection)."""
        return x

    # ---- scan-over-layers (compile-time optimization) ----

    # weight names NOT stacked per layer even when their leading dim happens
    # to equal num_layers (tiny test configs)
    _GLOBAL_WEIGHT_PREFIXES = (
        "embed_tokens", "lm_head", "final_norm", "embed_norm", "pos_embed",
        "type_embed", "pooler",
    )

    def _scan_layers_ok(self, w, t, cap) -> bool:
        """True when the layer stack is uniform enough to lax.scan: every
        layer runs the same program on [L, ...]-stacked weights. Exclusions
        keep the unrolled path for per-layer structure: SWA patterns/pools,
        mixed dense+MoE stacks, spec capture taps, subclass layer overrides
        (MLA/VL hooks), LoRA stacks (indexed per adapter), ring-CP prefill."""
        import os as _os

        cfg = self.cfg
        from rtp_llm_tpu.config import runtime_flags

        if runtime_flags.get("no_scan_layers"):
            return False
        if cfg.num_layers < 2:
            return False
        if self.swa_split or cfg.sliding_window_pattern:
            return False
        if cap:
            return False
        cls = type(self)
        for m in ("_layer", "_post_attention", "_post_layer_hook",
                  "_dense_mlp", "_moe_mlp", "_linear", "_norm_at",
                  "_apply_rope"):
            if getattr(cls, m) is not getattr(LlamaFamilyModel, m):
                return False
        if any(k.endswith((".lora_a", ".lora_b")) for k in w):
            return False
        if any(k.endswith((".act_perm", ".zero")) for k in w):
            # GPTQ/AWQ asymmetric checkpoints: the act-order gather / zero
            # slices inside the scan body trip a TPU runtime kernel fault
            # with the scalar-prefetch stacked kernel (round-5; unrolled
            # runs clean at 9.7k tok/s on the 1.5B) — keep asymmetric
            # checkpoints on the unrolled path until the Mosaic interaction
            # is understood
            return False
        if self.use_ring_prefill and t > 1:
            return False
        flags = {bool(cfg.is_moe_layer(i)) for i in range(cfg.num_layers)}
        return len(flags) == 1

    def _split_layer_weights(self, w):
        """Split the weight dict into per-layer stacks ([L, ...] leading dim,
        become lax.scan xs) and globals (closure constants: embeddings, final
        norm, 0-d quant markers)."""
        L = self.cfg.num_layers
        per, glob = {}, {}
        for k, v in w.items():
            if (hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == L
                    and not k.startswith(self._GLOBAL_WEIGHT_PREFIXES)):
                per[k] = v
            else:
                glob[k] = v
        return per, glob

    def _norm_at(self, w, name, x, i=None):
        """Apply the layer's norm; a ``<name>.bias`` entry selects full
        LayerNorm (starcoder2/bloom/falcon store biased layernorms)."""
        wt = w[name] if i is None else w[name][i]
        b = w.get(name + ".bias")
        if b is not None:
            return layer_norm(x, wt, b if i is None else b[i],
                              self.cfg.rms_norm_eps)
        return self._norm(x, wt, self.cfg.rms_norm_eps)

    # ---- linear helper (bf16 / int8 / int4 weights, see quant/) ----

    @staticmethod
    def _linear(w: dict, name: str, i, x, aids=None):
        s = w.get(name + ".scale")
        z = w.get(name + ".zero")
        P = w.get(name + ".act_perm")
        # GPTQ act-order: weight rows are group-sorted; gather x to match
        xq = x if P is None else jnp.take(x, P[i], axis=-1)
        # SmoothQuant/OmniQuant: calibration multiplied the smoother into
        # the weights; runtime divides it (and subtracts OmniQuant's shift)
        # out of the activations (smooth_quant_weight.py:39)
        sh = w.get(name + ".shift")
        if sh is not None:
            xq = xq - sh[i].astype(xq.dtype)
        sm = w.get(name + ".smoother")
        if sm is not None:
            xq = xq / sm[i].astype(xq.dtype)
        if name + ".fp4" in w and w[name].ndim == 3:
            # packed e2m1: same no-copy stacked-kernel path as int4p below
            from rtp_llm_tpu.quant.weight_only import fp4_matmul

            li = w.get("__layer_idx")
            y = fp4_matmul(xq, w[name], s[i],
                           layer=i if li is None else li)
            W = None
        elif name + ".int4p" in w and w[name].ndim == 3:
            # split-half packed s4: the kernel indexes the FULL per-layer
            # stack in place via a (scalar-prefetched) layer index — a
            # sliced operand would make XLA copy the whole [K/2, N] packed
            # matrix before every pallas call (xprof: slice_bitcast_fusion
            # dominated the int4 decode step). The scan path leaves these
            # stacks unsliced and provides __layer_idx (forward(); the
            # unrolled path uses the static python index). GPTQ/AWQ zeros
            # ride as the rank-1 correction outside the kernel, so the
            # asymmetric path keeps the same no-copy operands.
            from rtp_llm_tpu.ops.quant_gemm import groupwise_matmul_packed

            li = w.get("__layer_idx")
            y = groupwise_matmul_packed(
                xq, w[name], s[i], code="s4",
                zero=None if z is None else z[i],
                layer=i if li is None else li)
            W = None
        else:
            W = w[name][i]
        if W is None:
            pass
        elif name + ".fp4" in w:  # packed e2m1 codes (quant/weight_only.py)
            from rtp_llm_tpu.quant.weight_only import fp4_matmul

            y = fp4_matmul(xq, W, s[i])
        elif name + ".int4p" in w:  # packed s4 w/ GPTQ zero (rare path)
            from rtp_llm_tpu.ops.quant_gemm import groupwise_matmul_packed

            y = groupwise_matmul_packed(
                xq, W, s[i], code="s4",
                zero=None if z is None else z[i])
        elif name + ".w4a8" in w:  # integer-contraction W4A8
            from rtp_llm_tpu.quant.weight_only import w4a8_matmul

            y = w4a8_matmul(xq, W, s[i])
        elif name + ".w8a8" in w:  # integer-contraction W8A8 (SmoothQuant)
            from rtp_llm_tpu.quant.weight_only import w8a8_matmul

            y = w8a8_matmul(xq, W, s[i])
        else:
            y = quantized_matmul(
                xq, W, None if s is None else s[i],
                None if z is None else z[i]
            )
        bb = w.get(name + ".bias")
        if bb is not None:
            y = y + bb[i]
        A = w.get(name + ".lora_a")
        if A is not None and aids is not None:
            # dynamic multi-LoRA: per-row adapter gather (reference: dynamic
            # adapters, lora_manager.py; punica-style batched apply)
            Am = A[aids, i]  # [B, in, r]
            Bm = w[name + ".lora_b"][aids, i]  # [B, r, out]
            xa = jnp.einsum("bth,bhr->btr", x.astype(Am.dtype), Am)
            y = y + jnp.einsum("btr,bro->bto", xa, Bm).astype(y.dtype)
        return y

    @staticmethod
    def _expert_linear(w: dict, name: str, i, x):
        """Batched expert matmul: x [N,H] x W[i] [E,H,I'] -> [E,N,I']."""
        W = w[name][i]
        s = w.get(name + ".scale")
        if s is None:
            return jnp.einsum("nh,ehi->eni", x, W)
        z = w.get(name + ".zero")
        if z is None:
            return jax.vmap(lambda We, se: quantized_matmul(x, We, se))(W, s[i])
        return jax.vmap(
            lambda We, se, ze: quantized_matmul(x, We, se, ze)
        )(W, s[i], z[i])

    def aux_weights(self) -> dict:
        """Host-resident auxiliary tables the engine threads into the weights
        pytree so jitted programs take them as ARGUMENTS instead of
        closed-over constants (no per-program HLO embedding, no device fetch
        at lowering — see compute_rope_freqs docstring)."""
        aux = {"rope_cos": self.cos, "rope_sin": self.sin}
        if self.alibi_slopes is not None:
            aux["alibi_slopes"] = self.alibi_slopes
        return aux

    def _rope_tables(self, w):
        if w is not None and "rope_cos" in w:
            return w["rope_cos"], w["rope_sin"]
        return self.cos, self.sin

    def _apply_rope(self, x, inputs: ModelInputs, w=None):
        cos, sin = self._rope_tables(w)
        if self.rotary_dim != self.cfg.head_dim or self.cfg.rope_gptj_pairs:
            if not self.cfg.rope_partial_interleaved:
                # gpt_neox / phi: first rotary_dim dims rotate half-split
                from rtp_llm_tpu.ops.rope import apply_rope_partial_neox

                return apply_rope_partial_neox(
                    x, inputs.positions, cos, sin, self.rotary_dim)
            return apply_rope_partial_interleaved(
                x, inputs.positions, cos, sin, self.rotary_dim)
        return apply_rope(x, inputs.positions, cos, sin)

    # ---- layer ----

    def _layer(self, w, cache, i, x, inputs: ModelInputs, slots,
               kv_writes=None, gating_out=None, layer_idx=None):
        """One decoder layer. ``i`` indexes the per-layer weight stacks
        (python int). ``layer_idx``: traced i32 layer index used for cache
        addressing under the scan-over-layers path (weights arrive pre-sliced
        with a leading dim of 1 and i == 0)."""
        cfg = self.cfg
        b, t, h = x.shape
        hq, hkv, d = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        # mixed global/SWA pools: pick this layer's pool, group index, table
        # and write slots (the forward packed them into ``slots``)
        tbl = inputs.block_tables
        li = i if layer_idx is None else layer_idx
        sub = cache
        pool_key = None
        if self.swa_split:
            slots_full, slots_swa, table_swa = slots
            if self.is_swa_layer(i):
                pool_key, li = "swa", self._swa_pos[i]
                tbl, slots = table_swa, slots_swa
            else:
                pool_key, li = "full", self._full_pos[i]
                slots = slots_full
            sub = cache[pool_key]
            assert kv_writes is None, "deferred KV writes unsupported with swa_split"

        res = x
        x = self._norm_at(w, "input_norm", x, i)

        aids = inputs.adapter_ids
        if "qkv_proj" in w:
            # load-time fused QKV (fuse_weights): one GEMM, static splits
            qkv = self._linear(w, "qkv_proj", i, x)
            if "qkv_bias" in w:
                qkv = qkv + w["qkv_bias"][i]
            q, k, v = jnp.split(qkv, (hq * d, (hq + hkv) * d), axis=-1)
        else:
            q = self._linear(w, "q_proj", i, x, aids)
            k = self._linear(w, "k_proj", i, x, aids)
            v = self._linear(w, "v_proj", i, x, aids)
            if "q_bias" in w:
                q = q + w["q_bias"][i]
                k = k + w["k_bias"][i]
                v = v + w["v_bias"][i]
        q = q.reshape(b, t, hq, d)
        k = k.reshape(b, t, hkv, d)
        v = v.reshape(b, t, hkv, d)
        if cfg.use_qk_norm:
            q = self._norm(q, w["q_norm"][i], cfg.rms_norm_eps)
            k = self._norm(k, w["k_norm"][i], cfg.rms_norm_eps)
        if self.alibi_slopes is None and not cfg.use_learned_positions:
            q = self._apply_rope(q, inputs, w)
            k = self._apply_rope(k, inputs, w)

        cur_k = cur_v = None
        if kv_writes is not None:
            # deferred decode writes (T=1): the engine scatters every layer's
            # rows in one shot after the forward; attention folds the current
            # token from registers (ops/attention: cur_k/cur_v)
            cur_k = k.reshape(-1, hkv * d).reshape(b, hkv * d)
            cur_v = v.reshape(-1, hkv * d).reshape(b, hkv * d)
            kv_writes[0].append(cur_k)
            kv_writes[1].append(cur_v)
        k_scale = v_scale = None
        full_cache = None
        if kv_writes is not None:
            if isinstance(sub, dict):  # int8 KV, deferred: attention reads
                # the quantized pool (kv_len-1 tokens) + the bf16 current
                # token from registers; the engine quantizes and scatters all
                # layers' rows in one shot after the forward
                k_cache, v_cache = sub["data"][li, 0], sub["data"][li, 1]
                k_scale, v_scale = sub["scale"][li, 0], sub["scale"][li, 1]
                full_cache = sub["data"]
            else:
                k_cache, v_cache = sub[li, 0], sub[li, 1]
                full_cache = sub
        elif isinstance(sub, dict):  # int8 KV with scales
            # direct 3D scatters on the donated buffers — slicing a plane out
            # and writing it back (dynamic-update-slice) materializes full
            # [NS, HD] slab copies, measured 41x slower (round-2 perf notes)
            from rtp_llm_tpu.ops.kv_cache import quantize_kv

            kq, ks, vq, vs = quantize_kv(
                k.reshape(-1, hkv, d), v.reshape(-1, hkv, d))
            data = (sub["data"].at[li, 0, slots].set(kq, mode="drop")
                               .at[li, 1, slots].set(vq, mode="drop"))
            scale = (sub["scale"].at[li, 0, slots].set(ks, mode="drop")
                                 .at[li, 1, slots].set(vs, mode="drop"))
            sub = {"data": data, "scale": scale}
            k_cache, v_cache = data[li, 0], data[li, 1]
            k_scale, v_scale = scale[li, 0], scale[li, 1]
            full_cache = data  # pallas kernel DMAs at a layer offset
        else:
            k2d = k.reshape(-1, hkv * d).astype(sub.dtype)
            v2d = v.reshape(-1, hkv * d).astype(sub.dtype)
            sub = (sub.at[li, 0, slots].set(k2d, mode="drop")
                      .at[li, 1, slots].set(v2d, mode="drop"))
            k_cache, v_cache = sub[li, 0], sub[li, 1]
            full_cache = sub
        cache = {**cache, pool_key: sub} if pool_key else sub

        if self.use_ring_prefill and t > 1:
            # ring CP prefill: self-attention over this (whole, fresh)
            # prompt chunk computed ring-wise over cp; padded columns carry
            # sentinel positions (masked as keys). KV writes above keyed on
            # positions, so the zig-zag column order is cache-layout-safe.
            from rtp_llm_tpu.ops.attention.ring import (
                ring_prefill_attention_pos,
            )

            # padded columns already carry the 1<<30 sentinel position
            attn = ring_prefill_attention_pos(
                q, k, v, inputs.positions, self.mesh, self.sm_scale)
            x = self._linear(w, "o_proj", i, attn.reshape(b, t, hq * d), aids)
            return self._post_attention(w, cache, i, x, res, aids,
                                        gating_out)
        sliding = cfg.sliding_window
        if cfg.sliding_window_pattern:
            # gemma2: every Nth layer is global attention
            if (i + 1) % cfg.sliding_window_pattern == 0:
                sliding = 0
        attn = paged_attention(
            q, k_cache, v_cache,
            tbl, inputs.kv_lens, inputs.q_offsets,
            self.sm_scale,
            block_size=self.block_size,
            sliding_window=sliding,
            soft_cap=cfg.attn_soft_cap,
            backend=self.attn_backend,
            k_scale=k_scale, v_scale=v_scale,
            mesh=self.mesh,
            cur_k=cur_k, cur_v=cur_v,
            alibi_slopes=(w.get("alibi_slopes", self.alibi_slopes)
                          if self.alibi_slopes is not None else None),
            full_cache=full_cache, layer=li,
        )
        x = self._linear(w, "o_proj", i, attn.reshape(b, t, hq * d), aids)
        return self._post_attention(w, cache, i, x, res, aids, gating_out)

    def _post_attention(self, w, cache, i, x, res, aids, gating_out):
        """Residual + MLP tail shared by the paged and ring attention
        paths."""
        cfg = self.cfg
        if cfg.parallel_residual:
            # cohere/falcon/phi: attn and mlp consume the SAME normed input;
            # gpt_neox ("dual"): mlp reads post_attn_norm of the ORIGINAL
            # layer input (x + attn(ln1(x)) + mlp(ln2(x)))
            normed = (self._norm_at(w, "post_attn_norm", res, i)
                      if cfg.parallel_norms == "dual"
                      else self._norm_at(w, "input_norm", res, i))
            mlp = (self._moe_mlp(w, i, normed, gating_out)
                   if cfg.is_moe_layer(i)
                   else self._dense_mlp(w, i, normed, aids))
            return res + x + mlp, cache
        if cfg.sandwich_norms:
            # gemma2: x + post_attn_norm(attn_out); ffn sandwiched likewise
            x = res + rms_norm(x, w["post_attn_norm"][i], cfg.rms_norm_eps)
            res = x
            h = rms_norm(x, w["pre_ffn_norm"][i], cfg.rms_norm_eps)
            h = (self._moe_mlp(w, i, h, gating_out)
                 if cfg.is_moe_layer(i)
                 else self._dense_mlp(w, i, h, aids))
            return res + rms_norm(h, w["post_ffn_norm"][i], cfg.rms_norm_eps), cache
        x = res + x

        res = x
        x = self._norm_at(w, "post_attn_norm", x, i)
        if cfg.is_moe_layer(i):
            x = self._moe_mlp(w, i, x, gating_out)
        else:
            x = self._dense_mlp(w, i, x, aids)
        return res + x, cache

    def _dense_mlp(self, w, i, x, aids=None):
        i = self._dense_pos.get(i, i)
        if "gate_up_proj" in w:
            # load-time fused gate|up (fuse_weights): one GEMM, static split
            gu = self._linear(w, "gate_up_proj", i, x)
            gate, up = jnp.split(gu, 2, axis=-1)
            return self._linear(w, "down_proj", i, self._act(gate) * up, aids)
        if "gate_proj" not in w:
            # no-gate MLP (starcoder2/bloom/falcon): act(fc) -> proj; the fc
            # and proj tensors map onto the up/down canonical names
            up = self._linear(w, "up_proj", i, x, aids)
            return self._linear(w, "down_proj", i, self._act(up), aids)
        gate = self._linear(w, "gate_proj", i, x, aids)
        up = self._linear(w, "up_proj", i, x, aids)
        return self._linear(w, "down_proj", i, self._act(gate) * up, aids)

    def _moe_mlp(self, w, i, x, gating_out=None):
        """Routed-expert MLP. bf16 experts: sort + ragged grouped GEMM
        (ops/moe.py; under a mesh GSPMD partitions it over the expert-sharded
        weights). Quantized experts: capacity dispatch + per-expert quantized
        GEMMs (parallel/ep_moe.py). gating_out: list collecting per-layer
        [E] token counts for EPLB (reference: need_moe_gating)."""
        cfg = self.cfg
        i = self._moe_pos.get(i, i)
        b, t, h = x.shape
        xt = x.reshape(-1, h)  # [N,H]
        router_logits = (xt.astype(jnp.float32)
                         @ w["router"][i].astype(jnp.float32))  # [N,E]
        if cfg.moe_router_score_fn == "sigmoid":
            scores = jax.nn.sigmoid(router_logits)
        else:
            scores = jax.nn.softmax(router_logits, axis=-1)
        topk = cfg.num_experts_per_tok
        # deepseek-v3-style expert CHOICE (glm4_moe shares it): selection by
        # scores + e_score_correction_bias within the topk_group best groups,
        # weights from the RAW scores (models/deepseek.py is the MLA analog)
        choice = scores
        biased = "router_bias" in w
        if biased:
            choice = scores + w["router_bias"][i][None, :].astype(jnp.float32)
        if cfg.moe_n_group > 1 and 0 < cfg.moe_topk_group < cfg.moe_n_group:
            n = choice.shape[0]
            g = cfg.moe_n_group
            per = choice.shape[-1] // g
            grp = choice.reshape(n, g, per)
            top2 = jax.lax.top_k(grp, min(2, per))[0].sum(axis=-1)  # [n,g]
            _, gidx = jax.lax.top_k(top2, cfg.moe_topk_group)
            gmask = jnp.zeros((n, g), bool).at[
                jnp.arange(n)[:, None], gidx
            ].set(True)
            choice = jnp.where(jnp.repeat(gmask, per, axis=1), choice, 0.0)
            biased = True
        top_choice, top_idx = jax.lax.top_k(choice, topk)  # [N,k]
        top_vals = (jnp.take_along_axis(scores, top_idx, axis=-1)
                    if biased else top_choice)
        if cfg.moe_norm_topk_prob:
            top_vals = top_vals / jnp.maximum(
                jnp.sum(top_vals, axis=-1, keepdims=True), 1e-20
            )
        if cfg.moe_routed_scaling_factor != 1.0:
            top_vals = top_vals * cfg.moe_routed_scaling_factor

        if gating_out is not None:
            # LOGICAL loads (pre-replica-remap): the EPLB balancer plans over
            # logical experts
            e = (w["eplb_log2phy"].shape[1] if "eplb_log2phy" in w
                 else w["moe_gate"].shape[1])
            gating_out.append(jnp.sum(
                top_idx.reshape(-1)[:, None] == jnp.arange(e)[None, :],
                axis=0,
            ).astype(jnp.int32))

        if "eplb_log2phy" in w:
            # redundant-expert remap (parallel/eplb.py tier 2): logical
            # expert id -> one of its physical replicas, token-index
            # round-robin so a hot expert's load spreads evenly. Mapping
            # arrays are weights-pytree arguments: rebalances never retrace.
            l2p = w["eplb_log2phy"][i]  # [E, max_rep]
            cnt = w["eplb_rep_count"][i]  # [E]
            rr = (jnp.arange(top_idx.shape[0], dtype=jnp.int32)[:, None]
                  % cnt[top_idx])
            top_idx = jnp.take_along_axis(
                l2p[top_idx], rr[..., None].astype(jnp.int32), axis=-1
            )[..., 0]

        def experts(xp, idxp, valp):
            if "moe_gate.scale" not in w:
                from rtp_llm_tpu.ops.moe import fused_moe

                return fused_moe(
                    xp, idxp, valp,
                    w["moe_gate"][i], w["moe_up"][i], w["moe_down"][i],
                )
            # quantized experts: capacity dispatch + per-expert quantized
            # GEMMs (parallel/ep_moe.py) — each expert computes only its
            # assigned tokens, weights stay int8/int4 in HBM; under a mesh
            # the experts are tp-sharded and combine is one psum (kills the
            # round-1 dense all-expert fallback)
            from rtp_llm_tpu.parallel.ep_moe import ep_moe

            scales = {"gate": w["moe_gate.scale"][i],
                      "up": w["moe_up.scale"][i],
                      "down": w["moe_down.scale"][i]}
            zeros_d = None
            if "moe_gate.zero" in w:
                zeros_d = {"gate": w["moe_gate.zero"][i],
                           "up": w["moe_up.zero"][i],
                           "down": w["moe_down.zero"][i]}
            o, _ = ep_moe(
                xp, idxp, valp,
                w["moe_gate"][i], w["moe_up"][i], w["moe_down"][i],
                mesh=self.mesh, scales=scales, zeros=zeros_d,
                capacity_factor=self.moe_capacity_factor,
            )
            return o

        mb = self.moe_micro_batches
        n_tok = xt.shape[0]
        if mb > 1 and n_tok % mb == 0 and n_tok >= 2 * mb:
            # layer micro-batching (reference: PyWrappedModel.cc:347-433):
            # the halves are data-independent, so XLA's latency-hiding
            # scheduler can overlap one half's dispatch/combine collectives
            # with the other half's expert GEMMs
            outs = [
                experts(xp, ip, vp) for xp, ip, vp in zip(
                    jnp.split(xt, mb), jnp.split(top_idx, mb),
                    jnp.split(top_vals, mb))
            ]
            out = jnp.concatenate(outs, axis=0)
        else:
            out = experts(xt, top_idx, top_vals)

        if "shared_gate" in w:
            sg = self._linear(w, "shared_gate", i, xt)
            su = self._linear(w, "shared_up", i, xt)
            shared = self._linear(w, "shared_down", i, jax.nn.silu(sg) * su)
            if "shared_expert_gate" in w:
                g = jax.nn.sigmoid(xt.astype(jnp.float32) @ w["shared_expert_gate"][i])
                shared = shared * g.astype(shared.dtype)
            out = out + shared.astype(jnp.float32)
        return out.astype(x.dtype).reshape(b, t, h)
