"""JAX/TPU Qwen-VL (v1) vision tower: OpenCLIP ViT-bigG + perceiver resampler.

Reference analog: rtp_llm/multimodal/multimodal_mixins/qwen_vl/qwen_vl_vit.py
(torch VisionTransformer + Resampler, run on host GPU there; here a jitted
JAX forward shares the chip with the decoder like the other towers).

Architecture (checkpoint names under ``transformer.visual.``):
  conv1 (14px patches, no bias) -> +interpolated abs pos (256-entry table,
  bicubic to the actual grid) -> ln_pre -> pre-LN transformer resblocks
  (in_proj fused qkv, gelu mlp) -> Resampler: 256 learned queries with
  16x16 2D-sincos pos cross-attend over kv_proj'd features (+interpolated
  sincos pos on keys) -> ln_post -> @ proj.

Every image becomes exactly 256 tokens of ``output_dim`` — spliced between
``image_start_id``/``image_end_id`` in the prompt (reference:
qwen_vl.py:38-56 special token wiring).
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def sincos_2d(embed_dim: int, grid: int) -> np.ndarray:
    """2D sin-cos table [grid*grid, embed_dim] (reference:
    get_2d_sincos_pos_embed, qwen_vl_vit.py:60-93)."""
    omega = 1.0 / 10000 ** (np.arange(embed_dim // 4, dtype=np.float32)
                            / (embed_dim / 4))
    pos = np.arange(grid, dtype=np.float32)
    out = np.einsum("m,d->md", pos, omega)
    emb1 = np.concatenate([np.sin(out), np.cos(out)], axis=1)  # [g, D/2]
    h = np.repeat(emb1, grid, axis=0)  # rows vary slowly
    w = np.tile(emb1, (grid, 1))
    return np.concatenate([h, w], axis=1)  # [g*g, D]


class QwenVLVisionTower:
    """Lazy-loading JAX port of a qwen-vl checkpoint's visual tower."""

    def __init__(self, model_path: str, dtype=None):
        self.model_path = model_path
        self._w = None
        self._cfg = None
        self._dtype = dtype
        self._fn = None

    def _load(self):
        if self._w is not None:
            return
        import jax.numpy as jnp

        with open(os.path.join(self.model_path, "config.json")) as f:
            vc = json.load(f)["visual"]
        self._cfg = dict(
            image_size=vc.get("image_size", 448),
            patch_size=vc.get("patch_size", 14),
            width=vc.get("width", 1664),
            layers=vc.get("layers", 48),
            heads=vc.get("heads", 16),
            mlp_ratio=vc.get("mlp_ratio", 4.9231),
            output_dim=vc.get("output_dim", 4096),
            n_queries=vc.get("n_queries", 256),
        )
        dtype = self._dtype or jnp.float32
        names: dict = {}
        pref = "transformer.visual."

        from rtp_llm_tpu.loader.loader import _TensorSource

        src = _TensorSource(self.model_path)
        try:
            for k in src.names():
                if k.startswith(pref):
                    names[k[len(pref):]] = jnp.asarray(
                        np.asarray(src.get(k), np.float32), dtype)
        finally:
            src.close()
        self._w = names

    def _encode_fn(self, grid: int):
        import functools

        import jax
        import jax.numpy as jnp

        cfg = self._cfg
        w = self._w
        heads = cfg["heads"]
        width = cfg["width"]
        out_dim = cfg["output_dim"]

        def ln(x, name):
            g = w[name + ".weight"].astype(jnp.float32)
            b = w[name + ".bias"].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(x.dtype)

        def lin(x, name):
            y = x @ w[name + ".weight"].T
            b = w.get(name + ".bias")
            return y + b if b is not None else y

        def mha(q, k, v, n_heads):
            """softmax cross-attention, [N, Tq/Tk, E] inputs."""
            n, tq, e = q.shape
            d = e // n_heads
            qh = q.reshape(n, tq, n_heads, d).astype(jnp.float32)
            kh = k.reshape(n, k.shape[1], n_heads, d).astype(jnp.float32)
            vh = v.reshape(n, v.shape[1], n_heads, d).astype(jnp.float32)
            s = jnp.einsum("nthd,nshd->nhts", qh * d ** -0.5, kh)
            a = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhts,nshd->nthd", a, vh)
            return o.reshape(n, tq, e)

        # abs pos: 256-entry (16x16) table bicubic-resized to the grid
        # (reference get_abs_pos, qwen_vl_vit.py)
        def abs_pos(table, g):
            src = int(round(table.shape[0] ** 0.5))
            if src == g:
                return table
            t = table.reshape(src, src, -1).astype(jnp.float32)
            t = jax.image.resize(t, (g, g, t.shape[-1]), method="cubic")
            return t.reshape(g * g, -1).astype(table.dtype)

        # resampler sincos tables (static)
        qg = int(round(cfg["n_queries"] ** 0.5))
        pos_q = jnp.asarray(sincos_2d(out_dim, qg))  # [256, out]
        pos_k = (pos_q if grid == qg else jnp.asarray(
            np.asarray(jax.image.resize(
                jnp.asarray(sincos_2d(out_dim, qg)).reshape(qg, qg, -1)
                .astype(jnp.float32),
                (grid, grid, out_dim), method="cubic",
            )).reshape(grid * grid, out_dim)))

        def encode(pixel_values):  # [N, 3, H, W]
            n = pixel_values.shape[0]
            p = cfg["patch_size"]
            pw = w["conv1.weight"]  # [width, 3, p, p]
            x = pixel_values.reshape(n, 3, grid, p, grid, p)
            x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, grid * grid,
                                                      3 * p * p)
            x = x @ pw.reshape(width, -1).T  # [N, g*g, width]
            x = x + abs_pos(w["positional_embedding"], grid)[None]
            x = ln(x, "ln_pre")
            for i in range(cfg["layers"]):
                L = f"transformer.resblocks.{i}."
                h = ln(x, L + "ln_1")
                qkv = lin(h, L + "attn.in_proj")
                q, k, v = jnp.split(qkv, 3, axis=-1)
                x = x + lin(mha(q, k, v, heads).astype(x.dtype),
                            L + "attn.out_proj")
                h = ln(x, L + "ln_2")
                h = jax.nn.gelu(lin(h, L + "mlp.c_fc").astype(jnp.float32),
                                approximate=False)
                x = x + lin(h.astype(x.dtype), L + "mlp.c_proj")

            # Resampler (qwen_vl_vit.py:139-158): queries + sincos pos
            # cross-attend over kv_proj'd features + interpolated pos
            kv = x @ w["attn_pool.kv_proj.weight"].T
            kv = ln(kv, "attn_pool.ln_kv")
            q = ln(jnp.broadcast_to(w["attn_pool.query"][None],
                                    (n, cfg["n_queries"], out_dim)),
                   "attn_pool.ln_q")
            wq, wk, wv = jnp.split(w["attn_pool.attn.in_proj_weight"], 3,
                                   axis=0)
            bq, bk, bv = jnp.split(w["attn_pool.attn.in_proj_bias"], 3)
            qi = (q + pos_q[None].astype(q.dtype)) @ wq.T + bq
            ki = (kv + pos_k[None].astype(kv.dtype)) @ wk.T + bk
            vi = kv @ wv.T + bv
            o = mha(qi, ki, vi, max(1, out_dim // 128)).astype(x.dtype)
            o = lin(o, "attn_pool.attn.out_proj")
            o = ln(o, "ln_post")
            return o @ w["proj"]

        import jax

        return jax.jit(encode)

    # ---- host-side image transform (reference ImageTransform: bicubic
    # resize to image_size + CLIP normalization) ----

    def preprocess(self, pil_images: List) -> np.ndarray:
        s = self._cfg["image_size"]
        out = []
        for im in pil_images:
            im = im.convert("RGB").resize((s, s), 3)  # 3 = PIL BICUBIC
            a = np.asarray(im, np.float32) / 255.0
            a = (a - _CLIP_MEAN) / _CLIP_STD
            out.append(a.transpose(2, 0, 1))
        return np.stack(out)

    def encode_images(self, pil_images: List) -> np.ndarray:
        """PIL images -> [N, 256, output_dim]."""
        self._load()
        import jax.numpy as jnp

        pv = self.preprocess(pil_images)
        grid = self._cfg["image_size"] // self._cfg["patch_size"]
        if self._fn is None:
            self._fn = self._encode_fn(grid)
        return np.asarray(self._fn(
            jnp.asarray(pv, self._dtype or jnp.float32)))

    @property
    def tokens_per_image(self) -> int:
        self._load()
        return self._cfg["n_queries"]
