"""JAX/TPU GLM-4V vision tower (EVA2-CLIP + conv downsample + GLU projector).

Reference analog: rtp_llm/multimodal/multimodal_mixins/chatglm4v/
eva2clip_vit.py (torch EVA2CLIPModel). Structure:

  patch conv (+bias) -> [CLS] prepend -> +learned positions ->
  N x { x + input_layernorm(attn(x));  x + post_attention_layernorm(mlp(x)) }
     (NORM-ON-SUBLAYER-OUTPUT — not pre- or post-LN; eva2clip_vit.py:133-140)
  -> drop CLS -> reshape to grid -> 2x2/stride-2 conv downsample to
  llm_hidden -> GLU projector (linear -> LN -> gelu -> silu(gate)*up ->
  down) -> prepend boi / append eoi embeddings -> / scaling_factor.

Every image becomes (grid/2)^2 + 2 tokens of llm hidden size, spliced over
the prompt's image placeholder run (reference: chatglm4v_mixin.py).
Checkpoint names live under ``transformer.vision.``.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from rtp_llm_tpu.multimodal.qwen_vl_jax import _CLIP_MEAN, _CLIP_STD


class Glm4vVisionTower:
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
            hf = json.load(f)
        vc = hf["vision_config"]
        self._cfg = dict(
            image_size=vc.get("image_size", 1120),
            patch_size=vc.get("patch_size", 14),
            hidden_size=vc.get("hidden_size", 1792),
            layers=vc.get("num_hidden_layers", 63),
            heads=vc.get("num_heads", 16),
            intermediate_size=vc.get("intermediate_size", 15360),
            eps=vc.get("layer_norm_eps", 1e-6),
            act=vc.get("hidden_act", "gelu"),
            llm_hidden=hf.get("hidden_size", 4096),
            llm_inter=hf.get("ffn_hidden_size", 13696),
            scaling=vc.get("scaling_factor", 8.0),
        )
        dtype = self._dtype or jnp.float32
        names: dict = {}
        pref = "transformer.vision."

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

    def _encode_fn(self):
        import jax
        import jax.numpy as jnp

        cfg = self._cfg
        w = self._w
        heads = cfg["heads"]
        eps = cfg["eps"]

        def ln(x, name):
            g = w[name + ".weight"].astype(jnp.float32)
            b = w[name + ".bias"].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)

        def lin(x, name):
            y = x @ w[name + ".weight"].T
            b = w.get(name + ".bias")
            return y + b if b is not None else y

        def encode(pixel_values):  # [N, 3, H, W]
            n = pixel_values.shape[0]
            p = cfg["patch_size"]
            d = cfg["hidden_size"]
            g = cfg["image_size"] // p
            pw = w["patch_embedding.proj.weight"]  # [D, 3, p, p]
            x = pixel_values.reshape(n, 3, g, p, g, p)
            x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g * g, 3 * p * p)
            x = x @ pw.reshape(d, -1).T + w["patch_embedding.proj.bias"]
            cls = jnp.broadcast_to(
                w["patch_embedding.cls_embedding"][None], (n, 1, d))
            x = jnp.concatenate([cls, x], axis=1)
            x = x + w["patch_embedding.position_embedding.weight"][None]

            for i in range(cfg["layers"]):
                L = f"transformer.layers.{i}."
                qkv = lin(x, L + "attention.query_key_value")
                q, k, v = jnp.split(qkv, 3, axis=-1)
                t = x.shape[1]
                dh = d // heads
                qh = q.reshape(n, t, heads, dh).astype(jnp.float32)
                kh = k.reshape(n, t, heads, dh).astype(jnp.float32)
                vh = v.reshape(n, t, heads, dh).astype(jnp.float32)
                s = jnp.einsum("nthd,nshd->nhts", qh * dh ** -0.5, kh)
                a = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("nhts,nshd->nthd", a, vh).reshape(n, t, d)
                attn = lin(o.astype(x.dtype), L + "attention.dense")
                # eva2clip: residual + LAYERNORM OF THE SUBLAYER OUTPUT
                x = x + ln(attn, L + "input_layernorm")
                h = jax.nn.gelu(
                    lin(x, L + "mlp.fc1").astype(jnp.float32),
                    approximate=False).astype(x.dtype)
                mlp = lin(h, L + "mlp.fc2")
                x = x + ln(mlp, L + "post_attention_layernorm")

            x = x[:, 1:]  # drop CLS
            # 2x2 stride-2 conv downsample to llm hidden
            cw = w["conv.weight"]  # [out, D, 2, 2]
            out_d = cw.shape[0]
            x = x.reshape(n, g // 2, 2, g // 2, 2, d)
            x = x.transpose(0, 1, 3, 5, 2, 4).reshape(
                n, (g // 2) * (g // 2), d * 4)
            x = x @ cw.transpose(1, 2, 3, 0).reshape(d * 4, out_d)
            x = x + w["conv.bias"]
            # GLU projector (eva2clip_vit.py:161-184)
            x = x @ w["linear_proj.linear_proj.weight"].T
            x = jax.nn.gelu(ln(x, "linear_proj.norm1").astype(jnp.float32),
                            approximate=False).astype(x.dtype)
            gate = jax.nn.silu(
                (x @ w["linear_proj.gate_proj.weight"].T).astype(jnp.float32))
            up = x @ w["linear_proj.dense_h_to_4h.weight"].T
            x = (gate.astype(x.dtype) * up) @ w["linear_proj.dense_4h_to_h.weight"].T
            boi = jnp.broadcast_to(w["boi"], (n, 1, x.shape[-1]))
            eoi = jnp.broadcast_to(w["eoi"], (n, 1, x.shape[-1]))
            x = jnp.concatenate([boi, x, eoi], axis=1)
            return x / cfg["scaling"]

        import jax

        return jax.jit(encode)

    def preprocess(self, pil_images: List) -> np.ndarray:
        s = self._cfg["image_size"]
        out = []
        for im in pil_images:
            im = im.convert("RGB").resize((s, s), 3)  # PIL BICUBIC
            a = np.asarray(im, np.float32) / 255.0
            a = (a - _CLIP_MEAN) / _CLIP_STD
            out.append(a.transpose(2, 0, 1))
        return np.stack(out)

    def encode_images(self, pil_images: List) -> np.ndarray:
        """PIL images -> [N, (grid/2)^2 + 2, llm_hidden]."""
        self._load()
        import jax.numpy as jnp

        pv = self.preprocess(pil_images)
        if self._fn is None:
            self._fn = self._encode_fn()
        return np.asarray(self._fn(
            jnp.asarray(pv, self._dtype or jnp.float32)))

    @property
    def tokens_per_image(self) -> int:
        self._load()
        g = self._cfg["image_size"] // self._cfg["patch_size"]
        return (g // 2) * (g // 2) + 2  # + boi/eoi