"""JAX/TPU CLIP vision tower + llava multi-modal projector.

Reference analog: the llava VIT path (rtp_llm/models/llava.py +
eva2clip_vit.py run the tower in torch); here the tower is a jitted JAX
forward sharing the chip with the decoder, mirroring multimodal/vit_jax.py
for qwen2-vl.

Architecture (mirrors HF CLIPVisionModel):
  embeddings : patch conv (== matmul over flattened patches) + class token
               + learned position embeddings
  pre_layrnorm -> encoder layers (LN -> attn -> +res, LN -> mlp -> +res)
  feature select: hidden_states[vision_feature_layer] minus CLS
  projector  : linear_1 -> gelu -> linear_2  (LlavaMultiModalProjector)
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np


class ClipVisionTower:
    """Lazy-loading JAX port of a llava checkpoint's CLIP tower."""

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
            hidden_size=vc.get("hidden_size", 1024),
            intermediate_size=vc.get("intermediate_size", 4096),
            depth=vc.get("num_hidden_layers", 24),
            num_heads=vc.get("num_attention_heads", 16),
            image_size=vc.get("image_size", 336),
            patch_size=vc.get("patch_size", 14),
            layer_norm_eps=vc.get("layer_norm_eps", 1e-5),
            hidden_act=vc.get("hidden_act", "quick_gelu"),
            feature_layer=hf.get("vision_feature_layer", -2),
            select=hf.get("vision_feature_select_strategy", "default"),
            projector_act=hf.get("projector_hidden_act", "gelu"),
        )
        dtype = self._dtype or jnp.float32

        from safetensors import safe_open

        names: dict = {}
        idx = os.path.join(self.model_path, "model.safetensors.index.json")
        files = []
        if os.path.exists(idx):
            with open(idx) as f:
                wm = json.load(f)["weight_map"]
            files = sorted({v for k, v in wm.items()
                            if k.startswith(("vision_tower", "model.vision_tower",
                                             "multi_modal_projector",
                                             "model.multi_modal_projector"))})
        else:
            files = ["model.safetensors"]
        for fn in files:
            with safe_open(os.path.join(self.model_path, fn), "np") as f:
                for k in f.keys():
                    kk = k[len("model."):] if k.startswith("model.") else k
                    if kk.startswith(("vision_tower", "multi_modal_projector")):
                        names[kk] = jnp.asarray(f.get_tensor(k), dtype)
        self._w = names

    # ---- forward ----

    def _encode_fn(self):
        if self._fn is not None:
            return self._fn
        import jax
        import jax.numpy as jnp

        cfg = self._cfg
        w = self._w
        V = "vision_tower.vision_model."
        heads = cfg["num_heads"]
        eps = cfg["layer_norm_eps"]

        def ln(x, name):
            g = w[name + ".weight"].astype(jnp.float32)
            b = w[name + ".bias"].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)

        act = (lambda v: v * jax.nn.sigmoid(1.702 * v)) \
            if cfg["hidden_act"] == "quick_gelu" else jax.nn.gelu
        pact = (jax.nn.gelu if cfg["projector_act"] == "gelu"
                else jax.nn.silu)

        def lin(x, name):
            y = x @ w[name + ".weight"].T
            b = w.get(name + ".bias")
            return y + b if b is not None else y

        def encode(pixel_values):  # [N, 3, H, W]
            n = pixel_values.shape[0]
            p = cfg["patch_size"]
            d = cfg["hidden_size"]
            # patch conv as matmul over flattened patches
            pw = w[V + "embeddings.patch_embedding.weight"]  # [D, 3, p, p]
            g = cfg["image_size"] // p
            x = pixel_values.reshape(n, 3, g, p, g, p)
            x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g * g, 3 * p * p)
            x = x @ pw.reshape(d, -1).T  # [N, g*g, D]
            cls = jnp.broadcast_to(
                w[V + "embeddings.class_embedding"][None, None, :], (n, 1, d))
            x = jnp.concatenate([cls, x], axis=1)  # [N, 1+g*g, D]
            x = x + w[V + "embeddings.position_embedding.weight"][None]
            x = ln(x, V + "pre_layrnorm")

            hidden: List = [x]
            for i in range(cfg["depth"]):
                L = V + f"encoder.layers.{i}."
                res = x
                h = ln(x, L + "layer_norm1")
                t = h.shape[1]
                q = lin(h, L + "self_attn.q_proj").reshape(n, t, heads, -1)
                k = lin(h, L + "self_attn.k_proj").reshape(n, t, heads, -1)
                v = lin(h, L + "self_attn.v_proj").reshape(n, t, heads, -1)
                scale = q.shape[-1] ** -0.5
                s = jnp.einsum("nthd,nshd->nhts",
                               q.astype(jnp.float32) * scale,
                               k.astype(jnp.float32))
                a = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("nhts,nshd->nthd", a,
                               v.astype(jnp.float32)).astype(x.dtype)
                x = res + lin(o.reshape(n, t, -1), L + "self_attn.out_proj")
                res = x
                h = ln(x, L + "layer_norm2")
                h = act(lin(h, L + "mlp.fc1").astype(jnp.float32))
                x = res + lin(h, L + "mlp.fc2").astype(x.dtype)
                hidden.append(x)

            feat = hidden[cfg["feature_layer"]]
            if cfg["select"] == "default":
                feat = feat[:, 1:]  # drop CLS
            h = pact(lin(feat, "multi_modal_projector.linear_1"
                         ).astype(jnp.float32))
            return lin(h.astype(feat.dtype), "multi_modal_projector.linear_2")

        import jax

        self._fn = jax.jit(encode)
        return self._fn

    def encode_images(self, pixel_values) -> np.ndarray:
        """[N, 3, H, W] float -> [N, tokens_per_image, lm_hidden]."""
        self._load()
        import jax.numpy as jnp

        out = self._encode_fn()(
            jnp.asarray(pixel_values, self._dtype or jnp.float32))
        return np.asarray(out)

    @property
    def tokens_per_image(self) -> int:
        self._load()
        g = self._cfg["image_size"] // self._cfg["patch_size"]
        n = g * g
        return n if self._cfg["select"] == "default" else n + 1
