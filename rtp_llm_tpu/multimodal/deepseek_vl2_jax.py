"""JAX/TPU DeepSeek-VL2 vision stack: SigLIP tower + downsample-MLP
projector + tiled global/local token layout.

Reference analog: rtp_llm/multimodal/multimodal_mixins/deepseek_vl2/
(deepseek_vl2_vit.py MlpProjector + timm siglip tower;
deepseek_vl2_mixin.py preprocess_input / embedding tile layout):

  * each image -> one 384px padded GLOBAL view + a best-fit grid of
    384px LOCAL tiles (select_best_resolution over candidate_resolutions);
  * every tile -> SigLIP features (no class token) -> 2x2 downsample
    concat -> 2-layer gelu MLP to the LLM width (14x14 tokens per tile);
  * layout: global rows each get an image_newline token, then a
    view_seperator token, then the local tile grid rearranged to
    (th*14) x (tw*14) with a newline per row (tile_tag "2D",
    global_view_pos "head").

Checkpoint names: ``vision.*`` (timm ViT), ``projector.layers.{0,2}.*``,
top-level ``image_newline`` / ``view_seperator``.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
_STD = np.array([0.5, 0.5, 0.5], np.float32)


def select_best_resolution(image_size, candidates) -> Tuple[int, int]:
    """Best-fit tiling resolution (reference: deepseek_vl2_vit.py:223-252)."""
    ow, oh = image_size
    best, best_eff, best_waste = None, 0, float("inf")
    for w, h in candidates:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (w, h), eff, waste
    return best


def _pad_to(im, size: Tuple[int, int], color):
    """PIL ImageOps.pad: fit-resize then center on a padded canvas."""
    from PIL import Image

    w, h = size
    scale = min(w / im.width, h / im.height)
    nw, nh = max(1, round(im.width * scale)), max(1, round(im.height * scale))
    fitted = im.resize((nw, nh), 3)
    canvas = Image.new("RGB", (w, h), color)
    canvas.paste(fitted, ((w - nw) // 2, (h - nh) // 2))
    return canvas


class DeepseekVL2VisionTower:
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
        vc = hf.get("vision_config", {})
        pc = hf.get("projector_config", {})
        self._cfg = dict(
            image_size=vc.get("image_size", 384),
            patch_size=vc.get("patch_size", 16),
            width=vc.get("width", 1024),
            layers=vc.get("layers", 24),
            heads=vc.get("heads", 16),
            mlp_ratio=vc.get("mlp_ratio", 4),
            n_embed=pc.get("n_embed", 2048),
            proj_ratio=pc.get("mlp_ratio", 1),
            down=pc.get("downsample_ratio", 2),
            candidates=[tuple(c) for c in hf.get(
                "candidate_resolutions", [[384, 384], [384, 768], [768, 384]])],
        )
        dtype = self._dtype or jnp.float32
        names: dict = {}

        from rtp_llm_tpu.loader.loader import _TensorSource

        src = _TensorSource(self.model_path)
        try:
            for k in src.names():
                if k.startswith(("vision.", "projector.")) or k in (
                        "image_newline", "view_seperator"):
                    names[k] = jnp.asarray(np.asarray(src.get(k), np.float32),
                                           dtype)
        finally:
            src.close()
        self._w = names

    def _encode_fn(self):
        import jax
        import jax.numpy as jnp

        cfg = self._cfg
        w = self._w
        heads = cfg["heads"]
        width = cfg["width"]

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

        def encode(pixel_values):  # [N, 3, S, S] (all tiles of one image)
            n = pixel_values.shape[0]
            p = cfg["patch_size"]
            g = cfg["image_size"] // p
            pw = w["vision.patch_embed.proj.weight"]  # [width, 3, p, p]
            x = pixel_values.reshape(n, 3, g, p, g, p)
            x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g * g, 3 * p * p)
            x = x @ pw.reshape(width, -1).T + w["vision.patch_embed.proj.bias"]
            x = x + w["vision.pos_embed"].reshape(1, g * g, width)
            for i in range(cfg["layers"]):
                L = f"vision.blocks.{i}."
                h = ln(x, L + "norm1")
                qkv = lin(h, L + "attn.qkv")
                q, k, v = jnp.split(qkv, 3, axis=-1)
                t = x.shape[1]
                dh = width // heads
                qh = q.reshape(n, t, heads, dh).astype(jnp.float32)
                kh = k.reshape(n, t, heads, dh).astype(jnp.float32)
                vh = v.reshape(n, t, heads, dh).astype(jnp.float32)
                s = jnp.einsum("nthd,nshd->nhts", qh * dh ** -0.5, kh)
                a = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("nhts,nshd->nthd", a, vh).reshape(n, t, width)
                x = x + lin(o.astype(x.dtype), L + "attn.proj")
                h = ln(x, L + "norm2")
                h = jax.nn.gelu(lin(h, L + "mlp.fc1").astype(jnp.float32),
                                approximate=False).astype(x.dtype)
                x = x + lin(h, L + "mlp.fc2")
            x = ln(x, "vision.norm")

            # downsample_mlp_gelu projector (deepseek_vl2_vit.py:173-197):
            # pad the token grid to a multiple of `down`, 2x2 concat, MLP
            d = cfg["down"]
            gp = g + (d - g % d) % d
            xg = jnp.zeros((n, gp, gp, width), x.dtype)
            xg = xg.at[:, :g, :g].set(x.reshape(n, g, g, width))
            xg = xg.reshape(n, gp // d, d, gp // d, d, width)
            xg = xg.transpose(0, 1, 3, 5, 2, 4).reshape(
                n, (gp // d) ** 2, width * d * d)
            h = jax.nn.gelu(lin(xg, "projector.layers.0").astype(jnp.float32),
                            approximate=False)
            return lin(h.astype(x.dtype), "projector.layers.2")

        import jax

        return jax.jit(encode)

    # ---- preprocessing: global view + best-fit local tiles ----

    def preprocess(self, im) -> Tuple[np.ndarray, int, int]:
        """One image -> ([1 + th*tw, 3, S, S] tiles, tw, th)."""
        s = self._cfg["image_size"]
        bw, bh = select_best_resolution(im.size, self._cfg["candidates"])
        color = tuple(int(x * 255) for x in _MEAN)

        def norm(img):
            a = np.asarray(img, np.float32) / 255.0
            return ((a - _MEAN) / _STD).transpose(2, 0, 1)

        tiles = [norm(_pad_to(im, (s, s), color))]
        local = _pad_to(im, (bw, bh), color)
        for i in range(0, bh, s):
            for j in range(0, bw, s):
                tiles.append(norm(local.crop((j, i, j + s, i + s))))
        return np.stack(tiles), bw // s, bh // s

    def encode_image(self, im) -> np.ndarray:
        """One PIL image -> [T, n_embed] with the 2D tile layout
        (global rows + newlines, view separator, local grid + newlines)."""
        self._load()
        import jax.numpy as jnp

        tiles, tw, th = self.preprocess(im.convert("RGB"))
        if self._fn is None:
            self._fn = self._encode_fn()
        emb = np.asarray(self._fn(
            jnp.asarray(tiles, self._dtype or jnp.float32)))  # [1+th*tw,hw,D]
        hw, dim = emb.shape[1], emb.shape[2]
        h = int(round(hw ** 0.5))
        nl = np.asarray(self._w["image_newline"], np.float32)  # [D]
        sep = np.asarray(self._w["view_seperator"], np.float32)

        g = emb[0].reshape(h, h, dim)
        g = np.concatenate([g, np.tile(nl, (h, 1, 1))], axis=1).reshape(-1, dim)
        loc = emb[1:].reshape(th, tw, h, h, dim)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(th * h, tw * h, dim)
        loc = np.concatenate([loc, np.tile(nl, (th * h, 1, 1))],
                             axis=1).reshape(-1, dim)
        return np.concatenate([g, sep[None], loc], axis=0)

    def encode_images(self, pil_images: List) -> List[np.ndarray]:
        return [self.encode_image(im) for im in pil_images]
