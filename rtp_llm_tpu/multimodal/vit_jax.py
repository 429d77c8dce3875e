"""JAX/TPU Qwen2-VL vision tower.

Replaces the round-1 torch-on-host-CPU tower (vit.py) with a jitted JAX
forward so image encoding runs on the TPU alongside the decoder (reference:
the VIT subsystem deploys scaled-out encoder workers, vit_start_server.py;
here the tower is a jit program sharing the chip).

Architecture (mirrors HF Qwen2VisionTransformerPretrainedModel):
  patch_embed : flattened [C*tps*ps*ps] patches @ W            (conv == matmul)
  rot_pos_emb : 2D rotary over (h, w) patch positions with the
                spatial-merge-aware interleaved ordering
  blocks      : pre-LN bidirectional attention (masked per image) + MLP
  merger      : LN -> [embed * merge^2] -> GELU -> hidden_size
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import List

import numpy as np


class JaxVisionTower:
    """Lazy-loading JAX port of the checkpoint's Qwen2-VL vision tower."""

    def __init__(self, model_path: str, dtype=None):
        self.model_path = model_path
        self._w = None
        self._cfg = None
        self._dtype = dtype
        self._merge = 2
        self._fns = {}

    # ---- loading ----

    def _load(self):
        if self._w is not None:
            return
        import jax.numpy as jnp

        with open(os.path.join(self.model_path, "config.json")) as f:
            vc = json.load(f)["vision_config"]
        self._cfg = dict(
            embed_dim=vc.get("embed_dim", 1280),
            depth=vc.get("depth", 32),
            num_heads=vc.get("num_heads", 16),
            mlp_ratio=vc.get("mlp_ratio", 4),
            in_channels=vc.get("in_channels", 3),
            patch_size=vc.get("patch_size", 14),
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            hidden_size=vc.get("hidden_size", 3584),
            hidden_act=vc.get("hidden_act", "quick_gelu"),
        )
        self._merge = self._cfg["spatial_merge_size"]
        dtype = self._dtype or jnp.float32

        state = {}
        from safetensors import safe_open

        for fname in sorted(os.listdir(self.model_path)):
            if not fname.endswith(".safetensors"):
                continue
            with safe_open(os.path.join(self.model_path, fname),
                           framework="np") as f:
                for name in f.keys():
                    for pref in ("model.visual.", "visual."):
                        if name.startswith(pref):
                            state[name[len(pref):]] = f.get_tensor(name)

        def t(name, transpose=False):
            a = np.asarray(state[name], np.float32)
            if transpose:
                a = a.T
            return jnp.asarray(a, dtype)

        c = self._cfg
        d = c["depth"]
        w = {
            # conv3d kernel [E, C, tps, ps, ps] -> matmul [C*tps*ps*ps, E]
            "patch_proj": jnp.asarray(
                np.asarray(state["patch_embed.proj.weight"], np.float32)
                .reshape(c["embed_dim"], -1).T, dtype),
            "ln_q_w": t("merger.ln_q.weight"),
            "ln_q_b": t("merger.ln_q.bias"),
            "merge_fc1": t("merger.mlp.0.weight", True),
            "merge_fc1_b": t("merger.mlp.0.bias"),
            "merge_fc2": t("merger.mlp.2.weight", True),
            "merge_fc2_b": t("merger.mlp.2.bias"),
        }
        for nm, hf, tr in (
            ("norm1_w", "norm1.weight", False), ("norm1_b", "norm1.bias", False),
            ("norm2_w", "norm2.weight", False), ("norm2_b", "norm2.bias", False),
            ("qkv", "attn.qkv.weight", True), ("qkv_b", "attn.qkv.bias", False),
            ("proj", "attn.proj.weight", True), ("proj_b", "attn.proj.bias", False),
            ("fc1", "mlp.fc1.weight", True), ("fc1_b", "mlp.fc1.bias", False),
            ("fc2", "mlp.fc2.weight", True), ("fc2_b", "mlp.fc2.bias", False),
        ):
            w[nm] = jnp.stack([t(f"blocks.{i}.{hf}", tr) for i in range(d)])
        self._w = w

    # ---- position ids (host, per grid) ----

    def _pos_ids(self, grid_thw) -> np.ndarray:
        """[N, 2] (h, w) patch positions in the merge-interleaved order the
        HF tower uses (rot_pos_emb, modeling_qwen2_vl)."""
        m = self._merge
        out = []
        for t_, h, w in np.asarray(grid_thw):
            hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
            hp = hp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).ravel()
            wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
            wp = wp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).ravel()
            pair = np.stack([hp, wp], axis=-1)
            out.append(np.tile(pair, (int(t_), 1)))
        return np.concatenate(out, axis=0)

    # ---- jitted forward ----

    def _forward_fn(self, n: int):
        if n in self._fns:
            return self._fns[n]
        import jax
        import jax.numpy as jnp

        c = self._cfg
        heads = c["num_heads"]
        hd = c["embed_dim"] // heads
        act = (
            (lambda x: x * jax.nn.sigmoid(1.702 * x))
            if c["hidden_act"] == "quick_gelu"
            else (jax.nn.silu if c["hidden_act"] == "silu"
                  else jax.nn.gelu)
        )

        def ln(x, wt, b, eps=1e-6):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(-1, keepdims=True)
            return ((xf - mu) / jnp.sqrt(var + eps) * wt + b).astype(x.dtype)

        def rotate_half(x):
            a, b = jnp.split(x, 2, axis=-1)
            return jnp.concatenate([-b, a], axis=-1)

        def fwd(w, patches, pos_ids, seg_ids):
            x = patches @ w["patch_proj"]  # [N, E]
            # 2D rotary: freqs dim hd//4 per axis -> [N, hd//2] -> doubled
            inv = 1.0 / (10000.0 ** (
                jnp.arange(0, hd // 2, 2, dtype=jnp.float32) / (hd // 2)))
            fr = pos_ids[:, :, None].astype(jnp.float32) * inv[None, None, :]
            fr = fr.reshape(n, -1)  # [N, hd//2]
            emb = jnp.concatenate([fr, fr], axis=-1)  # [N, hd]
            cos, sin = jnp.cos(emb)[:, None, :], jnp.sin(emb)[:, None, :]
            mask = seg_ids[:, None] == seg_ids[None, :]  # [N, N]

            def block(x, wi):
                h = ln(x, wi["norm1_w"], wi["norm1_b"])
                qkv = (h @ wi["qkv"] + wi["qkv_b"]).reshape(n, 3, heads, hd)
                q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [N, H, D]
                qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
                q = (qf * cos + rotate_half(qf) * sin).astype(x.dtype)
                k = (kf * cos + rotate_half(kf) * sin).astype(x.dtype)
                s = jnp.einsum("nhd,mhd->hnm", q.astype(jnp.float32),
                               k.astype(jnp.float32)) * (hd ** -0.5)
                s = jnp.where(mask[None], s, -jnp.inf)
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("hnm,mhd->nhd", p, v.astype(jnp.float32))
                x = x + (o.reshape(n, -1).astype(x.dtype) @ wi["proj"]
                         + wi["proj_b"])
                h = ln(x, wi["norm2_w"], wi["norm2_b"])
                x = x + (act(h @ wi["fc1"] + wi["fc1_b"]) @ wi["fc2"]
                         + wi["fc2_b"])
                return x

            for i in range(c["depth"]):
                x = block(x, {k_: w[k_][i] for k_ in (
                    "norm1_w", "norm1_b", "norm2_w", "norm2_b", "qkv",
                    "qkv_b", "proj", "proj_b", "fc1", "fc1_b", "fc2",
                    "fc2_b")})

            # merger
            x = ln(x, w["ln_q_w"], w["ln_q_b"])
            x = x.reshape(-1, c["embed_dim"] * self._merge ** 2)
            x = jax.nn.gelu(x @ w["merge_fc1"] + w["merge_fc1_b"],
                            approximate=False)
            return x @ w["merge_fc2"] + w["merge_fc2_b"]  # [N/m^2, hidden]

        import jax

        self._fns[n] = jax.jit(fwd)
        return self._fns[n]

    # ---- public API (same seam as HfVisionTower) ----

    def encode_images(self, pixel_values, grid_thw) -> tuple:
        """pixel_values [N, C*tps*ps*ps]; grid_thw [n_img, 3] (pre-merge).
        Returns (per-image merged embeds [n_i, H], merged grids)."""
        import jax.numpy as jnp

        self._load()
        pv = np.asarray(pixel_values, np.float32)
        n = pv.shape[0]
        pos = self._pos_ids(grid_thw)
        g = np.asarray(grid_thw)
        lens = (g[:, 0] * g[:, 1] * g[:, 2]).astype(np.int64)
        seg = np.repeat(np.arange(len(g)), lens)
        fn = self._forward_fn(n)
        out = np.asarray(fn(
            self._w, jnp.asarray(pv, self._w["patch_proj"].dtype),
            jnp.asarray(pos, jnp.int32), jnp.asarray(seg, jnp.int32),
        ), dtype=np.float32)
        m = self._merge
        grids, embeds, off = [], [], 0
        for t_, h, w in g:
            k = int(t_ * (h // m) * (w // m))
            embeds.append(out[off: off + k])
            grids.append((int(t_), int(h // m), int(w // m)))
            off += k
        return embeds, grids


class Qwen25VisionTower(JaxVisionTower):
    """Qwen2.5-VL windowed vision tower (HF
    Qwen2_5_VisionTransformerPretrainedModel): RMSNorms, gated silu MLP,
    window attention with full-attention blocks at fullatt_block_indexes.
    Window reordering happens on host; the jitted forward takes the
    reordered patches plus per-token window/image segment ids."""

    def _load(self):
        if self._w is not None:
            return
        import jax.numpy as jnp

        with open(os.path.join(self.model_path, "config.json")) as f:
            vc = json.load(f)["vision_config"]
        self._cfg = dict(
            embed_dim=vc.get("hidden_size", 1280),
            depth=vc.get("depth", 32),
            num_heads=vc.get("num_heads", 16),
            intermediate_size=vc.get("intermediate_size", 3420),
            in_channels=vc.get("in_channels", 3),
            patch_size=vc.get("patch_size", 14),
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            hidden_size=vc.get("out_hidden_size", 3584),
            window_size=vc.get("window_size", 112),
            fullatt=tuple(vc.get("fullatt_block_indexes") or (7, 15, 23, 31)),
            hidden_act=vc.get("hidden_act", "silu"),
        )
        self._merge = self._cfg["spatial_merge_size"]
        dtype = self._dtype or jnp.float32

        state = {}
        from safetensors import safe_open

        for fname in sorted(os.listdir(self.model_path)):
            if not fname.endswith(".safetensors"):
                continue
            with safe_open(os.path.join(self.model_path, fname),
                           framework="np") as f:
                for name in f.keys():
                    for pref in ("model.visual.", "visual."):
                        if name.startswith(pref):
                            state[name[len(pref):]] = f.get_tensor(name)

        def t(name, transpose=False):
            a = np.asarray(state[name], np.float32)
            if transpose:
                a = a.T
            return jnp.asarray(a, dtype)

        c = self._cfg
        d = c["depth"]
        w = {
            "patch_proj": jnp.asarray(
                np.asarray(state["patch_embed.proj.weight"], np.float32)
                .reshape(c["embed_dim"], -1).T, dtype),
            "ln_q_w": t("merger.ln_q.weight"),  # RMSNorm (weight only)
            "merge_fc1": t("merger.mlp.0.weight", True),
            "merge_fc1_b": t("merger.mlp.0.bias"),
            "merge_fc2": t("merger.mlp.2.weight", True),
            "merge_fc2_b": t("merger.mlp.2.bias"),
        }
        for nm, hf, tr in (
            ("norm1_w", "norm1.weight", False),
            ("norm2_w", "norm2.weight", False),
            ("qkv", "attn.qkv.weight", True), ("qkv_b", "attn.qkv.bias", False),
            ("proj", "attn.proj.weight", True), ("proj_b", "attn.proj.bias", False),
            ("gate", "mlp.gate_proj.weight", True),
            ("gate_b", "mlp.gate_proj.bias", False),
            ("up", "mlp.up_proj.weight", True),
            ("up_b", "mlp.up_proj.bias", False),
            ("down", "mlp.down_proj.weight", True),
            ("down_b", "mlp.down_proj.bias", False),
        ):
            w[nm] = jnp.stack([t(f"blocks.{i}.{hf}", tr) for i in range(d)])
        self._w = w

    # ---- host-side window planning (HF get_window_index port) ----

    def _window_plan(self, grid_thw):
        """Returns (window_index [G] over merge-groups, win_seg [N] per
        token, img_seg [N] per token in the REORDERED order)."""
        c = self._cfg
        m = self._merge
        unit = m * m
        vit_ws = c["window_size"] // m // c["patch_size"]
        idx_list, seqlens_all, img_of_group = [], [], []
        base = 0
        for gi, (t_, h, w) in enumerate(np.asarray(grid_thw)):
            lh, lw = int(h) // m, int(w) // m
            index = np.arange(int(t_) * lh * lw).reshape(int(t_), lh, lw)
            pad_h = (-lh) % vit_ws
            pad_w = (-lw) % vit_ws
            nh = (lh + pad_h) // vit_ws
            nw = (lw + pad_w) // vit_ws
            padded = np.pad(index, ((0, 0), (0, pad_h), (0, pad_w)),
                            constant_values=-100)
            padded = padded.reshape(int(t_), nh, vit_ws, nw, vit_ws)
            padded = padded.transpose(0, 1, 3, 2, 4).reshape(
                int(t_), nh * nw, vit_ws, vit_ws)
            seqlens = (padded != -100).sum((2, 3)).reshape(-1)
            flat = padded.reshape(-1)
            flat = flat[flat != -100]
            idx_list.append(flat + base)
            seqlens_all.append(seqlens)
            img_of_group.append(np.full(int(t_) * lh * lw, gi))
            base += int(t_) * lh * lw
        window_index = np.concatenate(idx_list)
        seqlens = np.concatenate(seqlens_all)  # groups per window
        seqlens = seqlens[seqlens > 0]
        win_seg = np.repeat(np.arange(len(seqlens)), seqlens * unit)
        img_seg = np.repeat(
            np.concatenate(img_of_group)[window_index], unit)
        return window_index, win_seg, img_seg

    def _forward_fn(self, n: int):
        if n in self._fns:
            return self._fns[n]
        import jax
        import jax.numpy as jnp

        c = self._cfg
        heads = c["num_heads"]
        hd = c["embed_dim"] // heads
        fullatt = set(c["fullatt"])

        def rms(x, wt, eps=1e-6):
            xf = x.astype(jnp.float32)
            return (xf * jax.lax.rsqrt(
                jnp.mean(xf * xf, -1, keepdims=True) + eps)
                * wt).astype(x.dtype)

        def rotate_half(x):
            a, b = jnp.split(x, 2, axis=-1)
            return jnp.concatenate([-b, a], axis=-1)

        def fwd(w, patches, pos_ids, win_seg, img_seg):
            x = patches @ w["patch_proj"]
            inv = 1.0 / (10000.0 ** (
                jnp.arange(0, hd // 2, 2, dtype=jnp.float32) / (hd // 2)))
            fr = pos_ids[:, :, None].astype(jnp.float32) * inv[None, None, :]
            fr = fr.reshape(n, -1)
            emb = jnp.concatenate([fr, fr], axis=-1)
            cos, sin = jnp.cos(emb)[:, None, :], jnp.sin(emb)[:, None, :]
            win_mask = win_seg[:, None] == win_seg[None, :]
            img_mask = img_seg[:, None] == img_seg[None, :]

            def block(x, wi, mask):
                h = rms(x, wi["norm1_w"])
                qkv = (h @ wi["qkv"] + wi["qkv_b"]).reshape(n, 3, heads, hd)
                q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
                qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
                q = (qf * cos + rotate_half(qf) * sin).astype(x.dtype)
                k = (kf * cos + rotate_half(kf) * sin).astype(x.dtype)
                s = jnp.einsum("nhd,mhd->hnm", q.astype(jnp.float32),
                               k.astype(jnp.float32)) * (hd ** -0.5)
                s = jnp.where(mask[None], s, -jnp.inf)
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("hnm,mhd->nhd", p, v.astype(jnp.float32))
                x = x + (o.reshape(n, -1).astype(x.dtype) @ wi["proj"]
                         + wi["proj_b"])
                h = rms(x, wi["norm2_w"])
                g = jax.nn.silu((h @ wi["gate"] + wi["gate_b"]
                                 ).astype(jnp.float32))
                u = (h @ wi["up"] + wi["up_b"]).astype(jnp.float32)
                x = x + ((g * u).astype(x.dtype) @ wi["down"] + wi["down_b"])
                return x

            for i in range(c["depth"]):
                wi = {k_: w[k_][i] for k_ in (
                    "norm1_w", "norm2_w", "qkv", "qkv_b", "proj", "proj_b",
                    "gate", "gate_b", "up", "up_b", "down", "down_b")}
                x = block(x, wi, img_mask if i in fullatt else win_mask)

            x = rms(x, w["ln_q_w"])
            x = x.reshape(-1, c["embed_dim"] * self._merge ** 2)
            x = jax.nn.gelu(x @ w["merge_fc1"] + w["merge_fc1_b"],
                            approximate=False)
            return x @ w["merge_fc2"] + w["merge_fc2_b"]

        import jax

        self._fns[n] = jax.jit(fwd)
        return self._fns[n]

    def encode_images(self, pixel_values, grid_thw) -> tuple:
        import jax.numpy as jnp

        self._load()
        pv = np.asarray(pixel_values, np.float32)
        n = pv.shape[0]
        m = self._merge
        unit = m * m
        pos = self._pos_ids(grid_thw)
        window_index, win_seg, img_seg = self._window_plan(grid_thw)
        # reorder patches + positions at merge-group granularity
        pv_r = pv.reshape(n // unit, unit, -1)[window_index].reshape(n, -1)
        pos_r = pos.reshape(n // unit, unit, 2)[window_index].reshape(n, 2)
        fn = self._forward_fn(n)
        out = np.asarray(fn(
            self._w, jnp.asarray(pv_r, self._w["patch_proj"].dtype),
            jnp.asarray(pos_r, jnp.int32), jnp.asarray(win_seg, jnp.int32),
            jnp.asarray(img_seg, jnp.int32),
        ), dtype=np.float32)
        out = out[np.argsort(window_index)]  # undo window reorder
        g = np.asarray(grid_thw)
        grids, embeds, off = [], [], 0
        for t_, h, w in g:
            k = int(t_ * (h // m) * (w // m))
            embeds.append(out[off: off + k])
            grids.append((int(t_), int(h // m), int(w // m)))
            off += k
        return embeds, grids


class Qwen3VisionTower(JaxVisionTower):
    """Qwen3-VL vision tower (HF Qwen3VLVisionModel): conv3d patch embed
    WITH bias, bilinearly-interpolated learned position embeddings,
    biased-LayerNorm blocks with per-image attention, a patch merger, and
    K deepstack mergers tapping early blocks. encode_images returns
    per-image [n_i, H*(1+K)] rows: main merger output with the deepstack
    features packed channel-wise (consumed by models/qwen2_vl.Qwen3VLModel).
    """

    def _load(self):
        if self._w is not None:
            return
        import jax.numpy as jnp

        with open(os.path.join(self.model_path, "config.json")) as f:
            vc = json.load(f)["vision_config"]
        self._cfg = dict(
            embed_dim=vc.get("hidden_size", 1152),
            depth=vc.get("depth", 27),
            num_heads=vc.get("num_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4304),
            in_channels=vc.get("in_channels", 3),
            patch_size=vc.get("patch_size", 16),
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            hidden_size=vc.get("out_hidden_size", 3584),
            num_pos=vc.get("num_position_embeddings", 2304),
            deepstack=tuple(vc.get("deepstack_visual_indexes") or ()),
            hidden_act=vc.get("hidden_act", "gelu_pytorch_tanh"),
        )
        self._merge = self._cfg["spatial_merge_size"]
        dtype = self._dtype or jnp.float32

        state = {}
        from safetensors import safe_open

        for fname in sorted(os.listdir(self.model_path)):
            if not fname.endswith(".safetensors"):
                continue
            with safe_open(os.path.join(self.model_path, fname),
                           framework="np") as f:
                for name in f.keys():
                    for pref in ("model.visual.", "visual."):
                        if name.startswith(pref):
                            state[name[len(pref):]] = f.get_tensor(name)

        def t(name, transpose=False):
            a = np.asarray(state[name], np.float32)
            if transpose:
                a = a.T
            return jnp.asarray(a, dtype)

        c = self._cfg
        d = c["depth"]
        w = {
            "patch_proj": jnp.asarray(
                np.asarray(state["patch_embed.proj.weight"], np.float32)
                .reshape(c["embed_dim"], -1).T, dtype),
            "patch_bias": t("patch_embed.proj.bias"),
            "pos_embed": t("pos_embed.weight"),
        }
        for mname, pref in [("merger", "merger.")] + [
                (f"ds{i}", f"deepstack_merger_list.{i}.")
                for i in range(len(c["deepstack"]))]:
            w[mname + "_norm_w"] = t(pref + "norm.weight")
            w[mname + "_norm_b"] = t(pref + "norm.bias")
            w[mname + "_fc1"] = t(pref + "linear_fc1.weight", True)
            w[mname + "_fc1_b"] = t(pref + "linear_fc1.bias")
            w[mname + "_fc2"] = t(pref + "linear_fc2.weight", True)
            w[mname + "_fc2_b"] = t(pref + "linear_fc2.bias")
        for nm, hf, tr in (
            ("norm1_w", "norm1.weight", False), ("norm1_b", "norm1.bias", False),
            ("norm2_w", "norm2.weight", False), ("norm2_b", "norm2.bias", False),
            ("qkv", "attn.qkv.weight", True), ("qkv_b", "attn.qkv.bias", False),
            ("proj", "attn.proj.weight", True), ("proj_b", "attn.proj.bias", False),
            ("fc1", "mlp.linear_fc1.weight", True),
            ("fc1_b", "mlp.linear_fc1.bias", False),
            ("fc2", "mlp.linear_fc2.weight", True),
            ("fc2_b", "mlp.linear_fc2.bias", False),
        ):
            w[nm] = jnp.stack([t(f"blocks.{i}.{hf}", tr) for i in range(d)])
        self._w = w

    # ---- host-side learned-pos bilinear interpolation (HF
    # fast_pos_embed_interpolate port, weights gathered on device) ----

    def _pos_interp(self, grid_thw):
        c = self._cfg
        side = int(round(c["num_pos"] ** 0.5))
        m = self._merge
        idxs, wts = [], []
        for t_, h, w_ in np.asarray(grid_thw):
            h_idx = np.linspace(0, side - 1, int(h))
            w_idx = np.linspace(0, side - 1, int(w_))
            hf_, wf_ = h_idx.astype(np.int64), w_idx.astype(np.int64)
            hc = np.clip(hf_ + 1, None, side - 1)
            wc = np.clip(wf_ + 1, None, side - 1)
            dh, dw = h_idx - hf_, w_idx - wf_
            quad_idx = np.stack([
                (hf_[:, None] * side + wf_[None, :]).ravel(),
                (hf_[:, None] * side + wc[None, :]).ravel(),
                (hc[:, None] * side + wf_[None, :]).ravel(),
                (hc[:, None] * side + wc[None, :]).ravel(),
            ])  # [4, h*w]
            quad_w = np.stack([
                ((1 - dh)[:, None] * (1 - dw)[None, :]).ravel(),
                ((1 - dh)[:, None] * dw[None, :]).ravel(),
                (dh[:, None] * (1 - dw)[None, :]).ravel(),
                (dh[:, None] * dw[None, :]).ravel(),
            ])
            # merge-interleaved permutation + temporal repeat
            hh, ww = int(h), int(w_)
            perm = np.arange(hh * ww).reshape(
                hh // m, m, ww // m, m).transpose(0, 2, 1, 3).ravel()
            quad_idx = quad_idx[:, perm]
            quad_w = quad_w[:, perm]
            quad_idx = np.tile(quad_idx, (1, int(t_)))
            quad_w = np.tile(quad_w, (1, int(t_)))
            idxs.append(quad_idx)
            wts.append(quad_w)
        return (np.concatenate(idxs, axis=1),
                np.concatenate(wts, axis=1).astype(np.float32))

    def _forward_fn(self, n: int):
        if n in self._fns:
            return self._fns[n]
        import jax
        import jax.numpy as jnp

        c = self._cfg
        heads = c["num_heads"]
        hd = c["embed_dim"] // heads
        m2 = self._merge ** 2
        act = ((lambda x: jax.nn.gelu(x, approximate=True))
               if "tanh" in c["hidden_act"]
               else (lambda x: jax.nn.gelu(x, approximate=False)))

        def ln(x, wt, b, eps=1e-6):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(-1, keepdims=True)
            return ((xf - mu) / jnp.sqrt(var + eps) * wt + b).astype(x.dtype)

        def rotate_half(x):
            a, b = jnp.split(x, 2, axis=-1)
            return jnp.concatenate([-b, a], axis=-1)

        def merger(w, name, x, post):
            # pre-shuffle norm over [N, E] (main) or post-shuffle over
            # [N/4, E*4] (deepstack)
            if post:
                x = x.reshape(-1, c["embed_dim"] * m2)
                x = ln(x, w[name + "_norm_w"], w[name + "_norm_b"])
            else:
                x = ln(x, w[name + "_norm_w"], w[name + "_norm_b"])
                x = x.reshape(-1, c["embed_dim"] * m2)
            h = act((x @ w[name + "_fc1"] + w[name + "_fc1_b"]
                     ).astype(jnp.float32)).astype(x.dtype)
            return h @ w[name + "_fc2"] + w[name + "_fc2_b"]

        def fwd(w, patches, pos_ids, seg_ids, quad_idx, quad_w):
            x = patches @ w["patch_proj"] + w["patch_bias"]
            pe = jnp.einsum("qn,qnd->nd", quad_w,
                            w["pos_embed"][quad_idx])  # [N, E]
            x = x + pe.astype(x.dtype)
            inv = 1.0 / (10000.0 ** (
                jnp.arange(0, hd // 2, 2, dtype=jnp.float32) / (hd // 2)))
            fr = pos_ids[:, :, None].astype(jnp.float32) * inv[None, None, :]
            fr = fr.reshape(n, -1)
            emb = jnp.concatenate([fr, fr], axis=-1)
            cos, sin = jnp.cos(emb)[:, None, :], jnp.sin(emb)[:, None, :]
            mask = seg_ids[:, None] == seg_ids[None, :]

            outs = []
            for i in range(c["depth"]):
                wi = {k_: w[k_][i] for k_ in (
                    "norm1_w", "norm1_b", "norm2_w", "norm2_b", "qkv",
                    "qkv_b", "proj", "proj_b", "fc1", "fc1_b", "fc2",
                    "fc2_b")}
                h = ln(x, wi["norm1_w"], wi["norm1_b"])
                qkv = (h @ wi["qkv"] + wi["qkv_b"]).reshape(n, 3, heads, hd)
                q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
                qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
                q = (qf * cos + rotate_half(qf) * sin).astype(x.dtype)
                k = (kf * cos + rotate_half(kf) * sin).astype(x.dtype)
                s = jnp.einsum("nhd,mhd->hnm", q.astype(jnp.float32),
                               k.astype(jnp.float32)) * (hd ** -0.5)
                s = jnp.where(mask[None], s, -jnp.inf)
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("hnm,mhd->nhd", p, v.astype(jnp.float32))
                x = x + (o.reshape(n, -1).astype(x.dtype) @ wi["proj"]
                         + wi["proj_b"])
                h = ln(x, wi["norm2_w"], wi["norm2_b"])
                h = act((h @ wi["fc1"] + wi["fc1_b"]).astype(jnp.float32))
                x = x + (h.astype(x.dtype) @ wi["fc2"] + wi["fc2_b"])
                if i in c["deepstack"]:
                    outs.append(merger(
                        w, f"ds{c['deepstack'].index(i)}", x, post=True))

            main = merger(w, "merger", x, post=False)  # [N/m2, H]
            return jnp.concatenate([main] + outs, axis=-1)

        self._fns[n] = jax.jit(fwd)
        return self._fns[n]

    def encode_images(self, pixel_values, grid_thw) -> tuple:
        import jax.numpy as jnp

        self._load()
        pv = np.asarray(pixel_values, np.float32)
        n = pv.shape[0]
        pos = self._pos_ids(grid_thw)
        g = np.asarray(grid_thw)
        lens = (g[:, 0] * g[:, 1] * g[:, 2]).astype(np.int64)
        seg = np.repeat(np.arange(len(g)), lens)
        quad_idx, quad_w = self._pos_interp(grid_thw)
        fn = self._forward_fn(n)
        out = np.asarray(fn(
            self._w, jnp.asarray(pv, self._w["patch_proj"].dtype),
            jnp.asarray(pos, jnp.int32), jnp.asarray(seg, jnp.int32),
            jnp.asarray(quad_idx, jnp.int32), jnp.asarray(quad_w),
        ), dtype=np.float32)
        m = self._merge
        grids, embeds, off = [], [], 0
        for t_, h, w in g:
            k = int(t_ * (h // m) * (w // m))
            embeds.append(out[off: off + k])
            grids.append((int(t_), int(h // m), int(w // m)))
            off += k
        return embeds, grids
