"""JAX/TPU Qwen2-Audio tower (Whisper-style encoder + projector).

Reference analog: rtp_llm/models/qwen_v2_audio.py (torch audio tower); here
the encoder is a jitted JAX forward sharing the chip (mirrors vit_jax.py
for vision).

Architecture (mirrors HF Qwen2AudioEncoder):
  conv1 (k3 s1 p1) -> gelu -> conv2 (k3 s2 p1) -> gelu
  + embed_positions -> pre-LN encoder layers (bidirectional)
  -> avg_pool(2) -> layer_norm -> projector linear -> LM hidden
"""

from __future__ import annotations

import json
import os

import numpy as np


class AudioTower:
    """Lazy-loading JAX port of a qwen2_audio checkpoint's audio tower."""

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
        ac = hf["audio_config"]
        self._cfg = dict(
            d_model=ac.get("d_model", 1280),
            layers=ac.get("encoder_layers", 32),
            heads=ac.get("encoder_attention_heads", 20),
            ffn=ac.get("encoder_ffn_dim", 5120),
            mels=ac.get("num_mel_bins", 128),
            max_src=ac.get("max_source_positions", 1500),
        )
        dtype = self._dtype or jnp.float32

        from safetensors import safe_open

        w = {}
        files = [f for f in sorted(os.listdir(self.model_path))
                 if f.endswith(".safetensors")]
        for fn in files:
            with safe_open(os.path.join(self.model_path, fn), "np") as f:
                for k in f.keys():
                    kk = k[len("model."):] if k.startswith("model.") else k
                    if kk.startswith(("audio_tower", "multi_modal_projector")):
                        w[kk] = jnp.asarray(f.get_tensor(k), dtype)
        self._w = w

    def _encode_fn(self):
        if self._fn is not None:
            return self._fn
        import jax
        import jax.numpy as jnp

        cfg = self._cfg
        w = self._w
        A = "audio_tower."
        heads = cfg["heads"]
        d = cfg["d_model"]
        hd = d // heads

        def ln(x, name):
            g = w[name + ".weight"].astype(jnp.float32)
            b = w[name + ".bias"].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.var(xf, -1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(
                x.dtype)

        def lin(x, name):
            y = x @ w[name + ".weight"].T
            b = w.get(name + ".bias")
            return y + b if b is not None else y

        def conv1d(x, name, stride):
            # x [N, C, T]; weight [O, C, 3], pad 1
            k = w[name + ".weight"]
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.float32), k.astype(jnp.float32),
                window_strides=(stride,), padding=((1, 1),),
                dimension_numbers=("NCH", "OIH", "NCH"))
            return y + w[name + ".bias"].astype(jnp.float32)[None, :, None]

        def encode(feats):  # [N, mels, T]
            x = jax.nn.gelu(conv1d(feats, A + "conv1", 1), approximate=False)
            x = jax.nn.gelu(conv1d(x, A + "conv2", 2), approximate=False)
            x = x.transpose(0, 2, 1)  # [N, T', D]
            x = x + w[A + "embed_positions.weight"][None, : x.shape[1]]
            n, t, _ = x.shape
            for i in range(cfg["layers"]):
                L = A + f"layers.{i}."
                res = x
                h = ln(x, L + "self_attn_layer_norm")
                q = lin(h, L + "self_attn.q_proj").reshape(n, t, heads, hd)
                k = lin(h, L + "self_attn.k_proj").reshape(n, t, heads, hd)
                v = lin(h, L + "self_attn.v_proj").reshape(n, t, heads, hd)
                s = jnp.einsum("nthd,nshd->nhts",
                               q.astype(jnp.float32) * hd ** -0.5,
                               k.astype(jnp.float32))
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("nhts,nshd->nthd", p,
                               v.astype(jnp.float32)).astype(x.dtype)
                x = res + lin(o.reshape(n, t, d), L + "self_attn.out_proj")
                res = x
                h = ln(x, L + "final_layer_norm")
                h = jax.nn.gelu(lin(h, L + "fc1").astype(jnp.float32),
                                approximate=False)
                x = res + lin(h.astype(x.dtype), L + "fc2")
            # avg_pool(2) over time, then final layer_norm
            t2 = (t // 2) * 2
            x = x[:, :t2].reshape(n, t2 // 2, 2, d).mean(axis=2)
            x = ln(x, A + "layer_norm")
            return lin(x, "multi_modal_projector.linear")  # [N, T'', H_lm]

        self._fn = jax.jit(encode)
        return self._fn

    def encode_audio(self, input_features) -> np.ndarray:
        """[N, mels, 2*max_src] float mel features -> [N, frames, lm_hidden]."""
        self._load()
        import jax.numpy as jnp

        out = self._encode_fn()(
            jnp.asarray(input_features, self._dtype or jnp.float32))
        return np.asarray(out)

    def output_frames(self, input_len: int) -> int:
        """_get_feat_extract_output_lengths analog."""
        conv_out = (input_len - 1) // 2 + 1
        return (conv_out - 2) // 2 + 1
