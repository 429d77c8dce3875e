"""Vision tower backends.

Reference analog: the VIT subsystem (rtp_llm/multimodal/ — vision encoders
run as mixins in-process or as a separate VIT role). Round-1 backend: the
checkpoint's own HF vision tower executed with torch on host CPU — the
embeddings then flow through the TPU decode path via
multimodal/processor.py. A JAX/TPU tower is the planned replacement; this
interface (encode_images -> per-image [n, H] arrays + merged grids) is the
seam.
"""

from __future__ import annotations

from typing import List

import numpy as np


class HfVisionTower:
    """Lazy torch-CPU wrapper over the checkpoint's Qwen2-VL vision tower."""

    def __init__(self, model_path: str):
        self.model_path = model_path
        self._tower = None
        self._merge = 2

    def _load(self):
        if self._tower is not None:
            return
        import torch
        from transformers import AutoConfig

        cfg = AutoConfig.from_pretrained(self.model_path)
        from transformers.models.qwen2_vl.modeling_qwen2_vl import (
            Qwen2VisionTransformerPretrainedModel,
        )

        self._tower = Qwen2VisionTransformerPretrainedModel(cfg.vision_config)
        self._merge = cfg.vision_config.spatial_merge_size
        # load only visual.* weights from the checkpoint
        import os

        from safetensors import safe_open

        state = {}
        files = [f for f in os.listdir(self.model_path)
                 if f.endswith(".safetensors")]
        for fname in files:
            with safe_open(os.path.join(self.model_path, fname),
                           framework="pt") as f:
                for name in f.keys():
                    for pref in ("model.visual.", "visual."):
                        if name.startswith(pref):
                            state[name[len(pref):]] = f.get_tensor(name)
        self._tower.load_state_dict(state)
        self._tower.eval()

    def encode_images(self, pixel_values, grid_thw) -> tuple:
        """pixel_values: stacked patches [N, C*ps*ps*tps]; grid_thw [n_img, 3]
        (pre-merge). Returns (per-image embeds [n_i, H], merged grids)."""
        import torch

        self._load()
        with torch.no_grad():
            out = self._tower(
                torch.as_tensor(pixel_values),
                grid_thw=torch.as_tensor(grid_thw, dtype=torch.long),
            ).float().numpy()
        m = self._merge
        grids, embeds, off = [], [], 0
        for t, h, w in np.asarray(grid_thw):
            n = int(t * (h // m) * (w // m))
            embeds.append(out[off : off + n])
            grids.append((int(t), int(h // m), int(w // m)))
            off += n
        return embeds, grids
