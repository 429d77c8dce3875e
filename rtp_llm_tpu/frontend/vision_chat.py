"""Vision chat-message handling for the OpenAI API.

Reference analog: the VIT subsystem + multimodal renderers
(rtp_llm/multimodal/mm_process_engine.py, openai/renderers/qwen_vl_renderer):
OpenAI content parts with ``image_url`` (data: URIs — this environment has no
egress) are decoded, preprocessed with the checkpoint's own HF image
processor, encoded by the JAX vision tower, and spliced into the prompt as
MM inputs for the engine.
"""

from __future__ import annotations

import base64
import io
import logging
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class VisionChatHandler:
    """Owns the image processor + vision tower for one served VL model."""

    def __init__(self, model_path: str, model_config, tokenizer,
                 vit_endpoint: str = ""):
        self.model_path = model_path
        self.cfg = model_config
        self.tok = tokenizer
        # remote VIT worker (reference: VIT role processes,
        # vit_start_server.py); empty = in-process JAX tower
        self.vit_endpoint = vit_endpoint
        self._improc = None
        self._tower = None
        self._mm = None

    def _ensure(self):
        if self._improc is None:
            from transformers import AutoImageProcessor

            self._improc = AutoImageProcessor.from_pretrained(self.model_path)
        if self._tower is None:
            if self.vit_endpoint:
                from rtp_llm_tpu.server.vit_server import RemoteTower

                self._tower = RemoteTower(self.vit_endpoint,
                                          self.cfg.model_type)
            elif self.cfg.model_type == "llava":
                from rtp_llm_tpu.multimodal.clip_jax import ClipVisionTower

                self._tower = ClipVisionTower(self.model_path)
            elif self.cfg.model_type == "qwen2_5_vl":
                from rtp_llm_tpu.multimodal.vit_jax import Qwen25VisionTower

                self._tower = Qwen25VisionTower(self.model_path)
            elif self.cfg.model_type in ("qwen3_vl", "qwen3_vl_moe"):
                from rtp_llm_tpu.multimodal.vit_jax import Qwen3VisionTower

                self._tower = Qwen3VisionTower(self.model_path)
            else:
                from rtp_llm_tpu.multimodal.vit_jax import JaxVisionTower

                self._tower = JaxVisionTower(self.model_path)
        if self._mm is None:
            from rtp_llm_tpu.multimodal.processor import MultimodalProcessor

            self._mm = MultimodalProcessor(self.cfg)

    @staticmethod
    def extract_images(messages: List[dict]) -> Tuple[List[dict], list]:
        """Split image parts out of OpenAI messages; the text content is
        left with one image placeholder marker per image (the chat template
        renders the vision tokens)."""
        images = []
        out = []
        for m in messages:
            content = m.get("content")
            if not isinstance(content, list):
                out.append(m)
                continue
            parts = []
            for part in content:
                if part.get("type") in ("image_url", "image"):
                    url = part.get("image_url", {})
                    if isinstance(url, dict):
                        url = url.get("url", "")
                    images.append(url)
                    parts.append({"type": "image"})
                else:
                    parts.append(part)
            out.append({**m, "content": parts})
        return out, images

    @staticmethod
    def _decode_image(url: str):
        from PIL import Image

        if url.startswith("data:"):
            _, _, b64 = url.partition(",")
            raw = base64.b64decode(b64)
            return Image.open(io.BytesIO(raw)).convert("RGB")
        if url.startswith("file://"):
            return Image.open(url[len("file://"):]).convert("RGB")
        raise ValueError(
            "only data: and file:// image URLs are supported (no egress)")

    def process(self, token_ids: List[int],
                image_urls: List[str]) -> Tuple[List[int], object]:
        """One-shot: decode + preprocess images, expand each image
        placeholder run to its grid's token count, encode through the JAX
        tower, and build the engine MMInputs. Returns (token_ids, mm)."""
        self._ensure()
        pil = [self._decode_image(u) for u in image_urls]
        if self.cfg.model_type == "llava":
            return self._process_llava(pil, token_ids)
        feats = self._improc(images=pil, return_tensors="np")
        pixel_values = np.asarray(feats["pixel_values"], np.float32)
        grid_thw = np.asarray(feats["image_grid_thw"])
        m = getattr(self._improc, "merge_size", 2)
        img_tok = self.cfg.image_token_id

        out: List[int] = []
        gi, i, n = 0, 0, len(token_ids)
        while i < n:
            t = token_ids[i]
            if t == img_tok and gi < len(grid_thw):
                j = i
                while j < n and token_ids[j] == img_tok:
                    j += 1
                tt, h, w = grid_thw[gi]
                out.extend([img_tok] * int(tt * (h // m) * (w // m)))
                gi += 1
                i = j
            else:
                out.append(t)
                i += 1

        embeds, grids = self._tower.encode_images(pixel_values, grid_thw)
        mm = self._mm.prepare(out, embeds, grids)
        return out, mm

    def _process_llava(self, pil, token_ids):
        """llava: each image placeholder expands to a fixed
        tokens_per_image run; flat positions (no MRoPE)."""
        import numpy as np

        feats = self._improc(images=pil, return_tensors="np")
        pixel_values = np.asarray(feats["pixel_values"], np.float32)
        per = self._tower.tokens_per_image
        img_tok = self.cfg.image_token_id
        out = []
        for t in token_ids:
            out.extend([img_tok] * per if t == img_tok else [t])
        embeds = self._tower.encode_images(pixel_values)  # [N, per, H]
        mm = self._mm.prepare_flat(out, list(embeds))
        return out, mm
