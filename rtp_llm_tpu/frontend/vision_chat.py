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
        # MM embedding cache (reference: the MM embedding cache keyed by
        # content hashes, cpp/multimodal_processor/ + MMProcessEngine):
        # repeated images skip the vision tower entirely. Byte-capped LRU
        # of per-image (embeds, grid); RTP_MM_CACHE_MB=0 disables.
        import os

        from collections import OrderedDict

        self._embed_cache: OrderedDict = OrderedDict()
        self._embed_cache_bytes = 0
        from rtp_llm_tpu.config import runtime_flags
        self._embed_cache_cap = int(runtime_flags.get("mm_cache_mb")) << 20
        self.mm_cache_hits = 0
        self.mm_cache_misses = 0

    def _cache_get(self, digest: str):
        v = self._embed_cache.get(digest)
        if v is not None:
            self._embed_cache.move_to_end(digest)
            self.mm_cache_hits += 1
        else:
            self.mm_cache_misses += 1
        return v

    def _cache_put(self, digest: str, embeds, grid) -> None:
        if not self._embed_cache_cap or digest in self._embed_cache:
            return
        nb = embeds.nbytes
        if nb > self._embed_cache_cap:
            return
        while (self._embed_cache_bytes + nb > self._embed_cache_cap
               and self._embed_cache):
            _, (old, _) = self._embed_cache.popitem(last=False)
            self._embed_cache_bytes -= old.nbytes
        self._embed_cache[digest] = (embeds, grid)
        self._embed_cache_bytes += nb

    @staticmethod
    def _digest(im) -> str:
        import hashlib

        h = hashlib.sha1(im.tobytes())
        h.update(str(im.size).encode())
        return h.hexdigest()

    def _ensure(self):
        if (self._improc is None
                and self.cfg.model_type not in ("qwen_vl", "chatglm4v",
                                                "deepseek_vl_v2")):
            # qwen_vl / glm-4v ship no HF processor: the tower owns its
            # fixed-size bicubic + CLIP-normalize transform
            from transformers import AutoImageProcessor

            self._improc = AutoImageProcessor.from_pretrained(self.model_path)
        if self._tower is None:
            if self.vit_endpoint:
                from rtp_llm_tpu.server.vit_server import RemoteTower

                self._tower = RemoteTower(self.vit_endpoint,
                                          self.cfg.model_type)
            elif self.cfg.model_type == "qwen_vl":
                from rtp_llm_tpu.multimodal.qwen_vl_jax import (
                    QwenVLVisionTower,
                )

                self._tower = QwenVLVisionTower(self.model_path)
            elif self.cfg.model_type == "chatglm4v":
                from rtp_llm_tpu.multimodal.glm4v_jax import Glm4vVisionTower

                self._tower = Glm4vVisionTower(self.model_path)
            elif self.cfg.model_type == "deepseek_vl_v2":
                from rtp_llm_tpu.multimodal.deepseek_vl2_jax import (
                    DeepseekVL2VisionTower,
                )

                self._tower = DeepseekVL2VisionTower(self.model_path)
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
        if self.cfg.model_type == "deepseek_vl_v2":
            return self._process_deepseek_vl2(pil, token_ids)
        if self.cfg.model_type in ("llava", "qwen_vl", "chatglm4v"):
            # fixed tokens-per-image towers, flat positions (no MRoPE)
            return self._process_llava(pil, token_ids)
        # MM embedding cache: tower-encode only images not seen before
        digests = [self._digest(im) for im in pil]
        hit = {d: self._cache_get(d) for d in set(digests)}
        miss_idx = [k for k, d in enumerate(digests) if hit[d] is None]
        per_img: dict = {}
        if miss_idx:
            feats = self._improc(images=[pil[k] for k in miss_idx],
                                 return_tensors="np")
            pixel_values = np.asarray(feats["pixel_values"], np.float32)
            grid_thw = np.asarray(feats["image_grid_thw"])
            m_embeds, m_grids = self._tower.encode_images(
                pixel_values, grid_thw)
            for k, e, g in zip(miss_idx, m_embeds, m_grids):
                per_img[k] = (np.asarray(e), g)
                self._cache_put(digests[k], np.asarray(e), g)
        for k, d in enumerate(digests):
            if k not in per_img:
                per_img[k] = hit[d]
        embeds = [per_img[k][0] for k in range(len(pil))]
        grids = [per_img[k][1] for k in range(len(pil))]
        m = getattr(self._improc, "merge_size", 2)
        img_tok = self.cfg.image_token_id

        out: List[int] = []
        gi, i, n = 0, 0, len(token_ids)
        while i < n:
            t = token_ids[i]
            if t == img_tok and gi < len(grids):
                j = i
                while j < n and token_ids[j] == img_tok:
                    j += 1
                tt, h, w = grids[gi]  # merged (t, h, w)
                out.extend([img_tok] * int(tt * h * w))
                gi += 1
                i = j
            else:
                out.append(t)
                i += 1

        mm = self._mm.prepare(out, embeds, grids)
        return out, mm

    def _process_deepseek_vl2(self, pil, token_ids):
        """deepseek-vl2: VARIABLE tokens per image (global view + best-fit
        tile grid + newline/separator tokens); each <image> placeholder
        expands to its own image's token count."""
        digests = [self._digest(im) for im in pil]
        hit = {d: self._cache_get(d) for d in set(digests)}
        per_img: dict = {}
        for k, d in enumerate(digests):
            if hit[d] is not None:
                per_img[k] = hit[d][0]
            else:
                e = np.asarray(self._tower.encode_image(pil[k]))
                per_img[k] = e
                self._cache_put(d, e, None)
                hit[d] = (e, None)
        img_tok = self.cfg.image_token_id
        out: list = []
        gi = 0
        for t in token_ids:
            if t == img_tok and gi < len(pil):
                out.extend([img_tok] * per_img[gi].shape[0])
                gi += 1
            else:
                out.append(t)
        mm = self._mm.prepare_flat(out, [per_img[k] for k in range(len(pil))])
        return out, mm

    def _process_llava(self, pil, token_ids):
        """llava: each image placeholder expands to a fixed
        tokens_per_image run; flat positions (no MRoPE)."""
        import numpy as np

        digests = [self._digest(im) for im in pil]
        hit = {d: self._cache_get(d) for d in set(digests)}
        miss_idx = [k for k, d in enumerate(digests) if hit[d] is None]
        per_img: dict = {}
        if miss_idx:
            if self._improc is None:  # qwen_vl: tower-owned transform
                m_embeds = self._tower.encode_images(
                    [pil[k] for k in miss_idx])
            else:
                feats = self._improc(images=[pil[k] for k in miss_idx],
                                     return_tensors="np")
                pixel_values = np.asarray(feats["pixel_values"], np.float32)
                m_embeds = self._tower.encode_images(pixel_values)  # [N,per,H]
            for k, e in zip(miss_idx, m_embeds):
                per_img[k] = (np.asarray(e), None)
                self._cache_put(digests[k], np.asarray(e), None)
        for k, d in enumerate(digests):
            if k not in per_img:
                per_img[k] = hit[d]
        per = self._tower.tokens_per_image
        img_tok = self.cfg.image_token_id
        out = []
        for t in token_ids:
            out.extend([img_tok] * per if t == img_tok else [t])
        mm = self._mm.prepare_flat(
            out, [per_img[k][0] for k in range(len(pil))])
        return out, mm
