"""Audio chat-message handling for the OpenAI API (qwen2_audio).

Reference analog: the qwen_v2_audio multimodal path. OpenAI ``input_audio``
content parts (base64 WAV — no egress in this environment) are decoded with
the stdlib ``wave`` module, mel-extracted with the checkpoint's own HF
feature extractor (WhisperFeatureExtractor, numpy-only), encoded by the JAX
audio tower, and spliced into the prompt as MM inputs."""

from __future__ import annotations

import base64
import io
import logging
from typing import List, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class AudioChatHandler:
    def __init__(self, model_path: str, model_config):
        self.model_path = model_path
        self.cfg = model_config
        self._fe = None
        self._tower = None
        self._mm = None

    def _ensure(self):
        if self._fe is None:
            from transformers import AutoFeatureExtractor

            self._fe = AutoFeatureExtractor.from_pretrained(self.model_path)
        if self._tower is None:
            from rtp_llm_tpu.multimodal.audio_jax import AudioTower

            self._tower = AudioTower(self.model_path)
        if self._mm is None:
            from rtp_llm_tpu.multimodal.processor import MultimodalProcessor

            self._mm = MultimodalProcessor(self.cfg)

    @staticmethod
    def extract_audio(messages: List[dict]) -> Tuple[List[dict], list]:
        """Split input_audio parts out; leave one audio placeholder marker
        per clip for the chat template."""
        audios, out = [], []
        for m in messages:
            content = m.get("content")
            if not isinstance(content, list):
                out.append(m)
                continue
            parts = []
            for part in content:
                if part.get("type") == "input_audio":
                    audios.append(part.get("input_audio", {}).get("data", ""))
                    parts.append({"type": "audio"})
                else:
                    parts.append(part)
            out.append({**m, "content": parts})
        return out, audios

    @staticmethod
    def _decode_wav(b64: str) -> np.ndarray:
        import wave

        raw = base64.b64decode(b64)
        with wave.open(io.BytesIO(raw)) as w:
            n = w.getnframes()
            width = w.getsampwidth()
            data = w.readframes(n)
        dt = {1: np.int8, 2: np.int16, 4: np.int32}[width]
        x = np.frombuffer(data, dtype=dt).astype(np.float32)
        x /= float(np.iinfo(dt).max)
        return x

    def process(self, token_ids: List[int], audio_b64: List[str]):
        """Expand each audio placeholder run to its frame count, encode
        through the tower, build MMInputs (flat positions)."""
        self._ensure()
        waves = [self._decode_wav(a) for a in audio_b64]
        feats = self._fe(waves, sampling_rate=self._fe.sampling_rate,
                         return_tensors="np", padding="max_length")
        input_features = np.asarray(feats["input_features"], np.float32)
        frames = self._tower.output_frames(input_features.shape[-1])
        tok = self.cfg.image_token_id  # audio_token_index
        out: List[int] = []
        for t in token_ids:
            out.extend([tok] * frames if t == tok else [t])
        embeds = self._tower.encode_audio(input_features)
        mm = self._mm.prepare_flat(out, list(embeds))
        return out, mm
