"""Tokenizer construction (reference: frontend/tokenizer_factory/tokenizer_factory.py:11)."""

from __future__ import annotations

from typing import Optional


class TokenizerFactory:
    @staticmethod
    def create(tokenizer_path: str, trust_remote_code: bool = True):
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(
            tokenizer_path, trust_remote_code=trust_remote_code
        )
