"""Kimi K2 / K2.5 chat renderer.

Reference: rtp_llm/openai/renderers/kimik2_renderer.py — beyond the HF chat
template, K2 needs (a) ``<|im_end|>`` as an extra stop word, and (b) tool
call ids normalized to the ``functions.{name}:{index}`` wire format the
template and the model's tool-call section tokens expect
(kimik2_renderer.py:60-145: ids are prefixed with ``functions.`` when bare,
validated against the pattern, and every used id must have a matching tool
response). Output-side tool parsing is handled by the registered
``kimi_k2`` detector (frontend/tool_detectors.py).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

from rtp_llm_tpu.frontend.chat_renderer import (
    ChatRenderer, RenderedPrompt, register_renderer,
)

_ID_PATTERN = re.compile(r"^functions\.[\w.-]+:\d+$")


def _normalize_id(tool_call_id: str) -> str:
    if not tool_call_id.startswith("functions."):
        tool_call_id = f"functions.{tool_call_id}"
    if not _ID_PATTERN.match(tool_call_id):
        raise ValueError(
            f"invalid kimi tool_call id {tool_call_id!r}; expected "
            "'functions.{name}:{index}'")
    return tool_call_id


class KimiK2Renderer(ChatRenderer):
    def render(
        self,
        messages: List[Dict[str, Any]],
        tools: Optional[List[dict]] = None,
        add_generation_prompt: bool = True,
        chat_template_kwargs: Optional[dict] = None,
    ) -> RenderedPrompt:
        used, returned = set(), set()
        fixed = []
        for m in messages:
            m = dict(m)
            if m.get("tool_calls"):
                calls = []
                for tc in m["tool_calls"]:
                    tc = dict(tc)
                    if "id" in tc:
                        tc["id"] = _normalize_id(tc["id"])
                        used.add(tc["id"])
                    calls.append(tc)
                m["tool_calls"] = calls
            if "tool_call_id" in m and m["tool_call_id"] is not None:
                m["tool_call_id"] = _normalize_id(m["tool_call_id"])
                returned.add(m["tool_call_id"])
            fixed.append(m)
        missing = used - returned
        if missing:
            raise ValueError(
                "missing tool responses for: " + ", ".join(sorted(missing)))
        return super().render(fixed, tools, add_generation_prompt,
                              chat_template_kwargs)

    def extra_stop_words(self) -> List[str]:
        return ["<|im_end|>"]


for _mt in ("kimi_k2", "kimi_k25", "kimi_linear"):
    register_renderer(_mt, KimiK2Renderer)
