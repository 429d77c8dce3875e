"""Generated-text post-processors: tool calls + reasoning extraction.

Analog of the reference's renderer-side parsers (rtp_llm/openai/renderers/ —
qwen tool/agent renderers, reasoning_tool_parsing, deepseek/kimi variants):
model output is scanned for the family's structured segments and converted to
OpenAI response fields:

  * qwen/hermes style  : <tool_call>{"name":..., "arguments":...}</tool_call>
  * reasoning ("think"): <think> ... </think>  -> message.reasoning_content
"""

from __future__ import annotations

import dataclasses
import json
import re
import uuid
from typing import List, Optional, Tuple

_TOOL_RE = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)
_THINK_RE = re.compile(r"<think>(.*?)</think>", re.DOTALL)


@dataclasses.dataclass
class ParsedOutput:
    content: str
    reasoning_content: Optional[str] = None
    tool_calls: Optional[List[dict]] = None

    @property
    def finish_reason(self) -> Optional[str]:
        return "tool_calls" if self.tool_calls else None


def parse_reasoning(text: str) -> Tuple[Optional[str], str]:
    """Extract <think> blocks; returns (reasoning, remaining_text).

    Handles the open-ended case (model started thinking, output cut before
    </think>): everything after <think> counts as reasoning."""
    blocks = _THINK_RE.findall(text)
    rest = _THINK_RE.sub("", text)
    open_idx = rest.find("<think>")
    if open_idx != -1:
        blocks.append(rest[open_idx + len("<think>"):])
        rest = rest[:open_idx]
    reasoning = "\n".join(b.strip() for b in blocks if b.strip()) or None
    return reasoning, rest


def parse_tool_calls(text: str) -> Tuple[Optional[List[dict]], str]:
    """Extract qwen/hermes <tool_call> JSON blocks into OpenAI tool_calls."""
    calls = []
    for raw in _TOOL_RE.findall(text):
        try:
            obj = json.loads(raw)
        except json.JSONDecodeError:
            continue
        name = obj.get("name")
        if not name:
            continue
        args = obj.get("arguments", obj.get("parameters", {}))
        calls.append({
            "id": "call_" + uuid.uuid4().hex[:24],
            "type": "function",
            "function": {
                "name": name,
                "arguments": json.dumps(args, ensure_ascii=False)
                if not isinstance(args, str) else args,
            },
        })
    rest = _TOOL_RE.sub("", text).strip()
    return (calls or None), rest


def parse_output(text: str, enable_thinking: bool = True,
                 enable_tools: bool = True) -> ParsedOutput:
    reasoning = None
    if enable_thinking:
        reasoning, text = parse_reasoning(text)
    tool_calls = None
    if enable_tools:
        tool_calls, text = parse_tool_calls(text)
    return ParsedOutput(
        content=text.strip(), reasoning_content=reasoning, tool_calls=tool_calls
    )
