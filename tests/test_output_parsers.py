"""Tool-call + reasoning parsing tests (reference analog:
rtp_llm/test frontend renderer/tool parsing suites)."""

import json

from rtp_llm_tpu.frontend.output_parsers import (
    parse_output,
    parse_reasoning,
    parse_tool_calls,
)


class TestReasoning:
    def test_extracts_think_block(self):
        r, rest = parse_reasoning("<think>step 1\nstep 2</think>The answer is 4.")
        assert r == "step 1\nstep 2"
        assert rest == "The answer is 4."

    def test_unclosed_think(self):
        r, rest = parse_reasoning("prefix<think>still going")
        assert r == "still going"
        assert rest == "prefix"

    def test_no_think(self):
        r, rest = parse_reasoning("plain answer")
        assert r is None and rest == "plain answer"

    def test_multiple_blocks(self):
        r, rest = parse_reasoning("<think>a</think>mid<think>b</think>end")
        assert r == "a\nb"
        assert rest == "midend"


class TestToolCalls:
    def test_single_call(self):
        text = ('I will check the weather.\n<tool_call>\n'
                '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
                '</tool_call>')
        calls, rest = parse_tool_calls(text)
        assert len(calls) == 1
        fc = calls[0]["function"]
        assert fc["name"] == "get_weather"
        assert json.loads(fc["arguments"]) == {"city": "Paris"}
        assert rest == "I will check the weather."

    def test_multiple_calls(self):
        text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
                '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
        calls, rest = parse_tool_calls(text)
        assert [c["function"]["name"] for c in calls] == ["a", "b"]
        assert rest == ""

    def test_malformed_json_skipped(self):
        calls, rest = parse_tool_calls("<tool_call>not json</tool_call>ok")
        assert calls is None
        assert rest == "ok"

    def test_no_calls(self):
        calls, rest = parse_tool_calls("hello")
        assert calls is None and rest == "hello"


def test_parse_output_combined():
    text = ('<think>user wants weather</think>Checking.'
            '<tool_call>{"name": "w", "arguments": {}}</tool_call>')
    out = parse_output(text)
    assert out.reasoning_content == "user wants weather"
    assert out.content == "Checking."
    assert out.tool_calls[0]["function"]["name"] == "w"
    assert out.finish_reason == "tool_calls"


def test_streaming_parser_split_invariance():
    """The streaming parser must produce identical results no matter where
    the SSE deltas split the tags."""
    from rtp_llm_tpu.frontend.output_parsers import StreamingOutputParser

    def run(chunks):
        p = StreamingOutputParser()
        r_all, c_all = "", ""
        for c in chunks:
            r, c2 = p.push(c)
            r_all += r
            c_all += c2
        fr, fc, tools = p.finalize()
        return r_all + fr, c_all + fc, tools

    text = "<think>I am thinking</think>Hello world"
    for split in range(1, len(text)):
        r, c, t = run([text[:split], text[split:]])
        assert (r, c, t) == ("I am thinking", "Hello world", None), split

    text = ('before <tool_call>{"name": "f", "arguments": {"x": 1}}'
            "</tool_call> after")
    for split in range(1, len(text)):
        r, c, t = run([text[:split], text[split:]])
        assert t and t[0]["function"]["name"] == "f", split
        assert c.strip().startswith("before"), split

    assert run(["<think>partial thought"])[0] == "partial thought"
    r, c, t = run(["just ", "text < here"])
    assert (r, c, t) == ("", "just text < here", None)


def test_streaming_parser_multiple_tools():
    from rtp_llm_tpu.frontend.output_parsers import StreamingOutputParser

    p = StreamingOutputParser()
    p.push('<tool_call>{"name": "a", "arguments": {}}</tool_call>')
    p.push('<tool_call>{"name": "b", "arguments": {}}</tool_call>')
    _, _, tools = p.finalize()
    assert [t["function"]["name"] for t in tools] == ["a", "b"]


class TestToolDetectors:
    """Model-family tool wire formats (frontend/tool_detectors.py; reference:
    sglang_helpers/function_call/*_detector.py)."""

    def test_deepseek_v31_format(self):
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        det = get_tool_detector("deepseek_v31")
        text = ("I will check.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>"
                'get_weather<｜tool▁sep｜>{"city": "Hangzhou"}'
                "<｜tool▁call▁end｜><｜tool▁calls▁end｜>")
        calls, rest = det.parse(text)
        assert rest == "I will check."
        assert len(calls) == 1
        assert calls[0]["function"]["name"] == "get_weather"
        assert json.loads(calls[0]["function"]["arguments"]) == {
            "city": "Hangzhou"}

    def test_deepseek_v31_multiple_calls(self):
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        det = get_tool_detector("deepseek_v3")
        text = ("<｜tool▁calls▁begin｜>"
                "<｜tool▁call▁begin｜>a<｜tool▁sep｜>{}<｜tool▁call▁end｜>"
                '<｜tool▁call▁begin｜>b<｜tool▁sep｜>{"x":1}<｜tool▁call▁end｜>'
                "<｜tool▁calls▁end｜>")
        calls, rest = det.parse(text)
        assert [c["function"]["name"] for c in calls] == ["a", "b"]
        assert rest == ""

    def test_kimi_k2_format(self):
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        det = get_tool_detector("kimi_k2")
        text = ("Let me call it.<|tool_calls_section_begin|>"
                "<|tool_call_begin|>functions.get_time:0"
                '<|tool_call_argument_begin|>{"tz": "UTC"}<|tool_call_end|>'
                "<|tool_calls_section_end|>")
        calls, rest = det.parse(text)
        assert rest == "Let me call it."
        assert calls[0]["function"]["name"] == "get_time"
        assert json.loads(calls[0]["function"]["arguments"]) == {"tz": "UTC"}

    def test_glm4_moe_format(self):
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        det = get_tool_detector("glm4_moe")
        text = ("<tool_call>get_weather\n"
                "<arg_key>city</arg_key>\n<arg_value>Beijing</arg_value>\n"
                "<arg_key>days</arg_key>\n<arg_value>3</arg_value>"
                "</tool_call>")
        calls, rest = det.parse(text)
        assert calls[0]["function"]["name"] == "get_weather"
        assert json.loads(calls[0]["function"]["arguments"]) == {
            "city": "Beijing", "days": 3}

    def test_glm4_moe_no_args(self):
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        det = get_tool_detector("glm4_moe")
        calls, _ = det.parse("<tool_call>get_time</tool_call>")
        assert calls[0]["function"]["name"] == "get_time"
        assert json.loads(calls[0]["function"]["arguments"]) == {}

    def test_qwen3_coder_format(self):
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        det = get_tool_detector("qwen3_coder")
        text = ("<tool_call><function=read_file>"
                "<parameter=path>/tmp/x.txt</parameter>"
                "<parameter=limit>10</parameter>"
                "</function></tool_call>")
        calls, rest = det.parse(text)
        assert calls[0]["function"]["name"] == "read_file"
        assert json.loads(calls[0]["function"]["arguments"]) == {
            "path": "/tmp/x.txt", "limit": 10}

    def test_default_hermes_for_unknown_models(self):
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        det = get_tool_detector("llama")
        text = '<tool_call>{"name": "f", "arguments": {"a": 1}}</tool_call>'
        calls, _ = det.parse(text)
        assert calls[0]["function"]["name"] == "f"

    def test_streaming_parser_with_deepseek_detector(self):
        from rtp_llm_tpu.frontend.output_parsers import StreamingOutputParser
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        p = StreamingOutputParser(detector=get_tool_detector("deepseek_v31"))
        chunks = ["ok ", "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>f",
                  '<｜tool▁sep｜>{"a":1}<｜tool▁call▁end｜><｜tool▁calls▁end｜>']
        content = ""
        for c in chunks:
            _, out = p.push(c)
            content += out
        r, c2, calls = p.finalize()
        content += c2
        assert content.strip() == "ok"
        assert calls and calls[0]["function"]["name"] == "f"
