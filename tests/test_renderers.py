"""Model-specific chat renderers (reference: rtp_llm/openai/renderers/).

Covers the qwen agent/tool fncall protocol (✿FUNCTION✿ commands,
qwen_agent/llm/function_calling.py) and the GLM-4 <|role|> special-token
protocol (chatglm4_renderer.py)."""

import pytest

from rtp_llm_tpu.frontend.chat_renderer import create_renderer
from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory
from rtp_llm_tpu.loader.fake_checkpoint import write_fake_tokenizer


@pytest.fixture(scope="module")
def qwen_tok(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok"))
    write_fake_tokenizer(path, 128)
    tok = TokenizerFactory.create(path)
    # the tiny word-level vocab would UNK the fncall markers; real qwen
    # tokenizers encode them losslessly
    tok.add_tokens(["✿FUNCTION✿", "✿ARGS✿", "✿RESULT✿", "✿RETURN✿",
                    "get_weather", "sunny"])
    return tok


TOOLS = [{
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "look up weather",
        "parameters": {"type": "object",
                       "properties": {"city": {"type": "string"}}},
    },
}]


class TestQwenAgentRenderer:
    def test_no_tools_falls_back_to_template(self, qwen_tok):
        r = create_renderer(qwen_tok, "qwen_agent")
        plain = create_renderer(qwen_tok, "qwen2")
        msgs = [{"role": "user", "content": "w1 w2"}]
        assert r.render(msgs).token_ids == plain.render(msgs).token_ids

    def test_tools_inject_fncall_section(self, qwen_tok):
        r = create_renderer(qwen_tok, "qwen_agent")
        out = r.render([{"role": "user", "content": "w1"}], tools=TOOLS)
        text = qwen_tok.decode(out.token_ids)
        assert "✿FUNCTION✿" in text and "get_weather" in text
        assert "✿RESULT✿" in out.stop_words and "✿RETURN✿" in out.stop_words

    def test_tool_turn_splices_result(self, qwen_tok):
        r = create_renderer(qwen_tok, "qwen_agent")
        msgs = [
            {"role": "user", "content": "weather in sf?"},
            {"role": "assistant", "tool_calls": [{
                "function": {"name": "get_weather",
                             "arguments": '{"city": "sf"}'}}]},
            {"role": "tool", "content": "sunny"},
        ]
        out = r.render(msgs, tools=TOOLS)
        toks = qwen_tok.decode(out.token_ids).split()
        # final assistant turn carries the protocol in order:
        # ✿FUNCTION✿ get_weather ✿ARGS✿ ... ✿RESULT✿ sunny ✿RETURN✿
        tail = toks[-20:]
        order = [tail.index(m) for m in
                 ("✿FUNCTION✿", "get_weather", "✿ARGS✿", "✿RESULT✿",
                  "sunny", "✿RETURN✿")]
        assert order == sorted(order), tail
        # the open ✿RETURN✿ continues the assistant turn: no fresh
        # generation header after it
        assert "<|im_start|>" not in tail[tail.index("✿RETURN✿"):]

    def test_detector_parses_calls(self):
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        det = get_tool_detector("qwen_tool")
        calls, rest = det.parse(
            "let me check\n✿FUNCTION✿: get_weather\n"
            '✿ARGS✿: {"city": "sf"}\n')
        assert rest == "let me check"
        assert len(calls) == 1
        assert calls[0]["function"]["name"] == "get_weather"
        assert calls[0]["function"]["arguments"] == '{"city": "sf"}'
        none, passthrough = det.parse("plain text")
        assert none is None and passthrough == "plain text"


class _GlmTok:
    """Minimal GLM-4-style tokenizer stub: role special tokens + encode."""

    unk_token_id = 0
    _special = {"[gMASK]": 1, "<sop>": 2, "<|system|>": 3, "<|user|>": 4,
                "<|assistant|>": 5, "<|observation|>": 6, "<|endoftext|>": 7}

    def convert_tokens_to_ids(self, t):
        return self._special.get(t, 0)

    def encode(self, text, add_special_tokens=False):
        return [100 + (ord(c) % 50) for c in text]


class TestGlm4Renderer:
    def test_role_token_protocol(self):
        r = create_renderer(_GlmTok(), "glm4")
        out = r.render([
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
            {"role": "user", "content": "again"},
        ])
        ids = out.token_ids
        assert ids[:2] == [1, 2]  # [gMASK]<sop>
        assert ids.count(4) == 2 and ids.count(5) == 2  # 2 user + asst+gen
        assert ids[-1] == 5  # generation opens <|assistant|>
        assert 4 in out.stop_token_ids and 6 in out.stop_token_ids

    def test_tools_and_observation(self):
        r = create_renderer(_GlmTok(), "glm4_moe")
        out = r.render([
            {"role": "user", "content": "weather?"},
            {"role": "assistant", "tool_calls": [{
                "function": {"name": "get_weather",
                             "arguments": '{"city": "sf"}'}}]},
            {"role": "tool", "content": "sunny"},
        ], tools=TOOLS)
        ids = out.token_ids
        assert 3 in ids  # tool system block
        assert 6 in ids  # observation role turn
        assert "<|observation|>" in out.stop_words

    def test_fallback_without_role_tokens(self, qwen_tok):
        # a glm4-typed model with a plain tokenizer uses the chat template
        r = create_renderer(qwen_tok, "glm4")
        out = r.render([{"role": "user", "content": "w1"}])
        assert out.token_ids, "template fallback must render"


class TestDeepseekV31Renderer:
    """thinking-mode plumbing (reference: deepseekv31_renderer.py:116-159):
    enable_thinking maps to the template's `thinking` var; tools force it
    off."""

    class _Tok:
        def __init__(self):
            self.calls = []

        def apply_chat_template(self, messages, add_generation_prompt=True,
                                tokenize=True, **kw):
            self.calls.append(kw)
            return [1, 2, 3]

        def convert_tokens_to_ids(self, t):
            return -1

    def test_enable_thinking_maps(self):
        tok = self._Tok()
        r = create_renderer(tok, "deepseek_v31")
        r.render([{"role": "user", "content": "hi"}],
                 chat_template_kwargs={"enable_thinking": True})
        assert tok.calls[-1].get("thinking") is True
        assert "enable_thinking" not in tok.calls[-1]

    def test_tools_disable_thinking_v31(self):
        # V3.1 cannot think during tool calls (deepseekv31_renderer.py:116)
        tok = self._Tok()
        r = create_renderer(tok, "deepseek_v31")
        r.render([{"role": "user", "content": "hi"}], tools=TOOLS,
                 chat_template_kwargs={"enable_thinking": True})
        assert tok.calls[-1].get("thinking") is False
        assert "tools" in tok.calls[-1]

    def test_tools_keep_thinking_v32(self):
        # V3.2 interleaves thinking with tool calls — keep the caller's flag
        tok = self._Tok()
        r = create_renderer(tok, "deepseek_v32")
        r.render([{"role": "user", "content": "hi"}], tools=TOOLS,
                 chat_template_kwargs={"enable_thinking": True})
        assert tok.calls[-1].get("thinking") is True
        assert "tools" in tok.calls[-1]


class TestLegacyTemplates:
    """Fallback conversation templates for no-chat-template checkpoints
    (reference: llama_template.py + llama_template_renderer.py)."""

    class _NoTemplateTok:
        bos_token_id = 1

        def apply_chat_template(self, *a, **k):
            raise ValueError("Cannot use chat template functions because "
                             "tokenizer.chat_template is not set")

        def __call__(self, text, add_special_tokens=False):
            self.last_text = text
            return list(range(2, 2 + len(text.split())))

        def convert_tokens_to_ids(self, t):
            return -1

    MSGS = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi there"}]

    def test_llama2_nests_system_in_first_inst(self):
        tok = self._NoTemplateTok()
        r = create_renderer(tok, "llama")
        out = r.render(self.MSGS)
        assert out.token_ids[0] == 1  # BOS
        assert tok.last_text.startswith("[INST] <<SYS>>\nbe brief\n<</SYS>>")
        assert tok.last_text.endswith("[/INST]")

    def test_baichuan_reserved_tokens(self):
        tok = self._NoTemplateTok()
        r = create_renderer(tok, "baichuan2")
        r.render([{"role": "user", "content": "hello"}])
        assert tok.last_text == "<reserved_106>hello<reserved_107>"

    def test_internlm_stop_words(self):
        tok = self._NoTemplateTok()
        out = create_renderer(tok, "internlm").render(
            [{"role": "user", "content": "hello"}])
        assert "<eoa>" in out.stop_words
        assert tok.last_text == "<|User|>:hello<eoh>\n<|Bot|>:"

    def test_unknown_type_uses_default(self):
        tok = self._NoTemplateTok()
        create_renderer(tok, "mystery_model").render(
            [{"role": "user", "content": "q"}])
        assert "USER: q ASSISTANT:" in tok.last_text

    def test_longest_prefix_wins(self):
        from rtp_llm_tpu.frontend.legacy_templates import template_for

        assert template_for("internlm2_chat").name == "internlm2"
        assert template_for("internlm").name == "internlm"

    def test_template_errors_surface_when_template_exists(self):
        # a tokenizer WITH a chat template must not silently degrade to
        # the legacy fallback when rendering raises
        class _Tok:
            chat_template = "{{ bad"

            def apply_chat_template(self, *a, **k):
                raise ValueError("template parse error")

            def convert_tokens_to_ids(self, t):
                return -1

        with pytest.raises(ValueError, match="template parse error"):
            create_renderer(_Tok(), "llama").render(
                [{"role": "user", "content": "q"}])

    def test_multiturn_vicuna(self):
        tok = self._NoTemplateTok()
        create_renderer(tok, "vicuna").render(
            [{"role": "user", "content": "a"},
             {"role": "assistant", "content": "b"},
             {"role": "user", "content": "c"}])
        assert "USER: a ASSISTANT: b</s>USER: c ASSISTANT:" in tok.last_text


class TestKimiK2Renderer:
    """Tool-call id wire format (reference: kimik2_renderer.py:60-145)."""

    class _Tok:
        def __init__(self):
            self.calls = []

        def apply_chat_template(self, messages, add_generation_prompt=True,
                                tokenize=True, **kw):
            self.calls.append(messages)
            return [1, 2]

        def convert_tokens_to_ids(self, t):
            return -1

    def test_bare_ids_get_prefixed(self):
        tok = self._Tok()
        r = create_renderer(tok, "kimi_k2")
        out = r.render([
            {"role": "user", "content": "weather?"},
            {"role": "assistant", "tool_calls": [
                {"id": "get_weather:0", "type": "function",
                 "function": {"name": "get_weather", "arguments": "{}"}}]},
            {"role": "tool", "tool_call_id": "get_weather:0",
             "content": "sunny"},
        ], tools=TOOLS)
        sent = tok.calls[-1]
        assert sent[1]["tool_calls"][0]["id"] == "functions.get_weather:0"
        assert sent[2]["tool_call_id"] == "functions.get_weather:0"
        assert "<|im_end|>" in out.stop_words

    def test_missing_tool_response_raises(self):
        tok = self._Tok()
        r = create_renderer(tok, "kimi_k2")
        with pytest.raises(ValueError, match="missing tool responses"):
            r.render([
                {"role": "user", "content": "weather?"},
                {"role": "assistant", "tool_calls": [
                    {"id": "get_weather:0", "type": "function",
                     "function": {"name": "get_weather",
                                  "arguments": "{}"}}]},
            ], tools=TOOLS)

    def test_openai_style_ids_rebuilt(self):
        # the server's own hermes-style "call_<uuid>" ids (and anything
        # else foreign) rebuild deterministically and remap the responses
        tok = self._Tok()
        r = create_renderer(tok, "kimi_k2")
        r.render([
            {"role": "assistant", "tool_calls": [
                {"id": "call_abc123", "type": "function",
                 "function": {"name": "f", "arguments": "{}"}}]},
            {"role": "tool", "tool_call_id": "call_abc123",
             "content": "x"},
        ])
        sent = tok.calls[-1]
        assert sent[0]["tool_calls"][0]["id"] == "functions.f:0"
        assert sent[1]["tool_call_id"] == "functions.f:0"

    def test_detector_keeps_wire_id(self):
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        det = get_tool_detector("kimi_k2")
        calls, _ = det.parse(
            "<|tool_calls_section_begin|><|tool_call_begin|>"
            "functions.get_weather:0<|tool_call_argument_begin|>"
            '{"city": "sf"}<|tool_call_end|><|tool_calls_section_end|>')
        assert calls[0]["id"] == "functions.get_weather:0"
        assert calls[0]["function"]["name"] == "get_weather"
