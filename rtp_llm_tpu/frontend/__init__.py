"""Frontend: HTTP API, tokenization, chat rendering, incremental detokenize.

Analog of the reference frontend layer (rtp_llm/frontend/, rtp_llm/openai/):
OpenAI-compatible chat/completions with SSE streaming over aiohttp.
"""
