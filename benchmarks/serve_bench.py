#!/usr/bin/env python
"""Serving-under-load benchmark on the real TPU chip.

Methodology mirrors the reference's benchmark/benchmark_serving.py (Poisson
arrivals against a live OpenAI server, TTFT/TPOT/throughput percentiles), but
self-contained: builds the same Qwen2-7B-shaped random-weight engine as
bench.py, serves it through the REAL aiohttp app + engine-loop thread, then
drives concurrent streamed /v1/completions requests at a configurable
request rate. Prints ONE json line.

Usage (on TPU):
  python benchmarks/serve_bench.py --num-prompts 128 --request-rate 8
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time

import aiohttp
import numpy as np

sys.path.insert(0, "/root/repo")


class IdTokenizer:
    """Minimal tokenizer for token-id-in / token-id-out serving (the load
    generator posts integer prompts; text detok is irrelevant to perf)."""

    eos_token_id = None
    pad_token_id = 0

    def encode(self, text, **kw):
        return [int(t) for t in str(text).split() if t.isdigit()] or [1]

    def decode(self, ids, **kw):
        if hasattr(ids, "__iter__"):
            return " ".join(f"t{int(i)}" for i in ids)
        return f"t{int(ids)}"

    def convert_ids_to_tokens(self, ids):
        return [f"t{int(i)}" for i in ids]


async def _one(session, url, prompt_ids, max_tokens, results):
    t0 = time.perf_counter()
    first = None
    n = 0
    try:
        async with session.post(
            f"{url}/v1/completions",
            json={"prompt": prompt_ids, "max_tokens": max_tokens,
                  "temperature": 0.0, "ignore_eos": True, "stream": True},
            timeout=aiohttp.ClientTimeout(total=900),
        ) as resp:
            if resp.status == 429:  # SLA shed — count explicitly
                results.append({"ok": False, "rejected": True,
                                "error": "429"})
                return
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data: "):
                    continue
                if line[6:] == "[DONE]":
                    break
                if first is None:
                    first = time.perf_counter()
                # IdTokenizer emits one whitespace-separated word per token
                n += len(json.loads(line[6:])["choices"][0]["text"].split())
        results.append({"ok": True, "ttft": (first - t0) if first else None,
                        "latency": time.perf_counter() - t0, "tokens": n})
    except Exception as e:  # noqa: BLE001 — record failures as results
        results.append({"ok": False, "error": repr(e)})


async def _drive(url, prompts, max_tokens, rate):
    results = []
    async with aiohttp.ClientSession() as s:
        tasks = []
        rng = np.random.default_rng(0)
        for ids in prompts:
            tasks.append(asyncio.create_task(
                _one(s, url, ids, max_tokens, results)))
            if rate > 0:
                await asyncio.sleep(rng.exponential(1.0 / rate))
        await asyncio.gather(*tasks)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen2-7b")
    p.add_argument("--quant", default="int8",
                   choices=["int8", "bf16", "w8a8", "fp8"])
    p.add_argument("--quant-lm-head", action="store_true",
                   help="per-channel int8 LM head (+5%% decode, ppl +0.16%%)")
    p.add_argument("--num-prompts", type=int, default=128)
    p.add_argument("--request-rate", type=float, default=8.0,
                   help="Poisson arrival rate (req/s); 0 = all at once")
    p.add_argument("--input-len", type=int, default=512)
    p.add_argument("--output-len", type=int, default=128)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--decode-steps", type=int, default=8,
                   help="fused decode steps per dispatch (lower than the "
                        "fixed-batch bench: bounds added TTFT)")
    p.add_argument("--port", type=int, default=18808)
    p.add_argument("--prefill-budget", type=int, default=None,
                   help="max_prefill_tokens_per_step override "
                        "(default: SchedulerConfig default; 0 disables)")
    p.add_argument("--platform", default=None)
    p.add_argument("--ttft-slo-ms", type=int, default=0,
                   help="SLA admission guard: shed (429) when projected "
                        "queue wait exceeds this (0 = off)")
    args = p.parse_args()

    import os

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    from rtp_llm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from bench import MODELS, build_device_weights

    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig, QuantConfig,
    )
    from rtp_llm_tpu.config.model_config import ModelConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.frontend.openai_api import OpenAIApp
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.server.engine_runner import EngineRunner

    mc = ModelConfig(model_type="qwen2", **MODELS[args.model])
    mc.eos_token_id = []
    model = create_model(mc)
    weights = build_device_weights(mc, args.quant,
                                   lm_head_int8=args.quant_lm_head)
    max_seq = args.input_len + args.output_len + 64
    econf = EngineConfig(
        cache=CacheConfig(block_size=32),
        scheduler=SchedulerConfig(
            max_batch_size=args.max_batch, max_seq_len=max_seq,
            prefill_buckets=(args.input_len,),
            decode_steps=args.decode_steps,
            ttft_slo_ms=args.ttft_slo_ms,
            **({} if args.prefill_budget is None
               else {"max_prefill_tokens_per_step": args.prefill_budget}),
        ),
        quant=QuantConfig(method=args.quant if args.quant != "bf16"
                          else "none"),
    )
    engine = LlmEngine(model, weights, econf)
    t0 = time.time()
    engine.warmup()
    warmup_s = time.time() - t0

    runner = EngineRunner(engine).start()
    tracked = []
    _orig_enqueue = runner.enqueue

    def _tracked_enqueue(*a, **k):
        s = _orig_enqueue(*a, **k)
        tracked.append(s)
        return s

    runner.enqueue = _tracked_enqueue
    engine._bench_streams = tracked
    app = OpenAIApp(runner, IdTokenizer(), model_name="serve-bench",
                    enable_access_log=False)

    from aiohttp import web

    async def run():
        webapp = app.build_app()
        runner_http = web.AppRunner(webapp)
        await runner_http.setup()
        site = web.TCPSite(runner_http, "127.0.0.1", args.port)
        await site.start()

        rng = np.random.default_rng(0)
        prompts = [
            rng.integers(10, mc.vocab_size - 10,
                         size=args.input_len).tolist()
            for _ in range(args.num_prompts)
        ]
        t1 = time.perf_counter()
        results = await _drive(f"http://127.0.0.1:{args.port}", prompts,
                               args.output_len, args.request_rate)
        wall = time.perf_counter() - t1
        # scrape the Prometheus exporter the way an operator's monitoring
        # would (VERDICT r3 #7 done-criterion: server-side phase percentiles
        # come from GET /metrics, not in-process access)
        import aiohttp

        async with aiohttp.ClientSession() as sess:
            async with sess.get(
                    f"http://127.0.0.1:{args.port}/metrics") as r:
                prom_text = await r.text()
        await runner_http.cleanup()
        return results, wall, prom_text

    results, wall, prom_text = asyncio.run(run())
    runner.stop()

    # server-side truth: engine phase timings + stream-level TTFT measured
    # from enqueue to first emitted token (bisects engine vs delivery)
    from rtp_llm_tpu.utils.metrics import METRICS

    snap = METRICS.snapshot()
    eng_hist = {k: v for k, v in snap.get("histograms", {}).items()
                if k.startswith("engine.")}
    print("ENGINE_METRICS", json.dumps(eng_hist), file=sys.stderr)
    svr_ttft = sorted(
        (s.first_token_time - s.enqueue_time)
        for s in getattr(engine, "_bench_streams", [])
        if s.first_token_time)
    if svr_ttft:
        print("SERVER_TTFT p50=%.2f p99=%.2f" % (
            float(np.percentile(svr_ttft, 50)),
            float(np.percentile(svr_ttft, 99))), file=sys.stderr)

    ok = [r for r in results if r.get("ok")]
    fail = len(results) - len(ok)
    total_tokens = sum(r["tokens"] for r in ok)
    ttfts = sorted(r["ttft"] for r in ok if r["ttft"] is not None)
    tpots = sorted((r["latency"] - r["ttft"]) / max(r["tokens"] - 1, 1)
                   for r in ok if r["ttft"] is not None and r["tokens"] > 1)

    def pct(v, q):
        return round(float(np.percentile(v, q)), 4) if v else None

    def scraped(name, quantile):
        """Parse one summary quantile out of the Prometheus text."""
        import re

        m = re.search(
            rf'^{re.escape(name)}{{quantile="{quantile}"}} ([0-9.eE+-]+)$',
            prom_text, re.M)
        return round(float(m.group(1)), 3) if m else None

    server_phases = {
        f"{phase.split('_ms')[0].replace('rtp_engine_', '')}_{q}_ms":
            scraped(phase, qv)
        for phase in ("rtp_engine_prefill_ms", "rtp_engine_decode_ms",
                      "rtp_engine_schedule_ms")
        for q, qv in (("p50", "0.5"), ("p99", "0.99"))
    }

    print(json.dumps({
        "metric": f"serving_throughput ({args.model} {args.quant}, "
                  f"rate={args.request_rate}/s, n={args.num_prompts}, "
                  f"in={args.input_len}, out={args.output_len})",
        "value": round(total_tokens / wall, 1),
        "unit": "tokens/s",
        "detail": {
            "requests_ok": len(ok), "requests_failed": fail,
            "requests_rejected_429": sum(
                1 for r in results if r.get("rejected")),
            "wall_s": round(wall, 1),
            "ttft_p50_s": pct(ttfts, 50), "ttft_p99_s": pct(ttfts, 99),
            "tpot_p50_s": pct(tpots, 50), "tpot_p99_s": pct(tpots, 99),
            "warmup_s": round(warmup_s, 1),
            "decode_steps": args.decode_steps,
            "server_phases_scraped": server_phases,
        },
    }))


if __name__ == "__main__":
    main()
