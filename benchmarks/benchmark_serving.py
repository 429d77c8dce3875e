#!/usr/bin/env python
"""Serving load benchmark: concurrent OpenAI-API requests against a live
server, reporting throughput / TTFT / TPOT percentiles.

Analog of the reference's benchmark/benchmark_serving.py (ShareGPT load test)
with synthetic prompt/output length distributions (no dataset ships in this
environment; lengths are lognormal-ish like ShareGPT's).

Usage:
  python benchmarks/benchmark_serving.py --base-url http://localhost:8088 \
      --num-prompts 128 --request-rate 8 --input-len 512 --output-len 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import time

import aiohttp
import numpy as np


async def one_request(session, base_url, prompt_ids, max_tokens, results):
    t0 = time.perf_counter()
    first = None
    n_tokens = 0
    try:
        async with session.post(
            f"{base_url}/v1/completions",
            json={
                "prompt": prompt_ids,
                "max_tokens": max_tokens,
                "temperature": 0.0,
                "ignore_eos": True,
                "stream": True,
            },
            timeout=aiohttp.ClientTimeout(total=600),
        ) as resp:
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data: "):
                    continue
                data = line[6:]
                if data == "[DONE]":
                    break
                if first is None:
                    first = time.perf_counter()
                n_tokens += 1
        t1 = time.perf_counter()
        results.append({
            "ok": True,
            "ttft": (first - t0) if first else None,
            "latency": t1 - t0,
            "tokens": n_tokens,
        })
    except Exception as e:
        results.append({"ok": False, "error": str(e)})


async def run(args):
    rng = random.Random(0)
    nprng = np.random.default_rng(0)
    results: list = []
    async with aiohttp.ClientSession() as session:
        tasks = []
        t_start = time.perf_counter()
        for i in range(args.num_prompts):
            in_len = max(4, int(nprng.lognormal(np.log(args.input_len), 0.3)))
            out_len = max(4, int(nprng.lognormal(np.log(args.output_len), 0.3)))
            prompt = [rng.randrange(10, 1000) for _ in range(in_len)]
            tasks.append(asyncio.create_task(
                one_request(session, args.base_url, prompt, out_len, results)
            ))
            if args.request_rate > 0:
                await asyncio.sleep(nprng.exponential(1.0 / args.request_rate))
        await asyncio.gather(*tasks)
        wall = time.perf_counter() - t_start

    ok = [r for r in results if r.get("ok")]
    fail = len(results) - len(ok)
    total_tokens = sum(r["tokens"] for r in ok)
    ttfts = sorted(r["ttft"] for r in ok if r["ttft"])
    tpots = sorted(
        (r["latency"] - r["ttft"]) / max(r["tokens"] - 1, 1)
        for r in ok if r["ttft"] and r["tokens"] > 1
    )

    def pct(xs, p):
        return xs[min(int(len(xs) * p / 100), len(xs) - 1)] if xs else 0.0

    print(json.dumps({
        "num_prompts": args.num_prompts,
        "failed": fail,
        "wall_s": round(wall, 2),
        "output_tokens_per_s": round(total_tokens / wall, 1),
        "requests_per_s": round(len(ok) / wall, 2),
        "ttft_ms": {"p50": round(pct(ttfts, 50) * 1e3, 1),
                    "p90": round(pct(ttfts, 90) * 1e3, 1),
                    "p99": round(pct(ttfts, 99) * 1e3, 1)},
        "tpot_ms": {"p50": round(pct(tpots, 50) * 1e3, 2),
                    "p90": round(pct(tpots, 90) * 1e3, 2)},
    }, indent=1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base-url", default="http://localhost:8088")
    p.add_argument("--num-prompts", type=int, default=64)
    p.add_argument("--request-rate", type=float, default=0.0,
                   help="poisson arrival rate (0 = all at once)")
    p.add_argument("--input-len", type=int, default=512)
    p.add_argument("--output-len", type=int, default=128)
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
