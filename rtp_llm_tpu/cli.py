"""CLI entrypoint: ``rtp-llm-tpu serve <model_path> [flags]``.

Analog of the reference CLI (rtp_llm/cli/main.py:6, cli/serve.py:10).
"""

from __future__ import annotations

import logging
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cmd = argv.pop(0) if argv and not argv[0].startswith("-") else "serve"
    if cmd not in ("serve", "launch", "vit-serve"):
        # model path given directly: treat as serve target
        argv.insert(0, cmd)
        cmd = "serve"

    from rtp_llm_tpu.config.server_args import parse_engine_config

    config = parse_engine_config(argv)
    logging.basicConfig(
        level=getattr(logging, config.server.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    if not config.server.model_path:
        print("usage: rtp-llm-tpu serve <model_path> [flags]", file=sys.stderr)
        return 2

    if cmd == "launch":
        from rtp_llm_tpu.server.launcher import launch

        return launch(config)

    if cmd == "vit-serve":
        # standalone VIT worker / worker pool (reference: vit_start_server.py
        # / vit_proxy_start_server.py)
        from rtp_llm_tpu.config.model_config import ModelConfig
        from rtp_llm_tpu.server.vit_server import serve_vit, serve_vit_pool

        mc = ModelConfig.from_pretrained(config.server.model_path,
                                         config.server.model_type)
        if config.server.vit_workers > 1:
            serve_vit_pool(config.server.model_path, mc.model_type,
                           config.server.vit_workers,
                           host=config.server.host, port=config.server.port)
        else:
            serve_vit(config.server.model_path, mc.model_type,
                      host=config.server.host, port=config.server.port)
        return 0

    from rtp_llm_tpu.server.server import serve

    serve(config)
    return 0


if __name__ == "__main__":
    sys.exit(main())
