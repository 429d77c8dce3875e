"""Server assembly: config -> model -> engine -> HTTP app.

Analog of the reference BackendManager + start_server wiring
(rtp_llm/server/backend_manager.py:26, start_server.py:333), collapsed to one
process: on TPU the XLA runtime already executes the jitted step async, so the
frontend/backend process split of the reference is an option (gRPC split for
multi-host, later), not a requirement.
"""

from __future__ import annotations

import logging
from typing import Optional

from rtp_llm_tpu.config.engine_config import EngineConfig
from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.engine.engine import LlmEngine
from rtp_llm_tpu.frontend.openai_api import OpenAIApp
from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.models import create_model
from rtp_llm_tpu.quant import make_quant_transform
from rtp_llm_tpu.server.engine_runner import EngineRunner

logger = logging.getLogger(__name__)


def build_engine(
    config: EngineConfig, model_config: Optional[ModelConfig] = None
) -> LlmEngine:
    model_path = config.server.model_path
    if model_config is None:
        model_config = ModelConfig.from_pretrained(
            model_path, config.server.model_type
        )
    mesh = None
    shard_fn = None
    if config.parallel.tp_size * config.parallel.dp_size > 1:
        from rtp_llm_tpu.parallel import make_mesh, make_weight_shard_fn

        mesh = make_mesh(config.parallel)
        shard_fn = make_weight_shard_fn(mesh, model_config,
                                        afd=config.parallel.afd_mode)

    transform = make_quant_transform(config.quant)
    logger.info("loading weights from %s (quant=%s)", model_path,
                config.quant.method.value)
    weights = CheckpointLoader(
        model_config, transform=transform, shard_fn=shard_fn
    ).load(model_path)

    if config.server.lora_adapters:
        from rtp_llm_tpu.lora import load_peft_adapter, merge_lora

        for spec in config.server.lora_adapters.split(","):
            name, _, path = spec.partition("=")
            adapter = load_peft_adapter(
                path or name, model_config.num_layers,
                name if path else None,
            )
            logger.info("merging static LoRA adapter %r", adapter.name)
            weights = merge_lora(weights, adapter)

    model = create_model(model_config)

    draft = None
    sp = config.speculative
    eagle = None
    if sp.method == "eagle" and sp.sp_model_path:
        # EAGLE feature-level draft head (engine/eagle.py)
        from rtp_llm_tpu.loader import load_eagle_weights

        logger.info("loading EAGLE head from %s", sp.sp_model_path)
        eagle = load_eagle_weights(sp.sp_model_path)
    if sp.method == "vanilla" and sp.sp_model_path:
        # vanilla draft-model speculative decoding: load the small draft
        # checkpoint alongside (reference: sp_model loading, sp_type vanilla)
        draft_cfg = ModelConfig.from_pretrained(sp.sp_model_path)
        logger.info("loading draft model from %s", sp.sp_model_path)
        draft_weights = CheckpointLoader(draft_cfg).load(sp.sp_model_path)
        draft = (create_model(draft_cfg), draft_weights)

    return LlmEngine(model, weights, config, mesh=mesh, draft=draft,
                     eagle=eagle)


def serve(config: EngineConfig):
    from rtp_llm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    """Blocking: build everything and run the HTTP server."""
    from aiohttp import web

    model_config = ModelConfig.from_pretrained(
        config.server.model_path, config.server.model_type
    )
    model_name = (config.server.served_model_name
                  or config.server.model_path.rstrip("/").rsplit("/", 1)[-1])
    probe = create_model(model_config)
    if getattr(probe, "is_encoder_only", False):
        # bert-family: embeddings-only service (reference: embedding engine
        # deployment)
        from rtp_llm_tpu.frontend.embedding_app import (
            EncoderEmbedder, build_embedding_app,
        )

        weights = CheckpointLoader(
            model_config, transform=make_quant_transform(config.quant)
        ).load(config.server.model_path)
        tok = TokenizerFactory.create(
            config.server.tokenizer_path or config.server.model_path
        )
        app = build_embedding_app(
            EncoderEmbedder(probe, weights), tok, model_name
        )
        logger.info("serving embeddings-only on %s:%d",
                    config.server.host, config.server.port)
        web.run_app(app, host=config.server.host, port=config.server.port,
                    print=None, access_log=None)
        return

    engine = build_engine(config, model_config=model_config)
    runner = EngineRunner(engine).start()
    tok_path = config.server.tokenizer_path or config.server.model_path
    tokenizer = TokenizerFactory.create(tok_path)

    pd_forwarder = None
    if config.server.role == "prefill":
        if config.server.decode_peer:
            # push entrance: this instance is the entry and relays tokens
            from rtp_llm_tpu.frontend.pd_routes import PrefillForwarder

            pd_forwarder = PrefillForwarder(
                engine, config.server.decode_peer,
                decode_grpc_peer=config.server.decode_grpc_peer or None)
        elif not config.server.decode_entrance:
            raise ValueError(
                "prefill role requires --server-decode-peer (push entrance) "
                "or --server-decode-entrance (passive /prefill_kv)")
    elif (config.server.role == "decode" and config.server.decode_entrance
          and config.server.prefill_peer):
        # decode-entrance inversion: this instance is the entry, pulls KV
        # from the prefill peer (pd_entrance_transpose.md)
        from rtp_llm_tpu.frontend.pd_routes import DecodeEntranceBackend

        pd_forwarder = DecodeEntranceBackend(
            engine, runner, config.server.prefill_peer)

    api = OpenAIApp(
        runner,
        tokenizer,
        model_name=config.server.served_model_name
        or config.server.model_path.rstrip("/").rsplit("/", 1)[-1],
        model_type=engine.model.cfg.model_type,
        pd_forwarder=pd_forwarder,
        model_path=config.server.model_path,
        vit_endpoint=config.server.vit_endpoint,
        role=config.server.role,
        decode_entrance=bool(config.server.decode_entrance),
    )
    app = api.build_app()
    grpc_srv = None
    if config.server.grpc_port:
        from rtp_llm_tpu.server.grpc_server import start_grpc_server

        grpc_srv = start_grpc_server(runner, config.server.grpc_port)
    if config.server.role == "decode":
        from rtp_llm_tpu.frontend.pd_routes import DecodeRole

        DecodeRole(runner).add_routes(app)
    if config.server.role == "prefill":
        # decode-entrance: serve the passive /prefill_kv pull endpoint
        from rtp_llm_tpu.frontend.pd_routes import PrefillRole

        PrefillRole(runner).add_routes(app)
    logger.info("serving on %s:%d", config.server.host, config.server.port)
    try:
        web.run_app(
            app, host=config.server.host, port=config.server.port,
            print=None, access_log=None,
        )
    finally:
        if grpc_srv is not None:
            grpc_srv.stop(grace=2)
        runner.stop()
