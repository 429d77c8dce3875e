"""gRPC service: streaming generation + status over HTTP/2.

Analog of the reference's model-RPC gRPC servers (LocalRpcServer enqueue +
pollStreamOutput, cpp/model_rpc/LocalRpcServer.cc:160-191; proto service
model_rpc_service.proto:490). The reference generates C++ stubs; here the
service is a hand-written generic handler over the protoc-generated message
classes (no grpc codegen plugin needed) — same wire format, same streaming
semantics: one ``GenerateUpdate`` per engine step with the new tokens.
"""

from __future__ import annotations

import json
import logging
from concurrent import futures
from typing import Optional

import grpc

from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.protos import rtp_llm_pb2 as pb

logger = logging.getLogger(__name__)

SERVICE = "rtp_llm_tpu.RpcService"


class GrpcService:
    """Wraps an EngineRunner; serves Generate/Health/WorkerStatus."""

    def __init__(self, runner):
        self.runner = runner

    # ---- handlers ----

    def generate(self, request: pb.GenerateRequest, context):
        cfg = GenerateConfig.from_dict(json.loads(request.config_json or "{}"))
        stream = self.runner.enqueue(list(request.token_ids), cfg)
        n_out = 0
        try:
            while True:
                out = stream.next_output()
                n_out += len(out.new_tokens)
                yield pb.GenerateUpdate(
                    tokens=list(out.new_tokens),
                    finished=out.finished,
                    finish_reason=(out.finish_reason.value
                                   if out.finish_reason else ""),
                    output_len=n_out,
                    logprobs=[float(x) for x in (out.logprobs or [])],
                )
                if out.finished:
                    return
        except Exception:
            stream.abort()
            raise

    def remote_generate(self, request: pb.RemoteGenerateRequest, context):
        """PD decode-role handoff: preloaded KV rows + first token in, token
        stream out (reference: DecodeRpcServer + cache-store transfer;
        binary analog of frontend/pd_routes.py remote_generate)."""
        import numpy as np

        segs = {
            s.name: np.frombuffer(s.data, dtype=np.dtype(s.dtype)).reshape(
                tuple(s.shape))
            for s in request.segments
        }
        # single-array caches travel as one segment named "kv"
        kv_rows = segs["kv"] if set(segs) == {"kv"} else segs
        cfg = GenerateConfig.from_dict(json.loads(request.config_json or "{}"))
        engine = self.runner.engine
        stream = engine.enqueue_preloaded(
            list(request.token_ids), int(request.first_token), kv_rows, cfg,
            first_logprob=float(request.first_logprob),
        )
        self.runner.kick()
        n_out = 0
        try:
            while True:
                out = stream.next_output()
                n_out += len(out.new_tokens)
                yield pb.GenerateUpdate(
                    tokens=list(out.new_tokens),
                    finished=out.finished,
                    finish_reason=(out.finish_reason.value
                                   if out.finish_reason else ""),
                    output_len=n_out,
                    logprobs=[float(x) for x in (out.logprobs or [])],
                )
                if out.finished:
                    return
        except Exception:
            stream.abort()
            raise

    def update_weights(self, request: pb.UpdateWeightsRequest, context):
        """Reference: UpdateWeights RPC (model_rpc_service.proto:700)."""
        try:
            self.runner.update_weights(request.model_path)
        except Exception as e:  # surface the loader error to the client
            return pb.UpdateWeightsReply(ok=False, error=str(e))
        return pb.UpdateWeightsReply(ok=True)

    def cache_status(self, request: pb.CacheStatusRequest, context):
        """Reference: GetCacheStatus RPC (proto :683); same payload as the
        HTTP /cache_status route so FlexLB-style routers can use either."""
        mgr = self.runner.engine.cache_mgr
        out = {
            "block_size": mgr.block_size,
            "total_blocks": mgr.pool.num_blocks,
            "free_blocks": mgr.pool.free_blocks,
            "used_blocks": mgr.pool.used_blocks,
            "available_blocks": mgr.free_blocks,
            "prefix_cache_entries": len(mgr.prefix_cache)
            if mgr.prefix_cache is not None else 0,
            "backend": mgr.backend,
        }
        if request.want_diff:
            out.update(mgr.cache_hash_diff(int(request.from_version)))
        else:
            out["version"] = mgr.hash_version
        return pb.CacheStatusReply(status_json=json.dumps(out))

    def health(self, request, context):
        return pb.HealthReply(ok=True)

    def worker_status(self, request, context):
        eng = self.runner.engine
        status = {
            "available_concurrency": max(
                0, eng.config.scheduler.max_batch_size
                - len(eng.scheduler.running)
            ),
            "running_query_len": len(eng.scheduler.running),
            "waiting_query_len": eng.scheduler.pending,
            "step_count": eng.step_count,
            "tokens_generated": eng.tokens_generated,
            "alive": True,
        }
        return pb.WorkerStatusReply(status_json=json.dumps(status))

    # ---- server assembly ----

    def handlers(self) -> grpc.GenericRpcHandler:
        rpcs = {
            "Generate": grpc.unary_stream_rpc_method_handler(
                self.generate,
                request_deserializer=pb.GenerateRequest.FromString,
                response_serializer=pb.GenerateUpdate.SerializeToString,
            ),
            "Health": grpc.unary_unary_rpc_method_handler(
                self.health,
                request_deserializer=pb.HealthRequest.FromString,
                response_serializer=pb.HealthReply.SerializeToString,
            ),
            "WorkerStatus": grpc.unary_unary_rpc_method_handler(
                self.worker_status,
                request_deserializer=pb.WorkerStatusRequest.FromString,
                response_serializer=pb.WorkerStatusReply.SerializeToString,
            ),
            "RemoteGenerate": grpc.unary_stream_rpc_method_handler(
                self.remote_generate,
                request_deserializer=pb.RemoteGenerateRequest.FromString,
                response_serializer=pb.GenerateUpdate.SerializeToString,
            ),
            "UpdateWeights": grpc.unary_unary_rpc_method_handler(
                self.update_weights,
                request_deserializer=pb.UpdateWeightsRequest.FromString,
                response_serializer=pb.UpdateWeightsReply.SerializeToString,
            ),
            "CacheStatus": grpc.unary_unary_rpc_method_handler(
                self.cache_status,
                request_deserializer=pb.CacheStatusRequest.FromString,
                response_serializer=pb.CacheStatusReply.SerializeToString,
            ),
        }
        return grpc.method_handlers_generic_handler(SERVICE, rpcs)


# PD KV payloads are hundreds of MB for long prompts; lift the 4 MB default
_MSG_OPTS = [
    ("grpc.max_send_message_length", 1 << 30),
    ("grpc.max_receive_message_length", 1 << 30),
]


def start_grpc_server(runner, port: int, max_workers: int = 16) -> grpc.Server:
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers),
                         options=_MSG_OPTS)
    server.add_generic_rpc_handlers((GrpcService(runner).handlers(),))
    server.add_insecure_port(f"[::]:{port}")
    server.start()
    logger.info("gRPC server listening on :%d", port)
    return server


class GrpcGenerateClient:
    """Client for the service above (reference analog:
    BackendRPCServerVisitor, rtp_llm/server/backend_rpc_server_visitor.py:23,
    and the RL AsyncRpcInferenceClient)."""

    def __init__(self, target: str):
        self.channel = grpc.insecure_channel(target, options=_MSG_OPTS)
        self._generate = self.channel.unary_stream(
            f"/{SERVICE}/Generate",
            request_serializer=pb.GenerateRequest.SerializeToString,
            response_deserializer=pb.GenerateUpdate.FromString,
        )
        self._health = self.channel.unary_unary(
            f"/{SERVICE}/Health",
            request_serializer=pb.HealthRequest.SerializeToString,
            response_deserializer=pb.HealthReply.FromString,
        )
        self._status = self.channel.unary_unary(
            f"/{SERVICE}/WorkerStatus",
            request_serializer=pb.WorkerStatusRequest.SerializeToString,
            response_deserializer=pb.WorkerStatusReply.FromString,
        )
        self._remote_generate = self.channel.unary_stream(
            f"/{SERVICE}/RemoteGenerate",
            request_serializer=pb.RemoteGenerateRequest.SerializeToString,
            response_deserializer=pb.GenerateUpdate.FromString,
        )
        self._update_weights = self.channel.unary_unary(
            f"/{SERVICE}/UpdateWeights",
            request_serializer=pb.UpdateWeightsRequest.SerializeToString,
            response_deserializer=pb.UpdateWeightsReply.FromString,
        )
        self._cache_status = self.channel.unary_unary(
            f"/{SERVICE}/CacheStatus",
            request_serializer=pb.CacheStatusRequest.SerializeToString,
            response_deserializer=pb.CacheStatusReply.FromString,
        )

    def generate(self, token_ids, config: Optional[dict] = None):
        """Yields GenerateUpdate messages."""
        req = pb.GenerateRequest(
            token_ids=list(token_ids), config_json=json.dumps(config or {})
        )
        yield from self._generate(req)

    def remote_generate(self, token_ids, first_token: int, kv_rows,
                        config: Optional[dict] = None,
                        first_logprob: float = 0.0):
        """PD handoff: ship KV rows (ndarray or {name: ndarray} pytree) to
        the decode peer and yield GenerateUpdate messages. The binary analog
        of PrefillForwarder's HTTP push (frontend/pd_routes.py)."""
        import numpy as np

        arrays = kv_rows if isinstance(kv_rows, dict) else {"kv": kv_rows}
        segs = [
            pb.KvSegment(
                name=name, dtype=str(a.dtype), shape=list(a.shape),
                data=np.ascontiguousarray(a).tobytes(),
            )
            for name, a in ((n, np.asarray(v)) for n, v in sorted(arrays.items()))
        ]
        req = pb.RemoteGenerateRequest(
            token_ids=list(map(int, token_ids)), first_token=int(first_token),
            first_logprob=float(first_logprob),
            config_json=json.dumps(config or {}), segments=segs,
        )
        yield from self._remote_generate(req)

    def update_weights(self, model_path: str):
        reply = self._update_weights(
            pb.UpdateWeightsRequest(model_path=model_path))
        if not reply.ok:
            raise RuntimeError(f"update_weights failed: {reply.error}")

    def cache_status(self, from_version: Optional[int] = None) -> dict:
        req = pb.CacheStatusRequest(
            from_version=from_version or 0, want_diff=from_version is not None)
        return json.loads(self._cache_status(req).status_json)

    def health(self) -> bool:
        return self._health(pb.HealthRequest()).ok

    def worker_status(self) -> dict:
        return json.loads(self._status(pb.WorkerStatusRequest()).status_json)

    def close(self):
        self.channel.close()
