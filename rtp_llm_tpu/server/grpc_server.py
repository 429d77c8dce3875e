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
        }
        return grpc.method_handlers_generic_handler(SERVICE, rpcs)


def start_grpc_server(runner, port: int, max_workers: int = 16) -> grpc.Server:
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
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
        self.channel = grpc.insecure_channel(target)
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

    def generate(self, token_ids, config: Optional[dict] = None):
        """Yields GenerateUpdate messages."""
        req = pb.GenerateRequest(
            token_ids=list(token_ids), config_json=json.dumps(config or {})
        )
        yield from self._generate(req)

    def health(self) -> bool:
        return self._health(pb.HealthRequest()).ok

    def worker_status(self) -> dict:
        return json.loads(self._status(pb.WorkerStatusRequest()).status_json)

    def close(self):
        self.channel.close()
