"""Protobuf messages for the gRPC plane (generated from rtp_llm.proto).

``rtp_llm_pb2.py`` is checked in; regenerate with
``protoc --python_out=. rtp_llm.proto`` after editing the proto.
"""

from rtp_llm_tpu.protos import rtp_llm_pb2  # noqa: F401
