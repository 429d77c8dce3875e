"""Parallelism: device mesh construction + sharding rules.

TPU-native replacement for the reference's NCCL process groups / DeepEP /
user-buffers stack (rtp_llm/models_py/distributed/, SURVEY.md §2.3): TP/DP/EP
become named mesh axes; XLA GSPMD inserts the collectives (all-reduce after
attn/ffn row-parallel matmuls, all-to-all for EP) from weight + activation
shardings — there is no hand-written communication code on the compute path.
"""

from rtp_llm_tpu.parallel.mesh import make_mesh
from rtp_llm_tpu.parallel.shardings import (
    make_weight_shard_fn,
    cache_sharding,
    state_sharding,
)

__all__ = ["make_mesh", "make_weight_shard_fn", "cache_sharding", "state_sharding"]
