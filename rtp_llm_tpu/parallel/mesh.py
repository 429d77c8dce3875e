"""Device mesh construction from ParallelConfig.

Axes (reference ParallelismConfig analog, cpp/config/ConfigModules.h:56-95):
  dp — data parallel: independent batch shards (each dp group runs its own
       scheduler in the reference; here the decode batch dim is sharded)
  tp — tensor parallel: weight shards; EP folds into this axis for MoE
       (experts sharded over tp, like the reference's DP=EP deployment)

Mesh layout puts tp innermost so TP collectives ride the fastest ICI links.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from rtp_llm_tpu.config.engine_config import ParallelConfig


def make_mesh(
    parallel: Optional[ParallelConfig] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Axes (dp, cp, tp); cp (prefill context parallel) shards the prompt's
    token dim during prefill — the reference's PCPAllGather scheme
    (PrefillCPConfig, ConfigModules.h:21-42) expressed as a sharding."""
    parallel = parallel or ParallelConfig()
    devices = list(devices if devices is not None else jax.devices())
    tp, dp, cp = parallel.tp_size, parallel.dp_size, parallel.cp_size
    need = tp * dp * cp
    if need > len(devices):
        raise ValueError(
            f"mesh needs {need} devices (dp={dp} x cp={cp} x tp={tp}), "
            f"have {len(devices)}"
        )
    devs = np.asarray(devices[:need]).reshape(dp, cp, tp)
    return Mesh(devs, ("dp", "cp", "tp"))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1), ("dp", "cp", "tp"))
