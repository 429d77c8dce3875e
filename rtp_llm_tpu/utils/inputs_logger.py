"""Model-inputs logger for offline batch replay / debugging.

Reference analog: ModelInputsLogger (cpp/models/ModelInputsLogger.h, wired in
NormalExecutor.cc:44-49) — when enabled, every dispatched batch's inputs dump
to disk so a bad step can be reproduced offline against the same checkpoint.

TPU-native form: each prefill dispatch writes one ``prefill_<step>.npz``
(tokens / positions / block_tables / kv_lens / q_offsets / adapter_ids) and
each decode dispatch a ``decode_<step>.npz`` of the device-state rows it ran
with. ``replay(engine, path)`` re-executes a dump through a live engine's
compiled programs and returns the logits/tokens for diffing.

Enable with EngineConfig.model_inputs_log_dir (env
RTP_MODEL_INPUTS_LOG_DIR, flag --model-inputs-log-dir).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


class ModelInputsLogger:
    def __init__(self, log_dir: str, max_dumps: int = 1000):
        self.dir = log_dir
        self.max_dumps = max_dumps
        self._n = 0
        os.makedirs(log_dir, exist_ok=True)

    def _path(self, kind: str, step: int) -> Optional[str]:
        if self._n >= self.max_dumps:
            return None
        self._n += 1
        # sequence suffix: several dumps (prefill chunks) can share a step
        return os.path.join(self.dir,
                            f"{kind}_{step:08d}_{self._n:05d}.npz")

    def log_prefill(self, step: int, tokens, positions, block_tables,
                    kv_lens, q_offsets, adapter_ids=None) -> None:
        p = self._path("prefill", step)
        if p is None:
            return
        np.savez_compressed(
            p, kind="prefill", tokens=np.asarray(tokens),
            positions=np.asarray(positions),
            block_tables=np.asarray(block_tables),
            kv_lens=np.asarray(kv_lens), q_offsets=np.asarray(q_offsets),
            adapter_ids=(np.asarray(adapter_ids)
                         if adapter_ids is not None else np.zeros(0)),
        )

    def log_decode(self, step: int, state, kv_blocks=None,
                   need_sampling=True, need_stats=True) -> None:
        """Dump the decode-relevant device-state rows (one host fetch per
        field; only when logging is on, so the serving path never pays)."""
        p = self._path("decode", step)
        if p is None:
            return
        np.savez_compressed(
            p, kind="decode",
            last_tokens=np.asarray(state.last_tokens),
            kv_lens=np.asarray(state.kv_lens),
            block_tables=np.asarray(state.block_tables),
            kv_blocks=np.asarray(kv_blocks if kv_blocks is not None else -1),
            need_sampling=np.asarray(need_sampling),
            need_stats=np.asarray(need_stats),
        )


def replay(engine, npz_path: str):
    """Re-run one dumped batch through a live engine's compiled programs.

    Prefill dumps return the program logits [rows, V]; decode dumps return
    the sampled tokens [B]. The engine must be built from the same
    checkpoint/config that produced the dump (the reference replay makes the
    same assumption)."""
    import jax.numpy as jnp

    d = np.load(npz_path, allow_pickle=False)
    kind = str(d["kind"])
    if kind == "prefill":
        bucket = int(d["tokens"].shape[1])
        fn = engine._get_prefill_fn(bucket)
        args = [engine.weights, engine.kv,
                jnp.asarray(d["tokens"]), jnp.asarray(d["positions"]),
                jnp.asarray(d["block_tables"]), jnp.asarray(d["kv_lens"]),
                jnp.asarray(d["q_offsets"])]
        if d["adapter_ids"].size:
            args.append(jnp.asarray(d["adapter_ids"]))
        engine.kv, logits = fn(*args)
        return np.asarray(logits)
    # decode: install the dumped rows into the live state, run one step
    st = engine.state._replace(
        last_tokens=jnp.asarray(d["last_tokens"]),
        kv_lens=jnp.asarray(d["kv_lens"]),
        block_tables=jnp.asarray(d["block_tables"]),
    )
    kvb = int(d["kv_blocks"])
    engine.kv, st, tokens, _ = engine._decode_jit(
        engine.weights, engine.kv, st, bool(d["need_sampling"]),
        kv_blocks=None if kvb < 0 else kvb,
        need_stats=bool(d["need_stats"]),
    )
    engine.state = st
    return np.asarray(tokens)
