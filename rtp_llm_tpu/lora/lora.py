"""LoRA adapter loading, merging, and the runtime adapter registry.

HF PEFT layout: adapter_config.json {r, lora_alpha, target_modules}, weights
``base_model.model.model.layers.{l}.self_attn.q_proj.lora_A.weight`` [r, in]
and ``...lora_B.weight`` [out, r]. Canonical storage here:
``A[name] = [L, in, r]``, ``B[name] = [L, r, out]`` (so delta = A @ B in our
x@W convention), scaled by alpha/r at load.

Reference analogs: lora weight load (model_loader/loader.py:100), dynamic
add/remove (lora/lora_manager.py:72-83), per-request adapter_name
(GenerateConfig.h:51).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import threading
from typing import Dict, List, Optional

import numpy as np

# HF target module name -> canonical weight name
_TARGET_TO_CANONICAL = {
    "q_proj": "q_proj",
    "k_proj": "k_proj",
    "v_proj": "v_proj",
    "o_proj": "o_proj",
    "gate_proj": "gate_proj",
    "up_proj": "up_proj",
    "down_proj": "down_proj",
}

_NAME_RE = re.compile(
    r"layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)\.lora_(A|B)\.weight$"
)


@dataclasses.dataclass
class LoraAdapter:
    name: str
    rank: int
    alpha: float
    # canonical name -> [L, in, r] / [L, r, out] float32 (zeros where absent)
    a: Dict[str, np.ndarray]
    b: Dict[str, np.ndarray]

    @property
    def scale(self) -> float:
        return self.alpha / max(self.rank, 1)


def load_peft_adapter(path: str, num_layers: int, name: Optional[str] = None) -> LoraAdapter:
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    rank = int(cfg.get("r", 8))
    alpha = float(cfg.get("lora_alpha", rank))

    from safetensors import safe_open

    st_path = os.path.join(path, "adapter_model.safetensors")
    tensors: Dict[str, np.ndarray] = {}
    if os.path.exists(st_path):
        with safe_open(st_path, framework="np") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    else:
        import torch

        sd = torch.load(os.path.join(path, "adapter_model.bin"),
                        map_location="cpu", weights_only=True)
        tensors = {k: v.float().numpy() for k, v in sd.items()}

    a: Dict[str, np.ndarray] = {}
    b: Dict[str, np.ndarray] = {}
    for hf_name, t in tensors.items():
        m = _NAME_RE.search(hf_name)
        if not m:
            continue
        layer, target, ab = int(m.group(1)), m.group(2), m.group(3)
        canon = _TARGET_TO_CANONICAL.get(target)
        if canon is None:
            continue
        t = np.asarray(t, np.float32)
        if ab == "A":  # [r, in] -> ours [in, r]
            store, mat = a, t.T
        else:  # [out, r] -> ours [r, out]
            store, mat = b, t.T
        if canon not in store:
            store[canon] = None  # placeholder until shapes known
        if store[canon] is None:
            shape = (num_layers,) + mat.shape
            store[canon] = np.zeros(shape, np.float32)
        store[canon][layer] = mat
    return LoraAdapter(
        name=name or os.path.basename(path.rstrip("/")), rank=rank, alpha=alpha,
        a=a, b=b,
    )


def merge_lora(weights: dict, adapter: LoraAdapter) -> dict:
    """Static merge: W[name] += (A @ B) * scale, per layer. Works on bf16/f32
    base weights (quantized bases cannot be merged — use dynamic mode)."""
    import jax.numpy as jnp

    out = dict(weights)
    for name, A in adapter.a.items():
        Bm = adapter.b.get(name)
        if Bm is None or name not in weights:
            continue
        W = weights[name]
        if W.dtype == jnp.int8:
            raise ValueError(
                f"cannot statically merge LoRA into quantized weight {name!r}; "
                "use dynamic adapters"
            )
        delta = jnp.einsum(
            "lir,lro->lio", jnp.asarray(A), jnp.asarray(Bm)
        ) * adapter.scale
        out[name] = (W.astype(jnp.float32) + delta).astype(W.dtype)
    return out


class LoraManager:
    """Runtime adapter registry (reference: LoraManager add/remove,
    lora_manager.py:72-83). Dynamic application: y += ((x @ A) @ B) * scale
    for the adapter bound to each request.

    ``device_pack`` stacks all adapters into per-weight tensors
    ``[n_adapters+1, L, in, r_max]`` / ``[n_adapters+1, L, r_max, out]``
    (id 0 = no adapter, zeros; scale folded into B) so the batched decode
    program can gather each row's adapter by id."""

    def __init__(self, num_layers: int):
        self.num_layers = num_layers
        self._adapters: Dict[str, LoraAdapter] = {}
        self._ids: Dict[str, int] = {}
        self._lock = threading.Lock()

    def add_adapter(self, path: str, name: Optional[str] = None) -> str:
        adapter = load_peft_adapter(path, self.num_layers, name)
        with self._lock:
            self._adapters[adapter.name] = adapter
            if adapter.name not in self._ids:
                self._ids[adapter.name] = len(self._ids) + 1  # 0 = none
        return adapter.name

    def remove_adapter(self, name: str) -> bool:
        with self._lock:
            # id stays reserved (slot becomes zeros on next pack)
            return self._adapters.pop(name, None) is not None

    def adapter_id(self, name: Optional[str]) -> int:
        if not name:
            return 0
        with self._lock:
            if name not in self._adapters:
                raise KeyError(f"unknown LoRA adapter {name!r}")
            return self._ids[name]

    def device_pack(self) -> dict:
        """Stacked {canonical.lora_a / canonical.lora_b} jnp tensors."""
        import jax.numpy as jnp
        import numpy as _np

        with self._lock:
            adapters = dict(self._adapters)
            ids = dict(self._ids)
        if not adapters:
            return {}
        n_slots = max(ids.values()) + 1
        r_max = max(a.rank for a in adapters.values())
        names = set()
        for a in adapters.values():
            names |= set(a.a) & set(a.b)
        out = {}
        for name in sorted(names):
            shapes = next(
                (a.a[name].shape, a.b[name].shape)
                for a in adapters.values() if name in a.a
            )
            (_L, in_dim, _r), (_L2, _r2, out_dim) = shapes
            A = _np.zeros((n_slots, self.num_layers, in_dim, r_max), _np.float32)
            B = _np.zeros((n_slots, self.num_layers, r_max, out_dim), _np.float32)
            for aname, a in adapters.items():
                if name not in a.a or name not in a.b:
                    continue
                sid = ids[aname]
                A[sid, :, :, : a.rank] = a.a[name]
                B[sid, :, : a.rank, :] = a.b[name] * a.scale
            out[name + ".lora_a"] = jnp.asarray(A, jnp.bfloat16)
            out[name + ".lora_b"] = jnp.asarray(B, jnp.bfloat16)
        return out

    def get(self, name: Optional[str]) -> Optional[LoraAdapter]:
        if not name:
            return None
        with self._lock:
            adapter = self._adapters.get(name)
        if adapter is None:
            raise KeyError(f"unknown LoRA adapter {name!r}")
        return adapter

    def names(self) -> List[str]:
        with self._lock:
            return sorted(self._adapters)


def apply_dynamic_lora(x, name: str, layer: int, adapter: Optional[LoraAdapter]):
    """Per-layer dynamic delta: returns ((x @ A_l) @ B_l) * scale or 0."""
    if adapter is None:
        return 0.0
    A = adapter.a.get(name)
    Bm = adapter.b.get(name)
    if A is None or Bm is None:
        return 0.0
    import jax.numpy as jnp

    a = jnp.asarray(A[layer], x.dtype)
    bmat = jnp.asarray(Bm[layer], x.dtype)
    return ((x @ a) @ bmat) * adapter.scale
