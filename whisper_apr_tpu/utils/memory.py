"""Device memory planning and introspection.

The reference manages memory with a size-class buffer pool and simulated
mmap bookkeeping (reference: src/memory/pool.rs:145 MemoryPool with
hit/miss stats — the "zero-alloc after warmup" claim — and src/memory/mmap.rs
weight-region planning). Under XLA, zero-realloc comes by CONSTRUCTION:
fixed shapes + donated buffers. This module provides the planning/observability
equivalents: live device memory stats, model/cache footprint estimation,
and buffer-donation helpers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..config import ModelConfig


@dataclasses.dataclass
class MemoryStats:
    """Device memory snapshot (the pool-stats analog, pool.rs:156-172)."""

    bytes_in_use: int
    bytes_limit: int
    peak_bytes: int

    @property
    def utilization(self) -> float:
        return self.bytes_in_use / self.bytes_limit if self.bytes_limit else 0.0


def device_memory_stats(device=None) -> Optional[MemoryStats]:
    """Live HBM stats from the device, when the backend exposes them."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", None)
    if stats is None:
        return None
    try:
        s = stats()
    except Exception:  # noqa: BLE001 - backend may not support it
        return None
    if not s:
        return None
    return MemoryStats(
        bytes_in_use=s.get("bytes_in_use", 0),
        bytes_limit=s.get("bytes_limit", 0),
        peak_bytes=s.get("peak_bytes_in_use", s.get("bytes_in_use", 0)))


@dataclasses.dataclass
class MemoryPlan:
    """Pre-flight footprint estimate (reference analog:
    ModelConfig::peak_memory_bytes, src/model/mod.rs:276)."""

    weights_bytes: int
    kv_cache_bytes: int
    activations_bytes: int

    @property
    def total_bytes(self) -> int:
        return self.weights_bytes + self.kv_cache_bytes + self.activations_bytes

    def fits(self, hbm_bytes: int = 16 << 30) -> bool:
        return self.total_bytes < hbm_bytes * 0.9


def plan_memory(config: ModelConfig, batch: int = 1,
                param_bytes_per_el: int = 4,
                compute_bytes_per_el: int = 4) -> MemoryPlan:
    """Estimate HBM needs for one inference session."""
    weights = config.parameter_count() * param_bytes_per_el
    kv = config.kv_cache_bytes(batch, compute_bytes_per_el)
    # encoder activations dominate: [B, 1500, d] x ~4 live tensors + scores
    acts = batch * config.n_audio_ctx * config.n_audio_state \
        * compute_bytes_per_el * 8
    return MemoryPlan(weights, kv, acts)


def recommend_model(hbm_bytes: int, batch: int = 1,
                    quantization: str = "int8") -> str:
    """Largest model preset whose inference session fits the given memory
    (reference: recommendedModelForMemory, src/wasm/mod.rs:640, and
    recommended_wasm_pages, src/model/mod.rs:295 — re-expressed for HBM)."""
    from ..config import ModelConfig
    per_el = {"int8": 1, "int4": 1, "none": 4,
              "bfloat16": 2, "float32": 4}.get(quantization, 4)
    best = "tiny"
    for name in ("tiny", "base", "small", "medium", "large-v3"):
        plan = plan_memory(ModelConfig.from_name(name), batch,
                           param_bytes_per_el=per_el,
                           compute_bytes_per_el=2)
        if plan.fits(hbm_bytes):
            best = name
    return best


def tree_bytes(params: Any) -> int:
    """Actual bytes of a parameter pytree on device."""
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree_util.tree_leaves(params))


def donate_buffers(fn, donate_argnums=(0,)):
    """jit with buffer donation — XLA reuses the donated input's HBM for the
    output, the construction-level analog of the reference's buffer pool
    reuse (pool.rs get_buffer/return_buffer)."""
    return jax.jit(fn, donate_argnums=donate_argnums)
