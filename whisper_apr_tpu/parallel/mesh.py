"""Device mesh + sharding rules: the distributed layer.

The reference has NO distributed backend (SURVEY.md §2.13 — its parallelism
is rayon threads and Web Workers). The TPU-native equivalent is a
``jax.sharding.Mesh`` over ICI with GSPMD-propagated shardings:

- ``dp`` axis: data parallel — batch dimension of mel/tokens/caches
- ``tp`` axis: tensor parallel — attention heads + FFN hidden of each block,
  plus the vocabulary dimension of the embedding (Megatron-style split;
  XLA inserts the psum/all-gather collectives automatically)

Weights are annotated once via ``shard_params``; activations follow from the
batch sharding + propagation. On a single chip everything degrades to
replicated, so the same code path serves 1..N devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def _attn_specs(tp_ok: bool) -> dict:
    """PartitionSpecs for one stacked attention param group [L, ...]."""
    col = P(None, None, "tp") if tp_ok else P()
    row = P(None, "tp", None) if tp_ok else P()
    vec = P(None, "tp") if tp_ok else P()
    return {
        "q_w": col, "q_b": vec,
        "k_w": col, "k_b": vec,
        "v_w": col, "v_b": vec,
        "o_w": row, "o_b": P(),  # row-parallel output proj: bias replicated
    }


def param_specs(params: dict, shard_tp: bool = True) -> dict:
    """Megatron-style PartitionSpec tree matching the params pytree.

    Column-split QKV/fc1 (output dim on tp), row-split out_proj/fc2 (input
    dim on tp), vocab-split token embedding. LayerNorms and conv stem are
    replicated (tiny).
    """
    ln = {"w": P(), "b": P()}
    col3 = P(None, None, "tp") if shard_tp else P()
    row3 = P(None, "tp", None) if shard_tp else P()
    vec2 = P(None, "tp") if shard_tp else P()

    enc = {
        "conv1": {"w": P(), "b": P()},
        "conv2": {"w": P(), "b": P()},
        "pos_emb": P(),
        "blocks": {
            "ln1": dict(ln), "attn": _attn_specs(shard_tp), "ln2": dict(ln),
            "fc1": {"w": col3, "b": vec2},
            "fc2": {"w": row3, "b": P()},
        },
        "ln_post": dict(ln),
    }
    dec = {
        "token_emb": P("tp", None) if shard_tp else P(),
        "pos_emb": P(),
        "blocks": {
            "ln1": dict(ln),
            "self_attn": _attn_specs(shard_tp),
            "ln2": dict(ln),
            "cross_attn": _attn_specs(shard_tp),
            "ln3": dict(ln),
            "fc1": {"w": col3, "b": vec2},
            "fc2": {"w": row3, "b": P()},
        },
        "ln_post": dict(ln),
    }
    return {"encoder": enc, "decoder": dec}


def shard_params(params: dict, mesh: Mesh, shard_tp: bool = True) -> dict:
    """Place the parameter pytree onto the mesh with TP shardings."""
    specs = param_specs(params, shard_tp=shard_tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(x, mesh: Mesh, axis: int = 0):
    """Shard an array's batch axis over dp (replicated over tp)."""
    spec = [None] * x.ndim
    spec[axis] = "dp"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
