"""Fast parameter checkpoints (save/restore of prepared pytrees).

(reference analog: the `.apr` container IS the reference's checkpoint format,
SURVEY.md §5.4. This adds a second, loading-speed-oriented format: the
ALREADY-PREPARED parameter pytree — transposed, stacked, possibly quantized
QTensors — dumped as one .npz, so a large model skips the per-tensor
parse/transpose/stack work on every process start.)
"""

from __future__ import annotations

import io
import json
import pickle
from typing import Any, Tuple

import jax
import numpy as np

FORMAT_VERSION = 1


def save_params(path: str, params: Any) -> None:
    """Serialize a parameter pytree (incl. QTensor nodes) to ``path``."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    meta = {
        "version": FORMAT_VERSION,
        "n_leaves": len(leaves),
        # treedef includes registered pytree node types (QTensor)
        "treedef": pickle.dumps(treedef).hex(),
    }
    with open(path, "wb") as f:
        np.savez(f, __meta__=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8), **arrays)


def load_params(path: str, device_put: bool = True) -> Any:
    """Restore a pytree saved by :func:`save_params`."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta["version"] > FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    treedef = pickle.loads(bytes.fromhex(meta["treedef"]))
    if device_put:
        import jax.numpy as jnp
        leaves = [jnp.asarray(leaf) for leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)
