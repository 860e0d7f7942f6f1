"""Fast parameter checkpoints (save/restore of prepared pytrees).

(reference analog: the `.apr` container IS the reference's checkpoint format,
SURVEY.md §5.4. This adds a second, loading-speed-oriented format: the
ALREADY-PREPARED parameter pytree — transposed, stacked, possibly quantized
QTensors — dumped as one .npz, so a large model skips the per-tensor
parse/transpose/stack work on every process start.)

Security: the tree structure is stored as a DECLARATIVE JSON spec and
rebuilt at load time — never pickled. The reference's container makes the
same choice (pure binary layout + CRC, reference src/format/mod.rs:63);
unpickling a treedef from an untrusted file would be arbitrary code
execution (v1 of this format did exactly that; v1 files are now refused).
"""

from __future__ import annotations

import json
from typing import Any, List

import numpy as np

from ..ops.quant import QTensor

FORMAT_VERSION = 2


def _to_spec(tree: Any, leaves: List[np.ndarray]) -> Any:
    """Encode ``tree`` as a JSON-able structure spec, appending array leaves
    to ``leaves`` in traversal order."""
    if tree is None:
        return {"t": "none"}
    if isinstance(tree, QTensor):
        return {
            "t": "qtensor",
            "aux": [tree.int4, tree.orig_last, tree.group, tree.kpack],
            "q": _to_spec(tree.q, leaves),
            "scale": _to_spec(tree.scale, leaves),
            "zero": _to_spec(tree.zero, leaves),
        }
    if isinstance(tree, dict):
        for k in tree:
            if not isinstance(k, str):
                raise TypeError(f"checkpoint dict keys must be str, got {k!r}")
        return {"t": "dict",
                "items": [[k, _to_spec(v, leaves)] for k, v in tree.items()]}
    if isinstance(tree, (list, tuple)):
        return {"t": "list" if isinstance(tree, list) else "tuple",
                "items": [_to_spec(v, leaves) for v in tree]}
    # array leaf
    leaves.append(np.asarray(tree))
    return {"t": "leaf", "i": len(leaves) - 1}


def _from_spec(spec: Any, leaves: List[Any]) -> Any:
    if spec["t"] == "none":
        return None
    if spec["t"] == "leaf":
        return leaves[spec["i"]]
    if spec["t"] == "qtensor":
        int4, orig_last, group, kpack = spec["aux"]
        return QTensor(
            _from_spec(spec["q"], leaves),
            _from_spec(spec["scale"], leaves),
            int4=int4, orig_last=orig_last, group=group, kpack=kpack,
            zero=_from_spec(spec["zero"], leaves))
    if spec["t"] == "dict":
        return {k: _from_spec(v, leaves) for k, v in spec["items"]}
    if spec["t"] in ("list", "tuple"):
        seq = [_from_spec(v, leaves) for v in spec["items"]]
        return seq if spec["t"] == "list" else tuple(seq)
    raise ValueError(f"unknown checkpoint node type {spec['t']!r}")


def save_params(path: str, params: Any) -> None:
    """Serialize a parameter pytree (incl. QTensor nodes) to ``path``."""
    leaves: List[np.ndarray] = []
    spec = _to_spec(params, leaves)
    arrays = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    meta = {"version": FORMAT_VERSION, "n_leaves": len(leaves), "spec": spec}
    with open(path, "wb") as f:
        np.savez(f, __meta__=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8), **arrays)


def load_params(path: str, device_put: bool = True) -> Any:
    """Restore a pytree saved by :func:`save_params`.

    Refuses v1 checkpoints (they carried a pickled treedef — an arbitrary
    code execution vector); re-save with the current version.
    """
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta["version"] != FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {meta['version']} "
                f"(v1 used a pickled treedef and is refused; re-save)")
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    if device_put:
        import jax.numpy as jnp
        leaves = [jnp.asarray(leaf) for leaf in leaves]
    return _from_spec(meta["spec"], leaves)
