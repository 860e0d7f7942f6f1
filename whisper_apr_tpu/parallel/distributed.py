"""Multi-host (DCN) dispatch: jax.distributed process groups + global meshes.

The reference is strictly single-node (SURVEY.md §2.13 — Web Workers are
its only "cluster"); this is the TPU-native scale-out layer the survey
mandates (§5.8, §7 phase 8): each host drives its local chips, hosts are
joined by a coordination service, and the mesh's ``dp`` axis spans hosts so
batch parallelism rides DCN while ``tp`` stays inside a host's ICI island.

Usage (one call per process):

    init_distributed("10.0.0.1:1234", num_processes=4, process_id=rank)
    mesh = make_multihost_mesh(tp=2)
    params = shard_params(params, mesh)          # same specs as single-host
    batch = host_local_batch_to_global(x, mesh)  # local shard -> global

Validated by a real 2-process CPU test (tests/test_distributed.py) running
the full sharded pipeline step — the same ``shard_params``/``shard_batch``
path as single-host, which is the point: one code path, 1..N hosts.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import param_specs, shard_params  # noqa: F401  (re-export)


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int,
                     local_device_count: Optional[int] = None) -> None:
    """Join the process group. Must run before first backend use.

    ``local_device_count`` forces N virtual CPU devices per process (test
    rigs); real TPU hosts auto-detect their local chips.
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_multihost_mesh(tp: int = 1,
                        devices: Optional[Sequence] = None) -> Mesh:
    """Global (dp, tp) mesh with tp confined to a host's local devices.

    dp spans hosts (collectives on dp ride DCN; tp collectives stay on the
    host's ICI). Requires local device count divisible by tp.
    """
    devices = list(devices if devices is not None else jax.devices())
    n_local = jax.local_device_count()
    if n_local % tp:
        raise ValueError(f"tp={tp} does not divide local devices {n_local}")
    n = len(devices)
    # order devices host-major so the dp axis crosses hosts and each tp
    # group is host-local (devices from jax.devices() are process-major)
    dev_array = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def host_local_batch_to_global(x: np.ndarray, mesh: Mesh,
                               axis: int = 0) -> jax.Array:
    """Assemble a GLOBAL batch from each process's local shard.

    Every process passes its own rows; the returned global array has
    ``num_processes * local_rows`` along ``axis``, sharded over dp. This is
    the host-batch dispatcher primitive: each host feeds its own requests,
    one jit step runs globally.
    """
    spec = [None] * np.ndim(x)
    spec[axis] = "dp"
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def process_slice(global_out: jax.Array, axis: int = 0) -> np.ndarray:
    """Each process's rows of a dp-sharded global output (the inverse of
    ``host_local_batch_to_global`` for fetching local results).

    Shards are deduplicated by index: tp replicas of the same dp rows (and
    fully-replicated outputs) appear once."""
    seen = {}
    for s in global_out.addressable_shards:
        start = s.index[axis].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)], axis=axis)
