"""Device-mesh utilities: the TPU-native replacement for the reference's absent
distributed layer (SURVEY.md §2b — the reference is single-GPU; scale-out here is
a first-class new component).

Conventions:
  * a 1-D ``('data',)`` mesh for data-parallel embedding/prediction and the ring
    dedup; multi-host slices extend the same axis over ICI,
  * batch arrays sharded on their leading axis, model params replicated,
  * optional ``('data', 'model')`` 2-D mesh for tensor-parallel ViT serving of
    models too big for one chip (sharding rules in parallel/tp.py).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_count() -> int:
    return jax.device_count()


def compat_shard_map(f, mesh, in_specs, out_specs, check_rep: bool = False):
    """``jax.shard_map`` across JAX versions: the public API (≥0.8, kw
    ``check_vma``) when present, else the deprecated experimental module
    (kw ``check_rep``) — which emits DeprecationWarnings on 0.8+ and is
    slated for removal. All parallel/ call sites route through here."""
    try:
        from jax import shard_map as _sm  # JAX >= 0.8
    except ImportError:  # pragma: no cover - old JAX only
        from jax.experimental.shard_map import shard_map as _legacy

        return _legacy(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_rep=check_rep)
    try:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=check_rep)
    except TypeError:  # pragma: no cover - signature drift
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def get_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over this process's LOCAL devices (single-process: all devices).

    Per-host pipelines (embed) shard over local chips only — each host works an
    independent file shard, so no cross-host program is involved. Cross-host
    SPMD programs (the multi-host ring dedup) use :func:`get_global_mesh`.
    """
    devices = jax.local_devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def get_global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over EVERY device in the job (all hosts). Programs over this
    mesh must run on all processes simultaneously (SPMD); collectives ride ICI
    within a slice and DCN/gloo across hosts."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def get_mesh_2d(data: int, model: int) -> Mesh:
    devices = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devices, ("data", "model"))


def shard_batch(mesh: Mesh, array, axis: str = "data"):
    """Place an array with its leading dim sharded over the mesh axis."""
    spec = P(axis, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def multihost_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialize jax.distributed for a multi-host run; returns
    ``(process_index, process_count)``.

    Launch one process per host with identical arguments except ``process_id``
    (or set the standard env vars — ``COORDINATOR_ADDRESS``, plus
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` or a cluster-env jax auto-detects).
    Single-process with no coordinator configured is a no-op returning (0, 1).
    Safe to call twice (returns the live state)."""
    import os

    already = jax.distributed.is_initialized()
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if not already:
        if coordinator_address is None:
            return 0, 1
        if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        if process_id is None and os.environ.get("JAX_PROCESS_ID"):
            process_id = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()
