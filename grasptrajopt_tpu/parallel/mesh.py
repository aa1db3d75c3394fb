"""Mesh construction and batch sharding helpers."""

from __future__ import annotations

from typing import Optional


import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op on a single host).

    On TPU pods the arguments are auto-detected from the environment; this
    is the DCN-side counterpart of the reference's absent NCCL/MPI layer
    (SURVEY.md §2.3).

    Call with explicit (coordinator, num_processes, process_id) for manual
    setups; with no arguments it auto-detects from the cluster environment
    (TPU pod metadata / JAX_COORDINATOR_ADDRESS et al.) and stays a no-op
    on a plain single host.
    """
    if num_processes is not None:
        if num_processes > 1:
            jax.distributed.initialize(coordinator, num_processes, process_id)
        return
    import os

    if coordinator is not None or any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
        )
    ):
        # multi-host cluster: let jax auto-detect everything not given
        jax.distributed.initialize(coordinator_address=coordinator)


def data_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """A 1-D data mesh over the first n (default: all) local devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return jax.make_mesh((n,), (axis_name,), devices=devices[:n])


def shard_batch(tree, mesh: Mesh, axis_name: str = "dp"):
    """Place a pytree of batched arrays with the leading axis sharded over
    the mesh's data axis (host->device transfer happens once, sharded)."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
