"""Worker for the multi-process jax.distributed test (test_distributed.py).

Launched as N separate OS processes; each initializes the distributed
runtime through the production `parallel.mesh.distributed_init` path
(SURVEY.md §2.3 multi-process row), builds a GLOBAL mesh spanning both
processes' devices, and exercises:
  1. a cross-process psum (sharded_metric_reduce over a global array)
  2. a sharded-vs-unsharded LM solve through make_sharded_solver
Results land in a per-process JSON the parent test asserts on.

Usage: python distributed_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys


def main():
    process_id, num_processes, port, out_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from grasptrajopt_tpu.parallel import (
        data_mesh,
        distributed_init,
        make_sharded_solver,
        sharded_metric_reduce,
    )

    # the production multi-process entry (parallel/mesh.py:12) — explicit
    # coordinator/topology, the num_processes>1 branch
    distributed_init(
        coordinator=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    result = {
        "process_id": process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }

    n = len(jax.devices())
    mesh = data_mesh(n)

    # -- 1. cross-process psum: global mean of arange over every device ------
    sharding = NamedSharding(mesh, P("dp"))
    B = 2 * n
    host_vals = np.arange(B, dtype=np.float32)
    vals = jax.make_array_from_callback(
        (B,), sharding, lambda idx: host_vals[idx]
    )
    mean = sharded_metric_reduce(vals, mesh)
    result["psum_mean"] = float(mean)
    result["psum_expected"] = float(host_vals.mean())

    # -- 2. sharded-vs-unsharded solve through make_sharded_solver -----------
    from grasptrajopt_tpu.opt import make_box_lm_solver
    from grasptrajopt_tpu.opt.lm import LMConfig

    def res(x, p):
        return x - p

    inner = make_box_lm_solver(res, config=LMConfig(iterations=10))

    def solve_one(target):
        return inner(jnp.zeros(3), -5 * jnp.ones(3), 5 * jnp.ones(3), target)

    host_targets = (
        np.random.default_rng(0).normal(size=(B, 3)).astype(np.float32)
    )
    targets = jax.make_array_from_callback(
        (B, 3), sharding, lambda idx: host_targets[idx]
    )
    sharded = make_sharded_solver(solve_one, mesh)
    (xs, cs, _), metrics = sharded(targets)

    # every process checks ITS addressable shards against the host truth
    max_err = 0.0
    for s in xs.addressable_shards:
        sl = s.index[0]
        max_err = max(
            max_err, float(np.abs(np.asarray(s.data) - host_targets[sl]).max())
        )
    result["solve_max_err"] = max_err
    result["mean_cost"] = float(metrics["mean_cost"])
    result["ok"] = (
        result["process_count"] == num_processes
        and abs(result["psum_mean"] - result["psum_expected"]) < 1e-5
        and max_err < 1e-4
    )
    with open(out_path, "w") as f:
        json.dump(result, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
