"""Multi-device tests on the 8-virtual-device CPU mesh: sharded batch
solving, collectives, and the driver entry points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasptrajopt_tpu.parallel import (
    data_mesh,
    make_sharded_solver,
    shard_batch,
    sharded_metric_reduce,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return data_mesh(8)


class TestSharding:
    def test_metric_reduce(self, mesh):
        vals = jnp.arange(16.0)
        vals = shard_batch(vals, mesh)
        mean = sharded_metric_reduce(vals, mesh)
        np.testing.assert_allclose(float(mean), 7.5, atol=1e-6)

    def test_sharded_solver_matches_unsharded(self, mesh):
        from grasptrajopt_tpu.opt import make_box_lm_solver
        from grasptrajopt_tpu.opt.lm import LMConfig

        def res(x, p):
            return x - p

        lo, hi = -5 * jnp.ones(3), 5 * jnp.ones(3)
        inner = make_box_lm_solver(res, config=LMConfig(iterations=15))

        def solve_one(target):
            return inner(jnp.zeros(3), lo, hi, target)

        targets = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32))
        sharded = make_sharded_solver(solve_one, mesh)
        (xs, cs, _), metrics = sharded(shard_batch(targets, mesh))
        np.testing.assert_allclose(np.asarray(xs), np.asarray(targets), atol=1e-5)
        assert np.isfinite(float(metrics["mean_cost"]))

    def test_output_sharding_layout(self, mesh):
        from grasptrajopt_tpu.opt import make_box_lm_solver
        from grasptrajopt_tpu.opt.lm import LMConfig

        def res(x, p):
            return x - p

        inner = make_box_lm_solver(res, config=LMConfig(iterations=5))
        solve_one = lambda t: inner(jnp.zeros(3), -5 * jnp.ones(3), 5 * jnp.ones(3), t)
        targets = shard_batch(jnp.ones((16, 3)), mesh)
        (xs, _, _), _ = make_sharded_solver(solve_one, mesh)(targets)
        # result stays sharded over the mesh, one shard per device
        assert len(xs.sharding.device_set) == 8


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        Q, cost = jax.jit(fn)(*args)
        assert Q.shape[1:] == (50, 7)
        assert np.isfinite(np.asarray(cost)).all()

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
