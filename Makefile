# Test/bench entry points.
#
# The container's sitecustomize registers the axon TPU PJRT plugin in every
# python process and serializes device access through a single-tenant relay.
# CPU-side work (tests, asset prep) must disable it at process launch;
# `bench.py` is the only thing that should touch the real chip.

CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-fast bench eval eval-shelf eval-pybullet

# full suite (nightly): ~60 min on 4 cores (223 tests)
test:
	$(CPU_ENV) python -m pytest tests/ -q

# iteration suite: <10 min — planner/pipeline/batching integration tests
# over ~40 s are marked `slow` (split measured round 5, logs in docs)
test-fast:
	$(CPU_ENV) python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

# closed-loop evaluation on synthetic SceneReplica-style scenes (CPU)
eval:
	$(CPU_ENV) python examples/synthetic_eval.py -t tabletop

eval-shelf:
	$(CPU_ENV) python examples/synthetic_eval.py -t shelf

# real-engine on-ramp (CLAUDE.md round-2 note): the day pybullet becomes
# installable, this is the scene-10 closed-loop run against the real
# SceneReplica dataset (point GTO_DATA_DIR at it first). Until then the
# driver exits with its own "needs pybullet" message — the import path and
# the driver flow itself are kept green by tests/test_drivers.py (fake
# backend) and tests/test_pybullet_onramp.py (--help / module gate).
eval-pybullet:
	$(CPU_ENV) python examples/gto_planning.py -t tabletop -s 10
