# Test/bench entry points.
#
# The container's sitecustomize registers the axon TPU PJRT plugin in every
# python process and serializes device access through a single-tenant relay.
# CPU-side work (tests, asset prep) must disable it at process launch;
# `bench.py` is the only thing that should touch the real chip.

CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-fast bench eval eval-shelf

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
