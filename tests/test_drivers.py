"""End-to-end execution of the experiment drivers on the fake backend.

Runs `examples/gto_planning.py` (the reference's headline pipeline,
pybullet_gto_planning.py) and `examples/evaluate_plans.py` (the replay
checker, pybullet_evaluate_plans.py) as real __main__-style invocations
against the kinematic pybullet emulator and a miniature SceneReplica-shaped
dataset — the full observation -> fields -> grasp filter -> IK screen ->
goal-set planning -> execution -> reward -> JSON flow actually executes.
"""

import importlib
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from fake_dataset import make_mini_dataset

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


@pytest.fixture(scope="module", autouse=True)
def _fake_env():
    from grasptrajopt_tpu.envs import fake_pybullet as fp

    assert fp.install(force=True)
    # envs may have been imported before the fake existed: refresh the gate
    import grasptrajopt_tpu.envs as envs

    importlib.reload(envs)
    assert envs.HAS_PYBULLET
    yield
    fp.disconnect()


def _load_driver(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(EXAMPLES, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_gto_planning_then_evaluate(tmp_path, monkeypatch):
    data_dir = str(tmp_path / "dataset")
    os.makedirs(data_dir)
    make_mini_dataset(data_dir, scene_id=10)
    monkeypatch.chdir(tmp_path)

    # -- planning driver (C21) ------------------------------------------------
    monkeypatch.setattr(
        sys, "argv",
        ["gto_planning.py", "-s", "10", "-d", data_dir, "--goal_capacity", "2"],
    )
    driver = _load_driver("gto_planning")
    assert driver.HAS_PYBULLET
    driver.main()

    results_dir = tmp_path / "results"
    files = list(results_dir.glob("GTO_scenereplica_panda_tabletop_*.json"))
    assert len(files) == 1
    with open(files[0]) as f:
        results = json.load(f)
    assert set(results.keys()) == {"10"}
    assert set(results["10"].keys()) == {"nearest_first", "random"}
    planned = 0
    for ordering, objects in results["10"].items():
        assert set(objects) == {"009_gelatin_box", "010_potted_meat_can"}
        for rec in objects.values():
            assert {"reward", "plan", "checking_time", "ik_time", "planning_time"} <= set(rec)
            if rec["plan"] is not None:
                plan = np.asarray(rec["plan"])
                assert plan.shape[0] == 9  # panda ndof rows (reference schema)
                planned += 1
    # the pipeline must actually produce plans on this easy scene, not just
    # degrade gracefully to zero-reward records
    assert planned >= 2

    # the recorded-success aggregation path of the scorer handles the file
    from grasptrajopt_tpu.utils import aggregate_results, load_results

    agg = aggregate_results(load_results(str(files[0])))
    assert agg["trials"] == 4

    # -- replay/evaluation driver (C23) --------------------------------------
    monkeypatch.setattr(
        sys, "argv",
        ["evaluate_plans.py", "-s", "10", "-d", data_dir, "-f", str(files[0])],
    )
    evaluator = _load_driver("evaluate_plans")
    evaluator.main()


@pytest.mark.slow
def test_mobile_driver(tmp_path, monkeypatch):
    """Mobile-manipulation driver (C22): base placement, differential-drive
    repositioning, base freeze, base-frame per-object loop — executed
    end-to-end on the fake backend with Fetch."""
    data_dir = str(tmp_path / "dataset")
    os.makedirs(data_dir)
    make_mini_dataset(data_dir, scene_id=10)
    monkeypatch.chdir(tmp_path)

    monkeypatch.setattr(
        sys, "argv",
        ["gto_planning_mobile.py", "-s", "10", "-d", data_dir, "--goal_capacity", "2"],
    )
    driver = _load_driver("gto_planning_mobile")
    # one ordering keeps the runtime bounded; the second adds no coverage
    monkeypatch.setitem(
        driver.SCENE_KNOBS, "tabletop",
        dict(driver.SCENE_KNOBS["tabletop"], orderings=["nearest_first"]),
    )
    np.random.seed(0)
    driver.main()

    files = list((tmp_path / "results").glob("GTO_scenereplica_mobile_fetch_tabletop_*.json"))
    assert len(files) == 1
    with open(files[0]) as f:
        results = json.load(f)
    rec = results["10"]["nearest_first"]
    # mobile runs persist the chosen base pose (reference schema,
    # pybullet_gto_planning_mobile.py:247)
    RT_base_new = np.asarray(rec["RT_base_new"])
    assert RT_base_new.shape == (4, 4)
    # the base actually moved from its -2 m spawn toward the table
    assert RT_base_new[0, 3] > -1.9
    for name in ("009_gelatin_box", "010_potted_meat_can"):
        assert {"reward", "plan", "checking_time"} <= set(rec[name])


@pytest.mark.slow
def test_throughput_serving_demo(monkeypatch):
    """The serving demo must stream all batches through PlanStream and
    report a sustained rate (pipelined results identical to synchronous
    is covered by tests/test_parallel.py; here the DRIVER executes)."""
    monkeypatch.setattr(
        sys, "argv",
        ["throughput_serving.py", "--batches", "3", "--batch", "2",
         "--iterations", "2", "--goals", "2"],
    )
    mod = _load_driver("throughput_serving")
    mod.main()
