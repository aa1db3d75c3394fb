"""Regression: the result scorer reproduces BASELINE.md from the committed
IROS'24 result JSONs (the reference's own golden outputs)."""

import glob
import os

import pytest

from grasptrajopt_tpu.utils import aggregate_results, load_results

RESULTS_DIR = "/root/reference/examples/results_iros2024"

# (file glob, trials, success, mean_planning_time) from BASELINE.md
EXPECTED = [
    ("GTO_scenereplica_panda_tabletop*", 200, 120, 10.25),
    ("GTO_scenereplica_panda_shelf*", 120, 53, 8.29),
    ("GTO_scenereplica_fetch_tabletop*", 200, 132, 11.66),
    ("GTO_scenereplica_fetch_shelf*", 120, 78, 8.39),
    ("GTO_scenereplica_mobile_fetch_tabletop*", 200, 134, None),
    ("GTO_scenereplica_mobile_fetch_shelf*", 120, 71, None),
    ("OMG_scenereplica_panda_tabletop*", 200, 112, None),
    ("OMG_scenereplica_panda_shelf*", 120, 38, None),
]


@pytest.mark.parametrize("pattern,trials,success,plan_time", EXPECTED)
def test_baseline_scores(pattern, trials, success, plan_time):
    if not os.path.isdir(RESULTS_DIR):
        pytest.skip("reference results not available")
    files = glob.glob(os.path.join(RESULTS_DIR, pattern))
    assert len(files) == 1, files
    agg = aggregate_results(load_results(files[0]))
    assert agg["trials"] == trials
    assert agg["success"] == success
    if plan_time is not None:
        assert abs(agg["mean_planning_time"] - plan_time) < 0.01
