"""Closed-loop evaluation harness: synthetic scenes, rendered observations,
full-pipeline planning, and replay scoring with the reference's criteria."""

import numpy as np
import pytest

import jax.numpy as jnp

from grasptrajopt_tpu.envs.synthetic import (
    GRASP_CONVENTIONS,
    SyntheticSceneEnv,
    box_grasps,
    cylinder_grasps,
    default_catalog,
)


class TestSyntheticEnv:
    def test_scene_determinism(self):
        a = SyntheticSceneEnv(n_objects=5).setup_scene(36)
        b = SyntheticSceneEnv(n_objects=5).setup_scene(36)
        assert a == b
        c = SyntheticSceneEnv(n_objects=5).setup_scene(37)
        assert c["object_names"] != a["object_names"] or c["nearest_first"] != a["nearest_first"]

    def test_grasp_frames_are_rotations(self):
        for conv in GRASP_CONVENTIONS.values():
            for G in cylinder_grasps(0.033, 0.1, convention=conv) + box_grasps(
                0.04, 0.09, 0.17, convention=conv
            ):
                R = G[:3, :3]
                np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
                assert np.linalg.det(R) > 0.999

    def test_grasps_point_at_object(self):
        env = SyntheticSceneEnv(n_objects=3)
        meta = env.setup_scene(10)
        name = meta["object_names"][0]
        placed = env._placed(name)
        center = placed.pose[:3, 3] + [0, 0, placed.obj.height / 2]
        conv = env.convention
        axis = {"x": 0, "y": 1, "z": 2}[conv["approach"]]
        for G in env.grasps_world(name):
            a = G[:3, axis]
            to_obj = center - G[:3, 3]
            # approach axis roughly toward the object center, fingertip
            # midpoint within the object's bounding sphere
            assert a @ (to_obj / np.linalg.norm(to_obj)) > 0.7
            tip = G[:3, 3] + conv["backoff"] * a
            assert np.linalg.norm(tip - center) < placed.obj.height / 2 + placed.obj.radius_xy + 0.03

    def test_observation_and_removal(self):
        env = SyntheticSceneEnv(n_objects=4, width=96, height=96)
        meta = env.setup_scene(48)
        depth, mask, cam_pose, K = env.get_observation()
        assert depth.shape == (96, 96) and mask.shape == (96, 96)
        # background is FAR (10 m), not zero — the visibility sign test
        # depends on it (see get_observation docstring)
        assert depth.max() == pytest.approx(10.0)
        uids = {p.uid for p in env.objects}
        seen = set(np.unique(mask)) & uids
        assert len(seen) >= 3, f"objects visible: {seen}"
        name = meta["object_names"][0]
        uid = env._placed(name).uid
        env.remove_object(name)
        _, mask2, _, _ = env.get_observation()
        assert uid not in np.unique(mask2)
        env.reset_scene()
        _, mask3, _, _ = env.get_observation()
        assert uid in np.unique(mask3)

    def test_catalog_objects_graspable(self):
        conv = GRASP_CONVENTIONS["panda"]
        for name, obj in default_catalog().items():
            g = obj.grasps(conv)
            assert g.shape[0] >= 4, f"{name} has too few grasps"


@pytest.mark.slow
class TestClosedLoopEvaluation:
    def test_tabletop_success_and_no_collisions(self, data_dir):
        """The de facto integration test of the whole framework (the role
        the reference gives PyBullet replay): plan every object of a
        synthetic tabletop scene with the full pipeline and verify the
        plans reach their grasps collision-free under the reference's
        replay criteria."""
        from examples.synthetic_eval import build_models, evaluate_scenes
        from grasptrajopt_tpu.utils.results import aggregate_results

        robot, gripper, cfg = build_models("panda", data_dir)
        results = evaluate_scenes(
            robot, gripper, cfg,
            scene_type="tabletop", scene_ids=[10], n_objects=3,
            orderings=["nearest_first"], verbose=False,
        )
        agg = aggregate_results(results)
        assert agg["trials"] == 3
        assert agg["success_rate"] >= 2 / 3, results
        recs = [
            rec
            for o in results.values()
            for objs in o.values()
            for rec in objs.values()
        ]
        collisions = sum(int(bool(r.get("collision", False))) for r in recs)
        assert collisions == 0, results
        # every record carries the reference schema fields
        for r in recs:
            for key in ("reward", "checking_time", "ik_time", "planning_time"):
                assert key in r


class TestScorePlan:
    def test_errors_attributed_to_a_goal_meeting_tolerances(self, monkeypatch):
        """When reached, (err_pos, err_rot) must come from a goal that
        satisfies BOTH tolerances, not the best-combined-score goal (which
        may violate one of them — symmetric flip pairs make this common)."""
        from grasptrajopt_tpu.planning import evaluate

        # goal 0 wins the combined score but fails rot tol; goal 1 is the
        # goal actually reached
        d = np.array([0.001, 0.018])
        rot = np.array([12.0, 8.0])
        monkeypatch.setattr(
            evaluate, "goalset_reach_errors", lambda *a, **k: (d, rot)
        )
        monkeypatch.setattr(
            evaluate,
            "check_plan_collision",
            lambda *a, **k: (False, np.zeros(5, dtype=int)),
        )
        rec = evaluate.score_plan(
            None, "ee", np.zeros((7, 3)), None, None,
            pos_tol=0.02, rot_tol_deg=10.0,
        )
        assert rec["reached"] and rec["reward"] == 1
        assert rec["err_pos"] == pytest.approx(0.018)
        assert rec["err_rot"] == pytest.approx(8.0)

    def test_unreached_reports_best_combined(self, monkeypatch):
        from grasptrajopt_tpu.planning import evaluate

        d = np.array([0.05, 0.2])
        rot = np.array([30.0, 2.0])
        monkeypatch.setattr(
            evaluate, "goalset_reach_errors", lambda *a, **k: (d, rot)
        )
        monkeypatch.setattr(
            evaluate,
            "check_plan_collision",
            lambda *a, **k: (True, np.full(5, 9, dtype=int)),
        )
        rec = evaluate.score_plan(None, "ee", np.zeros((7, 3)), None, None)
        assert not rec["reached"] and rec["collision"] and rec["reward"] == 0
        assert rec["err_pos"] == pytest.approx(0.05)
