"""Visualizer smoke tests (Agg backend, file output only)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from grasptrajopt_tpu.viz import Visualizer


def test_primitives_and_save(tmp_path):
    vis = Visualizer()
    vis.grid_floor()
    vis.points(np.random.default_rng(0).normal(size=(50, 3)), rgb=[1, 0, 0], size=5)
    vis.line([0, 0, 0], [1, 1, 1])
    vis.sphere(radius=0.2, position=[0.5, 0, 0.5])
    vis.box(half_extents=[0.1, 0.1, 0.1], position=[0, 0.5, 0])
    vis.cylinder(radius=0.1, height=0.3, position=[-0.5, 0, 0])
    vis.text([0, 0, 1.2], "hello")
    out = tmp_path / "scene.png"
    vis.save(str(out))
    assert out.exists() and out.stat().st_size > 1000
    vis.close()


def test_robot_rendering(tmp_path, data_dir):
    from grasptrajopt_tpu.planning import GTORobotModel
    from grasptrajopt_tpu.planning.utils import load_robot_config

    cfg = load_robot_config("panda", data_dir)
    robot = GTORobotModel(
        model_dir=f"{data_dir}/robots/panda",
        urdf_filename=f"{data_dir}/robots/panda/panda.urdf",
        collision_link_names=cfg["collision_link_names"],
        dtype=jnp.float64,
    )
    q = np.asarray(cfg["default_pose"])
    vis = Visualizer()
    vis.grid_floor()
    vis.robot(robot, q=q)
    Q = np.tile(q[:, None], (1, 3))
    Q[0, 1] = 0.5
    Q[0, 2] = 1.0
    vis.robot_traj(robot, Q, alpha_spec={"style": "A"})
    out = tmp_path / "robot.png"
    vis.save(str(out))
    assert out.exists() and out.stat().st_size > 1000
    vis.close()


def test_animate_gif(tmp_path):
    from grasptrajopt_tpu.models import RobotModel

    urdf = """
    <robot name="stick"><link name="a"/><link name="b"/>
      <joint name="j" type="revolute"><parent link="a"/><child link="b"/>
      <origin xyz="0 0 1"/><axis xyz="0 1 0"/>
      <limit lower="-1" upper="1" velocity="1"/></joint></robot>
    """
    robot = RobotModel(urdf_string=urdf, dtype=jnp.float64)
    vis = Visualizer()
    vis.grid_floor()
    Q = np.linspace(-0.5, 0.5, 4)[None, :]
    seen = []
    out = tmp_path / "traj.gif"
    frames = vis.animate(
        robot, Q, file_name=str(out), fps=5, callback=lambda v, i, q: seen.append(i)
    )
    assert len(frames) == 4 and seen == [0, 1, 2, 3]
    assert frames[0].ndim == 3 and frames[0].shape[2] == 3
    # dynamic artists are dropped between frames: the axes end clean
    assert out.exists() and out.stat().st_size > 500
    vis.close()


def test_animate_interactive_headless(tmp_path):
    """The interactive viewer (VTK-parity transport keys) must build on
    the headless backend, honor the pause/step key handlers, and degrade
    to a no-op event loop."""
    from grasptrajopt_tpu.models import RobotModel

    urdf = """
    <robot name="stick"><link name="a"/><link name="b"/>
      <joint name="j" type="revolute"><parent link="a"/><child link="b"/>
      <origin xyz="0 0 1"/><axis xyz="0 1 0"/>
      <limit lower="-1" upper="1" velocity="1"/></joint></robot>
    """
    robot = RobotModel(urdf_string=urdf, dtype=jnp.float64)
    vis = Visualizer()
    vis.grid_floor()
    Q = np.linspace(-0.5, 0.5, 4)[None, :]
    ani = vis.animate_interactive(robot, Q, fps=20)
    assert ani is not None
    assert "step 1/4" in vis.ax.get_title()

    class _Key:
        def __init__(self, key):
            self.key = key

    # space pauses, right steps forward, left steps back, up speeds up
    fire = lambda k: vis._transport_key_handler(_Key(k))
    fire(" ")
    assert "[paused]" in vis.ax.get_title()
    fire("right")
    assert "step 2/4" in vis.ax.get_title()
    fire("left")
    assert "step 1/4" in vis.ax.get_title()
    before = ani.event_source.interval
    fire("up")
    assert ani.event_source.interval < before
    vis.close()


def test_skeleton_fallback(tmp_path):
    from grasptrajopt_tpu.models import RobotModel

    urdf = """
    <robot name="stick"><link name="a"/><link name="b"/>
      <joint name="j" type="revolute"><parent link="a"/><child link="b"/>
      <origin xyz="0 0 1"/><axis xyz="0 1 0"/>
      <limit lower="-1" upper="1" velocity="1"/></joint></robot>
    """
    robot = RobotModel(urdf_string=urdf, dtype=jnp.float64)
    vis = Visualizer()
    vis.robot(robot, q=[0.3])
    out = tmp_path / "stick.png"
    vis.save(str(out))
    assert out.exists()
    vis.close()
