"""Probe: per-problem trilinear field-lookup strategies at bench shapes.

The per-problem-fields config runs 3x slower than the shared-scene config
(docs/PERF.md round-2 sweep); the stacked-flat-table experiment showed the
penalty is the 148 MB batched packed-corner working set, not the gather's
batch dim. This probe times layout/scheduling alternatives with REALISTIC
spatially-coherent indices (FK surface points along smooth trajectories --
random-index microbenchmarks mis-rank these paths, docs/PERF.md):

  packed_*   (2S, 8) corner rows, 1 gather/query, 4.65 MB/problem
  zline4     (2F*sx*sy, sz) z-line rows, 4 gathers/query, 0.58 MB/problem
  ypair2     (2F*sx*sy, 2sz) y-pair z-lines, 2 gathers/query, 1.16 MB
  quad1      (2F*sx*sy, 4sz) full 2x2 xy-neighborhood z-lines, 1 gather,
             2.3 MB/problem (half of packed), 576 B rows
  *_seq      lax.map over problems (one small-table gather at a time)
  *_chunk4   lax.map over chunks of 4 problems
  *_shared   one table for the whole batch (the headline config's op)

Each variant computes the SAME trilinear interpolation (value parity is
asserted against ops.interp.field_lookup_trilinear_packed on a subset)
and is timed over the full (B, T*P) query load of the bench problem.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

import jax.numpy as jnp

from grasptrajopt_tpu.ops.interp import pack_corners
from grasptrajopt_tpu.planning.gto_models import GTORobotModel
from grasptrajopt_tpu.planning.utils import load_robot_config

B = int(os.environ.get("PG_BATCH", "32"))
T = 50
REPS = int(os.environ.get("PG_REPS", "5"))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best * 1e3:9.2f} ms", flush=True)
    return out, best


def main():
    data_dir = os.environ.get("GTO_DATA_DIR", "/root/reference/data")
    cfg = load_robot_config("panda", data_dir)
    robot = GTORobotModel(
        model_dir=os.path.join(data_dir, "robots", "panda"),
        urdf_filename=os.path.join(data_dir, "robots/panda/panda.urdf"),
        time_derivs=[0, 1],
        param_joints=cfg["param_joints"],
        collision_link_names=cfg["collision_link_names"],
    )
    g = robot.setup_workspace_field(cfg["arm_len"], cfg["arm_height"])
    sx, sy, sz = g.shape
    S = g.size
    P = robot.num_surface_points
    N = T * P
    print(
        f"device={jax.devices()[0]} B={B} T={T} P={P} N={N} "
        f"grid={g.shape} S={S}",
        flush=True,
    )

    # -- realistic coherent query points: smooth trajectories, B goals ------
    rng = np.random.default_rng(0)
    qc = np.asarray(cfg["default_pose"], np.float32)
    q_goals = qc[None] + rng.uniform(-0.9, 0.9, size=(B, robot.ndof)).astype(np.float32)
    alphas = np.linspace(0.0, 1.0, T, dtype=np.float32)
    Q = qc[None, None] + alphas[None, :, None] * (q_goals[:, None] - qc[None, None])
    pts = jax.jit(robot.fk_surface_points)(jnp.asarray(Q))  # (B, T, P, 3)
    pts = pts.reshape(B, N, 3)
    jax.block_until_ready(pts)

    origin = jnp.asarray(g.origin, jnp.float32)
    res = g.resolution

    def base_frac(p):
        u = (p - origin) / res
        hi = jnp.asarray([sx - 2, sy - 2, sz - 2], jnp.int32)
        base = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, hi)
        frac = jnp.clip(u - base.astype(jnp.float32), 0.0, 1.0)
        return base, frac

    # -- tables ---------------------------------------------------------------
    field = rng.random(S).astype(np.float32)
    f3 = field.reshape(sx, sy, sz)
    packed1 = np.asarray(pack_corners(jnp.asarray(field), g.shape))  # (S, 8)
    packed2 = np.concatenate([packed1, packed1], axis=0)  # two fields stacked
    packed_b = jnp.asarray(np.broadcast_to(packed2, (B,) + packed2.shape).copy())

    def shifted(dy):
        return f3[:, np.minimum(np.arange(sy) + dy, sy - 1), :]

    # z-line rows keyed by (ix, iy): (sx*sy, sz)
    zline1 = f3.reshape(sx * sy, sz)
    zline2 = np.concatenate([zline1, zline1], axis=0)  # (2*sx*sy, sz)
    zline_b = jnp.asarray(np.broadcast_to(zline2, (B,) + zline2.shape).copy())
    # quad rows keyed by (ix, iy): z-lines of (ix,iy),(ix,iy+1),(ix+1,iy),(ix+1,iy+1)
    y0 = f3
    y1 = shifted(1)
    x0y0 = y0
    x0y1 = y1
    x1y0 = y0[np.minimum(np.arange(sx) + 1, sx - 1), :, :]
    x1y1 = y1[np.minimum(np.arange(sx) + 1, sx - 1), :, :]
    quad1_t = np.concatenate(
        [a.reshape(sx * sy, sz) for a in (x0y0, x0y1, x1y0, x1y1)], axis=1
    )  # (sx*sy, 4sz)
    quad2 = np.concatenate([quad1_t, quad1_t], axis=0)
    quad_b = jnp.asarray(np.broadcast_to(quad2, (B,) + quad2.shape).copy())
    print(
        f"tables/problem: packed {packed2.nbytes / 1e6:.2f} MB, "
        f"zline {zline2.nbytes / 1e6:.2f} MB, quad {quad2.nbytes / 1e6:.2f} MB",
        flush=True,
    )

    iz_iota = jnp.arange(sz, dtype=jnp.int32)

    # phase: half the trajectory uses field 0, half field 1 (like standoff)
    phase = (jnp.arange(T, dtype=jnp.int32) >= T - 10).astype(jnp.int32)
    phase_n = jnp.repeat(phase, P)  # (N,)

    def packed_lookup(table, p, pib=False, ph=None):
        base, frac = base_frac(p)
        offs = (
            base[..., 2]
            + sz * (base[..., 1] + sy * base[..., 0])
            + (phase_n if ph is None else ph) * S
        )
        if pib:
            rows = table.at[offs].get(mode="promise_in_bounds")
        else:
            rows = table[offs]
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        w = jnp.stack(
            [
                (1 - fx) * (1 - fy) * (1 - fz), (1 - fx) * (1 - fy) * fz,
                (1 - fx) * fy * (1 - fz), (1 - fx) * fy * fz,
                fx * (1 - fy) * (1 - fz), fx * (1 - fy) * fz,
                fx * fy * (1 - fz), fx * fy * fz,
            ],
            axis=-1,
        )
        return jnp.sum(rows.astype(jnp.float32) * w, axis=-1)

    def zw(frac_z, base_z):
        # (N, sz) z weights: (1-fz) at iz, fz at iz+1
        return jnp.where(iz_iota[None, :] == base_z[:, None], (1 - frac_z)[:, None], 0.0) + jnp.where(
            iz_iota[None, :] == (base_z + 1)[:, None], frac_z[:, None], 0.0
        )

    def zline_lookup(table, p, ph=None):
        base, frac = base_frac(p)
        rowk = base[..., 1] + sy * base[..., 0] + (phase_n if ph is None else ph) * (sx * sy)
        fx, fy = frac[..., 0], frac[..., 1]
        wz = zw(frac[..., 2], base[..., 2])  # (N, sz)
        r00 = jnp.sum(table[rowk].astype(jnp.float32) * wz, axis=-1)
        r01 = jnp.sum(table[rowk + 1].astype(jnp.float32) * wz, axis=-1)
        r10 = jnp.sum(table[rowk + sy].astype(jnp.float32) * wz, axis=-1)
        r11 = jnp.sum(table[rowk + sy + 1].astype(jnp.float32) * wz, axis=-1)
        # guard: iy+1 row wraps into next ix slab only when iy==sy-1, which
        # the base clamp already prevents (base_y <= sy-2)
        return (1 - fx) * ((1 - fy) * r00 + fy * r01) + fx * ((1 - fy) * r10 + fy * r11)

    def quad_lookup(table, p, ph=None):
        base, frac = base_frac(p)
        rowk = base[..., 1] + sy * base[..., 0] + (phase_n if ph is None else ph) * (sx * sy)
        rows = table[rowk].astype(jnp.float32)  # (N, 4sz)
        fx, fy = frac[..., 0], frac[..., 1]
        wz = zw(frac[..., 2], base[..., 2])  # (N, sz)
        wxy = jnp.stack(
            [(1 - fx) * (1 - fy), (1 - fx) * fy, fx * (1 - fy), fx * fy], axis=-1
        )  # (N, 4)
        w = (wxy[:, :, None] * wz[:, None, :]).reshape(-1, 4 * sz)
        return jnp.sum(rows * w, axis=-1)

    # -- correctness spot check (first problem, first 4096 queries) ---------
    ph0 = phase_n[:4096]
    ref = jax.jit(lambda t, p: packed_lookup(t, p, ph=ph0))(packed_b[0], pts[0, :4096])
    for name, fn, tbl in (
        ("zline", zline_lookup, zline_b[0]),
        ("quad", quad_lookup, quad_b[0]),
    ):
        got = jax.jit(lambda t, p: fn(t, p, ph0))(tbl, pts[0, :4096])
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-5, (name, err)
    print("parity ok", flush=True)

    # -- timed variants -------------------------------------------------------
    results = {}

    def run(name, fn, *args):
        (_, best) = timeit(name, jax.jit(fn), *args)
        results[name] = best * 1e3

    run("packed_batched", lambda t, p: jnp.sum(jax.vmap(packed_lookup)(t, p), axis=-1), packed_b, pts)
    run(
        "packed_pib",
        lambda t, p: jnp.sum(jax.vmap(lambda tt, pp: packed_lookup(tt, pp, pib=True))(t, p), axis=-1),
        packed_b,
        pts,
    )
    run(
        "packed_seq",
        lambda t, p: jax.lax.map(lambda a: jnp.sum(packed_lookup(*a)), (t, p)),
        packed_b,
        pts,
    )
    if B % 4 == 0:
        nc = B // 4
        run(
            "packed_chunk4",
            lambda t, p: jax.lax.map(
                lambda a: jnp.sum(jax.vmap(packed_lookup)(*a), axis=-1),
                (t.reshape(nc, 4, *t.shape[1:]), p.reshape(nc, 4, *p.shape[1:])),
            ),
            packed_b,
            pts,
        )
    run("zline4", lambda t, p: jnp.sum(jax.vmap(zline_lookup)(t, p), axis=-1), zline_b, pts)
    run("quad1", lambda t, p: jnp.sum(jax.vmap(quad_lookup)(t, p), axis=-1), quad_b, pts)
    run(
        "quad1_bf16",
        lambda t, p: jnp.sum(jax.vmap(quad_lookup)(t, p), axis=-1),
        quad_b.astype(jnp.bfloat16),
        pts,
    )
    run(
        "zline4_seq",
        lambda t, p: jax.lax.map(lambda a: jnp.sum(zline_lookup(*a)), (t, p)),
        zline_b,
        pts,
    )
    # shared-table reference points (the headline config's op)
    run("packed_shared", lambda t, p: jnp.sum(jax.vmap(lambda pp: packed_lookup(t, pp))(p), axis=-1), jnp.asarray(packed2), pts)
    run("quad1_shared", lambda t, p: jnp.sum(jax.vmap(lambda pp: quad_lookup(t, pp))(p), axis=-1), jnp.asarray(quad2), pts)
    run("zline4_shared", lambda t, p: jnp.sum(jax.vmap(lambda pp: zline_lookup(t, pp))(p), axis=-1), jnp.asarray(zline2), pts)

    print("\nsummary (ms, lower is better):", flush=True)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {k:26s} {v:8.2f}")


if __name__ == "__main__":
    main()
