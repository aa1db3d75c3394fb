"""On-device probe: SDF field-build min-distance variants at e2e shapes.

Round-5 findings (first run of this probe, docs/PERF.md):
  - the then-production XLA path (min_sqdist at ambient DEFAULT matmul
    precision) had up to 9.0e-2 m distance error on TPU — the MXU
    truncates the f32 coordinates to bf16 and the d2 terms cancel
    catastrophically near the surface. Fixed: min_sqdist pins HIGHEST.
  - the MXU Pallas kernel at HIGHEST is exact (3.5e-6 m) but 35.6
    ms/object: Mosaic pads the K=8 contraction to 128 and HIGHEST
    multiplies by 6 passes. Precision.HIGH is unsupported by Mosaic.

Variants measured now (all through the SHIPPED ops functions):
  prod_hst  — vmap over clouds of ops.min_sqdist (XLA, HIGHEST)
  bcast*    — ops.min_d2_batched_pallas: VPU broadcast-subtract kernel
              over the transposed ref layout (exact f32, no matmul), at
              several tilings

Run on the real chip (single-tenant; CLAUDE.md):
    python tools/probe_fields.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

import jax.numpy as jnp

from grasptrajopt_tpu.ops import min_sqdist, min_d2_batched_pallas
from grasptrajopt_tpu.ops.nn import _pack_query8, _pack_refT
from grasptrajopt_tpu.fields.depth_point_cloud import sdf_cost_shaping

BC = int(os.environ.get("PROBE_BC", "32"))  # clouds (16 objects x 2 fields)
M = int(os.environ.get("PROBE_M", "72576"))  # grid points
N = int(os.environ.get("PROBE_N", str(160 * 160)))  # cloud points
REPS = int(os.environ.get("PROBE_REPS", "10"))


def main():
    rng = np.random.default_rng(0)
    # synthetic tabletop-like scene: points in a thin slab (table top +
    # object blobs) so grid cells near the surface exercise the small-d
    # regime where cancellation error matters
    table = np.stack(
        [
            rng.uniform(0.2, 0.9, size=(BC, N * 3 // 4)),
            rng.uniform(-0.5, 0.5, size=(BC, N * 3 // 4)),
            rng.uniform(0.70, 0.73, size=(BC, N * 3 // 4)),
        ],
        axis=-1,
    )
    blobs = np.stack(
        [
            rng.uniform(0.4, 0.6, size=(BC, N - N * 3 // 4)),
            rng.uniform(-0.1, 0.1, size=(BC, N - N * 3 // 4)),
            rng.uniform(0.73, 0.95, size=(BC, N - N * 3 // 4)),
        ],
        axis=-1,
    )
    clouds = np.concatenate([table, blobs], axis=1).astype(np.float32)
    masks = rng.uniform(size=(BC, N)) > 0.15  # ~15% invalid pixels
    gx, gy, gz = np.meshgrid(
        np.arange(-0.4, 1.5, 0.05),
        np.arange(-1.5, 1.5, 0.05),
        np.arange(-0.4, 1.7, 0.05),
        indexing="ij",
    )
    grid_pts = (
        np.stack([gx, gy, gz], -1).reshape(-1, 3)[:M].astype(np.float32)
    )
    assert grid_pts.shape[0] == M

    grid_j = jnp.asarray(grid_pts)
    clouds_j = jnp.asarray(clouds)
    masks_j = jnp.asarray(masks)

    # exact reference on a subset, f64 host
    sub = np.arange(0, M, 17)
    d_exact = np.empty((2, len(sub)))
    for b in range(2):
        pts = clouds[b][masks[b]].astype(np.float64)
        q = grid_pts[sub].astype(np.float64)
        d2 = (
            (q * q).sum(-1)[:, None]
            + (pts * pts).sum(-1)[None, :]
            - 2.0 * q @ pts.T
        )
        d_exact[b] = np.sqrt(np.maximum(d2.min(axis=1), 0))

    @jax.jit
    def f_prod(clouds, masks):
        def one(cloud, mask):
            d2, _ = min_sqdist(grid_j, cloud, ref_mask=mask)
            return d2
        return jax.vmap(one)(clouds, masks)

    import functools

    @functools.partial(jax.jit, static_argnames=("tm", "tn"))
    def f_bcast(clouds, masks, tm=512, tn=2048):
        q8 = _pack_query8(grid_j, tm=tm)
        rT = _pack_refT(clouds, masks, tn=tn)
        return min_d2_batched_pallas(q8, rT, tm=tm, tn=tn)

    def check(name, d2_all):
        d2_all = np.asarray(d2_all)
        err = 0.0
        cerr = 0.0
        for b in range(2):
            d = np.sqrt(np.maximum(d2_all[b][:M][sub], 0))
            err = max(err, np.abs(d - d_exact[b]).max())
            c = np.asarray(sdf_cost_shaping(jnp.asarray(d, jnp.float32), 0.02))
            ce = np.asarray(sdf_cost_shaping(jnp.asarray(d_exact[b]).astype(jnp.float32), 0.02))
            cerr = max(cerr, np.abs(c - ce).max())
        print(f"  {name}: max |d-d_exact| = {err:.2e} m, max shaped-cost err = {cerr:.2e}")

    def bench(name, fn, *args, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            jax.block_until_ready(fn(*args, **kw))
            ts.append(time.time() - t0)
        ms = 1e3 * min(ts)
        print(f"{name:14s} {ms:8.2f} ms total, {ms / (BC / 2):6.2f} ms/object (2 fields)")
        return out, ms

    print(f"shapes: {BC} clouds x ({M} grid, {N} cloud pts), backend={jax.default_backend()}")
    out, _ = bench("prod_hst", f_prod, clouds_j, masks_j)
    check("prod_hst", out)
    out, _ = bench("bcast_512x2048", f_bcast, clouds_j, masks_j)
    check("bcast_512x2048", out)
    for tm, tn in ((256, 2048), (1024, 2048), (512, 4096), (256, 4096)):
        bench(f"bcast_{tm}x{tn}", f_bcast, clouds_j, masks_j, tm=tm, tn=tn)


if __name__ == "__main__":
    main()
