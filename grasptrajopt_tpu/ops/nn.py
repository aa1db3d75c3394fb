"""Brute-force nearest-neighbor squared distances, MXU-tiled.

The SDF field build asks: for each of M grid points, the distance to the
nearest of N scene points (M ~ 1e5, N ~ 1e5-3e5). The reference does this
with a host-side sklearn KD-tree (mesh_to_sdf/depth_point_cloud.py:25,
:57-91) at hundreds of ms per field. On TPU the same query is a tiled
matmul: ||g - p||^2 = ||g||^2 + ||p||^2 - 2 g.p, streamed flash-attention
style so the (M, N) distance matrix never materializes in HBM.

Two implementations:
  - `min_sqdist`: XLA path — lax.map over M-chunks, each chunk one
    (chunk, N) matmul + row min. XLA fuses the add/min into the matmul
    epilogue; this is already near memory-bound speed-of-light.
  - `min_sqdist_pallas`: explicit Pallas kernel with a (M/TM, N/TN) grid
    accumulating running minima in VMEM, for full control of tiling.

Both return (min squared distance, argmin index). Invalid reference points
are masked with +inf before the reduction.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = jnp.inf


def min_sqdist_reference(query, ref, ref_mask=None):
    """Dense O(M*N) reference implementation (tests / tiny inputs)."""
    query = jnp.asarray(query)
    ref = jnp.asarray(ref)
    d2 = jnp.sum((query[:, None, :] - ref[None, :, :]) ** 2, axis=-1)
    if ref_mask is not None:
        d2 = jnp.where(ref_mask[None, :], d2, _INF)
    return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def min_sqdist(query, ref, ref_mask=None, chunk: int = 1024):
    """Min squared distance + argmin from each query to the ref set.

    query: (M, 3); ref: (N, 3); ref_mask: optional (N,) bool — False entries
    are excluded. Returns (d2 (M,), idx (M,)) in query dtype / int32.

    Streams over M in `chunk`-sized tiles; each tile computes a
    (chunk, N) squared-distance block via one MXU matmul and reduces it
    immediately, so peak memory is O(chunk * N).
    """
    query = jnp.asarray(query)
    ref = jnp.asarray(ref)
    M = query.shape[0]
    n_chunks = -(-M // chunk)
    pad = n_chunks * chunk - M
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    qchunks = qpad.reshape(n_chunks, chunk, 3)

    ref_sq = jnp.sum(ref * ref, axis=-1)  # (N,)
    if ref_mask is not None:
        penalty = jnp.where(ref_mask, jnp.zeros_like(ref_sq), jnp.full_like(ref_sq, _INF))
    else:
        penalty = jnp.zeros_like(ref_sq)

    def one_chunk(qc):
        # (chunk, N) block: ||q||^2 + ||p||^2 - 2 q.p. HIGHEST precision:
        # at DEFAULT the TPU MXU truncates the f32 coordinates to bf16,
        # which at workspace scale costs up to ~9 cm of distance error
        # (tools/probe_fields.py) — the d2 terms cancel catastrophically
        # near the surface. (On TPU the hot field builds route through
        # min_sqdist_d2's VPU kernel instead; this path is the fallback.)
        cross = jnp.matmul(qc, ref.T, precision="highest")
        d2 = jnp.sum(qc * qc, axis=-1)[:, None] + (ref_sq + penalty)[None, :] - 2.0 * cross
        return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1)

    d2s, idxs = jax.lax.map(one_chunk, qchunks)
    d2 = d2s.reshape(-1)[:M]
    idx = idxs.reshape(-1)[:M].astype(jnp.int32)
    # Guard tiny negative values from cancellation.
    return jnp.maximum(d2, 0.0), idx


def _min_d2_bcast_kernel(q_ref, rT_ref, out_ref):
    """VPU-explicit min-distance tile: the reference set lives TRANSPOSED
    ((4, tn): x/y/z/penalty rows, points along lanes) and the (tm, tn)
    squared-distance tile is built from three broadcast subtract-squares —
    exact f32, no matmul. The MXU form ((tm, K)x(K, tn) dot with K=3-8)
    is the wrong tool here: Mosaic pads K to 128 (16x wasted MACs) and
    f32 operands either truncate to bf16 (DEFAULT — up to ~9 cm distance
    error at workspace coordinate scale, tools/probe_fields.py) or cost
    6 passes (HIGHEST). The brute-force field build is VPU-bound either
    way; this form reaches that bound at full f32 accuracy."""
    q = q_ref[:, :]  # (tm, 8) — x, y, z in lanes 0..2
    r = rT_ref[:, :]  # (4, tn)
    acc = (q[:, 0:1] - r[0:1, :]) ** 2
    acc += (q[:, 1:2] - r[1:2, :]) ** 2
    acc += (q[:, 2:3] - r[2:3, :]) ** 2
    acc += r[3:4, :]  # +inf-style penalty row masks invalid/padded points
    tile_min = jnp.min(acc, axis=1)

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:, 0] = tile_min

    @pl.when(pl.program_id(2) > 0)
    def _():
        out_ref[:, 0] = jnp.minimum(tile_min, out_ref[:, 0])


@functools.partial(jax.jit, static_argnames=("tm", "tn"))
def min_d2_batched_pallas(q8, rT, tm: int = 512, tn: int = 2048):
    """Batched min squared distance, Pallas TPU: q8 (Mp, 8) padded queries
    (coords in lanes 0..2; pad rows anything), rT (B, 4, Np) transposed
    reference sets (row 3 = penalty: 0 valid, BIG invalid/pad). Returns
    (B, Mp) d2. Shared queries across the batch — the field-build shape
    (one workspace grid, many scene clouds)."""
    B, _, Np = rT.shape
    Mp = q8.shape[0]
    out = pl.pallas_call(
        _min_d2_bcast_kernel,
        grid=(B, Mp // tm, Np // tn),
        in_specs=[
            pl.BlockSpec((tm, 8), lambda b, i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 4, tn), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, tm, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Mp, 1), jnp.float32),
    )(q8, rT)
    return jnp.maximum(out[:, :, 0], 0.0)


def _pack_query8(query, tm: int = 512):
    M = query.shape[0]
    Mp = -(-M // tm) * tm
    return jnp.zeros((Mp, 8), jnp.float32).at[:M, :3].set(query)


def _pack_refT(ref, ref_mask=None, tn: int = 2048):
    """(B, N, 3) [+ (B, N) mask] -> (B, 4, Np) transposed + penalty row."""
    B, N, _ = ref.shape
    Np = -(-N // tn) * tn
    rT = jnp.full((B, 4, Np), _PAL_BIG, jnp.float32)
    rT = rT.at[:, :3, :N].set(jnp.swapaxes(ref, 1, 2))
    pen = jnp.zeros((B, N), jnp.float32)
    if ref_mask is not None:
        pen = jnp.where(ref_mask, 0.0, _PAL_BIG)
    rT = rT.at[:, 3, :N].set(pen)
    return rT


_PAL_BIG = 3.0e38


def min_sqdist_d2(query, ref, ref_mask=None, use_pallas: Optional[bool] = None):
    """Min squared distance only (no argmin) from (M, 3) queries to an
    (N, 3) reference set — the dense SDF field-build primitive. On TPU
    this is the exact-f32 VPU broadcast kernel; elsewhere the chunked XLA
    path (HIGHEST-precision matmul)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if not use_pallas:
        # dtype-polymorphic XLA fallback (tests run x64 on CPU)
        d2, _ = min_sqdist(jnp.asarray(query), jnp.asarray(ref), ref_mask=ref_mask)
        return d2
    query = jnp.asarray(query, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    M = query.shape[0]
    q8 = _pack_query8(query)
    rT = _pack_refT(ref[None], None if ref_mask is None else ref_mask[None])
    return min_d2_batched_pallas(q8, rT)[0, :M]


def _min_d2_impl(points, ref, use_pallas: Optional[bool] = None):
    """(d2, idx) of nearest ref point for (..., 3) query points.

    ref is a padded (K, 3) set (pad rows with coordinates far away, e.g.
    1e6, so they never win). Dispatches to the Pallas kernel on TPU, dense
    XLA otherwise; leading query dims are flattened around the kernel.
    """
    points = jnp.asarray(points)
    ref = jnp.asarray(ref)
    lead = points.shape[:-1]
    flat = points.reshape(-1, 3)
    if use_pallas is None:
        # TPU-family backends (incl. tunneled platforms) lower Pallas TPU
        # kernels; everything else uses the dense XLA fallback
        backend = jax.default_backend()
        use_pallas = backend in ("tpu", "axon")
    if use_pallas:
        d2, idx = min_sqdist_pallas(flat, ref)
    else:
        # dense (N, K) — fine for the moderate K of downsampled scenes;
        # HIGHEST so the TPU MXU's bf16 operand truncation never corrupts
        # the cancelling d2 terms (see one_chunk above)
        d2k = (
            jnp.sum(flat * flat, axis=-1)[:, None]
            + jnp.sum(ref * ref, axis=-1)[None, :]
            - 2.0 * jnp.matmul(flat, ref.T, precision="highest")
        )
        d2 = jnp.maximum(jnp.min(d2k, axis=-1), 0.0)
        idx = jnp.argmin(d2k, axis=-1).astype(jnp.int32)
    return d2.reshape(lead), idx.reshape(lead)


@jax.custom_jvp
def min_sqdist_diff(points, ref):
    """Differentiable min squared distance to a (padded) reference set.

    The derivative flows through the nearest point: d/dp min_k ||p - s_k||^2
    = 2 (p - s_argmin). Defined via custom_jvp so forward-mode (the
    solvers' jacfwd) gets the exact piecewise gradient without
    differentiating through the argmin reduction — and without
    materializing the (N, K) distance matrix in the autodiff graph. The
    reference set is treated as constant (scene geometry).
    """
    d2, _ = _min_d2_impl(points, ref)
    return d2


@min_sqdist_diff.defjvp
def _min_sqdist_diff_jvp(primals, tangents):
    points, ref = primals
    pdot, _ = tangents
    d2, idx = _min_d2_impl(points, ref)
    nearest = jnp.asarray(ref)[idx]  # small-table gather
    tan = 2.0 * jnp.sum((points - nearest) * pdot, axis=-1)
    return d2, tan


def nearest_ref_index(points, ref):
    """Argmin index of the nearest reference point (for sign lookups)."""
    _, idx = _min_d2_impl(points, ref)
    return idx


@jax.custom_jvp
def signed_distance_to_set(points, ref, normals):
    """Signed distance to a padded point set with per-point normals.

    sign = sign((p - s*) . n*) over the nearest point s* — the reference's
    'normal' sign determination with k=1
    (mesh_to_sdf/surface_point_cloud.py:32-64) — GUARDED by a lateral
    footprint test (see signed_distance_with_dir). On TPU the nearest
    point AND normal come out of the one-hot kernel directly (no
    `ref[idx]` gathers — profiled as ~100x slower than the distance
    matmul itself); the forward derivative is the exact piecewise
    gradient sign * (p - s*) / |p - s*| via custom_jvp.
    """
    sd, _ = signed_distance_with_dir(points, ref, normals)
    return sd


def signed_distance_with_dir(points, ref, normals, lateral_margin=0.05):
    """(sd, d(sd)/dp) in one evaluation — the chain-rule building block for
    whole-trajectory obstacle terms: one kernel launch yields both the
    signed distances and their exact spatial gradients, which callers
    contract with their own point Jacobians instead of differentiating
    through the kernel.

    Sign: negative (inside) ONLY when the query sits behind its nearest
    sample's normal AND within `lateral_margin` of that sample's surface
    footprint. A bare normal-dot sign classifies everything behind the
    tangent PLANE as inside — e.g. the whole robot base below a tabletop's
    top-sheet sampling, nowhere near the table, which injects a large
    constant cost into the obstacle term (round-2 points-mode quality
    collapse: reached 0.19 with min sd -0.38 on truly collision-free
    trajectories). A query directly under a sampled sheet has lateral
    offset <= the sampling spacing, so margin ~= 2x the downsample
    resolution keeps genuine penetrations negative.
    """
    d2, nearest, n_star = _nearest_impl(points, ref, normals)
    diff = points - nearest
    d_n = jnp.sum(diff * n_star, axis=-1)
    lat2 = jnp.maximum(d2 - d_n * d_n, 0.0)
    inside = jnp.logical_and(d_n < 0.0, lat2 <= lateral_margin * lateral_margin)
    sign = jnp.where(inside, -1.0, 1.0)
    d = jnp.sqrt(jnp.maximum(d2, 1e-18))
    sd = sign * d
    return sd, diff / sd[..., None]


@signed_distance_to_set.defjvp
def _signed_distance_jvp(primals, tangents):
    points, ref, normals = primals
    pdot = tangents[0]
    sd, dirs = signed_distance_with_dir(points, ref, normals)
    return sd, jnp.sum(dirs * pdot, axis=-1)


def _nearest_kernel(q_ref, rT_ref, r_ref, n_ref, d2_ref, pt_ref, nm_ref):
    """Tiled nearest-point kernel that returns the nearest REFERENCE POINT
    and NORMAL as values (not indices): per tile, a one-hot mask of the
    row minima matmuls against the VMEM-resident ref/normal tables, so no
    caller-side `ref[idx]` gather ever happens (profiled as the dominant
    cost — scattered row gathers run ~100x below HBM speed on TPU).

    d2 uses the VPU broadcast-subtract form over the TRANSPOSED ref tile
    (exact f32 regardless of the ambient matmul-precision context — the
    MXU form truncates f32 operands to bf16 at DEFAULT, up to ~cm-scale
    distance error); the one-hot table contractions pin HIGHEST."""
    j = pl.program_id(1)

    q = q_ref[:, :]  # (TM, 4)
    rT = rT_ref[:, :]  # (4, TN): x/y/z/penalty rows
    r = r_ref[:, :]  # (TN, 4)
    nrm = n_ref[:, :]  # (TN, 4)
    d2 = (q[:, 0:1] - rT[0:1, :]) ** 2
    d2 += (q[:, 1:2] - rT[1:2, :]) ** 2
    d2 += (q[:, 2:3] - rT[2:3, :]) ** 2
    d2 += rT[3:4, :]  # penalty row: 0 valid, BIG for padded rows

    tile_min = jnp.min(d2, axis=1)  # (TM,)
    onehot = (d2 <= tile_min[:, None]).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(onehot, axis=1, keepdims=True), 1.0)
    tile_pt = (
        jax.lax.dot_general(
            onehot, r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        / cnt
    )
    tile_nm = (
        jax.lax.dot_general(
            onehot, nrm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        / cnt
    )

    @pl.when(j == 0)
    def _():
        d2_ref[:, 0] = tile_min
        pt_ref[:, :] = tile_pt
        nm_ref[:, :] = tile_nm

    @pl.when(j > 0)
    def _():
        prev = d2_ref[:, 0]
        better = tile_min < prev
        d2_ref[:, 0] = jnp.where(better, tile_min, prev)
        pt_ref[:, :] = jnp.where(better[:, None], tile_pt, pt_ref[:, :])
        nm_ref[:, :] = jnp.where(better[:, None], tile_nm, nm_ref[:, :])


@functools.partial(jax.jit, static_argnames=("tm", "tn"))
def nearest_point_normal_pallas(query, ref, normals, tm: int = 1024, tn: int = 2048):
    """(d2, nearest_point, nearest_normal) for (M, 3) queries against a
    padded (K, 3) ref set with per-point normals, via the one-hot kernel.

    The K tile shrinks to fit small reference sets (the kernel's cost is
    VMEM traffic for the (tm, tn) distance tile, so tn should never exceed
    the padded reference count)."""
    query = jnp.asarray(query, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    normals = jnp.asarray(normals, jnp.float32)
    M, N = query.shape[0], ref.shape[0]
    tn = min(tn, max(512, -(-N // 512) * 512))
    Mp = -(-M // tm) * tm
    Np = -(-N // tn) * tn

    q4 = jnp.zeros((Mp, 4), jnp.float32).at[:M, :3].set(query)
    r4 = jnp.zeros((Np, 4), jnp.float32).at[:N, :3].set(ref)
    n4 = jnp.zeros((Np, 4), jnp.float32).at[:N, :3].set(normals)
    big = jnp.float32(3.0e38)
    rT = jnp.zeros((4, Np), jnp.float32).at[:3, :N].set(ref.T)
    rT = rT.at[3, N:].set(big)

    d2, pt, nm = pl.pallas_call(
        _nearest_kernel,
        grid=(Mp // tm, Np // tn),
        in_specs=[
            pl.BlockSpec((tm, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 4), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 4), jnp.float32),
        ],
    )(q4, rT, r4, n4)
    return jnp.maximum(d2[:M, 0], 0.0), pt[:M, :3], nm[:M, :3]


def _nearest_impl(points, ref, normals, use_pallas: Optional[bool] = None):
    """(d2, nearest point, nearest normal) with backend dispatch; leading
    query dims are flattened around the kernel."""
    points = jnp.asarray(points)
    lead = points.shape[:-1]
    flat = points.reshape(-1, 3)
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if use_pallas:
        d2, pt, nm = nearest_point_normal_pallas(flat, ref, normals)
    else:
        d2, idx = _min_d2_impl(flat, ref, use_pallas=False)
        pt = jnp.asarray(ref)[idx]
        nm = jnp.asarray(normals)[idx]
    return (
        d2.reshape(lead),
        pt.reshape(lead + (3,)),
        nm.reshape(lead + (3,)),
    )


def _min_kernel(q_ref, rT_ref, out_ref, arg_ref):
    """Pallas kernel body: one (TM, TN) tile of the distance matrix —
    VPU broadcast-subtract form over the transposed ref tile (exact f32,
    context-independent; see _nearest_kernel docstring)."""
    j = pl.program_id(1)

    q = q_ref[:, :]  # (TM, 4) — xyz padded to 4 lanes
    rT = rT_ref[:, :]  # (4, TN): x/y/z/penalty rows
    d2 = (q[:, 0:1] - rT[0:1, :]) ** 2
    d2 += (q[:, 1:2] - rT[1:2, :]) ** 2
    d2 += (q[:, 2:3] - rT[2:3, :]) ** 2
    d2 += rT[3:4, :]

    tile_min = jnp.min(d2, axis=1)
    local_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
    tile_arg = local_arg + j * d2.shape[1]

    @pl.when(j == 0)
    def _():
        out_ref[:, 0] = tile_min
        arg_ref[:, 0] = tile_arg

    @pl.when(j > 0)
    def _():
        prev = out_ref[:, 0]
        better = tile_min < prev
        out_ref[:, 0] = jnp.where(better, tile_min, prev)
        arg_ref[:, 0] = jnp.where(better, tile_arg, arg_ref[:, 0])


@functools.partial(jax.jit, static_argnames=("tm", "tn"))
def min_sqdist_pallas(query, ref, ref_mask=None, tm: int = 512, tn: int = 2048):
    """Pallas TPU kernel: tiled brute-force min distance with VMEM minima.

    Pads M, N up to tile multiples; masked/padded ref points get +inf via
    their squared-norm term. xyz is padded to 4 lanes for alignment.
    """
    query = jnp.asarray(query, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    M, N = query.shape[0], ref.shape[0]
    Mp = -(-M // tm) * tm
    Np = -(-N // tn) * tn

    q4 = jnp.zeros((Mp, 4), jnp.float32).at[:M, :3].set(query)
    big = jnp.float32(3.0e38)
    rT = jnp.zeros((4, Np), jnp.float32).at[:3, :N].set(ref.T)
    if ref_mask is not None:
        rT = rT.at[3, :].set(
            jnp.where(jnp.pad(ref_mask, (0, Np - N)), 0.0, big)
        )
    else:
        rT = rT.at[3, N:].set(big)

    out, arg = pl.pallas_call(
        _min_kernel,
        grid=(Mp // tm, Np // tn),
        in_specs=[
            pl.BlockSpec((tm, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
        ],
    )(q4, rT)
    return jnp.maximum(out[:M, 0], 0.0), arg[:M, 0]
