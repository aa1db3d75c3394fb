"""On-device probe: trilinear combine forms over gathered corner rows.

The solver's obstacle term gathers (B*T*P, 8) corner rows and combines
them into (value, 3 gradients) (ops/interp.py field_lookup_packed_soa_grad).
XLA inserts a row-layout copy between the gather and the unpack-combine
(~0.7-1.3 ms/iter at bench shapes, docs/PERF.md). Variants probed here:

  gather   — the row gather alone (floor)
  unpack   — current production form (gather + per-corner unpack combine)
  lane     — lane-space combine: view rows as (N/16, 128) [16 queries x 8
             corners per 128-lane row], build the four weight fields
             directly in that layout inside the fusion, segment-sum groups
             of 8 lanes with a one-hot (128, 16) MXU contraction. If the
             (N,8)->(N/16,128) reshape is a true bitcast of the gather's
             native layout, the copy disappears; if XLA materializes it,
             this measures no better than unpack.

Run on the real chip (single-tenant; see CLAUDE.md):
    python tools/probe_combine.py
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

B = int(os.environ.get("PROBE_B", "32"))
T = int(os.environ.get("PROBE_T", "50"))
P = int(os.environ.get("PROBE_P", "1152"))  # multiple of 16 for the lane view
S2 = int(os.environ.get("PROBE_S", str(2 * 72576)))
REPS = int(os.environ.get("PROBE_REPS", "20"))
N = T * P


def unpack_combine(rows, fx, fy, fz):
    """Production form (ops/interp.py:268-285)."""
    c000, c001, c010, c011, c100, c101, c110, c111 = [
        rows[..., i] for i in range(8)
    ]
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    val = c0 * (1 - fx) + c1 * fx
    gx = c1 - c0
    gy = (c01 - c00) * (1 - fx) + (c11 - c10) * fx
    dz0 = (c001 - c000) * (1 - fy) + (c011 - c010) * fy
    dz1 = (c101 - c100) * (1 - fy) + (c111 - c110) * fy
    gz = dz0 * (1 - fx) + dz1 * fx
    return val, gx, gy, gz


_l = np.arange(128)
_i = _l % 8  # corner index within the query's 8 lanes
_BX = jnp.asarray((_i // 4).astype(np.float32))
_BY = jnp.asarray(((_i // 2) % 2).astype(np.float32))
_BZ = jnp.asarray((_i % 2).astype(np.float32))
_J = jnp.asarray((_l // 8).astype(np.int32))  # query-within-row 0..15
# segment-sum selector: lane l contributes to query column l//8
_SEL = jnp.asarray(
    (np.arange(128)[:, None] // 8 == np.arange(16)[None, :]).astype(np.float32)
)


def lane_combine(rows, fx, fy, fz):
    """Lane-space combine over the (N/16, 128) view of the gathered rows."""
    n = rows.shape[0]
    R = rows.reshape(n // 16, 128)
    # per-lane interpolation factors, computed directly in lane layout
    fx16 = fx.reshape(n // 16, 16)[:, _J]  # (n/16, 128)
    fy16 = fy.reshape(n // 16, 16)[:, _J]
    fz16 = fz.reshape(n // 16, 16)[:, _J]
    wx = _BX * fx16 + (1 - _BX) * (1 - fx16)
    wy = _BY * fy16 + (1 - _BY) * (1 - fy16)
    wz = _BZ * fz16 + (1 - _BZ) * (1 - fz16)
    sx = 2 * _BX - 1  # d(wx)/d(fx) = +-1
    sy = 2 * _BY - 1
    sz = 2 * _BZ - 1
    # HIGHEST precision: production combines run inside the solver's
    # default_matmul_precision("highest") scope; the default MXU bf16
    # operand truncation would corrupt the segment sums
    mm = lambda a: jnp.matmul(a, _SEL, precision="highest")
    val = mm(R * (wx * wy * wz)).reshape(n)
    gx = mm(R * (sx * wy * wz)).reshape(n)
    gy = mm(R * (wx * sy * wz)).reshape(n)
    gz = mm(R * (wx * wy * sz)).reshape(n)
    return val, gx, gy, gz


def main():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(S2, 8)).astype(np.float32))
    offs = jnp.asarray(rng.integers(0, S2, size=(B, N)).astype(np.int32))
    fx = jnp.asarray(rng.uniform(size=(B, N)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(size=(B, N)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(size=(B, N)).astype(np.float32))

    def reduce4(v):
        val, gx, gy, gz = v
        return jnp.sum(val) + jnp.sum(gx) * 0.5 + jnp.sum(gy) * 0.25 + jnp.sum(gz) * 0.125

    @jax.jit
    def f_gather(offs):
        return jnp.sum(jax.vmap(lambda o: packed[o])(offs))

    @jax.jit
    def f_unpack(offs, fx, fy, fz):
        def one(o, a, b, c):
            rows = packed[o]
            return reduce4(unpack_combine(rows, a, b, c))
        return jnp.sum(jax.vmap(one)(offs, fx, fy, fz))

    @jax.jit
    def f_lane(offs, fx, fy, fz):
        def one(o, a, b, c):
            rows = packed[o]
            return reduce4(lane_combine(rows, a, b, c))
        return jnp.sum(jax.vmap(one)(offs, fx, fy, fz))

    # numeric parity check (CPU-friendly shapes are fine on device too)
    v_u = f_unpack(offs, fx, fy, fz)
    v_l = f_lane(offs, fx, fy, fz)
    rel = abs(float(v_u) - float(v_l)) / max(abs(float(v_u)), 1e-9)
    print(f"parity unpack-vs-lane rel diff: {rel:.2e}")
    # 59M-value f32 sum: accumulation-order differences alone reach ~1e-4
    assert rel < 3e-3, (float(v_u), float(v_l))

    def bench(name, fn, *args):
        fn(*args).block_until_ready()
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            fn(*args).block_until_ready()
            ts.append(time.time() - t0)
        ms = 1e3 * min(ts)
        print(f"{name:8s} {ms:8.2f} ms  ({B}x{N} queries)")
        return ms

    t_g = bench("gather", f_gather, offs)
    t_u = bench("unpack", f_unpack, offs, fx, fy, fz)
    t_l = bench("lane", f_lane, offs, fx, fy, fz)
    print(
        f"combine cost over gather floor: unpack +{t_u - t_g:.2f} ms, "
        f"lane +{t_l - t_g:.2f} ms"
    )


if __name__ == "__main__":
    main()
