"""TPU probe: VMEM-resident Pallas dynamic-gather vs the XLA packed-row gather.

OUTCOME (round 2, kept as the experimental record — see docs/PERF.md
negative results): the Pallas route FAILS at Mosaic compile. The jaxpr ->
MLIR lowering of `jnp.take_along_axis(op, idx, axis)` succeeds whenever
idx.shape == op.shape, but Mosaic's `tpu.dynamic_gather` then rejects any
gather spanning more than one vreg along the gather dimension ("Not
implemented: Multiple source vregs along gather dimension"), i.e. tables
beyond 128 lanes / 8 sublanes. The 145k-row field table is 1134 vregs.
Cross-lowering probes (.trace().lower(lowering_platforms=('tpu',))) do NOT
catch this — only a real (remote) Mosaic compile does.

The XLA baseline half of the probe also demonstrated the relay's
microbenchmark distortion (0.02-0.09 ms for a 61 MB-output gather, >2 TB/s
— impossible); trust only jax.profiler traces of the real program.

Run (one at a time on the chip):
    python tools/probe_vmem_gather.py
"""
import os, sys, time, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

S = 145152          # packed table rows (bench field: 72,576 cells x 2 fields)
Q = 1_920_000       # queries per LM iteration at bench shapes (32*50*1200)
B = 32

def timeit(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


# ---------------- baseline: XLA flat gather (current fast path) -------------
@jax.jit
def xla_gather(packed, offs):
    return packed[offs]  # (Q, 8)


# ---------------- pallas: transposed-table lane gather ----------------------
# Grid over query chunks of size S; table (8, S) stays resident in VMEM.
def _lane_gather_kernel(tabT_ref, offs_ref, out_ref):
    idx = offs_ref[:]                       # (8, S) — offs broadcast over 8 rows
    out_ref[:] = jnp.take_along_axis(tabT_ref[:], idx, axis=1)


def make_lane_gather(n_chunks):
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((8, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, S), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, S), lambda i: (0, i), memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(tabT, offs):
        # offs (Q,) -> (8, n_chunks*S) padded, broadcast over sublanes
        pad = n_chunks * S - offs.shape[0]
        offs_p = jnp.pad(offs, (0, pad))
        offs_2d = jnp.broadcast_to(offs_p[None, :], (8, n_chunks * S))
        return pl.pallas_call(
            _lane_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((8, n_chunks * S), jnp.float32),
            grid_spec=grid_spec,
        )(tabT, offs_2d)
    return f


# ---------------- pallas: smaller chunk via table tiling? -------------------
# Variant: chunk the queries at S but emit f32 rows via 8 separate sublane
# rows — already covered above.  Instead probe a SUBLANE gather at width 128:
# table padded to (S, 128) is 74 MB -> does not fit VMEM; skipped.


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    packed = jax.random.normal(key, (S, 8), jnp.float32)
    tabT = packed.T.copy()  # (8, S)
    offs = jax.random.randint(jax.random.PRNGKey(1), (Q,), 0, S, jnp.int32)

    ms = timeit(xla_gather, packed, offs)
    print(f"XLA flat gather      (Q={Q}): {ms:8.2f} ms  ({Q/ms/1e3:.0f} M rows/s)", flush=True)

    n_chunks = -(-Q // S)  # 14
    f = make_lane_gather(n_chunks)
    ms = timeit(f, tabT, offs)
    print(f"Pallas lane gather   (Q={Q}, {n_chunks} chunks): {ms:8.2f} ms  ({Q/ms/1e3:.0f} M rows/s)", flush=True)

    # numerical check
    got = f(tabT, offs)[:, :Q]          # (8, Q)
    want = xla_gather(packed, offs).T   # (8, Q)
    err = jnp.max(jnp.abs(got - want))
    print(f"max abs err: {err}", flush=True)

    # coherent indices (the real workload is spatially smooth over T)
    base = jnp.arange(Q, dtype=jnp.int32) * S // Q
    jitter = jax.random.randint(jax.random.PRNGKey(2), (Q,), -64, 64, jnp.int32)
    offs_c = jnp.clip(base + jitter, 0, S - 1)
    ms = timeit(xla_gather, packed, offs_c)
    print(f"XLA flat gather coherent: {ms:8.2f} ms", flush=True)
    ms = timeit(f, tabT, offs_c)
    print(f"Pallas lane gather coherent: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
