"""Tier-gather formulations + Pallas availability on the dev chip.

The tier fetches cap consecutive u64 rows per hit (db_d48[start + arange
(cap)]). profile_gather_model showed gathers are DESCRIPTOR-bound (~16-21
ns per row, row width nearly free), so if XLA lowers the [start+arange]
pattern per-element, an explicit sliced gather (slice_sizes=(cap,)) should
cut tier cost by ~cap x. This measures both, plus the dispatch overhead
constant and a Pallas smoke test (is Mosaic usable through the tunnel?).

Run: python tools_profiling/profile_tier_slices.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401

import jax
import jax.numpy as jnp

N = 60_533_845          # db rows (bench world)
H = 786_432             # hit rows (budget scale)
CAP = 2


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    np.asarray(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        np.asarray(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label:36s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)

    @jax.jit
    def make(k1, k2):
        t32 = jax.random.bits(k1, (N,), jnp.uint32).view(jnp.int32)
        t64 = (t32.astype(jnp.uint64) << jnp.uint64(32)) | t32.astype(
            jnp.uint64)
        st = (jax.random.bits(k2, (H,), jnp.uint32)
              % jnp.uint32(N - CAP)).astype(jnp.int32)
        return t64, st

    t64, st = make(k1, k2)
    np.asarray(st[:4])

    # dispatch + scalar-fetch overhead constant
    ov = jax.jit(lambda s: s[:8].sum())
    timeit("overhead (8-row program)", ov, st)

    @jax.jit
    def tier_bcast(t, s):
        idx = s[:, None] + jnp.arange(CAP, dtype=jnp.int32)[None, :]
        return (t[idx] & jnp.uint64(0xFF)).sum()

    @jax.jit
    def tier_sliced(t, s):
        g = jax.lax.gather(
            t, s[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(CAP,), mode="clip")
        return (g & jnp.uint64(0xFF)).sum()

    timeit("tier bcast idx [H,2] u64", tier_bcast, t64, st)
    timeit("tier sliced gather (2,) u64", tier_sliced, t64, st)

    # wider windows: cap=8 comparison
    @jax.jit
    def tier_bcast8(t, s):
        idx = s[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
        return (t[idx] & jnp.uint64(0xFF)).sum()

    @jax.jit
    def tier_sliced8(t, s):
        g = jax.lax.gather(
            t, s[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(8,), mode="clip")
        return (g & jnp.uint64(0xFF)).sum()

    timeit("tier bcast idx [H,8] u64", tier_bcast8, t64, st)
    timeit("tier sliced gather (8,) u64", tier_sliced8, t64, st)

    # Pallas smoke test
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def pk(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2

        @jax.jit
        def psmoke(x):
            return pl.pallas_call(
                pk,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        x = jnp.ones((8, 128), jnp.int32)
        got = np.asarray(psmoke(x))
        print(f"pallas smoke: OK (sum={got.sum()})", flush=True)

        # streaming rate: copy a 2 GB table tile-by-tile through VMEM
        TB = 1 << 28

        def ck(x_ref, o_ref):
            o_ref[0, 0] = jnp.sum(
                jax.lax.bitcast_convert_type(x_ref[:], jnp.int32))

        TILE = 1 << 19  # 512k i32 = 2 MB

        @jax.jit
        def stream_sum(t):
            t2 = jax.lax.bitcast_convert_type(t, jnp.int32).reshape(-1)
            n_t = (2 * TB) // TILE
            part = pl.pallas_call(
                ck,
                grid=(n_t,),
                in_specs=[pl.BlockSpec((TILE,), lambda i: (i,),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                       memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            )(t2)
            return part[0, 0]

        @jax.jit
        def mktab(k):
            return jax.random.bits(k, (TB,), jnp.uint32).view(jnp.uint64[
                ...].dtype if False else jnp.uint32).astype(jnp.uint64)

        tab = jax.jit(lambda k: jax.random.bits(
            k, (TB,), jnp.uint32).astype(jnp.uint64))(k1)
        np.asarray(tab[:2])
        timeit("pallas stream 2GB sum", stream_sum, tab, n=3)
    except Exception as e:  # noqa: BLE001
        print(f"pallas FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
