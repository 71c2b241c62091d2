"""Is a [N, 2]-i32 ROW gather cheaper than a 1D u64 gather?

The deep-group tier showed wide row fetches are descriptor-bound (a
[N, 128]-u64 row gather ran ~30x under the per-element model), while 1D
u64 gathers measure as TWO i32 elements (~28 ns each at 2M lookups).
If an 8-byte row gather is charged one descriptor, every u64 table
probe in the pipeline (dmap, dmap2, gbounds, taxdna, tier d48) halves.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timed(f, *args):
    f(*args)  # compile + warm
    np.asarray(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    N = 1 << 27
    M = 2 << 20
    rng = np.random.default_rng(0)
    tab64 = jax.device_put(rng.integers(0, 1 << 63, N, np.uint64))
    idx = jax.device_put(rng.integers(0, N, M).astype(np.int32))

    @jax.jit
    def g_u64(t, i):
        return jnp.sum(jax.lax.bitcast_convert_type(t[i], jnp.int32))

    @jax.jit
    def g_row2(t, i):
        t2 = jax.lax.bitcast_convert_type(t, jnp.int32)  # [N, 2]
        return jnp.sum(t2[i])

    @jax.jit
    def g_row4(t, i):
        t4 = jax.lax.bitcast_convert_type(t, jnp.int32).reshape(-1, 4)
        return jnp.sum(t4[i >> 1])

    @jax.jit
    def g_row8(t, i):
        t8 = jax.lax.bitcast_convert_type(t, jnp.int32).reshape(-1, 8)
        return jnp.sum(t8[i >> 2])

    @jax.jit
    def g_i32(t, i):
        t1 = jax.lax.bitcast_convert_type(t, jnp.int32)[:, 0]
        return jnp.sum(t1[i])

    for name, f in (("u64 1D", g_u64), ("i32 1D", g_i32),
                    ("[N,2] i32 row", g_row2), ("[N/2,4] i32 row", g_row4),
                    ("[N/4,8] i32 row", g_row8)):
        dt = timed(f, tab64, idx)
        print(f"{name:16s}: {dt*1e3:7.1f} ms  ({dt/M*1e9:5.1f} ns/lookup)",
              flush=True)


if __name__ == "__main__":
    main()
