"""Refine the gather/sort cost model at bench scale (2^28-slot tables).

Questions this answers (all feed the round-5 probe restructure):
  1. Is the HBM gather cost per ROW (descriptor-bound) or per 32-bit
     element?  -> i32-row vs u64-row gather at the same table size.
  2. Do SORTED indices gather faster than random ones (locality)?
  3. lax.sort cost vs operand count at Q=4.5M (naked partition key vs
     key+payload variants).
  4. Small-table gathers ([Q]-sized hit-field fetches).

Tables are generated ON DEVICE (jax.random) — a 2 GB device_put would
ride the ~40 MB/s tunnel for a minute. Timings force a D2H via
np.asarray of a tiny reduction (block_until_ready does not sync here).

Run: python tools_profiling/profile_gather_model.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401

import jax
import jax.numpy as jnp

TB = 28                 # table bits (bench dmap scale)
Q = 4_521_984           # bench query slots per 16k batch


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
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    @jax.jit
    def make_world(k1, k2):
        t32 = jax.random.bits(k1, (1 << TB,), jnp.uint32).view(jnp.int32)
        t64 = (t32.astype(jnp.uint64) << jnp.uint64(32)) | t32.astype(
            jnp.uint64)
        idx = (jax.random.bits(k2, (Q,), jnp.uint32)
               & jnp.uint32((1 << TB) - 1)).astype(jnp.int32)
        return t32, t64, idx, jnp.sort(idx)

    t32, t64, idx, idx_s = make_world(k1, k2)
    np.asarray(idx[:8])
    print(f"table 2^{TB} rows; Q={Q}", flush=True)

    g32 = jax.jit(lambda t, i: t[i].sum())
    g64 = jax.jit(lambda t, i: (t[i] & jnp.uint64(0xFFFF)).sum())

    timeit("gather i32-row random", g32, t32, idx)
    timeit("gather i32-row sorted", g32, t32, idx_s)
    timeit("gather u64-row random", g64, t64, idx)
    timeit("gather u64-row sorted", g64, t64, idx_s)

    # hit-field scale: 786k indices into a Q-row (36 MB u64) table
    H = 786_432
    idxh = idx[:H] % Q
    qtab = t64[:Q]
    timeit("gather u64-row [Q]-table 786k", g64, qtab, idxh)
    qtab32 = t32[:Q]
    timeit("gather i32-row [Q]-table 786k", g32, qtab32, idxh)

    # sorts at Q rows: operands scale
    key1 = idx
    pay1 = idx
    pay64 = t64[:Q]

    s1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1)[0][-1])
    s2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)[1][-1])
    s3 = jax.jit(
        lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1)[2][-1])
    su = jax.jit(lambda a, b: jax.lax.sort(
        (a, b), num_keys=1)[1][-1] & jnp.uint64(1))

    timeit("sort 1xi32 key only", s1, key1)
    timeit("sort i32 key + i32 payload", s2, key1, pay1)
    timeit("sort i32 key + i32 + i32", s3, key1, pay1, pay1)
    timeit("sort i32 key + u64 payload", su, key1, pay64)

    # u64 sort key (pi<<23|slot formulation)
    ku = (t64[:Q] & jnp.uint64((1 << 63) - 1))
    su1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1)[0][-1]
                  & jnp.uint64(1))
    timeit("sort 1xu64 key only", su1, ku)


if __name__ == "__main__":
    main()
