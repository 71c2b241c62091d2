"""Micro: scatter-compaction vs u64 partition-sort compaction on TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timeit(label, fn, *args, n=10):
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(n):
        np.asarray(fn(*args))
    print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)


rng = np.random.default_rng(0)
S = 4096 * 6 * 46 * 2  # Q * cap slots
M = 4096 * 300
keep = jax.device_put(rng.random(S) < 0.37)
payload = jax.device_put(rng.integers(0, 1 << 19, S).astype(np.uint64))


@jax.jit
def scatter_compact(keep):
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    scatter_idx = jnp.where(keep & (pos < M), pos, jnp.int32(M))
    rows = (
        jnp.full(M, S, jnp.int32)
        .at[scatter_idx]
        .set(jnp.arange(S, dtype=jnp.int32), mode="drop"))
    return rows.sum()


@jax.jit
def sort_compact(keep, payload):
    slot = jnp.arange(S, dtype=jnp.uint64)
    key = (
        jnp.where(keep, jnp.uint64(0), jnp.uint64(1) << jnp.uint64(63))
        | (slot << jnp.uint64(19))
        | payload
    )
    skey = jax.lax.sort(key)[:M]
    return skey.sum()


@jax.jit
def sort_compact_2x32(keep, payload):
    # same, as two i32 arrays (hi key, lo payload) to dodge u64 emulation
    slot = jnp.arange(S, dtype=jnp.int32)
    hi = jnp.where(keep, slot, jnp.int32(2147483647))
    lo = payload.astype(jnp.uint32).astype(jnp.int32)
    shi, slo = jax.lax.sort((hi, lo), num_keys=1)
    return shi[:M].sum() + slo[:M].sum()


timeit("scatter compaction", scatter_compact, keep)
timeit("u64 partition-sort", sort_compact, keep, payload)
timeit("i32-pair partition-sort", sort_compact_2x32, keep, payload)
