"""Microbench: TPU gather/scatter costs vs index locality and table size."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    Q = 1 << 20

    def timeit(label, fn, *args, n=10):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(n):
            jax.block_until_ready(fn(*args))
        dt = (time.time() - t0) / n * 1000
        print(f"{label}: {dt:.2f} ms  ({Q/dt/1e3:.0f} Melem/s)", flush=True)

    @jax.jit
    def g32(tab, idx):
        return tab[idx].sum()

    @jax.jit
    def g64(tab, idx):
        return (tab[idx] & jnp.uint64(0xFFFF)).astype(jnp.int32).sum()

    @jax.jit
    def g32x2(tab, idx):
        return tab[idx].sum() + tab[idx + 1].sum()

    @jax.jit
    def scat(idx, vals, size):
        return (
            jnp.zeros(size, jnp.int32).at[idx].set(vals, mode="drop").sum()
        )

    @jax.jit
    def csum(x):
        return jnp.cumsum(x)[-1]

    for tab_n in (1 << 15, 1 << 20, 3_200_000, 1 << 25):
        tab = jax.device_put(np.arange(tab_n, dtype=np.int32))
        tab8 = jax.device_put(np.arange(tab_n, dtype=np.uint64))
        ridx = rng.integers(0, tab_n, Q).astype(np.int32)
        sidx = np.sort(ridx)
        d_r = jax.device_put(ridx)
        d_s = jax.device_put(sidx)
        print(f"--- table {tab_n} ({tab_n*4/1e6:.1f} MB i32)")
        timeit("  g32 random", g32, tab, d_r)
        timeit("  g32 sorted", g32, tab, d_s)
        timeit("  g64 random", g64, tab8, d_r)
        timeit("  g64 sorted", g64, tab8, d_s)

    tab = jax.device_put(np.arange(3_200_000, dtype=np.int32))
    ridx = rng.integers(0, 3_200_000, Q).astype(np.int32)
    d_r = jax.device_put(ridx)
    vals = jax.device_put(np.ones(Q, np.int32))
    timeit("scatter 1M -> 1.2M", scat, d_r, vals, 1_200_000)
    big = jax.device_put(np.ones(2 * Q, np.int32))
    timeit("cumsum 2M", csum, big)

    # windowed gather: start + arange(cap) pattern (tier shape)
    @functools.partial(jax.jit, static_argnames=("cap",))
    def window(tab, starts, cap):
        idx = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        return tab[jnp.minimum(idx, tab.shape[0] - 1)].sum()

    starts_r = jax.device_put(rng.integers(0, 3_200_000, Q).astype(np.int32))
    starts_s = jax.device_put(np.sort(np.asarray(starts_r)))
    timeit("window cap=2 random", window, tab, starts_r, 2)
    timeit("window cap=2 sorted", window, tab, starts_s, 2)

    # u64 sort cost for Q keys
    keys = jax.device_put(rng.integers(0, 1 << 62, Q).astype(np.uint64))

    @jax.jit
    def dosort(k):
        return jax.lax.sort(k)

    timeit("sort u64 1M", dosort, keys)

    @jax.jit
    def dosort2(k, v):
        return jax.lax.sort((k, v), num_keys=1)[0]

    vals32 = jax.device_put(np.arange(Q, dtype=np.int32))
    timeit("sort u64+i32 1M", dosort2, keys, vals32)


if __name__ == "__main__":
    main()
