"""Isolate: does jax_enable_x64 change TPU gather lowering/cost?"""

import sys
import time

import numpy as np

X64 = "--x64" in sys.argv

import jax

jax.config.update("jax_enable_x64", X64)
import jax.numpy as jnp


def timeit(label, fn, *args, n=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    print(f"[x64={X64}] {label}: {(time.time()-t0)/n*1000:.2f} ms",
          flush=True)


rng = np.random.default_rng(0)
Q = 1 << 20
for tab_n in (1 << 23, (1 << 23) + 1):
    tab = jax.device_put(rng.integers(0, 1 << 30, tab_n).astype(np.int32))
    idx = jax.device_put(rng.integers(0, tab_n, Q).astype(np.int32))

    @jax.jit
    def g(t, i):
        return t[i].sum()

    @jax.jit
    def g_take(t, i):
        return jnp.take(t, i, mode="clip").sum()

    print(f"--- table {tab_n}")
    timeit("getitem", g, tab, idx)
    timeit("take(clip)", g_take, tab, idx)
    if X64:
        @jax.jit
        def g_cast(t, i):
            return t[i.astype(jnp.int32)].sum()
        timeit("getitem idx.astype(i32)", g_cast, tab, idx)
    # print the HLO gather index dtype
    hlo = jax.jit(g).lower(tab, idx).compile().as_text()
    for line in hlo.splitlines():
        if "gather" in line and "=" in line:
            print("   ", line.strip()[:160])
            break
