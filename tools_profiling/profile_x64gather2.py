"""Reproduce the 400x gather slowdown: closure capture? second gather? Q?"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", "--x64" in sys.argv)
import jax.numpy as jnp


def timeit(label, fn, *args, n=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    print(f"{label}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


rng = np.random.default_rng(0)
Q = 4096 * 6 * 46
tab_n = (1 << 23) + 1
tab = jax.device_put(rng.integers(0, 1 << 30, tab_n).astype(np.int32))
idx = jax.device_put(rng.integers(0, tab_n - 1, Q).astype(np.int32))


@jax.jit
def arg_one(t, i):
    return t[i].sum()


@jax.jit
def arg_two(t, i):
    return t[i].sum() + t[i + 1].sum()


@jax.jit
def clo_one(i):
    return tab[i].sum()


@jax.jit
def clo_two(i):
    return tab[i].sum() + tab[i + 1].sum()


timeit("arg 1 gather", arg_one, tab, idx)
timeit("arg 2 gathers", arg_two, tab, idx)
timeit("closure 1 gather", clo_one, idx)
timeit("closure 2 gathers", clo_two, idx)
hlo = jax.jit(clo_two).lower(idx).compile().as_text()
import re
for line in hlo.splitlines():
    if re.search(r"(gather|dynamic-slice|while)", line):
        print("   ", line.strip()[:200])
