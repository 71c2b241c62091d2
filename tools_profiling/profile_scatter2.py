"""Micro: scatter cost vs index order (random / sorted / strided)."""

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
M = 1_228_800
N = 3_211_264  # target cells

ridx = rng.choice(N, M, replace=False).astype(np.int32)
sidx = np.sort(ridx)
vals = rng.integers(0, 1 << 30, M).astype(np.int32)
d_r = jax.device_put(ridx)
d_s = jax.device_put(sidx)
d_v = jax.device_put(vals)


@jax.jit
def scat(idx, v):
    return jnp.zeros(N, jnp.int32).at[idx].set(v, mode="drop").sum()


@jax.jit
def scat5(idx, v):
    out = 0
    for sh in range(5):
        out += jnp.zeros(N, jnp.int32).at[idx].set(v >> sh, mode="drop").sum()
    return out


@jax.jit
def gat(idx, v):
    big = jnp.zeros(N, jnp.int32).at[idx].set(v, mode="drop")
    return big.sum()


timeit("scatter random", scat, d_r, d_v)
timeit("scatter sorted", scat, d_s, d_v)
timeit("scatter sorted x5 arrays", scat5, d_s, d_v)

# segment_min cost (used by chain q0)
seg = np.sort(rng.integers(0, 32768, M)).astype(np.int32)
d_seg = jax.device_put(seg)


@jax.jit
def segmin(s, v):
    return jax.ops.segment_min(v, s, num_segments=32769).sum()


timeit("segment_min 1.23M -> 32k", segmin, d_seg, d_v)
