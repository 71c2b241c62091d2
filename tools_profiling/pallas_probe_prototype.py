"""Pallas prototypes for the search probe, measured against the XLA gather.

The hot-path floor is the direct-map probe: N random u64 gathers from a
2^pb-entry table (~35 ms for N=2.26M on the dev chip via XLA's gather).
This prototypes the Pallas alternatives the ROADMAP deferred:

  1. xla_gather      — the production path's cost (baseline).
  2. pallas_dma      — per-tile kernel that issues ONE async DMA per
                       element from HBM into VMEM scratch (the "manual
                       DMA pipelining" idea at its finest granularity).
  3. pallas_vmem_lut — tiles the TABLE through VMEM sequentially
                       (contiguous DMA, bandwidth-bound) and, for each
                       table tile, selects the queries that fall in it
                       from a slot-sorted query array (merge-join
                       formulation). Requires the query array sorted by
                       slot and a per-tile offset prefix (computed with
                       XLA ops outside the kernel).

Run: python tools_profiling/pallas_probe_prototype.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401  (x64, cache config)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PB = 23                    # table slots = 2^23 (64 MB of u64)
N = 2_097_152              # queries (~bench Q)
TILE_Q = 1024              # queries per kernel tile
TILE_T = 2048              # table slots per VMEM tile (16 KB)


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label:18s} {dt:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    table = rng.integers(0, 1 << 31, size=1 << PB,
                         dtype=np.int32)  # one 32-bit plane of the u64 entry
                         # (Mosaic kernels have no 64-bit support)
    slots = rng.integers(0, 1 << PB, size=N).astype(np.int32)
    d_table = jax.device_put(table)
    d_slots = jax.device_put(slots)

    # ---- 1. XLA gather baseline
    @jax.jit
    def xla_gather(t, s):
        return jnp.sum((t[s] & 0xFFFF).astype(jnp.int64))

    want = timeit("xla_gather", xla_gather, d_table, d_slots)

    # ---- 2. Pallas per-element DMA (scalar async copies, double-buffered)
    def dma_kernel(slots_ref, table_hbm, out_ref, scratch, sem):
        def body(i, acc):
            slot = slots_ref[0, 0, i]
            i = jnp.int32(i)
            j = jax.lax.rem(i, jnp.int32(8))
            cp = pltpu.make_async_copy(
                table_hbm.at[pl.ds(slot, 1)],
                scratch.at[j, pl.ds(0, 1)], sem
            )
            cp.start()
            cp.wait()
            return acc + (scratch[j, 0] & jnp.int32(0xFFFF))

        out_ref[pl.program_id(0), 0] = jax.lax.fori_loop(
            0, TILE_Q, body, jnp.int32(0))

    @jax.jit
    def pallas_dma(t, s):
        t = t  # int32 plane
        partial = pl.pallas_call(
            dma_kernel,
            grid=(N // TILE_Q,),
            in_specs=[
                pl.BlockSpec((1, 1, TILE_Q), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((N // TILE_Q, 1), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(s.reshape(N // TILE_Q, 1, TILE_Q), t)
        return partial.sum()

    try:
        got = timeit("pallas_dma", pallas_dma, d_table, d_slots, n=2)
        print("   (sums mod 2^32 equal:", 
              int(got) % (1 << 32) == int(want) % (1 << 32), ")")
    except Exception as e:  # noqa: BLE001 - prototype: report and move on
        print(f"pallas_dma        FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # ---- 3. merge-join: sort queries by slot, stream the table through
    # VMEM tile by tile (contiguous DMA), select each tile's query range.
    # The in-tile lookup still needs a per-lane VMEM gather; express it
    # with jnp.take and let Mosaic decide if it lowers.
    n_tiles = (1 << PB) // TILE_T

    def lut_kernel(qoff_ref, sslot_ref, tile_ref, out_ref):
        t = pl.program_id(0)
        T8 = TILE_T // 8
        cnt = qoff_ref[0, t + 1] - qoff_ref[0, t]
        idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, 1), 0)
        mask = idx < cnt
        qs = sslot_ref[0].reshape(TILE_Q, 1)
        local = jnp.clip(qs - t * TILE_T, jnp.int32(0),
                         jnp.int32(TILE_T - 1))
        # per-lane VMEM gather does not lower on TPU; select via two
        # one-hot contractions on the MXU instead, in the tile's natural
        # (8, T8) layout (exact: f32 accumulates one 16-bit plane)
        r = local // jnp.int32(T8)           # [Q, 1]
        c = local - r * jnp.int32(T8)        # [Q, 1]
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, 8), 1)
        oh_r = (rows8 == r).astype(jnp.float32)          # [Q, 8]
        colsT = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, T8), 1)
        oh_c = (colsT == c).astype(jnp.float32)          # [Q, T8]
        plane = (tile_ref[0] & jnp.int32(0xFFFF)).astype(jnp.float32)
        picked_rows = jax.lax.dot_general(                # [Q, T8]
            oh_r, plane,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        vals = jnp.sum(picked_rows * oh_c, axis=1, keepdims=True)  # [Q,1]
        out_ref[t, 0] = jnp.sum(jnp.where(mask, vals, 0.0))

    @jax.jit
    def pallas_lut(t, s):
        ss = jnp.sort(s)
        bounds = jnp.searchsorted(
            ss, jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_T
        ).astype(jnp.int32)
        qwin = jnp.pad(ss, (0, max(0, n_tiles * TILE_Q - N))).reshape(
            n_tiles, 8, TILE_Q // 8)
        partial = pl.pallas_call(
            lut_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, TILE_Q // 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, TILE_T // 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1), jnp.float32),
        )(bounds.reshape(1, -1), qwin, t.reshape(n_tiles, 8, TILE_T // 8))
        return partial.sum()

    try:
        timeit("pallas_vmem_lut", pallas_lut, d_table, d_slots, n=2)
        print("NOTE: vmem_lut windows are fixed per tile (correctness "
              "requires per-tile dynamic offsets; timing is the point "
              "here)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas_vmem_lut   FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
