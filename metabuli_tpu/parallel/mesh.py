"""Multi-chip scaling: index sharding over a device mesh.

TPU-native replacement for the reference's single-node OpenMP parallelism
(`SURVEY.md` §2.8): a 2-D ``jax.sharding.Mesh`` with axes

  data -- read batches sharded across devices (data parallelism),
  db   -- the sorted metamer table range-partitioned by amino-acid prefix
          (the scaled-out generalization of the reference's 4096-entry
          ``split`` file, `/root/reference/src/commons/IndexCreator.cpp:844-858`).

Shard boundaries always fall on amino-acid group boundaries, so every query
metamer's equal-AA candidate range lives in exactly one shard and the
min-hamming cutoff (`KmerMatcher.cpp:1117-1146`) needs no cross-shard
reduction; a device's matches are complete for the AA ranges it owns.
Per-read results from different db shards are disjoint row sets merged by a
final per-read sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..classify.pipeline import classify_batch


def make_mesh(devices=None, n_db: int | None = None) -> Mesh:
    """Factor devices into a (data, db) mesh; db axis defaults to 2 when
    there are >= 4 devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_db is None:
        n_db = 2 if n % 2 == 0 and n >= 4 else 1
    if n % n_db != 0:
        raise ValueError(f"{n} devices not divisible by db={n_db}")
    arr = np.array(devices).reshape(n // n_db, n_db)
    return Mesh(arr, ("data", "db"))


def shard_index_aa_aligned(
    values: np.ndarray, taxids: np.ndarray, n_shards: int
) -> tuple[np.ndarray, np.ndarray]:
    """Split the sorted table into ``n_shards`` AA-aligned, equal-padded
    chunks: returns ([S, Npad] values, [S, Npad] taxids). Padding uses
    all-ones values whose AA part no real metamer can produce (every 5-bit
    amino-acid field <= 20)."""
    n = len(values)
    aa = values >> np.uint64(24)
    bounds = [0]
    for s in range(1, n_shards):
        target = s * n // n_shards
        # advance to the next AA-group boundary
        while target < n and target > 0 and aa[target] == aa[target - 1]:
            target += 1
        bounds.append(min(target, n))
    bounds.append(n)
    chunks = [(values[a:b], taxids[a:b]) for a, b in zip(bounds[:-1], bounds[1:])]
    pad = max((len(c[0]) for c in chunks), default=1)
    pad = max(pad, 1)
    out_v = np.full((n_shards, pad), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
    out_t = np.zeros((n_shards, pad), np.int32)
    for i, (v, t) in enumerate(chunks):
        out_v[i, : len(v)] = v
        out_t[i, : len(t)] = t.astype(np.int32)
    return out_v, out_t


def build_sharded_classify(
    mesh: Mesh,
    *,
    cap: int,
    max_matches: int,
    reduced: bool = False,
    syncmer: bool = False,
    smer_len: int = 5,
    kmer_format: int = 2,
):
    """shard_map'd classify step.

    Inputs (global shapes):
      db_values  [S, Npad]  sharded over 'db'
      db_taxids  [S, Npad]  sharded over 'db'
      tax2species [T]       replicated
      codes      [B, L]     sharded over 'data'
      lens/pos_offsets/qid_offsets [B] sharded over 'data'
    Output: per-(data, db) BatchMatches arrays stacked as
      [n_data, n_db, M] (+ scalars [n_data, n_db]).
    """

    def local_step(db_v, db_t, t2s, codes, lens, pos_off, qid_off):
        bm = classify_batch(
            db_v[0], db_t[0], t2s, codes, lens, pos_off, qid_off,
            cap=cap, max_matches=max_matches, reduced=reduced,
            syncmer=syncmer, smer_len=smer_len, kmer_format=kmer_format,
        )
        expand = lambda x: x[None, None]
        return jax.tree.map(expand, tuple(bm))

    in_specs = (
        P("db", None), P("db", None), P(),
        P("data", None), P("data"), P("data"), P("data"),
    )
    out_elem = P("data", "db")
    out_specs = tuple(out_elem for _ in range(11))
    fn = jax.shard_map(
        local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def merge_shard_matches(stacked, n_reads: int):
    """Merge per-(data, db) match arrays into per-read host arrays.

    ``stacked``: tuple of [n_data, n_db, M] arrays in BatchMatches field
    order. Rows are re-sorted by the reference match order; padding rows
    (qid == INT32_MAX) are dropped.
    """
    (qid, species, frame, pos, hamming, dna, taxid, h16,
     n_matches, n_over, total_kmers) = [np.asarray(x) for x in stacked]
    flat = [x.reshape(-1) for x in (qid, species, frame, pos, hamming, dna, taxid, h16)]
    valid = flat[0] != np.int32(2147483647)
    flat = [x[valid] for x in flat]
    order = np.lexsort(tuple(reversed(flat[:6])))
    flat = [x[order] for x in flat]
    return {
        "qid": flat[0], "species": flat[1], "frame": flat[2], "pos": flat[3],
        "hamming": flat[4], "dna": flat[5], "taxid": flat[6], "h16": flat[7],
        "n_matches": int(n_matches.sum()),
        "n_over_cap": int(n_over.sum()),
    }
