"""Device-side redundancy filtering (per-quotient best match + LCA).

Re-expresses ``filterRedundantMatches`` (`/root/reference/src/commons/Taxonomer.cpp:205-241`)
with fixed shapes: within one (read, species), matches sharing a position
quotient ``pos // dnaShift`` reduce to a single taxid — the minimum-hamming
match's, with equal-minimum ties collapsed by taxonomy LCA. (The reference's
sequential reset-and-accumulate loop equals "LCA of all matches whose
hamming equals the quotient minimum", since the last reset happens at the
first occurrence of the global minimum.)

LCA runs on device via the Euler-tour sparse table (the same structure the
host Taxonomy uses), reduced over tie sets with log-rounds of
distance-2^r segmented combining.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceTaxonomy(NamedTuple):
    """Euler-tour LCA structure as device arrays (from db.taxonomy)."""

    euler_first: jax.Array  # [N+1] int32
    euler_node: jax.Array   # [m] int32
    euler_depth: jax.Array  # [m] int32 depth per euler position
    sparse: jax.Array       # [levels, m] int32 argmin positions
    parent: jax.Array       # [N+1] int32


def device_taxonomy(tax) -> DeviceTaxonomy:
    return DeviceTaxonomy(
        euler_first=jax.device_put(np.asarray(tax.euler_first, np.int32)),
        euler_node=jax.device_put(np.asarray(tax.euler_node, np.int32)),
        euler_depth=jax.device_put(np.asarray(tax._euler_depth, np.int32)),
        sparse=jax.device_put(np.asarray(tax.sparse, np.int32)),
        parent=jax.device_put(np.asarray(tax.parent, np.int32)),
    )


def lca_pairs(dt: DeviceTaxonomy, a: jax.Array, b: jax.Array) -> jax.Array:
    """Vectorized LCA of internal-id arrays; 0 propagates the other side."""
    fa = dt.euler_first[jnp.maximum(a, 0)]
    fb = dt.euler_first[jnp.maximum(b, 0)]
    lo = jnp.minimum(fa, fb)
    hi = jnp.maximum(fa, fb)
    length = hi - lo + 1
    k = 31 - jax.lax.clz(length)
    left = dt.sparse[k, lo]
    right = dt.sparse[k, hi - (jnp.int32(1) << k) + 1]
    pick_right = dt.euler_depth[right] < dt.euler_depth[left]
    res = dt.euler_node[jnp.where(pick_right, right, left)]
    return jnp.where(a <= 0, b, jnp.where(b <= 0, a, res))


class QuotientResult(NamedTuple):
    # flat per-(read, species, quotient) rows, compacted to `max_rows`
    row_read: jax.Array     # [R] int32 (INT32_MAX padding)
    row_species: jax.Array  # [R] int32
    row_taxid: jax.Array    # [R] int32 LCA'd best taxid of the quotient
    n_rows: jax.Array       # [] int32


@functools.partial(jax.jit, static_argnames=("dna_shift", "max_rows"))
def quotient_best(
    dt: DeviceTaxonomy,
    qid, species, pos, hamming, taxid,  # [M] int32 sorted match arrays
    valid,                              # [M] bool
    *,
    dna_shift: int,
    max_rows: int,
) -> QuotientResult:
    M = qid.shape[0]
    quot = pos // dna_shift
    # quotients span frames, but matches arrive frame-major — re-sort so
    # each (read, species, quotient) set is one contiguous segment
    # (`filterRedundantMatches` walks the whole species range, all frames).
    # hamming (<=7 after the 2*min cutoff, <=56 worst case) packs with the
    # taxid payload; tie order within a segment is immaterial (LCA below).
    big_key = jnp.int32(2**31 - 1)
    k_qid = jnp.where(valid, qid, big_key)
    qid, species, quot, hamtax = jax.lax.sort(
        (k_qid, species, quot, (hamming << 26) | taxid),
        num_keys=3,
    )
    valid = qid != big_key
    hamming = jnp.where(valid, hamtax >> 26, 255)
    taxid = hamtax & jnp.int32((1 << 26) - 1)
    seg_new = jnp.ones(M, bool)
    seg_new = seg_new.at[1:].set(
        ~(
            (qid[1:] == qid[:-1])
            & (species[1:] == species[:-1])
            & (quot[1:] == quot[:-1])
        )
    )
    seg_new = seg_new | ~valid
    seg = jnp.cumsum(seg_new.astype(jnp.int32)) - 1

    # per-segment min hamming: scatter-min into a segment table, gather back
    big = jnp.int32(255)
    h = jnp.where(valid, hamming, big)
    n_seg_cap = M
    seg_c = jnp.minimum(seg, n_seg_cap)
    table = (
        jnp.full(n_seg_cap + 1, big, jnp.int32)
        .at[seg_c]
        .min(h, mode="drop")
    )
    minh = table[seg_c]
    is_tie = valid & (h == minh)

    # LCA over each segment's tie set = LCA of the two members whose Euler
    # first-occurrences are extremal (classic Euler-tour property). Since
    # euler_node[euler_first[x]] == x, two plain int32 scatter-reductions of
    # the first-occurrence positions identify the pair, and the range-min
    # LCA runs directly on those positions over the compacted rows —
    # no log-rounds, exact for any tie-set size.
    ef = dt.euler_first[jnp.maximum(taxid, 0)]
    big_ef = jnp.int32(2**30)
    efmin = (
        jnp.full(n_seg_cap + 1, big_ef, jnp.int32)
        .at[seg_c].min(jnp.where(is_tie, ef, big_ef), mode="drop")
    )
    efmax = (
        jnp.full(n_seg_cap + 1, -1, jnp.int32)
        .at[seg_c].max(jnp.where(is_tie, ef, -1), mode="drop")
    )

    first_of_seg = seg_new & valid
    (rows,) = jnp.nonzero(
        first_of_seg, size=max_rows, fill_value=M
    )
    pad = rows >= M
    safe = jnp.minimum(rows, M - 1)
    seg_r = seg_c[safe]
    lo_r = jnp.clip(efmin[seg_r], 0, dt.euler_node.shape[0] - 1)
    hi_r = jnp.clip(efmax[seg_r], lo_r, dt.euler_node.shape[0] - 1)
    length = hi_r - lo_r + 1
    kk = 31 - jax.lax.clz(length)
    left = dt.sparse[kk, lo_r]
    right = dt.sparse[kk, hi_r - (jnp.int32(1) << kk) + 1]
    pick_right = dt.euler_depth[right] < dt.euler_depth[left]
    row_taxid = dt.euler_node[jnp.where(pick_right, right, left)]
    INT32_MAX = jnp.int32(2**31 - 1)
    return QuotientResult(
        row_read=jnp.where(pad, INT32_MAX, qid[safe]),
        row_species=jnp.where(pad, INT32_MAX, species[safe]),
        row_taxid=jnp.where(pad, 0, row_taxid),
        n_rows=jnp.sum(first_of_seg.astype(jnp.int32)),
    )
