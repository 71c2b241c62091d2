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
    max_seg: jax.Array      # [] int32 largest quotient segment (rounds gate)


@functools.partial(
    jax.jit, static_argnames=("dna_shift", "max_rows", "lca_rounds")
)
def quotient_best(
    dt: DeviceTaxonomy,
    qid, species, pos, hamming, taxid,  # [M] int32 sorted match arrays
    valid,                              # [M] bool
    *,
    dna_shift: int,
    max_rows: int,
    lca_rounds: int = 6,
) -> QuotientResult:
    M = qid.shape[0]
    quot = pos // dna_shift
    # quotients span frames, but matches arrive frame-major — re-sort so
    # each (read, species, quotient) set is one contiguous segment
    # (`filterRedundantMatches` walks the whole species range, all frames)
    big_key = jnp.int32(2**31 - 1)
    k_qid = jnp.where(valid, qid, big_key)
    qid, species, quot, hamming, taxid, v_i = jax.lax.sort(
        (k_qid, species, quot, hamming, taxid, valid.astype(jnp.int32)),
        num_keys=3,
    )
    valid = v_i.astype(bool)
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
    table = (
        jnp.full(n_seg_cap + 1, big, jnp.int32)
        .at[jnp.minimum(seg, n_seg_cap)]
        .min(h, mode="drop")
    )
    minh = table[jnp.minimum(seg, n_seg_cap)]

    is_tie = valid & (h == minh)
    contrib = jnp.where(is_tie, taxid, 0)

    # largest segment length gates the round count: a segment longer than
    # 2^lca_rounds would be under-combined, so it is reported for the
    # caller's overflow-retry ladder (the host fallback stays exact)
    seg_len = jax.ops.segment_sum(
        valid.astype(jnp.int32), seg, num_segments=M + 1
    )
    max_seg = jnp.max(seg_len)

    # segmented LCA over tie members: suffix scan with distance-2^r combines
    acc = contrib
    for r in range(lca_rounds):
        hop = 1 << r
        shifted = jnp.concatenate([acc[hop:], jnp.zeros(hop, jnp.int32)])
        same = jnp.concatenate(
            [seg[hop:] == seg[:-hop], jnp.zeros(hop, bool)]
        )
        other = jnp.where(same, shifted, 0)
        acc = jnp.where(
            (acc > 0) & (other > 0), lca_pairs(dt, acc, other),
            jnp.maximum(acc, other),
        )
    # acc at a segment's first row = LCA over the segment's tie members
    # (non-tie rows contribute 0, which the combine treats as identity)
    first_of_seg = seg_new & valid

    (rows,) = jnp.nonzero(
        first_of_seg, size=max_rows, fill_value=M
    )
    pad = rows >= M
    safe = jnp.minimum(rows, M - 1)
    INT32_MAX = jnp.int32(2**31 - 1)
    return QuotientResult(
        row_read=jnp.where(pad, INT32_MAX, qid[safe]),
        row_species=jnp.where(pad, INT32_MAX, species[safe]),
        row_taxid=jnp.where(pad, 0, acc[safe]),
        n_rows=jnp.sum(first_of_seg.astype(jnp.int32)),
        max_seg=max_seg,
    )
