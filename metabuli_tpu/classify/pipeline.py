"""Fused device classification step: reads -> sorted match arrays.

One jitted XLA program per (batch shape, cap, match budget):

  encoded reads [B, L] --extract--> metamers [B, 6, W]
                       --bucketed search + gather + hamming--> candidates
                       --compact (fixed budget)--> flat match rows
                       --multi-key sort--> reference match order

This fuses the reference's KmerExtractor + KmerMatcher + sortMatches stages
(`/root/reference/src/commons/Classifier.cpp:81-133`) into a single device
program; the host only sees the compacted, sorted match tensors.

TPU-tuned representation (everything on the hot path is 32-bit):

  * the sorted u64 metamer table is split into 32-bit columns; amino-acid
    identity is (prefix bucket, ``rest``), so the binary search compares a
    single int32 gather per step (HBM gathers are the bottleneck);
  * a 2^22-entry prefix table over the top value bits narrows each
    query's binary search to a handful of steps (the HBM-resident, massively
    wider analogue of the reference's 4096-entry ``split`` file);
  * per-codon Hamming scoring is pure int32 ALU (XOR + popcount over
    precomputed expanded-base encodings) — no table gathers at all;
  * compaction is cumsum + scatter (TPU-friendly, no sort-based nonzero);
  * the sort runs on 5 packed int32 keys, and all match columns leave the
    device as one stacked array (single transfer).

Overflow of the candidate cap or match budget is reported via counters,
mirroring the reference's match-buffer retry (`Classifier.cpp:127-131`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import encode

PREFIX_BITS = 26  # cap; see pick_prefix_bits
INT32_MAX = np.int32(2147483647)

# Odd multiplier => (aa * MULT) mod 2^aa_bits is a BIJECTION: buckets are
# the top bits of the permuted key, so bucket loads are Poisson-uniform
# regardless of amino-acid composition skew (raw AA prefixes cluster on
# common residues, and the SKEWED max bucket sets the binary-search depth
# for every query).
AA_PERM_MULT = 0x9E3779B97F4A7C15
# Independent second permutation for the pass-2 overflow table (dmap2):
# groups colliding under MULT1's top bits are re-scattered, so a second
# ONE-u64-gather probe resolves nearly every direct-map overflow.
AA_PERM_MULT2 = 0xC2B2AE3D27D4EB4F

# Groups deeper than DEEP_T rows are aligned to DevIndex.deep_w-row
# boundaries at index build so the deep candidate tier fetches each
# query's whole group with ONE row descriptor (see DevIndex.deep_w).
DEEP_T = 16
# Alignment is skipped above this depth: a deeper-than-512 group would
# need multi-row fetches and a 512-wide flat emission per query; such
# tables fall back to the scattered cap2 gather.
DEEP_W_MAX = 512


def _mod_inverse_pow2(mult: int, bits: int) -> int:
    """Inverse of an odd multiplier mod 2^bits (Newton iteration)."""
    inv = 1
    for _ in range(6):
        inv = (inv * (2 - mult * inv)) % (1 << bits)
    return inv % (1 << bits)


AA_PERM_INV = _mod_inverse_pow2(AA_PERM_MULT, 40)


def aa_permute(aa: np.ndarray, aa_bits: int) -> np.ndarray:
    """Host-side multiplicative permutation of AA keys (uint64 in/out)."""
    mask = np.uint64((1 << aa_bits) - 1)
    return (aa.astype(np.uint64) * np.uint64(AA_PERM_MULT)) & mask


def pack_codes(codes: np.ndarray) -> np.ndarray:
    """Nibble-pack a [B, L] base-code matrix to [B, ceil(L/2)] (host side).

    Codes are 3-bit (0-3 bases, 7 invalid), so two fit per byte; the
    device unpacks with two shifts (`codes_packed=True`). Odd L gets an
    INVALID-padded trailing column."""
    if codes.shape[1] % 2:
        codes = np.concatenate(
            [codes, np.full((codes.shape[0], 1), 7, np.uint8)], axis=1)
    return (codes[:, 0::2] << 4) | codes[:, 1::2]


def pick_prefix_bits(n_groups: int) -> int:
    """Bucket-prefix width sized to ~2 buckets per DISTINCT AA group:
    with permuted (uniform) keys the max bucket load is the Poisson tail
    (~8-11 at 0.5 load), i.e. a 4-step in-bucket search at any DB size
    up to the 2^26 cap. The table costs 8 bytes per group next to the
    20-byte row columns; small DBs shrink it (a fixed-size table would
    dominate tiny test indices)."""
    bits = 12
    while (1 << bits) < 2 * n_groups and bits < PREFIX_BITS:
        bits += 1
    return bits


def hamming_dna48_split(q_lo, q_hi, t_lo, t_hi):
    """(sum, packed_fwd16, packed_rev16) from expanded base encodings.

    Pure int32 ALU (no 64-bit emulation): XOR the 2-bit base lanes, fold
    each lane to one mismatch bit, popcount for the total, and extract
    per-codon 2-bit sums for the packed words. Exactly equals the reference
    LUT results for same-AA metamers (see expand_db_dna48). No gathers.

    ``lo`` holds dna48 bits 0..31 (codons 0..4 + low bits of codon 5);
    ``hi`` holds bits 32..47 (rest of codon 5 + codons 6, 7).
    """
    xl = q_lo ^ t_lo
    xh = q_hi ^ t_hi
    ml = (xl | (xl >> 1)) & jnp.int32(0x55555555)
    mh = (xh | (xh >> 1)) & jnp.int32(0x5555)
    hsum = (
        jax.lax.population_count(ml) + jax.lax.population_count(mh)
    ).astype(jnp.int32)
    fwd = jnp.zeros(xl.shape, jnp.int32)
    rev = jnp.zeros(xl.shape, jnp.int32)
    for i in range(8):
        if i < 5:  # codon i fully in lo at bits 6i..6i+4
            lane = (ml >> (6 * i)) & 0x15
            vi = (lane & 1) + ((lane >> 2) & 1) + ((lane >> 4) & 1)
        elif i == 5:  # bits 30 (lo), 32, 34 (hi)
            vi = ((ml >> 30) & 1) + (mh & 1) + ((mh >> 2) & 1)
        else:  # codons 6,7 in hi at bits 6i-32
            lane = (mh >> (6 * i - 32)) & 0x15
            vi = (lane & 1) + ((lane >> 2) & 1) + ((lane >> 4) & 1)
        fwd = fwd | (vi << (2 * i))
        rev = rev | (vi << (2 * (7 - i)))
    return hsum, fwd, rev


class DevIndex(NamedTuple):
    """Device-side representation of the sorted metamer table.

    The binary search runs over DISTINCT amino-acid groups, not rows:
    groups are ordered by the PERMUTED key pi(AA) = AA * AA_PERM_MULT
    (mod 2^aa_bits, a bijection), whose top bits pick the prefix bucket —
    permutation makes bucket loads Poisson-uniform, so the search depth
    is ~3-4 steps at any DB size, independent of both AA-group row skew
    (a 128-row low-complexity group costs the same as a 1-row group) and
    amino-acid composition skew (raw AA prefixes cluster on common
    residues). The candidate window is bounded by the group end, so it
    needs NO per-candidate AA compare. This is the device analogue of
    the reference's per-group candidate lists (`KmerMatcher.cpp:362-406`).

    ``db`` is the tuple of device arrays consumed by ``_classify_core``.
    TPU HBM random gathers are the hot path's bottleneck, and their cost
    scales with the number of 32-BIT ELEMENTS fetched (a u64 gather
    lowers to two i32 gathers), so the layout keeps the repeatedly-probed
    search key narrow (i32 ``grest``) while columns fetched once at the
    same index pack into u64 pairs:

      standard:  (grest  i32 [G]   pi bits below the bucket prefix,
                  gstart i32 [G]   first row of the group,
                  gend   i32 [G]   one-past-last row,
                  taxdna u64 [N]   value_lo32 << 32 | taxid,
                  d48    u64 [N]   expanded-base codons,
                  prefix i32 [2^prefix_bits + 1]  bucket group offsets)
      reduced:   (grest, gstart, gend, lo32 i32 [N], taxids i32 [N],
                  prefix)
                 (reduced scores via the 11x11 LUT on lo32 in the tier,
                 so the dna word is already fetched there)
    """

    db: tuple           # device arrays, layout above
    n: int
    search_iters: int   # static binary-search depth within a bucket
    prefix_bits: int
    # 0 = plain layout; nonzero = compact search layout, value = the
    # gbounds start-field width in bits (adaptive: tag gets 64-16-start
    # bits, so small tables afford wide rest tags — see build_dev_index)
    packed_search: int = 0
    # 0 = no direct-map table; nonzero = its slot width in bits. The
    # direct table resolves most queries with ONE u64 gather (see
    # build_dev_index); queries landing in multi-group buckets fall back
    # to the bucketed binary search over a compacted overflow list.
    direct_bits: int = 0
    # 0 = no second-hash overflow table; nonzero = dmap2 slot width. dmap2
    # holds the NON-first groups of multi-group dmap slots re-permuted by
    # AA_PERM_MULT2, so a `more`-flagged pass-2 query resolves with ONE
    # u64 gather; only its own double collisions (more2) fall back to the
    # bucketed binary search over a small compacted residual list.
    direct2_bits: int = 0
    # 0 = no aligned deep groups; nonzero = the deep-group row width W
    # (pow2). Groups deeper than DEEP_T rows are PADDED so their start is
    # W-aligned and the whole group fits one W-row: the deep tier then
    # fetches all candidates of a query with ONE row descriptor from the
    # d48 table viewed as [n/W, W] — HBM gathers are descriptor-bound
    # (~14 ns/descriptor nearly independent of row width, PERF.md), so
    # this replaces `depth` scattered fetches per deep-group query with
    # one. Padding rows are invisible: group (start, cnt) windows never
    # include them.
    deep_w: int = 0


def rest_bits(reduced: bool, prefix_bits: int = PREFIX_BITS) -> int:
    """AA bits below the bucket prefix (aa_shift = 32/24)."""
    return (64 - prefix_bits) - (32 if reduced else 24)


def _expansion_table() -> np.ndarray:
    """EXP[aa*8 + codon_number] -> 6-bit raw codon bases.

    Inverse of the (aa, codon-number) encoding: for every real codon
    c1c2c3 the table maps its (aa, num) back to c1<<4|c2<<2|c3. Valid for
    the standard 20-letter alphabet (`GeneticCode.h:32-194`).
    """
    from ..ops.genetic_code import codon_tables

    aa_tab, num_tab = codon_tables(False)
    exp = np.zeros(21 * 8, np.uint8)
    for ci in range(64):
        exp[int(aa_tab[ci]) * 8 + int(num_tab[ci])] = ci
    return exp


def expand_db_dna48(values: np.ndarray, kmer_format: int = 2) -> np.ndarray:
    """Per-entry expanded base encoding (host, vectorized).

    Matched query/target metamers share all 8 amino acids, so the per-codon
    Hamming LUTs (`KmerMatcher.h:66-158`) reduce to plain base-level Hamming
    between the expanded codons — computable on device by XOR + popcount
    with no table gathers. (LUT entries that disagree with base distance
    are unreachable for same-AA pairs.)
    """
    exp = _expansion_table().astype(np.uint64)
    values = np.asarray(values, np.uint64)
    d48 = np.zeros(len(values), np.uint64)
    if kmer_format == 2:
        for i in range(8):
            aa_i = (values >> np.uint64(24 + 5 * (7 - i))) & np.uint64(31)
            num_i = (values >> np.uint64(3 * (7 - i))) & np.uint64(7)
            c6 = exp[np.minimum(aa_i, 20) * np.uint64(8) + num_i]
            d48 |= c6 << np.uint64(6 * (7 - i))
    else:
        aa_part = values >> np.uint64(24)
        for i in range(8):
            aa_i = (aa_part // np.uint64(21**i)) % np.uint64(21)
            num_i = (values >> np.uint64(3 * i)) & np.uint64(7)
            c6 = exp[aa_i * np.uint64(8) + num_i]
            d48 |= c6 << np.uint64(6 * i)
    return d48


def build_dev_index(
    values: np.ndarray, taxids: np.ndarray, kmer_format: int = 2,
    reduced: bool = False,
) -> DevIndex:
    """Split + bucket the sorted u64 table for the 32-bit search path."""
    import os as _os

    n = len(values)
    aa_shift = 32 if reduced else 24
    aa_bits = 32 if reduced else 40
    aa = values >> np.uint64(aa_shift)
    new_g = np.ones(n, bool)
    if n:
        new_g[1:] = aa[1:] != aa[:-1]
    starts = np.nonzero(new_g)[0]
    n_groups = len(starts)
    group_aa = aa[starts]
    depth = np.append(starts[1:], n) - starts

    # ---- deep-group alignment (see DevIndex.deep_w): pad the row arrays
    # so every group deeper than DEEP_T starts on a deep_w boundary and
    # fits one deep_w-row. Group structures below are derived from the
    # UNPADDED group list plus a per-group shift, so padding rows are
    # structurally invisible (no phantom groups; (start, cnt) windows
    # exclude them).
    deep_w = 0
    max_group_raw = int(depth.max()) if n_groups else 1
    if (not reduced and n_groups and DEEP_T < max_group_raw <= DEEP_W_MAX
            and not _os.environ.get("METABULI_TPU_NO_DEEP_ALIGN")):
        deep_w = 1 << int(np.ceil(np.log2(max_group_raw)))
        deep_idx = np.nonzero(depth > DEEP_T)[0]
        pts, cur = [], 0
        for gi in deep_idx:  # a few thousand deep groups: host loop is fine
            pad = -(int(starts[gi]) + cur) % deep_w
            cur += pad
            if pad:
                pts.append((int(gi), cur))
        shift = np.zeros(n_groups, np.int64)
        if pts:
            idxs = np.array([p[0] for p in pts], np.int64)
            vals = np.array([p[1] for p in pts], np.int64)
            pos = np.searchsorted(idxs, np.arange(n_groups), side="right") - 1
            shift = np.where(pos >= 0, vals[np.maximum(pos, 0)], 0)
        n_new = -(-(n + cur) // deep_w) * deep_w  # whole rows for the 2D view
        new_pos = np.arange(n, dtype=np.int64) + np.repeat(shift, depth)
        values_p = np.zeros(n_new, np.uint64)
        values_p[new_pos] = values
        taxids_p = np.zeros(n_new, np.int32)
        taxids_p[new_pos] = np.ascontiguousarray(taxids, np.int32)
        values, taxids = values_p, taxids_p
        starts = starts + shift
        n = n_new

    pb = pick_prefix_bits(max(n_groups, 1))
    rb = rest_bits(reduced, pb)
    if n_groups:
        from ..native.sort import argsort_pair

        pi = aa_permute(group_aa, aa_bits)
        order = argsort_pair(pi)
        pi_s = pi[order]
        grest = (pi_s & np.uint64((1 << rb) - 1)).astype(np.int32)
        gstart = starts[order].astype(np.int32)
        gend = (starts + depth)[order].astype(np.int32)
        gbuckets = (pi_s >> np.uint64(rb)).astype(np.int64)
    else:  # degenerate empty table: one unreachable group
        grest = np.full(1, -1, np.int32)
        gstart = np.zeros(1, np.int32)
        gend = np.zeros(1, np.int32)
        gbuckets = np.zeros(0, np.int64)
    counts = np.bincount(gbuckets, minlength=1 << pb)
    prefix = np.zeros((1 << pb) + 1, np.int64)
    np.cumsum(counts, out=prefix[1:])
    max_bucket = int(counts.max()) if n_groups else 1
    iters = max(1, int(np.ceil(np.log2(max(2, max_bucket + 1)))))
    max_group = int((gend - gstart).max()) if n_groups else 1
    taxids_u = np.ascontiguousarray(taxids, np.int32).view(np.uint32)
    # Compact search layout (element count is what TPU gathers charge for):
    #   prefix_packed i32 [2^pb]: bucket start(23b) << 8 | load(8b) — ONE
    #     element instead of the (start, end) pair;
    #   gbounds u64 [G]: rest << (sb+16) | start(sb bits) << 16 | cnt(16b)
    #     — ONE u64 (2 elements) yields tag verify + row range, instead of
    #     three separate i32 gathers. The start width sb adapts to the row
    #     count, so small tables (fewer rows -> narrower start) afford the
    #     wider rest tags their smaller prefix_bits imply.
    start_bits = max(1, int(np.ceil(np.log2(n + 1)))) if n else 1
    rb_fits = rest_bits(reduced, pb) + start_bits + 16 <= 64
    packed = (
        not reduced
        and not _os.environ.get("METABULI_TPU_NO_PACKED_SEARCH")
        and rb_fits
        and max_bucket <= 255
        and max_group <= 0xFFFF
        and n < (1 << 31)
    )
    # Direct-mapped probe table: one u64 gather resolves every query whose
    # bucket (top direct_bits of pi) holds <= 1 group — the common case at
    # 1/8 load. Entry: more(1) | rest_tag | start | cnt(16); `more` routes
    # multi-group-bucket queries to the bucketed binary search (pass 2,
    # over a compacted overflow list). Zero entries are unreachable
    # (cnt == 0 yields an empty candidate window). Sized for <= 1/8 load,
    # capped at 2^24 slots (128 MB); the tag must stay exact
    # (slot + tag == the full 40-bit permuted AA key) so direct_bits also
    # floors at start_bits - 7 to keep the packing within 64 bits.
    direct_bits = 0
    dmap = None
    direct2_bits = 0
    dmap2 = None
    if packed and not _os.environ.get("METABULI_TPU_NO_DIRECT_SEARCH"):
        # slot count targets <= 1/8 load so almost every bucket holds one
        # group; the table is HBM-budgeted at max(256 MB, ~1.5x the row
        # payload footprint) — at GTDB-class group counts a 2^27-2^28
        # table keeps the multi-group overflow fraction (routed to the
        # bucketed pass-2 search at ~9 gathered elements/slot vs the
        # probe's 2) in the low percents instead of dominating: the
        # traced 60M-row world spent ~450 of 956 ms/batch in pass-2 at
        # 2^27 (7.6% overflow) vs ~2.2% at 2^28
        dmap_budget = max(256 << 20, 36 * n)
        dbits = 12
        while ((1 << dbits) < 8 * max(n_groups, 1) and dbits < 28
               and (8 << (dbits + 1)) <= dmap_budget):
            dbits += 1
        dbits = max(dbits, start_bits - 7)
        rb_d = 40 - dbits
        if dbits <= 28 and 1 + rb_d + start_bits + 16 <= 64 and n_groups:
            slots_d = (pi_s >> np.uint64(rb_d)).astype(np.int64)
            rest_d = pi_s & np.uint64((1 << rb_d) - 1)
            first = np.ones(n_groups, bool)
            first[1:] = slots_d[1:] != slots_d[:-1]
            dmap = np.zeros(1 << dbits, np.uint64)
            dmap[slots_d[first]] = (
                (rest_d[first] << np.uint64(start_bits + 16))
                | (gstart[first].astype(np.uint64) << np.uint64(16))
                | (gend[first] - gstart[first]).astype(np.uint64)
            )
            # slots_d is sorted, so slots holding >= 2 groups are exactly
            # the duplicated values — no 2^dbits int64 bincount (2 GiB
            # transient at dbits=28) needed for the overflow flag
            multi = slots_d[1:][slots_d[1:] == slots_d[:-1]]
            dmap[multi] |= np.uint64(1) << np.uint64(63)
            direct_bits = dbits
            # ---- dmap2: a SECOND-hash direct table over just the
            # NON-first groups of multi-group slots. A pass-2 query
            # (`more`-flagged, first-group tag mismatch) then resolves
            # with ONE u64 gather instead of a ~6-fetch bucketed binary
            # search; only double collisions (a few % of pass-2) fall
            # back to the search. Sized for <= 1/4 load, 8 B/slot.
            ovf = ~first
            n_ovf = int(ovf.sum())
            if n_ovf:
                d2 = 14
                while ((1 << d2) < 4 * n_ovf and d2 < 26
                       and (8 << (d2 + 1)) <= dmap_budget):
                    d2 += 1
                d2 = max(d2, start_bits - 7)
                rb2 = 40 - d2
                if d2 <= 26 and 1 + rb2 + start_bits + 16 <= 64:
                    aa_ovf = (pi_s[ovf] * np.uint64(AA_PERM_INV)
                              ) & np.uint64((1 << 40) - 1)
                    pi2 = (aa_ovf * np.uint64(AA_PERM_MULT2)
                           ) & np.uint64((1 << 40) - 1)
                    o2 = np.argsort(pi2, kind="stable")
                    pi2 = pi2[o2]
                    slots2 = (pi2 >> np.uint64(rb2)).astype(np.int64)
                    g2s = gstart[ovf][o2]
                    g2e = gend[ovf][o2]
                    first2 = np.ones(n_ovf, bool)
                    first2[1:] = slots2[1:] != slots2[:-1]
                    dmap2 = np.zeros(1 << d2, np.uint64)
                    dmap2[slots2[first2]] = (
                        ((pi2[first2] & np.uint64((1 << rb2) - 1))
                         << np.uint64(start_bits + 16))
                        | (g2s[first2].astype(np.uint64) << np.uint64(16))
                        | (g2e[first2] - g2s[first2]).astype(np.uint64)
                    )
                    multi2 = slots2[1:][slots2[1:] == slots2[:-1]]
                    dmap2[multi2] |= np.uint64(1) << np.uint64(63)
                    direct2_bits = d2
    if reduced:
        # reduced mode scores via the 11x11 LUT on codon-number fields,
        # not the expanded-base XOR path; lo32 is fetched in the tier.
        lo32 = (values & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(
            np.int32)
        db = (grest, gstart, gend, lo32, taxids_u.view(np.int32),
              prefix.astype(np.int32))
    elif packed:
        taxdna = ((values & np.uint64(0xFFFFFFFF)) << np.uint64(32)) | taxids_u
        d48 = expand_db_dna48(values, kmer_format)
        # bucket start(23b) << 8 | load(8b) in ONE i32 element; tables
        # beyond 2^23 groups widen to i64 (2 gathered elements — in direct
        # mode only the rare pass-2 queries ever fetch it)
        prefix_packed = (
            (prefix[:-1].astype(np.int64) << 8) | counts.astype(np.int64)
        )
        if n_groups < (1 << 23):
            prefix_packed = prefix_packed.astype(np.int32)
        gbounds = (
            (grest.astype(np.uint64) << np.uint64(start_bits + 16))
            | (gstart.astype(np.uint64) << np.uint64(16))
            | (gend - gstart).astype(np.uint64)
        )
        db = (grest, gbounds, taxdna, d48, prefix_packed)
        if direct_bits:
            db = db + (dmap,)
            if direct2_bits:
                db = db + (dmap2,)
    else:
        taxdna = ((values & np.uint64(0xFFFFFFFF)) << np.uint64(32)) | taxids_u
        d48 = expand_db_dna48(values, kmer_format)
        db = (grest, gstart, gend, taxdna, d48, prefix.astype(np.int32))
    return DevIndex(
        db=tuple(jax.device_put(a) for a in db),
        n=n,
        search_iters=iters,
        prefix_bits=pb,
        packed_search=start_bits if packed else 0,
        direct_bits=direct_bits,
        direct2_bits=direct2_bits,
        deep_w=deep_w if packed else 0,
    )


class BatchMatches(NamedTuple):
    # transfer-packed: species/frame/hamming/h16 are derived host-side
    data: jax.Array     # [5, M] int32: qid, pos, dna, taxid,
                        #               packed (frame | hamming<<3 | h16<<11)
    counts: jax.Array   # [3] int32: n_matches, n_over_cap, total_kmers


FIELDS = ("qid", "species", "frame", "pos", "hamming", "dna", "taxid", "h16")


def _g64(tab: jax.Array, idx: jax.Array) -> jax.Array:
    """u64 table gather via a [N, 2]-i32 ROW fetch.

    A native 1D u64 gather is charged as two 32-bit elements (~43 ns per
    lookup at 2^27-table scale); fetching the bitcast [N, 2] row costs
    one 8-byte descriptor (~27 ns) — measured in
    tools_profiling/profile_rowgather.py. The reconstruction shifts are
    VPU-free by comparison."""
    r = jax.lax.bitcast_convert_type(tab, jnp.int32)[idx]   # [..., 2]
    lo = jax.lax.bitcast_convert_type(r[..., 0], jnp.uint32).astype(
        jnp.uint64)
    hi = jax.lax.bitcast_convert_type(r[..., 1], jnp.uint32).astype(
        jnp.uint64)
    return (hi << jnp.uint64(32)) | lo


def _unsigned_less(a: jax.Array, b: jax.Array) -> jax.Array:
    """Unsigned < on bit-cast int32 (flip the sign bit)."""
    flip = jnp.int32(-2147483648)
    return (a ^ flip) < (b ^ flip)


def _classify_core(
    db,
    tax2species,
    codes, lens, pos_offsets, qid_offsets,
    *,
    n_db: int,
    search_iters: int,
    cap: int,
    max_matches: int,
    reduced: bool,
    syncmer: bool,
    smer_len: int,
    kmer_format: int,
    sort_device: bool = True,
    prefix_bits: int = PREFIX_BITS,
    cap2: int = 0,
    ov_budget: int = 0,
    packed_search: bool = False,
    direct_bits: int = 0,
    hit_budget: int = 0,
    sovf_budget: int = 0,
    direct2_bits: int = 0,
    resid_budget: int = 0,
    codes_packed: bool = False,
    deep_w: int = 0,
    ovd_budget: int = 0,
):
    """Traceable core: encoded reads -> sorted match columns (on device).

    Two-tier candidate cap (``cap2 > cap``): every query first gathers a
    small ``cap``-wide window; the few queries whose equal-AA run extends
    past it are compacted into an ``ov_budget`` list and re-gathered at
    ``cap2``. Real databases have heavily skewed AA-group sizes (a handful
    of low-complexity groups with thousands of entries), so a single cap
    sized to the max group would multiply EVERY query's gather volume by
    the worst case (`KmerMatcher.cpp:362-406` walks per-group candidate
    lists; this is its fixed-shape analogue).

    Returns (m_qid, m_species, m_pos, m_dna, m_taxid, m_packed, counts)
    where padding rows have qid == INT32_MAX and packed holds
    frame | hamming << 3 | h16 << 11. Shared by the transfer-packed
    ``_classify_batch_impl`` and the fused device-taxonomer program.

    With ``sort_device=False`` the final multi-key sort is skipped: rows
    come back in compaction (query-major) order — already grouped by read
    with padding at the tail — and the host taxonomer performs the cheap
    per-read sort instead (its reads are independent, so a global device
    sort is wasted work on the host path)."""
    db_dmap = None
    db_dmap2 = None
    if reduced:
        db_grest, db_gstart, db_gend, db_lo, db_tax, db_prefix = db
    elif packed_search and direct_bits and direct2_bits:
        db_grest, db_gbounds, db_taxdna, db_d48, db_prefix_packed, \
            db_dmap, db_dmap2 = db
    elif packed_search and direct_bits:
        db_grest, db_gbounds, db_taxdna, db_d48, db_prefix_packed, \
            db_dmap = db
    elif packed_search:
        db_grest, db_gbounds, db_taxdna, db_d48, db_prefix_packed = db
    else:
        db_grest, db_gstart, db_gend, db_taxdna, db_d48, db_prefix = db
    # the direct-probe + hit-compaction flow needs all three budgets and
    # the packed layouts; otherwise every query runs the bucketed search
    direct_mode = bool(
        direct_bits and hit_budget and sovf_budget
        and packed_search and not reduced
    )
    if codes_packed:
        # 4-bit nibble-packed reads (see pack_codes): halves the
        # host->device volume — the input transfer rides a ~40MB/s tunnel
        # on the dev chip — at the cost of two VPU ops to unpack
        Bp, Lp = codes.shape
        codes = jnp.stack(
            [(codes >> 4) & jnp.uint8(0xF), codes & jnp.uint8(0xF)],
            axis=-1,
        ).reshape(Bp, 2 * Lp)
    B, L = codes.shape
    mm = encode.extract_metamers(
        codes, lens, reduced=reduced, syncmer=syncmer, smer_len=smer_len,
        kmer_format=kmer_format,
    )
    W = mm.value.shape[2]
    q_values = mm.value.reshape(-1)
    q_valid = mm.valid.reshape(-1)
    q_frame = jnp.broadcast_to(
        jnp.arange(6, dtype=jnp.int32)[None, :, None], (B, 6, W)
    ).reshape(-1)
    Q = q_values.shape[0]

    bc32 = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.uint32), jnp.int32
    )
    rb = rest_bits(reduced, prefix_bits)
    aa_bits = 32 if reduced else 40
    n_g = db_grest.shape[0]

    def search_groups(vals, valid_mask):
        """Bucketed lower-bound search over DISTINCT AA groups: depth is
        the Poisson-uniform bucket load, independent of row and AA skew.
        Each step probes ONE i32 (gather cost on TPU scales with 32-bit
        elements fetched, so the loop key stays narrow). The permutation
        (odd multiply, a bijection) uniformizes bucket loads; the whole
        u64 lower-bound compare reduces to one i32 gather per step because
        groups within a bucket are sorted by rest."""
        q_aa = vals >> jnp.uint64(32 if reduced else 24)
        q_pi = (q_aa * jnp.uint64(AA_PERM_MULT)) & jnp.uint64(
            (1 << aa_bits) - 1
        )
        q_rest = (q_pi & jnp.uint64((1 << rb) - 1)).astype(jnp.int32)
        bucket = (q_pi >> jnp.uint64(rb)).astype(jnp.int32)
        if packed_search:
            # ONE element for the bucket bounds, one u64 for verify+range
            pc = db_prefix_packed[bucket]
            if db_prefix_packed.dtype == jnp.int32:
                lo = (pc >> 8) & jnp.int32(0x7FFFFF)
                bucket_end = lo + (pc & 255)
            else:  # i64 variant for > 2^23 groups
                lo = (pc >> 8).astype(jnp.int32)
                bucket_end = lo + (pc & 255).astype(jnp.int32)
        else:
            lo = db_prefix[bucket]
            bucket_end = db_prefix[bucket + 1]
        hi = bucket_end
        for _ in range(search_iters):
            active = lo < hi
            mid = (lo + hi) >> 1
            mid_c = jnp.minimum(mid, jnp.int32(max(n_g - 1, 0)))
            less = db_grest[mid_c] < q_rest
            lo = jnp.where(active & less, mid + 1, lo)
            hi = jnp.where(active & ~less, mid, hi)
        g_c = jnp.minimum(lo, jnp.int32(max(n_g - 1, 0)))
        if packed_search:
            sb = int(packed_search)  # start-field width (adaptive)
            gb = _g64(db_gbounds, g_c)
            g_tag = bc32(gb >> jnp.uint64(sb + 16))
            s = bc32((gb >> jnp.uint64(16)) & jnp.uint64((1 << sb) - 1))
            cnt = bc32(gb & jnp.uint64(0xFFFF))
            h = valid_mask & (lo < bucket_end) & (g_tag == q_rest)
            e = jnp.where(h, s + cnt, s)
        else:
            h = valid_mask & (lo < bucket_end) & (db_grest[g_c] == q_rest)
            s = db_gstart[g_c]
            # row range of the matched group; empty (start, start) on miss —
            # the candidate window needs no per-candidate AA compare at all
            e = jnp.where(h, db_gend[g_c], s)
        return s, e, h

    two_tier = cap2 > cap and ov_budget > 0
    n_safe = jnp.int32(max(n_db - 1, 0))
    if kmer_format == 2:
        fwd_q = q_frame < 3
    else:
        fwd_q = q_frame >= 3
    if reduced:
        from ..ops.hamming import hamming_all_reduced

        q_lo = bc32(q_values & jnp.uint64(0xFFFFFFFF))
    else:
        q_d48 = mm.dna48.reshape(-1)
        q_d48lo = bc32(q_d48 & jnp.uint64(0xFFFFFFFF))
        q_d48hi = bc32(q_d48 >> jnp.uint64(32))

    def tier(starts, ends, active, capv, d48lo_q, d48hi_q, lo_q,
             fwd_sel):
        """One capped gather + Hamming + min-cutoff pass (vectorized)."""
        idx = starts[:, None] + jnp.arange(capv, dtype=jnp.int32)[None, :]
        idx_c = jnp.minimum(idx, n_safe)
        same_aa = (idx < ends[:, None]) & active[:, None]
        if reduced:
            # LUT distances over 4-bit codon fields (11x11 table is NOT
            # base-level Hamming, so no XOR trick); DNA part == lo32.
            t_dna = db_lo[idx_c]
            hsum, h_fwd, h_rev = hamming_all_reduced(lo_q[:, None], t_dna)
        else:
            t_dna = None
            dd = _g64(db_d48, idx_c)  # one 8-byte row descriptor per candidate
            hsum, h_fwd, h_rev = hamming_dna48_split(
                d48lo_q[:, None], d48hi_q[:, None],
                bc32(dd & jnp.uint64(0xFFFFFFFF)),
                bc32(dd >> jnp.uint64(32)),
            )
        hsum_m = jnp.where(same_aa, hsum, jnp.int32(255))
        cutoff = jnp.minimum(jnp.min(hsum_m, axis=1) * 2, 7)
        keep = same_aa & (hsum_m <= cutoff[:, None])
        h16 = jnp.where(fwd_sel[:, None], h_fwd, h_rev)
        return idx_c, keep, hsum, h16, t_dna

    # per-slot payloads ride through the compaction sort so nothing has to
    # be re-gathered after it: h16 (16b) + hamming (3b; kept rows have
    # hsum <= min-cutoff <= 7) + frame (3b) pack into one word; qid, pos
    # and the db row index are broadcasts/copies of per-slot values
    # (broadcasts are layout ops — the table gathers they replace cost
    # ~10ns/element on TPU)
    q_pos = (mm.pos + pos_offsets[:, None, None]).reshape(-1)   # [Q]
    q_qid = jnp.broadcast_to(
        qid_offsets[:, None, None], (B, 6, W)
    ).reshape(-1)                                               # [Q]

    def payw(h16v, hsumv, framev):
        return (h16v << 6) | ((hsumv & 7) << 3) | framev[:, None]

    if direct_mode:
        # ---- pass 1: ONE u64 probe of the direct-mapped table resolves
        # every query whose bucket holds <= 1 group; `more`-flagged
        # mismatches retry through the bucketed binary search over a
        # COMPACTED overflow list (pass 2), and the capped candidate
        # gathers below run on compacted HIT rows only — the per-slot
        # cost of the search drops from ~9 gathered elements to 2.
        rb_d = 40 - direct_bits
        sbw = int(packed_search)
        q_pi = (
            (q_values >> jnp.uint64(24)) * jnp.uint64(AA_PERM_MULT)
        ) & jnp.uint64((1 << 40) - 1)
        e = _g64(db_dmap, (q_pi >> jnp.uint64(rb_d)).astype(jnp.int32))
        rest_d = bc32(q_pi & jnp.uint64((1 << rb_d) - 1))
        tag = bc32((e >> jnp.uint64(sbw + 16)) & jnp.uint64((1 << rb_d) - 1))
        s1 = bc32((e >> jnp.uint64(16)) & jnp.uint64((1 << sbw) - 1))
        c1 = bc32(e & jnp.uint64(0xFFFF))
        hit1 = q_valid & (tag == rest_d) & (c1 > 0)
        sovf = q_valid & ((e >> jnp.uint64(63)) != 0) & ~hit1
        n_hits1 = jnp.sum(hit1.astype(jnp.int32)).astype(jnp.int32)
        n_sovf = jnp.sum(sovf.astype(jnp.int32)).astype(jnp.int32)
        slotid = jnp.arange(Q, dtype=jnp.int32)

        def pad_to(x, length, fill):
            if x.shape[0] < length:
                x = jnp.pad(x, (0, length - x.shape[0]),
                            constant_values=fill)
            return x[:length]

        # ---- ONE Q-wide partition sort compacts pass-1 hits AND routes
        # the pass-2 overflow: key = slot (hit) | Q+slot (overflow) | MAX.
        # Hits land in [0, n_hits1) in slot order, overflow slots right
        # after — a dynamic slice at n_hits1 replaces the second Q-wide
        # sort. EVERY per-slot field the downstream streams need rides as
        # an i32 payload: i32 sort operands are nearly free on TPU
        # (measured +0.8-2.5 ms each at 4.5M rows) while the post-sort
        # [hit_budget]/[sovf_budget] scalar gathers they replace cost
        # ~28 ns per u64 row (the q_d48/q_values/meta fetches were ~60 ms
        # of the traced skew batch). A packed u64 operand would cost
        # +25 ms — keep every payload a 32-bit half.
        key3 = jnp.where(
            hit1, slotid, jnp.where(sovf, Q + slotid, INT32_MAX)
        )
        vlo = bc32(q_values & jnp.uint64(0xFFFFFFFF))
        vhi = bc32(q_values >> jnp.uint64(32))
        kS, sS, cS, dloS, dhiS, vloS, vhiS, posS, qidS = jax.lax.sort(
            (key3, s1, c1, q_d48lo, q_d48hi, vlo, vhi, q_pos, q_qid),
            num_keys=1,
        )

        # pass-2 region: `more`-flagged overflow slots
        def slice2(x, fill):
            return jax.lax.dynamic_slice_in_dim(
                pad_to(x, max(Q, sovf_budget), fill), n_hits1, sovf_budget)

        bcu = lambda x: jax.lax.bitcast_convert_type(
            x, jnp.uint32).astype(jnp.uint64)
        s2k = slice2(kS, INT32_MAX)
        is2 = (s2k >= Q) & (s2k != INT32_MAX)
        s2_slot = jnp.where(is2, s2k - Q, INT32_MAX)
        pad2 = ~is2
        d2lo, d2hi = slice2(dloS, 0), slice2(dhiS, 0)
        pos2, qid2 = slice2(posS, 0), slice2(qidS, 0)
        qv2 = (bcu(slice2(vhiS, 0)) << jnp.uint64(32)) | bcu(
            slice2(vloS, 0))
        use_d2 = bool(direct2_bits and resid_budget)
        n_resid = jnp.int32(0)
        if use_d2:
            # ---- pass 2a: ONE u64 probe of the second-hash table (the
            # non-first groups of multi dmap slots under AA_PERM_MULT2)
            # replaces the ~6-fetch bucketed binary search for nearly
            # every overflow query; only dmap2's own double collisions
            # (more2) go to the search, compacted to [resid_budget].
            rb2 = 40 - direct2_bits
            pi2q = (
                (qv2 >> jnp.uint64(24)) * jnp.uint64(AA_PERM_MULT2)
            ) & jnp.uint64((1 << 40) - 1)
            e2 = _g64(db_dmap2, (pi2q >> jnp.uint64(rb2)).astype(jnp.int32))
            rest2 = bc32(pi2q & jnp.uint64((1 << rb2) - 1))
            tag2 = bc32(
                (e2 >> jnp.uint64(sbw + 16)) & jnp.uint64((1 << rb2) - 1))
            s2v = bc32((e2 >> jnp.uint64(16)) & jnp.uint64((1 << sbw) - 1))
            c2v = bc32(e2 & jnp.uint64(0xFFFF))
            h2 = ~pad2 & (tag2 == rest2) & (c2v > 0)
            more2 = ~pad2 & ((e2 >> jnp.uint64(63)) != 0) & ~h2
            st2 = jnp.where(h2, s2v, 0)
            en2 = jnp.where(h2, s2v + c2v, 0)
            n_resid = jnp.sum(more2.astype(jnp.int32))
            rp = jnp.cumsum(more2.astype(jnp.int32)) - 1
            SB = sovf_budget
            scv = jnp.where(more2 & (rp < resid_budget), rp,
                            jnp.int32(resid_budget))
            r_idx = (
                jnp.full(resid_budget, SB, jnp.int32)
                .at[scv].set(jnp.arange(SB, dtype=jnp.int32), mode="drop")
            )
            r_pad = r_idx >= SB
            r_safe = jnp.minimum(r_idx, SB - 1)
            st3, en3, h3 = search_groups(qv2[r_safe], ~r_pad)
            slot3 = jnp.where(h3 & ~r_pad, s2_slot[r_safe], INT32_MAX)
        else:
            st2, en2, h2 = search_groups(qv2, ~pad2)

        kH_raw = pad_to(kS, hit_budget, INT32_MAX)
        hpad = kH_raw >= Q          # overflow rows or MAX padding
        kH = jnp.where(hpad, INT32_MAX, kH_raw)
        sH_s = jnp.where(hpad, 0, pad_to(sS, hit_budget, 0))
        sH_c = jnp.where(hpad, 0, pad_to(cS, hit_budget, 0))

        # hit/pass-2 stream fields all arrive as sort payloads — no
        # post-sort [Q]-array gathers remain on this path
        parts_slot = [kH, jnp.where(h2, s2_slot, INT32_MAX)]
        parts_st = [sH_s, st2]
        parts_en = [sH_s + sH_c, en2]
        z = jnp.int32(0)
        parts_dlo = [jnp.where(hpad, z, pad_to(dloS, hit_budget, 0)), d2lo]
        parts_dhi = [jnp.where(hpad, z, pad_to(dhiS, hit_budget, 0)), d2hi]
        parts_pos = [jnp.where(hpad, z, pad_to(posS, hit_budget, 0)), pos2]
        parts_qid = [jnp.where(hpad, z, pad_to(qidS, hit_budget, 0)), qid2]
        if use_d2:
            parts_slot.append(slot3)
            parts_st.append(st3)
            parts_en.append(en3)
            parts_dlo.append(d2lo[r_safe])
            parts_dhi.append(d2hi[r_safe])
            parts_pos.append(pos2[r_safe])
            parts_qid.append(qid2[r_safe])
        slots_r = jnp.concatenate(parts_slot)
        starts_r = jnp.concatenate(parts_st)
        ends_r = jnp.concatenate(parts_en)
        activer = slots_r != INT32_MAX
        saf = jnp.minimum(slots_r, Q - 1)
        d48lo_r = jnp.concatenate(parts_dlo)
        d48hi_r = jnp.concatenate(parts_dhi)
        frame_r = (saf // W) % 6
        fwd_r = frame_r < 3 if kmer_format == 2 else frame_r >= 3
        pos_r = jnp.concatenate(parts_pos)
        qid_r = jnp.concatenate(parts_qid)
        NC = hit_budget + sovf_budget + (resid_budget if use_d2 else 0)

        idx_c, keep, hsum, h16, _ = tier(
            starts_r, ends_r, activer, cap, d48lo_r, d48hi_r, None, fwd_r
        )
        over_all = activer & (starts_r + cap < ends_r)
        # deep tier: groups deeper than DEEP_T were aligned at index build
        # (DevIndex.deep_w) — ONE row descriptor fetches a query's whole
        # candidate window; the scattered cap2 gather handles only the
        # medium (cap, DEEP_T] groups
        deep_mode = bool(deep_w) and two_tier and ovd_budget > 0
        n_ovd = jnp.int32(0)
        if deep_mode:
            cnt_r = ends_r - starts_r
            over = over_all & (cnt_r <= DEEP_T)
            overd = over_all & (cnt_r > DEEP_T)
            cap2_eff = min(cap2, DEEP_T)
        else:
            over = over_all
            cap2_eff = cap2
        if two_tier:
            ovp = jnp.cumsum(over.astype(jnp.int32)) - 1
            n_ov = ovp[-1] + 1
            sc = jnp.where(over & (ovp < ov_budget), ovp,
                           jnp.int32(ov_budget))
            ov_idx = (
                jnp.full(ov_budget, NC, jnp.int32)
                .at[sc].set(jnp.arange(NC, dtype=jnp.int32), mode="drop")
            )
            ov_pad = ov_idx >= NC
            ov_safe = jnp.minimum(ov_idx, NC - 1)
            start2 = jnp.where(ov_pad, 0, starts_r[ov_safe])
            gend2 = jnp.where(ov_pad, 0, ends_r[ov_safe])
            idx2_c, keep2, hsum2, h16_2, _ = tier(
                start2, gend2, ~ov_pad, cap2_eff,
                d48lo_r[ov_safe], d48hi_r[ov_safe], None, fwd_r[ov_safe]
            )
            keep = keep & ~over_all[:, None]
            over2 = ~ov_pad & (start2 + cap2_eff < gend2)
            n_over_cap = jnp.sum(over2.astype(jnp.int32))
            flat_keeps = [keep.reshape(-1), keep2.reshape(-1)]
            flat_pays = [
                payw(h16, hsum, frame_r).reshape(-1),
                payw(h16_2, hsum2, frame_r[ov_safe]).reshape(-1),
            ]
            flat_midxs = [idx_c.reshape(-1), idx2_c.reshape(-1)]

            def b1(x):
                return jnp.broadcast_to(x[:, None], (NC, cap)).reshape(-1)

            def b2(x):
                return jnp.broadcast_to(
                    x[ov_safe][:, None], (ov_budget, cap2_eff)
                ).reshape(-1)

            flat_qids = [b1(qid_r), b2(qid_r)]
            flat_poss = [b1(pos_r), b2(pos_r)]
            total_slots = NC * cap + ov_budget * cap2_eff
            if deep_mode:
                ovdp = jnp.cumsum(overd.astype(jnp.int32)) - 1
                n_ovd = ovdp[-1] + 1
                scd = jnp.where(overd & (ovdp < ovd_budget), ovdp,
                                jnp.int32(ovd_budget))
                ovd_idx = (
                    jnp.full(ovd_budget, NC, jnp.int32)
                    .at[scd].set(jnp.arange(NC, dtype=jnp.int32),
                                 mode="drop")
                )
                ovd_pad = ovd_idx >= NC
                ovd_safe = jnp.minimum(ovd_idx, NC - 1)
                startd = jnp.where(ovd_pad, 0, starts_r[ovd_safe])
                gendd = jnp.where(ovd_pad, 0, ends_r[ovd_safe])
                lw = deep_w.bit_length() - 1
                dd = db_d48.reshape(-1, deep_w)[startd >> lw]
                cols = jnp.arange(deep_w, dtype=jnp.int32)
                same_aad = (cols[None, :] < (gendd - startd)[:, None]) \
                    & ~ovd_pad[:, None]
                hsumd, h_fwdd, h_revd = hamming_dna48_split(
                    d48lo_r[ovd_safe][:, None], d48hi_r[ovd_safe][:, None],
                    bc32(dd & jnp.uint64(0xFFFFFFFF)),
                    bc32(dd >> jnp.uint64(32)),
                )
                hsumd_m = jnp.where(same_aad, hsumd, jnp.int32(255))
                cutd = jnp.minimum(jnp.min(hsumd_m, axis=1) * 2, 7)
                keepd = same_aad & (hsumd_m <= cutd[:, None])
                h16d = jnp.where(fwd_r[ovd_safe][:, None], h_fwdd, h_revd)
                idxd_c = jnp.minimum(startd[:, None] + cols[None, :],
                                     n_safe)
                n_over_cap = n_over_cap + jnp.sum(
                    (~ovd_pad & (gendd - startd > deep_w)).astype(jnp.int32))
                flat_keeps.append(keepd.reshape(-1))
                flat_pays.append(
                    payw(h16d, hsumd, frame_r[ovd_safe]).reshape(-1))
                flat_midxs.append(idxd_c.reshape(-1))

                def b3(x):
                    return jnp.broadcast_to(
                        x[ovd_safe][:, None], (ovd_budget, deep_w)
                    ).reshape(-1)

                flat_qids.append(b3(qid_r))
                flat_poss.append(b3(pos_r))
                total_slots += ovd_budget * deep_w
            flat_keep = jnp.concatenate(flat_keeps)
            flat_pay = jnp.concatenate(flat_pays)
            flat_midx = jnp.concatenate(flat_midxs)
            flat_qid = jnp.concatenate(flat_qids)
            flat_pos = jnp.concatenate(flat_poss)
        else:
            n_ov = jnp.int32(0)
            n_over_cap = jnp.sum(over.astype(jnp.int32))
            flat_keep = keep.reshape(-1)
            flat_pay = payw(h16, hsum, frame_r).reshape(-1)
            flat_midx = idx_c.reshape(-1)
            flat_qid = jnp.broadcast_to(
                qid_r[:, None], (NC, cap)
            ).reshape(-1)
            flat_pos = jnp.broadcast_to(
                pos_r[:, None], (NC, cap)
            ).reshape(-1)
            total_slots = NC * cap
    else:
      # ---- classic flow: bucketed search + capped gathers on EVERY slot
      n_hits1 = jnp.int32(0)
      n_sovf = jnp.int32(0)
      n_resid = jnp.int32(0)
      n_ovd = jnp.int32(0)
      start, gend, hit = search_groups(q_values, q_valid)

      # ---- tier 1: small cap for every query
      idx_c, keep, hsum, h16, t_dna = tier(
          start, gend, hit, cap,
          None if reduced else q_d48lo, None if reduced else q_d48hi,
          q_lo if reduced else None, fwd_q,
      )
      # overflow: the equal-AA group extends past the cap window
      over_all = start + cap < gend
      deep_mode = (bool(deep_w) and two_tier and ovd_budget > 0
                   and not reduced)
      if deep_mode:
          cnt_q = gend - start
          over = over_all & (cnt_q <= DEEP_T)
          overd = over_all & (cnt_q > DEEP_T)
          cap2_eff = min(cap2, DEEP_T)
      else:
          over = over_all
          cap2_eff = cap2

      if two_tier:
        # compact the overflowed queries and re-gather them at cap2; their
        # tier-1 rows are dropped (the cutoff needs the FULL equal-AA run)
        ovp = jnp.cumsum(over.astype(jnp.int32)) - 1
        n_ov = ovp[-1] + 1
        sc = jnp.where(over & (ovp < ov_budget), ovp, jnp.int32(ov_budget))
        ov_idx = (
            jnp.full(ov_budget, Q, jnp.int32)
            .at[sc].set(jnp.arange(Q, dtype=jnp.int32), mode="drop")
        )
        ov_pad = ov_idx >= Q
        ov_safe = jnp.minimum(ov_idx, Q - 1)
        start2 = jnp.where(ov_pad, 0, start[ov_safe])
        gend2 = jnp.where(ov_pad, 0, gend[ov_safe])
        idx2_c, keep2, hsum2, h16_2, t_dna2 = tier(
            start2, gend2, ~ov_pad, cap2_eff,
            None if reduced else q_d48lo[ov_safe],
            None if reduced else q_d48hi[ov_safe],
            q_lo[ov_safe] if reduced else None,
            fwd_q[ov_safe],
        )

      def slots1(x):
        return jnp.broadcast_to(x[:, None], (Q, cap)).reshape(-1)

      pay1 = payw(h16, hsum, q_frame)
      if two_tier:
        keep = keep & ~over_all[:, None]
        # true overflow at cap2 (drives the cap retry ladder)
        over2 = ~ov_pad & (start2 + cap2_eff < gend2)
        n_over_cap = jnp.sum(over2.astype(jnp.int32))
        flat_keeps = [keep.reshape(-1), keep2.reshape(-1)]
        flat_pays = [
            pay1.reshape(-1),
            payw(h16_2, hsum2, q_frame[ov_safe]).reshape(-1),
        ]
        flat_midxs = [idx_c.reshape(-1), idx2_c.reshape(-1)]

        def slots2(x):
            return jnp.broadcast_to(
                x[ov_safe][:, None], (ov_budget, cap2_eff)
            ).reshape(-1)

        flat_qids = [slots1(q_qid), slots2(q_qid)]
        flat_poss = [slots1(q_pos), slots2(q_pos)]
        total_slots = Q * cap + ov_budget * cap2_eff
        if deep_mode:
            # deep tier: aligned groups, ONE row descriptor per query
            # (see the direct-mode branch / DevIndex.deep_w)
            ovdp = jnp.cumsum(overd.astype(jnp.int32)) - 1
            n_ovd = ovdp[-1] + 1
            scd = jnp.where(overd & (ovdp < ovd_budget), ovdp,
                            jnp.int32(ovd_budget))
            ovd_idx = (
                jnp.full(ovd_budget, Q, jnp.int32)
                .at[scd].set(jnp.arange(Q, dtype=jnp.int32), mode="drop")
            )
            ovd_pad = ovd_idx >= Q
            ovd_safe = jnp.minimum(ovd_idx, Q - 1)
            startd = jnp.where(ovd_pad, 0, start[ovd_safe])
            gendd = jnp.where(ovd_pad, 0, gend[ovd_safe])
            lw = deep_w.bit_length() - 1
            dd = db_d48.reshape(-1, deep_w)[startd >> lw]
            cols = jnp.arange(deep_w, dtype=jnp.int32)
            same_aad = (cols[None, :] < (gendd - startd)[:, None]) \
                & ~ovd_pad[:, None]
            hsumd, h_fwdd, h_revd = hamming_dna48_split(
                q_d48lo[ovd_safe][:, None], q_d48hi[ovd_safe][:, None],
                bc32(dd & jnp.uint64(0xFFFFFFFF)),
                bc32(dd >> jnp.uint64(32)),
            )
            hsumd_m = jnp.where(same_aad, hsumd, jnp.int32(255))
            cutd = jnp.minimum(jnp.min(hsumd_m, axis=1) * 2, 7)
            keepd = same_aad & (hsumd_m <= cutd[:, None])
            h16d = jnp.where(fwd_q[ovd_safe][:, None], h_fwdd, h_revd)
            idxd_c = jnp.minimum(startd[:, None] + cols[None, :], n_safe)
            n_over_cap = n_over_cap + jnp.sum(
                (~ovd_pad & (gendd - startd > deep_w)).astype(jnp.int32))
            flat_keeps.append(keepd.reshape(-1))
            flat_pays.append(
                payw(h16d, hsumd, q_frame[ovd_safe]).reshape(-1))
            flat_midxs.append(idxd_c.reshape(-1))

            def slots3(x):
                return jnp.broadcast_to(
                    x[ovd_safe][:, None], (ovd_budget, deep_w)
                ).reshape(-1)

            flat_qids.append(slots3(q_qid))
            flat_poss.append(slots3(q_pos))
            total_slots += ovd_budget * deep_w
        flat_keep = jnp.concatenate(flat_keeps)
        flat_pay = jnp.concatenate(flat_pays)
        flat_midx = jnp.concatenate(flat_midxs)
        flat_qid = jnp.concatenate(flat_qids)
        flat_pos = jnp.concatenate(flat_poss)
        if reduced:
            flat_dna = jnp.concatenate(
                [t_dna.reshape(-1), t_dna2.reshape(-1)]
            )
      else:
        n_ov = jnp.int32(0)
        n_over_cap = jnp.sum(over.astype(jnp.int32))
        flat_keep = keep.reshape(-1)
        flat_pay = pay1.reshape(-1)
        flat_midx = idx_c.reshape(-1)
        flat_qid = slots1(q_qid)
        flat_pos = slots1(q_pos)
        if reduced:
            flat_dna = t_dna.reshape(-1)
        total_slots = Q * cap

    # ---- compaction to a fixed budget of flat rows via a PARTITION SORT:
    # one sort on (kept ? slot : INT32_MAX) moves kept slots to the front
    # in slot order (byte-identical to a stable compaction) and carries the
    # per-slot payload as a non-key operand — cheaper on TPU than a
    # scatter, and it saves the [Q, cap] re-gathers the scatter needed
    n_matches = jnp.sum(flat_keep.astype(jnp.int32))
    slot = jnp.arange(total_slots, dtype=jnp.int32)
    part_key = jnp.where(flat_keep, slot, INT32_MAX)
    def padded(x):  # the budget may exceed the slot capacity
        if x.shape[0] < max_matches:
            fill = INT32_MAX if x.dtype == jnp.int32 else 0
            x = jnp.pad(x, (0, max_matches - x.shape[0]),
                        constant_values=fill)
        return x[:max_matches]

    if reduced:
        s_key, s_pay, s_qid, s_pos, s_midx, s_dna = jax.lax.sort(
            (part_key, flat_pay, flat_qid, flat_pos, flat_midx, flat_dna),
            num_keys=1,
        )
        row_tdna = padded(s_dna)
    else:
        s_key, s_pay, s_qid, s_pos, s_midx = jax.lax.sort(
            (part_key, flat_pay, flat_qid, flat_pos, flat_midx), num_keys=1
        )
        row_tdna = None
    rows = padded(s_key)
    s_pay = padded(s_pay)
    row_qid = padded(s_qid)
    row_pos = padded(s_pos)
    midx = jnp.clip(padded(s_midx), 0, n_safe)
    is_pad = rows == INT32_MAX
    row_hsum = (s_pay >> 3) & 7
    row_h16 = s_pay >> 6
    m_frame_raw = s_pay & 7

    # qid/pos/frame/db-row arrive as compaction-sort payloads — nothing
    # re-derives through per-row gathers after the compaction
    m_qid = jnp.where(is_pad, INT32_MAX, row_qid)
    m_frame = jnp.where(is_pad, INT32_MAX, m_frame_raw)
    m_pos = jnp.where(is_pad, INT32_MAX, row_pos)
    # dna/taxid gathers run AFTER compaction (budget rows, not Q*cap);
    # the standard layout packs (value_lo32, taxid) into one u64 gather
    if reduced:
        m_taxid = db_tax[midx]
        m_dna = jnp.where(is_pad, INT32_MAX, row_tdna)
    else:
        tw = _g64(db_taxdna, midx)
        m_taxid = bc32(tw & jnp.uint64(0xFFFFFFFF))
        m_dna = jnp.where(
            is_pad, INT32_MAX,
            bc32(tw >> jnp.uint64(32)) & jnp.int32(0xFFFFFF),
        )
    m_ham = jnp.where(is_pad, INT32_MAX, row_hsum)
    m_h16 = jnp.where(is_pad, 0, row_h16)

    # frame (3b) | hamming (8b, <=7 post-cutoff) | h16 (16b) pack into one
    # payload word.
    m_packed = jnp.where(
        is_pad, INT32_MAX, m_frame | (m_ham << 3) | (m_h16 << 11)
    )
    counts = jnp.stack(
        (n_matches, n_over_cap, jnp.sum(q_valid.astype(jnp.int32)), n_ov,
         n_hits1, n_sovf, n_resid, n_ovd)
    ).astype(jnp.int32)
    if not sort_device:
        # compaction order is already read-grouped with padding at the
        # tail; the host performs the per-read sort.
        m_taxid = jnp.where(is_pad, INT32_MAX, m_taxid)
        return m_qid, None, m_pos, m_dna, m_taxid, m_packed, counts

    m_species = jnp.where(is_pad, INT32_MAX, tax2species[m_taxid])
    m_taxid = jnp.where(is_pad, INT32_MAX, m_taxid)
    # reference match order (`KmerMatcher.cpp:1149-1166`); padding sorts
    # last via INT32_MAX keys (the qid key alone already orders padding).
    if reduced:
        # 32-bit dna doesn't pack with hamming; sort on (ham, dna) with the
        # dna compared unsigned (sign-bit flip).
        k_dna_u = jnp.where(is_pad, INT32_MAX, m_dna ^ jnp.int32(-2147483648))
        keys = (m_qid, m_species, m_frame, m_pos, m_ham, k_dna_u)
        sorted_ops = jax.lax.sort(
            keys + (m_dna, m_taxid, m_packed), num_keys=6
        )
        s_qid, s_species, s_pos = sorted_ops[0], sorted_ops[1], sorted_ops[3]
        s_dna, s_taxid, s_packed = sorted_ops[6], sorted_ops[7], sorted_ops[8]
    else:
        # hamming<=56 and dna<2^24 pack into one key
        k_hamdna = jnp.where(is_pad, INT32_MAX, (m_ham << 24) | m_dna)
        sorted_ops = jax.lax.sort(
            (m_qid, m_species, m_frame, m_pos, k_hamdna,
             m_dna, m_taxid, m_packed),
            num_keys=5,
        )
        s_qid, s_species, s_pos = sorted_ops[0], sorted_ops[1], sorted_ops[3]
        s_dna, s_taxid, s_packed = sorted_ops[5], sorted_ops[6], sorted_ops[7]
    return s_qid, s_species, s_pos, s_dna, s_taxid, s_packed, counts


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_db", "search_iters", "cap", "max_matches", "reduced", "syncmer",
        "smer_len", "kmer_format", "sort_device", "pack4", "prefix_bits",
        "cap2", "ov_budget", "packed_search", "direct_bits", "hit_budget",
        "sovf_budget", "direct2_bits", "resid_budget", "codes_packed",
        "deep_w", "ovd_budget",
    ),
)
def _classify_batch_impl(
    db,
    tax2species,
    codes, lens, pos_offsets, qid_offsets,
    *,
    n_db: int,
    search_iters: int,
    cap: int,
    max_matches: int,
    reduced: bool,
    syncmer: bool,
    smer_len: int,
    kmer_format: int,
    sort_device: bool = True,
    pack4: bool = False,
    prefix_bits: int = PREFIX_BITS,
    cap2: int = 0,
    ov_budget: int = 0,
    packed_search: bool = False,
    direct_bits: int = 0,
    hit_budget: int = 0,
    sovf_budget: int = 0,
    direct2_bits: int = 0,
    resid_budget: int = 0,
    codes_packed: bool = False,
    deep_w: int = 0,
    ovd_budget: int = 0,
) -> BatchMatches:
    s_qid, _, s_pos, s_dna, s_taxid, s_packed, counts = _classify_core(
        db, tax2species,
        codes, lens, pos_offsets, qid_offsets,
        n_db=n_db, search_iters=search_iters, cap=cap,
        max_matches=max_matches, reduced=reduced, syncmer=syncmer,
        smer_len=smer_len, kmer_format=kmer_format, sort_device=sort_device,
        prefix_bits=prefix_bits, cap2=cap2, ov_budget=ov_budget,
        packed_search=packed_search, direct_bits=direct_bits,
        hit_budget=hit_budget, sovf_budget=sovf_budget,
        direct2_bits=direct2_bits, resid_budget=resid_budget,
        codes_packed=codes_packed, deep_w=deep_w, ovd_budget=ovd_budget,
    )
    if pack4:
        # 4-word transfer layout (standard alphabet, qid < 2^14):
        #   w0 = qid | h16 << 14, w1 = pos, w2 = dna | frame << 24,
        #   w3 = taxid; hamming is re-derived on the host as the sum of
        #   h16's 2-bit per-codon fields (exact for the XOR hamming path).
        is_pad = s_qid == INT32_MAX
        h16 = (s_packed >> 11) & 0xFFFF
        frame = s_packed & 7
        w0 = jnp.where(is_pad, INT32_MAX, s_qid | (h16 << 14))
        w2 = jnp.where(is_pad, INT32_MAX, s_dna | (frame << 24))
        data = jnp.stack((w0, s_pos, w2, s_taxid), axis=0)
    else:
        data = jnp.stack((s_qid, s_pos, s_dna, s_taxid, s_packed), axis=0)
    return BatchMatches(data=data, counts=counts)


def classify_batch_indexed(
    index: DevIndex,
    tax2species,
    codes, lens, pos_offsets, qid_offsets,
    *,
    cap: int,
    max_matches: int,
    reduced: bool = False,
    syncmer: bool = False,
    smer_len: int = 5,
    kmer_format: int = 2,
    sort_device: bool = True,
    pack4: bool = False,
    cap2: int = 0,
    ov_budget: int = 0,
    hit_budget: int = 0,
    sovf_budget: int = 0,
    resid_budget: int = 0,
    codes_packed: bool = False,
    ovd_budget: int = 0,
) -> BatchMatches:
    return _classify_batch_impl(
        index.db, tax2species,
        codes, lens, pos_offsets, qid_offsets,
        n_db=index.n, search_iters=index.search_iters, cap=cap,
        max_matches=max_matches, reduced=reduced, syncmer=syncmer,
        smer_len=smer_len, kmer_format=kmer_format, sort_device=sort_device,
        pack4=pack4, prefix_bits=index.prefix_bits, cap2=cap2,
        ov_budget=ov_budget, packed_search=index.packed_search,
        direct_bits=index.direct_bits, hit_budget=hit_budget,
        sovf_budget=sovf_budget, direct2_bits=index.direct2_bits,
        resid_budget=resid_budget, codes_packed=codes_packed,
        deep_w=index.deep_w, ovd_budget=ovd_budget,
    )


def classify_batch(
    db_values, db_taxids, tax2species,
    codes, lens, pos_offsets, qid_offsets,
    *,
    cap: int,
    max_matches: int,
    reduced: bool = False,
    syncmer: bool = False,
    smer_len: int = 5,
    kmer_format: int = 2,
    sort_device: bool = True,
    pack4: bool = False,
    cap2: int = 0,
    ov_budget: int = 0,
):
    """Convenience wrapper taking a raw u64 table (tests, graft entry,
    sharded path). Builds the split/bucketed DevIndex on the host."""
    index = build_dev_index(
        np.asarray(db_values), np.asarray(db_taxids), kmer_format=kmer_format,
        reduced=reduced,
    )
    return classify_batch_indexed(
        index, jnp.asarray(np.asarray(tax2species, np.int32)),
        codes, lens, pos_offsets, qid_offsets,
        cap=cap, max_matches=max_matches, reduced=reduced, syncmer=syncmer,
        smer_len=smer_len, kmer_format=kmer_format, sort_device=sort_device,
        pack4=pack4, cap2=cap2, ov_budget=ov_budget,
    )


def prefetch_matches(bm: BatchMatches) -> None:
    """Start async D2H copies of the batch outputs (call right after
    dispatch). Overlaps the transfer with the NEXT batch's device compute;
    a later ``matches_to_host(..., prefetched=True)`` then reads the
    already-local buffers instead of enqueueing a device-side slice that
    would serialize behind the next program."""
    for arr in (bm.data, bm.counts):
        fn = getattr(arr, "copy_to_host_async", None)
        if fn is not None:
            try:
                fn()
            except Exception:  # platform without async copies
                return


class MatchFetch(NamedTuple):
    """An in-flight (possibly async) D2H transfer of one batch's matches."""

    data: object        # device array [W, n_pad] (or np array), slice of data
    counts: np.ndarray  # host counts [3-4]
    n_true: int         # true match count (may exceed the buffer on overflow)


def prefetch_counts(bm: BatchMatches) -> None:
    """Start the async D2H copy of just the counters (call right after
    dispatch). By drain time the counts are host-local, so the data slice
    length is known without a blocking device roundtrip."""
    fn = getattr(bm.counts, "copy_to_host_async", None)
    if fn is not None:
        try:
            fn()
        except Exception:  # platform without async copies
            pass


def start_fetch(bm: BatchMatches) -> MatchFetch:
    """Begin the D2H transfer of the REAL match rows only.

    Reads the (prefetched) counters, slices the device buffer to the next
    power of two >= n_matches (so only O(log M) slice programs ever
    compile; remote compiles are expensive on tunneled TPU platforms) and
    starts an async copy of the slice. The returned handle is finished by
    ``fetched_to_host`` — host work (e.g. the previous batch's taxonomer)
    can run while the transfer flows. On transfer-bound links (tunneled
    dev chips at ~40MB/s; real PCIe less so) this cuts the drain cost by
    the buffer-slack factor vs fetching the whole budget buffer."""
    counts = np.asarray(bm.counts)
    n_true = int(counts[0])
    W, M = bm.data.shape
    n = min(n_true, M)
    if n == 0:
        return MatchFetch(np.zeros((W, 0), np.int32), counts, n_true)
    if isinstance(bm.data, np.ndarray):
        return MatchFetch(bm.data, counts, n_true)
    if n >= M // 2:
        data = bm.data
    else:
        n_pad = 1024
        while n_pad < n:
            n_pad *= 2
        data = bm.data[:, :n_pad]
    fn = getattr(data, "copy_to_host_async", None)
    if fn is not None:
        try:
            fn()
        except Exception:
            pass
    return MatchFetch(data, counts, n_true)


def fetched_to_host(
    f: MatchFetch, species_table: np.ndarray = None,
    sorted_rows: bool = True,
) -> dict:
    """Finish a ``start_fetch`` transfer -> host match dict."""
    n = min(f.n_true, np.asarray(f.data).shape[1]) if f.n_true else 0
    data = np.asarray(f.data)[:, :n]
    return _unpack_match_data(data, f.counts, f.n_true, species_table,
                              sorted_rows)


def matches_to_host(
    bm: BatchMatches, species_table: np.ndarray = None,
    sorted_rows: bool = True, prefetched: bool = False,
) -> dict:
    """One stacked transfer -> host match dict (trimmed to real rows).

    The device-side slice length is rounded up to a power of two so only
    O(log M) distinct slice programs ever compile (remote compiles are
    expensive on tunneled TPU platforms). frame/hamming/h16 are unpacked
    and species re-derived from the dense taxid table on the host, cutting
    transfer volume by ~40% (4-word layout: by 50%, with hamming re-derived
    from h16's per-codon fields).
    """
    counts = np.asarray(bm.counts)
    n_true = int(counts[0])
    W, M = bm.data.shape
    # the buffer holds at most M rows; n_true > M signals a budget overflow
    # that the caller's retry ladder handles (out["n_matches"] stays true)
    n = min(n_true, M)
    if n == 0:
        data = np.zeros((W, 0), np.int32)
    elif isinstance(bm.data, np.ndarray):
        data = bm.data[:, :n]
    elif prefetched or n >= M // 2:
        # fetch the whole buffer (an async copy started at dispatch time
        # overlaps it with the next batch's compute; a device-side slice
        # would instead queue BEHIND that batch's program on the stream)
        data = np.asarray(bm.data)[:, :n]
    else:
        n_pad = 1024
        while n_pad < n:
            n_pad *= 2
        n_pad = min(n_pad, M)
        data = np.asarray(bm.data[:, :n_pad])[:, :n]
    return _unpack_match_data(data, counts, n_true, species_table,
                              sorted_rows)


def _unpack_match_data(
    data: np.ndarray, counts: np.ndarray, n_true: int,
    species_table: np.ndarray, sorted_rows: bool,
) -> dict:
    W, n = data.shape
    if W == 4:  # pack4 layout
        h16 = (data[0] >> 14) & 0xFFFF
        ham = np.zeros(n, np.int32)
        for i in range(8):
            ham += (h16 >> (2 * i)) & 3
        out = {
            "qid": data[0] & 0x3FFF,
            "pos": data[1],
            "dna": data[2] & 0xFFFFFF,
            "taxid": data[3],
            "frame": (data[2] >> 24) & 7,
            "hamming": ham,
            "h16": h16,
        }
    else:
        packed = data[4]
        out = {
            "qid": data[0],
            "pos": data[1],
            "dna": data[2],
            "taxid": data[3],
            "frame": packed & 7,
            "hamming": (packed >> 3) & 0xFF,
            "h16": (packed >> 11) & 0xFFFF,
        }
    if species_table is not None:
        out["species"] = species_table[out["taxid"]].astype(np.int32)
    else:
        out["species"] = np.zeros(n, np.int32)
    out["n_matches"] = n_true
    out["n_over_cap"] = int(counts[1])
    out["total_kmers"] = int(counts[2])
    out["n_ov"] = int(counts[3]) if counts.shape[0] > 3 else 0
    out["n_hits"] = int(counts[4]) if counts.shape[0] > 4 else 0
    out["n_sovf"] = int(counts[5]) if counts.shape[0] > 5 else 0
    out["n_sovf2"] = int(counts[6]) if counts.shape[0] > 6 else 0
    out["n_ovd"] = int(counts[7]) if counts.shape[0] > 7 else 0
    out["sorted"] = sorted_rows
    return out
