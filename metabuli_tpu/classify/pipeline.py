"""Fused device classification step: reads -> sorted match arrays.

One jitted XLA program per (batch shape, cap, match budget):

  encoded reads [B, L] --extract--> metamers [B, 6, W]
                       --search+gather+hamming--> candidate matches
                       --compact (fixed budget)--> flat match rows
                       --multi-key sort--> reference match order

This fuses the reference's KmerExtractor + KmerMatcher + sortMatches stages
(`/root/reference/src/commons/Classifier.cpp:81-133`) into a single device
program; the host only sees the compacted, sorted match tensors. Overflow
of the match budget is reported (count), mirroring the reference's
match-buffer retry (`Classifier.cpp:127-131`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import encode
from ..ops.match import DNA_MASK24
from ..ops.hamming import hamming_all


class BatchMatches(NamedTuple):
    # flat [M] arrays sorted by (qid, species, frame, pos, hamming, dna);
    # rows >= n_matches are padding
    qid: jax.Array        # int32 read index within batch
    species: jax.Array    # int32
    frame: jax.Array      # int32
    pos: jax.Array        # int32
    hamming: jax.Array    # int32
    dna: jax.Array        # int32
    taxid: jax.Array      # int32
    h16: jax.Array        # int32
    n_matches: jax.Array  # int32 scalar: valid rows (<= M if no overflow)
    n_over_cap: jax.Array # int32 scalar: queries whose AA group exceeded cap
    total_kmers: jax.Array  # int32 scalar: valid query metamers


@functools.partial(
    jax.jit,
    static_argnames=(
        "cap", "max_matches", "reduced", "syncmer", "smer_len", "kmer_format",
    ),
)
def classify_batch(
    db_values: jax.Array,    # [N] uint64
    db_taxids: jax.Array,    # [N] int32 (internal)
    tax2species: jax.Array,  # [T+1] int32
    codes: jax.Array,        # [B, L] uint8
    lens: jax.Array,         # [B] int32
    pos_offsets: jax.Array,  # [B] int32 (0, or mate-1 usedLen+3 for mate 2)
    qid_offsets: jax.Array,  # [B] int32 read index of each row
    *,
    cap: int,
    max_matches: int,
    reduced: bool = False,
    syncmer: bool = False,
    smer_len: int = 5,
    kmer_format: int = 2,
) -> BatchMatches:
    B, L = codes.shape
    mm = encode.extract_metamers(
        codes, lens, reduced=reduced, syncmer=syncmer, smer_len=smer_len,
        kmer_format=kmer_format,
    )
    W = mm.value.shape[2]
    q_values = mm.value.reshape(-1)                       # [B*6*W]
    q_valid = mm.valid.reshape(-1)
    q_pos = (mm.pos + pos_offsets[:, None, None]).reshape(-1)
    q_frame = jnp.broadcast_to(
        jnp.arange(6, dtype=jnp.int32)[None, :, None], (B, 6, W)
    ).reshape(-1)
    q_read = jnp.broadcast_to(
        qid_offsets[:, None, None], (B, 6, W)
    ).reshape(-1)
    Q = q_values.shape[0]

    n = db_values.shape[0]
    aa_mask = jnp.uint64(0xFFFFFFFFFF000000)
    q_aa = jnp.where(q_valid, q_values & aa_mask, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    lo = jnp.searchsorted(db_values, q_aa, side="left")
    hi = jnp.searchsorted(db_values, q_aa | jnp.uint64(DNA_MASK24), side="right")
    n_cand = (hi - lo).astype(jnp.int32)
    n_over_cap = jnp.sum((n_cand > cap).astype(jnp.int32))

    idx = lo[:, None] + jnp.arange(cap, dtype=lo.dtype)[None, :]
    cand_ok = idx < hi[:, None]
    idx = jnp.minimum(idx, jnp.maximum(n - 1, 0))
    t_val = db_values[idx]
    t_dna = (t_val & jnp.uint64(DNA_MASK24)).astype(jnp.int32)
    q_dna = (q_values & jnp.uint64(DNA_MASK24)).astype(jnp.int32)

    hsum, h_fwd, h_rev = hamming_all(q_dna[:, None], t_dna)
    hsum_m = jnp.where(cand_ok, hsum, jnp.int32(255))
    min_h = jnp.min(hsum_m, axis=1)
    cutoff = jnp.minimum(min_h * 2, 7)
    # q_valid mask guards against sentinel collisions: sharded DBs pad with
    # all-ones values whose AA equals the invalid-query sentinel
    keep = cand_ok & (hsum_m <= cutoff[:, None]) & q_valid[:, None]

    if kmer_format == 2:
        fwd_sel = (q_frame < 3)[:, None]
    else:
        fwd_sel = (q_frame >= 3)[:, None]
    h16 = jnp.where(fwd_sel, h_fwd, h_rev)

    # --- compaction: keep-mask -> fixed budget of flat rows
    flat_keep = keep.reshape(-1)                       # [Q*cap]
    n_matches = jnp.sum(flat_keep.astype(jnp.int32))
    (rows,) = jnp.nonzero(flat_keep, size=max_matches, fill_value=Q * cap)
    is_pad = rows >= Q * cap
    safe = jnp.minimum(rows, Q * cap - 1)
    qi = (safe // cap).astype(jnp.int32)
    ci = (safe % cap).astype(jnp.int32)

    big = jnp.int32(2147483647)
    m_qid = jnp.where(is_pad, big, q_read[qi])
    m_frame = jnp.where(is_pad, big, q_frame[qi])
    m_pos = jnp.where(is_pad, big, q_pos[qi])
    m_taxid = db_taxids[idx[qi, ci]].astype(jnp.int32)
    m_species = jnp.where(is_pad, big, tax2species[m_taxid])
    m_taxid = jnp.where(is_pad, big, m_taxid)
    m_dna = jnp.where(is_pad, big, t_dna[qi, ci])
    m_ham = jnp.where(is_pad, big, hsum[qi, ci])
    m_h16 = jnp.where(is_pad, 0, h16[qi, ci])

    # reference match order (`KmerMatcher.cpp:1149-1166`); padding sorts last
    s = jax.lax.sort(
        (m_qid, m_species, m_frame, m_pos, m_ham, m_dna, m_taxid, m_h16),
        num_keys=6,
    )
    return BatchMatches(
        qid=s[0], species=s[1], frame=s[2], pos=s[3], hamming=s[4],
        dna=s[5], taxid=s[6], h16=s[7],
        n_matches=n_matches,
        n_over_cap=n_over_cap,
        total_kmers=jnp.sum(q_valid.astype(jnp.int32)),
    )
