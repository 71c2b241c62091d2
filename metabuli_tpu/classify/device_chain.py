"""Device-side match chaining (prototype for the on-device taxonomer).

Re-expresses the reference's per-read chain DP (`getMatchPaths`,
`/root/reference/src/commons/Taxonomer.cpp:487-648`) as a fixed-shape scan:

  * matches (already sorted by read, species, frame, pos) are scattered into
    a dense grid [block, column, slot] where a block is one
    (read, species, frame) run, a column is the position quotient pos//3
    relative to the block start, and slots hold position-group ties;
  * one `lax.scan` over columns carries the previous non-empty position
    group's path states (score/start/depth/hamming + target DNA encodings)
    and applies the reference's rules: connect iff 0 < shift <= maxCodonShift
    and the 24-bit codon encodings overlap (isConsecutive2, operand order
    swapped on reverse frames), take the best-scoring connectable
    predecessor (first-wins ties), emit unconnected predecessors with
    depth >= minConsCnt, and emit the final group unconditionally
    (depth-gated).

This module is validated against the annotated Python taxonomer; wiring it
into the production classifier (with per-quotient reduction on device) is
the headline ROADMAP item. Scope: one static grid shape; blocks exceeding
the column/slot capacity are flagged for host fallback.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG = jnp.float32(-1e30)


class ChainResult(NamedTuple):
    # stacked emissions: step axis = W columns + 1 final flush
    emit_mask: jax.Array    # [W+1, NB, K] bool
    start: jax.Array        # [W+1, NB, K] int32 query coordinate
    end: jax.Array          # [W+1, NB, K] int32
    score: jax.Array        # [W+1, NB, K] float32
    hamming: jax.Array      # [W+1, NB, K] int32
    depth: jax.Array        # [W+1, NB, K] int32
    start_h16: jax.Array    # [W+1, NB, K] int32 (startMatch rightEndHamming)
    end_h16: jax.Array     # [W+1, NB, K] int32 (endMatch rightEndHamming)
    block_read: jax.Array   # [NB] int32 qid per block
    block_species: jax.Array  # [NB] int32
    fallback: jax.Array     # [NB] bool: block exceeded grid capacity


def _match_score(h16: jax.Array) -> jax.Array:
    """Match::getScore over all 8 codons (`Match.h:32-44`), float32."""
    s = jnp.zeros(h16.shape, jnp.float32)
    for i in range(8):
        h = (h16 >> (2 * i)) & 3
        s = s + jnp.where(h == 0, jnp.float32(3.0),
                          jnp.float32(2.0) - jnp.float32(0.5) * h.astype(jnp.float32))
    return s


def _increment(h16: jax.Array, shift: jax.Array):
    """(score, hamming) increments over the low `shift` codons
    (`Taxonomer.cpp:650-669`); shift is traced (1..8)."""
    s = jnp.zeros(h16.shape, jnp.float32)
    hd = jnp.zeros(h16.shape, jnp.int32)
    for i in range(8):
        h = (h16 >> (2 * i)) & 3
        use = i < shift
        s = s + jnp.where(
            use,
            jnp.where(h == 0, jnp.float32(3.0),
                      jnp.float32(2.0) - jnp.float32(0.5) * h.astype(jnp.float32)),
            0.0,
        )
        hd = hd + jnp.where(use, h, 0)
    return s, hd


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "w", "k", "max_shift", "kmer_format"),
)
def chain_matches(
    qid, species, frame, pos, hamming, dna, h16,  # [M] int32 sorted arrays
    valid,                                        # [M] bool
    min_depth_of_species,                         # [S] int32 (euk-aware)
    *,
    n_blocks: int,
    w: int,
    k: int,
    max_shift: int,
    kmer_format: int = 2,
) -> ChainResult:
    M = qid.shape[0]
    idx = jnp.arange(M, dtype=jnp.int32)

    new_block = jnp.ones(M, bool)
    same = (
        (qid[1:] == qid[:-1])
        & (species[1:] == species[:-1])
        & (frame[1:] == frame[:-1])
    )
    new_block = new_block.at[1:].set(~same)
    new_block = new_block & valid
    bid = jnp.cumsum((new_block & valid).astype(jnp.int32)) - 1
    bid = jnp.where(valid, bid, n_blocks)  # invalid rows -> dropped

    q = pos // 3
    q0 = jax.ops.segment_min(
        jnp.where(valid, q, jnp.int32(2**30)), bid, num_segments=n_blocks + 1
    )
    col = q - q0[jnp.minimum(bid, n_blocks)]

    # slot within the (block, column) group
    cell_new = jnp.ones(M, bool)
    cell_same = (bid[1:] == bid[:-1]) & (col[1:] == col[:-1])
    cell_new = cell_new.at[1:].set(~cell_same)
    run_start = jnp.maximum.accumulate(jnp.where(cell_new, idx, 0))
    slot = idx - run_start

    ok = valid & (bid < n_blocks) & (col >= 0) & (col < w) & (slot < k)
    over = valid & ((bid >= n_blocks) | (col >= w) | (slot >= k))
    fallback = (
        jnp.zeros(n_blocks + 1, bool)
        .at[jnp.minimum(bid, n_blocks)]
        .max(over)[:n_blocks]
    )

    b_i = jnp.where(ok, bid, n_blocks)
    c_i = jnp.where(ok, col, 0)
    s_i = jnp.where(ok, slot, 0)

    def grid(x, fill, dtype):
        g = jnp.full((n_blocks + 1, w, k), fill, dtype)
        return g.at[b_i, c_i, s_i].set(x.astype(dtype), mode="drop")[:n_blocks]

    g_occ = grid(ok, False, bool)
    g_pos = grid(pos, 0, jnp.int32)
    g_dna = grid(dna, 0, jnp.int32)
    g_h16 = grid(h16, 0, jnp.int32)
    g_ham = grid(hamming, 0, jnp.int32)

    block_read = (
        jnp.full(n_blocks + 1, 2**31 - 1, jnp.int32)
        .at[b_i].min(jnp.where(ok, qid, 2**31 - 1), mode="drop")[:n_blocks]
    )
    block_species = (
        jnp.full(n_blocks + 1, 0, jnp.int32)
        .at[b_i].max(jnp.where(ok, species, 0), mode="drop")[:n_blocks]
    )
    block_forward = (
        jnp.full(n_blocks + 1, 0, jnp.int32)
        .at[b_i].max(jnp.where(ok, (frame < 3).astype(jnp.int32), 0), mode="drop")
    )[:n_blocks].astype(bool)
    if kmer_format != 2:
        # old format uses isConsecutive (operand roles swapped vs fmt 2)
        block_forward = ~block_forward
    block_min_depth = min_depth_of_species[
        jnp.minimum(block_species, min_depth_of_species.shape[0] - 1)
    ]

    base_score = jnp.where(g_occ, _match_score(g_h16), 0.0)

    class Carry(NamedTuple):
        col: jax.Array        # [NB] last non-empty column (-big if none)
        n_groups: jax.Array   # [NB] distinct non-empty columns so far
        occ: jax.Array        # [NB, K]
        dna: jax.Array        # [NB, K]
        h16: jax.Array        # [NB, K] endMatch h16 (the group's own match)
        pos: jax.Array        # [NB, K]
        p_score: jax.Array    # [NB, K] path score
        p_start: jax.Array    # [NB, K]
        p_ham: jax.Array      # [NB, K]
        p_depth: jax.Array    # [NB, K]
        p_sh16: jax.Array     # [NB, K] startMatch h16

    nb = n_blocks
    init = Carry(
        col=jnp.full(nb, -(2**30), jnp.int32),
        n_groups=jnp.zeros(nb, jnp.int32),
        occ=jnp.zeros((nb, k), bool),
        dna=jnp.zeros((nb, k), jnp.int32),
        h16=jnp.zeros((nb, k), jnp.int32),
        pos=jnp.zeros((nb, k), jnp.int32),
        p_score=jnp.zeros((nb, k), jnp.float32),
        p_start=jnp.zeros((nb, k), jnp.int32),
        p_ham=jnp.zeros((nb, k), jnp.int32),
        p_depth=jnp.zeros((nb, k), jnp.int32),
        p_sh16=jnp.zeros((nb, k), jnp.int32),
    )

    def step(carry: Carry, xs):
        occ_c, pos_c, dna_c, h16_c, ham_c, score_c = xs
        has_cur = occ_c.any(axis=1)                      # [NB]
        # shift between consecutive DISTINCT position groups, from the pos
        # quotients (columns are implicit scan steps; quotients stay exact)
        cur_col_q = jnp.where(occ_c, (pos_c // 3), 0).max(axis=1)
        prev_q = jnp.where(carry.occ, (carry.pos // 3), 0).max(axis=1)
        shift = jnp.where(carry.n_groups > 0, cur_col_q - prev_q, jnp.int32(2**30))
        connectable = has_cur & (shift >= 1) & (shift <= max_shift)

        # pairwise connectivity prev slot i x cur slot j
        sh = jnp.clip(shift, 1, 8)[:, None, None]
        mask_bits = (jnp.int32(1) << (24 - 3 * sh)) - 1
        prev_d = carry.dna[:, :, None]
        cur_d = dna_c[:, None, :]
        conn_fwd = (prev_d & mask_bits) == (cur_d >> (3 * sh))
        conn_rev = (cur_d & mask_bits) == (prev_d >> (3 * sh))
        conn = jnp.where(block_forward[:, None, None], conn_fwd, conn_rev)
        conn = (
            conn
            & carry.occ[:, :, None]
            & occ_c[:, None, :]
            & connectable[:, None, None]
        )

        # best predecessor per cur slot (strictly-greater-than-0, first wins)
        cand = jnp.where(conn, carry.p_score[:, :, None], NEG)
        best_i = jnp.argmax(cand, axis=1)                        # [NB, K]
        best_score = jnp.max(cand, axis=1)
        has_pred = best_score > 0.0
        take = lambda g: jnp.take_along_axis(g, best_i, axis=1)
        inc_s, inc_h = _increment(h16_c, jnp.clip(shift, 0, 8)[:, None])
        new_score = jnp.where(has_pred, take(carry.p_score) + inc_s, score_c)
        new_start = jnp.where(has_pred, take(carry.p_start), pos_c)
        new_ham = jnp.where(has_pred, take(carry.p_ham) + inc_h, ham_c)
        new_depth = jnp.where(
            has_pred, take(carry.p_depth) + jnp.clip(shift, 0, 8)[:, None], 1
        )
        new_sh16 = jnp.where(has_pred, take(carry.p_sh16), h16_c)

        # emissions: prev slots not connected to ANY cur slot, depth gate
        connected_prev = conn.any(axis=2)
        emit = (
            carry.occ
            & has_cur[:, None]
            & ~connected_prev
            & (carry.p_depth >= block_min_depth[:, None])
        )
        out = (
            emit,
            carry.p_start,
            carry.pos + 23,
            carry.p_score,
            carry.p_ham,
            carry.p_depth,
            carry.p_sh16,
            carry.h16,
        )

        sel = has_cur[:, None]
        new_carry = Carry(
            col=carry.col,  # informational only
            n_groups=carry.n_groups + has_cur.astype(jnp.int32),
            occ=jnp.where(sel, occ_c, carry.occ),
            dna=jnp.where(sel, dna_c, carry.dna),
            h16=jnp.where(sel, h16_c, carry.h16),
            pos=jnp.where(sel, pos_c, carry.pos),
            p_score=jnp.where(sel, new_score, carry.p_score),
            p_start=jnp.where(sel, new_start, carry.p_start),
            p_ham=jnp.where(sel, new_ham, carry.p_ham),
            p_depth=jnp.where(sel, new_depth, carry.p_depth),
            p_sh16=jnp.where(sel, new_sh16, carry.p_sh16),
        )
        return new_carry, out

    xs = (
        g_occ.transpose(1, 0, 2),
        g_pos.transpose(1, 0, 2),
        g_dna.transpose(1, 0, 2),
        g_h16.transpose(1, 0, 2),
        g_ham.transpose(1, 0, 2),
        base_score.transpose(1, 0, 2),
    )
    final, outs = jax.lax.scan(step, init, xs)

    # final flush: last group, depth-gated, needs >= 2 distinct groups
    f_emit = (
        final.occ
        & (final.p_depth >= block_min_depth[:, None])
        & (final.n_groups >= 2)[:, None]
    )
    f_out = (
        f_emit, final.p_start, final.pos + 23, final.p_score,
        final.p_ham, final.p_depth, final.p_sh16, final.h16,
    )
    stacked = tuple(
        jnp.concatenate([o, f[None]], axis=0) for o, f in zip(outs, f_out)
    )
    return ChainResult(
        emit_mask=stacked[0], start=stacked[1], end=stacked[2],
        score=stacked[3], hamming=stacked[4], depth=stacked[5],
        start_h16=stacked[6], end_h16=stacked[7],
        block_read=block_read, block_species=block_species,
        fallback=fallback,
    )
