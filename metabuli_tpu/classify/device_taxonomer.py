"""Experimental full device taxonomer: matches -> per-read classifications.

Composes the oracle-verified device blocks (chain DP, path combination,
quotient redundancy reduction) into one flow equivalent to
``Taxonomer::chooseBestTaxon`` (`/root/reference/src/commons/Taxonomer.cpp:130-202`):

  device: chain -> paths -> per-(read, species) combined scores
          + per-(read, species, quotient) best taxids
  host:   species selection (ties -> taxonomy LCA), min-score /
          min-sp-score branches, clade-count BFS below species, EM mappings

Only the small per-group tensors leave the device (~3 ints per distinct
quotient instead of 5 per match). Not yet the default classifier path —
enabled via ``Classifier(..., device_tax=True)`` once wired; currently
exercised by tests for equivalence with the host taxonomer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pow2(n: int, cap: int) -> int:
    v = 1024
    while v < n:
        v *= 2
    return min(v, cap)


@functools.partial(
    jax.jit,
    static_argnames=("path_budget", "g_budget", "max_rows", "dna_shift"),
)
def _tail_program(dt, chain_res, qid_a, sp_a, pos_a, ham_a, tax_a, valid_a,
                  rl, *, path_budget, g_budget, max_rows, dna_shift):
    """Fused post-chain stages: compact -> combine -> group compaction ->
    quotient reduction, one dispatch."""
    from .device_compact import compact_groups, compact_paths

    flat = compact_paths(chain_res, budget=path_budget)
    comb = combine_paths(
        flat.read, flat.species, flat.start, flat.end, flat.score,
        flat.ham, flat.sh16, flat.eh16, flat.valid, rl,
        n_groups=g_budget, p_max=64,
    )
    groups = compact_groups(comb, budget=g_budget)
    qres = quotient_best(
        dt, qid_a, sp_a, pos_a, ham_a, tax_a, valid_a,
        dna_shift=dna_shift, max_rows=max_rows,
    )
    overflow = (
        (flat.n_paths > path_budget).astype(jnp.int32)
        + comb.fallback.any().astype(jnp.int32)
        + (groups.n_groups > g_budget).astype(jnp.int32)
    )
    counts = jnp.stack([groups.n_groups, qres.n_rows, overflow])
    return groups, qres, counts


from .device_chain import chain_matches
from .device_combine import combine_paths
from .device_redundancy import device_taxonomy, quotient_best
from .taxonomer import ReadClassification, TaxonomerParams


class DeviceTaxonomer:
    """Batch taxonomer using the device blocks; host finishes per read."""

    def __init__(self, params: TaxonomerParams, taxonomy):
        self.p = params
        self.tax = taxonomy
        self.dt = device_taxonomy(taxonomy)
        # euk-aware min depth per species (dense internal ids)
        n = taxonomy.n_nodes()
        euk = np.zeros(n + 1, bool)
        if taxonomy.eukaryota_id:
            e = taxonomy.eukaryota_id
            for i in range(1, n + 1):
                euk[i] = taxonomy.is_ancestor(e, i)
        self.min_depth = np.where(
            euk, params.min_cons_cnt_euk, params.min_cons_cnt
        ).astype(np.int32)

    def assign_batch(self, m: dict, read_lens_by_qid: np.ndarray,
                     n_reads: int, valid=None,
                     n_blocks: int | None = None,
                     w: int | None = None) -> list[ReadClassification]:
        p = self.p
        M = int(m["qid"].shape[0])
        if M == 0:
            return [ReadClassification() for _ in range(n_reads)]
        if valid is None:
            valid = np.ones(M, bool)

        # --- device: chain DP. The grid is sized by BLOCK count
        # ((read, species, frame) runs) and read length, not match count;
        # overflow raises for the caller's host fallback.
        if w is None:
            max_q = int(np.max(read_lens_by_qid)) // 3 + 4
            w = 16
            while w < min(max_q, 2048):
                w *= 2
        if n_blocks is None:
            est = max(1024, 8 * n_reads)
            n_blocks = 1
            while n_blocks < min(est, M, 1 << 20):
                n_blocks *= 2
        res = chain_matches(
            m["qid"], m["species"], m["frame"], m["pos"], m["hamming"],
            m["dna"], m["h16"], valid, self.min_depth,
            n_blocks=n_blocks, w=w, k=4,
            max_shift=p.max_codon_shift, kmer_format=p.kmer_format,
        )
        if np.asarray(res.fallback).any():
            raise NotImplementedError(
                "device taxonomer grid overflow; host fallback required"
            )

        # --- device: compact emissions -> combine -> group compaction ->
        # quotient reduction, all in one on-chip program; only the compact
        # group/quotient tensors and overflow counters transfer.
        results = [ReadClassification() for _ in range(n_reads)]
        path_budget = 1024
        while path_budget < min(max(M, 2), 1 << 22):
            path_budget *= 2
        g_budget = 1024
        while g_budget < 8 * n_reads:
            g_budget *= 2
        max_rows = 1024
        while max_rows < max(M, 2):
            max_rows *= 2

        groups, qres, counts_dev = _tail_program(
            self.dt, res, m["qid"], m["species"], m["pos"], m["hamming"],
            m["taxid"], valid, read_lens_by_qid.astype(np.int32),
            path_budget=path_budget, g_budget=g_budget, max_rows=max_rows,
            dna_shift=p.dna_shift,
        )
        counts = np.asarray(counts_dev)
        if int(counts[2]):
            raise NotImplementedError("device taxonomer budget overflow")
        n_g = int(counts[0])
        if n_g == 0:
            return results
        g_read = np.asarray(groups.read[:_pow2(n_g, g_budget)])[:n_g]
        g_sp = np.asarray(groups.species[:_pow2(n_g, g_budget)])[:n_g]
        g_score = np.asarray(
            groups.score[:_pow2(n_g, g_budget)]
        )[:n_g].astype(np.float32)
        n_rows = int(counts[1])
        np_pad = _pow2(n_rows, max_rows)
        r_read = np.asarray(qres.row_read[:np_pad])[:n_rows]
        r_sp = np.asarray(qres.row_species[:np_pad])[:n_rows]
        r_tax = np.asarray(qres.row_taxid[:np_pad])[:n_rows]

        # --- host: per-read selection + below-species descent
        order = np.lexsort((g_sp, g_read))
        g_read, g_sp, g_score = g_read[order], g_sp[order], g_score[order]
        starts = np.searchsorted(g_read, np.arange(n_reads), side="left")
        ends = np.searchsorted(g_read, np.arange(n_reads), side="right")
        q_order = np.lexsort((r_sp, r_read))
        r_read, r_sp, r_tax = r_read[q_order], r_sp[q_order], r_tax[q_order]

        from .taxonomer import F32, Taxonomer

        host = Taxonomer(p, self.tax)
        for rid in range(n_reads):
            lo, hi = int(starts[rid]), int(ends[rid])
            if lo == hi:
                continue
            sp2score = [
                (int(g_sp[i]), F32(g_score[i]))
                for i in range(lo, hi)
                if g_score[i] >= p.min_score
            ]
            # reproduce getBestSpeciesMatches selection (`:388-407`)
            meaningful = sum(1 for _, sc in sp2score if sc > 0)
            if meaningful == 0 or not sp2score:
                continue
            res_rc = results[rid]
            if p.em:
                ordered = sorted(sp2score, key=lambda x: -x[1])
                res_rc.top_species = ordered[0][0]
                res_rc.species_scores = [
                    (sp, float(F32(sc) * F32(sc))) for sp, sc in ordered[:10]
                ]
            best_sp_score = max(sc for _, sc in sp2score)
            max_species = []
            total = F32(0)
            for sp, sc in sp2score:
                if sc >= best_sp_score * F32(p.tie_ratio):
                    max_species.append(sp)
                    total = F32(total + sc)
            if len(max_species) > 1:
                lca = self.tax.lca(max_species)
                score = F32(total / len(max_species))
                if score == 0 or score < p.min_score:
                    res_rc.score = float(score)
                    continue
                res_rc.is_classified = True
                res_rc.taxid = lca
                res_rc.score = float(score)
                continue
            best = max_species[0]
            score = total
            if score == 0 or score < p.min_score:
                res_rc.score = float(score)
                continue
            # tax counts for the winning species
            a = np.searchsorted(r_read, rid, side="left")
            b = np.searchsorted(r_read, rid, side="right")
            sel = (r_sp[a:b] == best)
            tax_cnt: dict[int, int] = {}
            for t in r_tax[a:b][sel]:
                tax_cnt[int(t)] = tax_cnt.get(int(t), 0) + 1
            res_rc.tax_counts = tax_cnt
            res_rc.is_classified = True
            res_rc.score = float(score)
            if score < p.min_sp_score:
                species = self.tax.species_of[best]
                res_rc.taxid = int(self.tax.parent[species])
            elif p.em:
                res_rc.taxid = best
            else:
                res_rc.taxid = host._lower_rank(
                    tax_cnt, best, int(read_lens_by_qid[rid])
                )
        return results
