"""Per-read taxonomic assignment from sorted match arrays.

Host-side implementation of the reference's ``Taxonomer``
(`/root/reference/src/commons/Taxonomer.cpp`). Matches arrive sorted by
(query, species, frame, position, hamming, dnaEncoding)
(`KmerMatcher.cpp:1149-1166`); per read we

  1. score every species by chaining consecutive matches into paths
     (`getMatchPaths`, `Taxonomer.cpp:487-648`) and greedily combining
     non-overlapping paths (`combineMatchPaths`, `:410-468`);
  2. pick the best species, or the LCA of species within ``tie_ratio`` of the
     best (`getBestSpeciesMatches`, `:316-407`);
  3. filter redundant matches per position-quotient (min hamming, ties ->
     LCA; `filterRedundantMatches`, `:205-241`);
  4. descend below species by clade-count BFS with threshold
     ``(len-1)//denominator`` (`lowerRankClassification`, `:252-314`).

Scores use float32 throughout to mirror the reference's C++ ``float``
accumulation (tie-breaks are float-order sensitive).

This module is deliberately branchy host code (like the reference); the
match generation that dominates runtime runs on device. A fully batched
device-side taxonomer is the planned next optimization.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..db.taxonomy import Taxonomy

F32 = np.float32


@dataclass
class TaxonomerParams:
    min_score: float = 0.0
    # --print-log: per-species match-path debug dump during combination
    # (the active reference branch, `Taxonomer.cpp:346-353`; the matcher
    # dump at `KmerMatcher.cpp:382-399` is commented out upstream)
    print_log: bool = False
    min_sp_score: float = 0.0
    min_cons_cnt: int = 4
    min_cons_cnt_euk: int = 9
    tie_ratio: float = 0.95
    syncmer: bool = False
    smer_len: int = 5
    seq_mode: int = 2
    accession_level: int = 0
    em: bool = False
    reduced_aa: bool = False
    kmer_format: int = 2

    @property
    def dna_shift(self) -> int:
        # `Taxonomer.cpp:34-42`
        return (8 - self.smer_len) * 3 if self.syncmer else 3

    @property
    def bits_per_codon(self) -> int:
        # `Taxonomer.cpp:50-57`
        return 4 if self.reduced_aa else 3

    @property
    def total_dna_bits(self) -> int:
        return 32 if self.reduced_aa else 24

    @property
    def max_codon_shift(self) -> int:
        return 8 - self.smer_len if self.syncmer else 1

    @property
    def denominator(self) -> int:
        # short reads 100, long reads 1000 (`Taxonomer.cpp:44-48`)
        return 100 if self.seq_mode in (1, 2) else 1000


@dataclass
class ReadClassification:
    is_classified: bool = False
    taxid: int = 0               # internal taxid
    score: float = 0.0
    hamming: int = 0
    tax_counts: dict = field(default_factory=dict)  # internal taxid -> count
    top_species: int = 0
    species_scores: list = field(default_factory=list)  # [(species, score^2)]


def _match_score(h16: int) -> F32:
    """Match::getScore (`Match.h:32-44`): per codon 3.0 if 0 else 2-0.5h."""
    s = F32(0)
    for i in range(8):
        h = (h16 >> (2 * i)) & 3
        s = F32(s + (F32(3.0) if h == 0 else F32(2.0) - F32(0.5) * F32(h)))
    return s


_SCORE_LUT = np.array(
    [3.0, 1.5, 1.0, 0.5], dtype=np.float32
)  # score per 2-bit hamming value


def _match_scores_vec(h16: np.ndarray) -> np.ndarray:
    """Vectorized Match::getScore over an int array."""
    total = np.zeros(len(h16), np.float32)
    for i in range(8):
        total += _SCORE_LUT[(h16 >> (2 * i)) & 3]
    return total


def _score_increment(h16: int, shift: int) -> F32:
    """calScoreIncrement (`Taxonomer.cpp:650-661`): low `shift` codons."""
    s = F32(0)
    for i in range(shift):
        h = (h16 >> (2 * i)) & 3
        s = F32(s + (F32(3.0) if h == 0 else F32(2.0) - F32(0.5) * F32(h)))
    return s


def _hamming_increment(h16: int, shift: int) -> int:
    return sum((h16 >> (2 * i)) & 3 for i in range(shift))


def _right_part_hamming(h16: int, rng: int) -> int:
    return sum((h16 >> (2 * i)) & 3 for i in range(rng))


def _left_part_hamming(h16: int, rng: int) -> int:
    return sum((h16 >> (14 - 2 * i)) & 3 for i in range(rng))


def _right_part_score(h16: int, rng: int) -> F32:
    s = F32(0)
    for i in range(rng):
        h = (h16 >> (2 * i)) & 3
        s = F32(s + (F32(3.0) if h == 0 else F32(2.0) - F32(0.5) * F32(h)))
    return s


def _left_part_score(h16: int, rng: int) -> F32:
    s = F32(0)
    for i in range(rng):
        h = (h16 >> (14 - 2 * i)) & 3
        s = F32(s + (F32(3.0) if h == 0 else F32(2.0) - F32(0.5) * F32(h)))
    return s


class _Path:
    """MatchPath (`Taxonomer.h:35-59`)."""

    __slots__ = ("start", "end", "score", "hamming", "depth", "start_idx", "end_idx")

    def __init__(self, start, end, score, hamming, depth, start_idx, end_idx):
        self.start = start
        self.end = end
        self.score = score
        self.hamming = hamming
        self.depth = depth
        self.start_idx = start_idx  # index of startMatch in the match arrays
        self.end_idx = end_idx


class Taxonomer:
    def __init__(self, params: TaxonomerParams, taxonomy: Taxonomy):
        self.p = params
        self.tax = taxonomy

    # ------------------------------------------------------------------ public
    def choose_best_taxon(
        self,
        m: dict,
        read_len: int,
    ) -> ReadClassification:
        """chooseBestTaxon (`Taxonomer.cpp:130-202`) for one read.

        ``m`` holds this read's matches as numpy arrays (sorted):
        species, frame, pos, hamming, dna, taxid, h16. ``read_len`` is
        queryLength + queryLength2 (max-covered lengths).
        """
        res = ReadClassification()
        score, lca_flag, best_taxid, best_range, sp_scores = self._best_species(
            m, read_len, res
        )
        if score == 0 or score < self.p.min_score:
            res.is_classified = False
            res.taxid = 0
            res.score = float(score)
            return res
        if lca_flag:
            res.is_classified = True
            res.taxid = best_taxid
            res.score = float(score)
            return res

        tax_cnt = self._filter_redundant(m, best_range, read_len)
        res.tax_counts = tax_cnt

        if score < self.p.min_sp_score:
            species = self.tax.species_of[best_taxid]
            res.is_classified = True
            res.taxid = int(self.tax.parent[species])
            res.score = float(score)
            return res

        res.is_classified = True
        res.score = float(score)
        if self.p.em:
            res.taxid = best_taxid
        else:
            res.taxid = self._lower_rank(tax_cnt, best_taxid, read_len)
        return res

    # ----------------------------------------------------------- species level
    def _best_species(self, m, read_len, res: ReadClassification):
        """getBestSpeciesMatches (`Taxonomer.cpp:316-407`)."""
        species = m["species"]
        frame = m["frame"]
        n = len(species)
        sp2score: list[tuple[int, F32]] = []
        best_sp_score = F32(0)
        best_range = (0, 0)
        meaningful = 0

        i = 0
        while i < n:
            cur_sp = species[i]
            sp_start = i
            paths: list[_Path] = []
            while i < n and species[i] == cur_sp:
                cur_frame = frame[i]
                f_start = i
                while i < n and species[i] == cur_sp and frame[i] == cur_frame:
                    i += 1
                if i - f_start > 1:
                    self._get_match_paths(m, f_start, i, paths, int(cur_sp))
            if paths:
                if self.p.print_log:
                    print(f"Current species: "
                          f"{self.tax.to_original(int(cur_sp))} "
                          f"{int(cur_sp)}")
                    for pp in paths:
                        print(f"{pp.start} {pp.end} {pp.score} "
                              f"{pp.hamming} {pp.depth}")
                score = self._combine_paths(m, paths, read_len)
                score = min(score, F32(1.0))
                if score < self.p.min_score:
                    continue  # reference skips low-score species entirely
                sp2score.append((int(cur_sp), score))
                if score > 0:
                    meaningful += 1
                if score > best_sp_score:
                    best_sp_score = score
                    best_range = (sp_start, i)

        if meaningful == 0:
            return F32(0), False, 0, (0, 0), sp2score

        if self.p.em and sp2score:
            ordered = sorted(sp2score, key=lambda x: -x[1])
            res.top_species = ordered[0][0]
            res.species_scores = [
                (sp, float(F32(sc) * F32(sc))) for sp, sc in ordered[:10]
            ]

        max_species = []
        total = F32(0)
        for sp, sc in sp2score:
            if sc >= best_sp_score * F32(self.p.tie_ratio):
                max_species.append(sp)
                total = F32(total + sc)

        if len(max_species) > 1:
            lca = self.tax.lca(max_species)
            return F32(total / len(max_species)), True, lca, best_range, sp2score
        return total, False, max_species[0], best_range, sp2score

    # ------------------------------------------------------------------ chains
    def _get_match_paths(self, m, start, end, out_paths: list, species_id: int):
        """getMatchPaths (`Taxonomer.cpp:487-648`): DP over consecutive
        position groups within one (species, frame) block."""
        pos = m["pos"]
        dna = m["dna"]
        h16 = m["h16"]
        ham = m["hamming"]
        p = self.p
        min_depth = p.min_cons_cnt
        if self.tax.eukaryota_id and self.tax.is_ancestor(
            self.tax.eukaryota_id, species_id
        ):
            min_depth = p.min_cons_cnt_euk
        forward = m["frame"][start] < 3
        max_shift = p.max_codon_shift

        # local paths, one per match in the block
        scores = _match_scores_vec(h16[start:end].astype(np.int64))
        local = [
            _Path(
                int(pos[j]),
                int(pos[j]) + 23,
                F32(scores[j - start]),
                int(ham[j]),
                1,
                j,
                j,
            )
            for j in range(start, end)
        ]
        connected = [False] * (end - start)

        # iterate position groups
        i = start
        cur_pos = int(pos[start])
        cur_s = i
        while i < end and int(pos[i]) == cur_pos:
            i += 1
        cur_e = i
        while i < end:
            next_pos = int(pos[i])
            nxt_s = i
            while i < end and int(pos[i]) == next_pos:
                i += 1
            nxt_e = i
            shift = (next_pos - cur_pos) // 3
            if 0 < shift <= max_shift:
                for nj in range(nxt_s, nxt_e):
                    inc = _score_increment(int(h16[nj]), shift)
                    best = None
                    best_score = F32(0)
                    bpc = p.bits_per_codon
                    mask = (1 << (p.total_dna_bits - bpc * shift)) - 1
                    fmt2 = p.kmer_format == 2
                    for cj in range(cur_s, cur_e):
                        # isConsecutive2 for the new format, isConsecutive for
                        # the old (`Taxonomer.cpp:671-699`); operands swapped
                        # for reverse frames (`:536` vs `:605`); dna read
                        # unsigned (reduced mode uses the full 32 bits)
                        a, b = (cj, nj) if forward else (nj, cj)
                        da = int(dna[a]) & 0xFFFFFFFF
                        db = int(dna[b]) & 0xFFFFFFFF
                        if fmt2:
                            ok = (da & mask) == (db >> (bpc * shift))
                        else:
                            ok = (da >> (bpc * shift)) == (db & mask)
                        if ok:
                            connected[cj - start] = True
                            lp = local[cj - start]
                            if lp.score > best_score:
                                best = lp
                                best_score = lp.score
                    if best is not None:
                        ln = local[nj - start]
                        ln.start = best.start
                        ln.score = F32(best.score + inc)
                        ln.hamming = best.hamming + _hamming_increment(
                            int(h16[nj]), shift
                        )
                        ln.depth = best.depth + shift
                        ln.start_idx = best.start_idx
            for cj in range(cur_s, cur_e):
                if not connected[cj - start] and local[cj - start].depth >= min_depth:
                    out_paths.append(local[cj - start])
            if i == end:
                for nj in range(nxt_s, nxt_e):
                    if local[nj - start].depth >= min_depth:
                        out_paths.append(local[nj - start])
            cur_s, cur_e, cur_pos = nxt_s, nxt_e, next_pos

    def _combine_paths(self, m, paths: list, read_len: int) -> F32:
        """combineMatchPaths (`Taxonomer.cpp:410-468`)."""
        h16 = m["h16"]
        paths.sort(key=lambda a: (-a.score, a.hamming, -a.start))
        combined: list[_Path] = []
        total = F32(0)
        for path in paths:
            overlapped = False
            for comb in combined:
                if path.end < comb.start or comb.end < path.start:
                    continue
                ov = min(path.end, comb.end) - max(path.start, comb.start) + 1
                if ov == path.end - path.start + 1:
                    overlapped = True
                    break
                if ov < 24:
                    # trimMatchPath (`Taxonomer.cpp:475-485`)
                    if path.start < comb.start:
                        path.end = comb.start - 1
                        path.hamming = max(
                            0,
                            path.hamming
                            - _right_part_hamming(int(h16[path.end_idx]), ov // 3),
                        )
                        path.score = F32(
                            path.score
                            - _right_part_score(int(h16[path.end_idx]), ov // 3)
                            - F32(ov % 3)
                        )
                    else:
                        path.start = comb.end + 1
                        path.hamming = max(
                            0,
                            path.hamming
                            - _left_part_hamming(int(h16[path.start_idx]), ov // 3),
                        )
                        path.score = F32(
                            path.score
                            - _left_part_score(int(h16[path.start_idx]), ov // 3)
                            - F32(ov % 3)
                        )
                    continue
                overlapped = True
                break
            if not overlapped:
                combined.append(path)
                total = F32(total + path.score)
        return F32(total / F32(read_len))

    # ------------------------------------------------------------- redundancy
    def _filter_redundant(self, m, best_range, read_len: int) -> dict:
        """filterRedundantMatches (`Taxonomer.cpp:205-241`): per
        position-quotient best match; min hamming wins, ties -> cumulative
        LCA of target taxids."""
        lo, hi = best_range
        pos = m["pos"]
        ham = m["hamming"]
        taxid = m["taxid"]
        shift = self.p.dna_shift
        best_tax: dict[int, int] = {}
        best_ham: dict[int, int] = {}
        for j in range(lo, hi):
            q = int(pos[j]) // shift
            h = int(ham[j])
            if q not in best_tax:
                best_tax[q] = int(taxid[j])
                best_ham[q] = h
            elif h < best_ham[q]:
                best_tax[q] = int(taxid[j])
                best_ham[q] = h
            elif h == best_ham[q]:
                best_tax[q] = self.tax.lca([best_tax[q], int(taxid[j])])
        counts: dict[int, int] = {}
        for q, t in best_tax.items():
            counts[t] = counts.get(t, 0) + 1
        return counts

    # ----------------------------------------------------------- below species
    def _lower_rank(self, tax_cnt: dict, species: int, read_len: int) -> int:
        """lowerRankClassification (`Taxonomer.cpp:252-314`)."""
        threshold = (read_len - 1) // self.p.denominator
        clade: dict[int, dict] = {}
        for t, c in tax_cnt.items():
            node = int(t)
            e = clade.setdefault(node, {"clade": 0, "children": []})
            e["clade"] += c
            guard = 0
            while node != species and guard < 64:
                pnode = int(self.tax.parent[node])
                pe = clade.setdefault(pnode, {"clade": 0, "children": []})
                if node not in pe["children"]:
                    pe["children"].append(node)
                pe["clade"] += c
                if pnode == node:
                    break
                node = pnode
                guard += 1
        if species not in clade:
            return int(species)
        if self.p.accession_level == 2:
            for t in list(clade.keys()):
                rank = self.tax.rank_of(t)
                if rank in ("", "accession"):
                    pt = int(self.tax.parent[t])
                    if pt in clade and t in clade[pt]["children"]:
                        clade[pt]["children"].remove(t)
        return self._bfs(clade, int(species), threshold)

    def _bfs(self, clade: dict, root: int, max_cnt: int) -> int:
        """BFS (`Taxonomer.cpp:292-314`): single dominant child above the
        original threshold descends; ties or none -> stop at root."""
        entry = clade.get(root)
        if entry is None or not entry["children"]:
            return root
        best_children = []
        cur_max = max_cnt
        for ch in entry["children"]:
            cnt = clade.get(ch, {"clade": 0})["clade"]
            if cnt > cur_max:
                best_children = [ch]
                cur_max = cnt
            elif cnt == cur_max:
                best_children.append(ch)
        if len(best_children) == 1:
            return self._bfs(clade, best_children[0], max_cnt)
        return root
