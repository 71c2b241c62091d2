"""UniRef protein-cluster database and classifier.

Re-provides `/root/reference/src/uniref/` (UnirefDbCreator, UnirefClassifier)
and the create-uniref-db / create-uniref-tree / assign_uniref workflows:

  * DB: AA 12-mers (5-bit packed) of UniRef100 representative sequences,
    sorted; duplicate k-mers collapse to the UniRef-tree LCA of their
    clusters (FilterMode::UNIREF_LCA, `IndexCreator.h:541-581`).
  * Classification (`UnirefClassifier.cpp` assignUniref): exact AA-level
    k-mer matches are counted per cluster; each cluster's score is the sum
    of counts of clusters that are its ancestors-or-self in the UniRef
    tree; best score wins, ties resolve to the tree LCA.
"""

from __future__ import annotations

import os

import numpy as np

from ..db.formats import delta_decode, delta_encode
from ..io import fasta
from ..ops.encode import (
    encode_aa_seqs_padded,
    extract_aa_kmers,
    extract_aa_kmers_dna,
)
from ..ops.genetic_code import encode_seqs_padded
from .tree import UnirefTree, build_tree, iter_uniref_entries

KMER_LEN = 12


def create_uniref_db(xml_path: str, db_dir: str, batch_aa: int = 2_000_000) -> dict:
    """Build tree + AA 12-mer index from a UniRef100 XML dump."""
    os.makedirs(db_dir, exist_ok=True)
    tree = build_tree(xml_path)
    tree.save(os.path.join(db_dir, "unirefTree"))

    all_values = []
    all_ids = []
    batch_seqs: list[bytes] = []
    batch_ids: list[int] = []
    batch_bases = 0

    def flush():
        nonlocal batch_seqs, batch_ids, batch_bases
        if not batch_seqs:
            return
        max_len = max(len(s) for s in batch_seqs)
        bucket = 512
        while bucket < max_len:
            bucket *= 2
        codes, lens = encode_aa_seqs_padded(batch_seqs, bucket)
        v, p, ok = extract_aa_kmers(codes, lens, k=KMER_LEN)
        v, ok = np.asarray(v), np.asarray(ok)
        b, w = np.nonzero(ok)
        all_values.append(v[b, w])
        all_ids.append(np.array(batch_ids, np.uint32)[b])
        batch_seqs, batch_ids, batch_bases = [], [], 0

    for u100, _, _, seq in iter_uniref_entries(xml_path):
        if not seq or u100 not in tree.name2id:
            continue
        batch_seqs.append(seq)
        batch_ids.append(tree.name2id[u100])
        batch_bases += len(seq)
        if batch_bases >= batch_aa:
            flush()
    flush()

    values = np.concatenate(all_values) if all_values else np.zeros(0, np.uint64)
    ids = np.concatenate(all_ids) if all_ids else np.zeros(0, np.uint32)
    order = np.lexsort((ids, values))
    values, ids = values[order], ids[order]
    # dedup by value; id := UniRef-tree LCA of members (UNIREF_LCA mode)
    if len(values):
        new_group = np.ones(len(values), bool)
        new_group[1:] = values[1:] != values[:-1]
        starts = np.nonzero(new_group)[0]
        ends = np.append(starts[1:], len(values))
        out_ids = np.empty(len(starts), np.uint32)
        for g, (a, b) in enumerate(zip(starts, ends)):
            if b - a == 1:
                out_ids[g] = ids[a]
            else:
                out_ids[g] = tree.lca(ids[a:b])
        values = values[starts]
        ids = out_ids
    delta_encode(values).tofile(os.path.join(db_dir, "diffIdx"))
    ids.astype(np.uint32).tofile(os.path.join(db_dir, "info"))
    return {"clusters": len(tree.names) - 1, "kmers": len(values)}


class UnirefClassifier:
    def __init__(self, db_dir: str):
        self.tree = UnirefTree.load(os.path.join(db_dir, "unirefTree"))
        stream = np.fromfile(os.path.join(db_dir, "diffIdx"), np.uint16)
        self.values = delta_decode(stream)
        self.ids = np.fromfile(os.path.join(db_dir, "info"), np.uint32)

    def _match_counts(self, q_values: np.ndarray) -> dict[int, int]:
        lo = np.searchsorted(self.values, q_values, side="left")
        hi = np.searchsorted(self.values, q_values, side="right")
        counts: dict[int, int] = {}
        for a, b in zip(lo, hi):
            for j in range(a, b):
                cid = int(self.ids[j])
                counts[cid] = counts.get(cid, 0) + 1
        return counts

    def _assign(self, counts: dict[int, int]) -> tuple[int, int]:
        """assignUniref scoring (`UnirefClassifier.cpp` assignUniref)."""
        best = 0
        best_count = 0
        for cid in counts:
            total = 0
            for other, cnt in counts.items():
                if self.tree.is_ancestor(other, cid):
                    total += cnt
            if total > best_count:
                best_count = total
                best = cid
            elif total == best_count and best:
                best = self.tree.lca2(best, cid)
        return best, best_count

    def classify_file(self, query_path: str, out_dir: str, protein: bool | None = None) -> dict:
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, "uniref_classifications.tsv")
        n = classified = 0
        with open(out_path, "w") as out:
            out.write("#name\tlength\tuniref\tkmer_matches\tkmer_count\n")
            for rec in fasta.read_records(query_path):
                seq = rec.seq
                if protein is None:
                    letters = set(seq.upper())
                    is_protein = bool(letters - set(b"ACGTNacgtn"))
                else:
                    is_protein = protein
                if is_protein:
                    codes, lens = encode_aa_seqs_padded([seq])
                    v, p, ok = extract_aa_kmers(codes, lens, k=KMER_LEN)
                else:
                    codes, lens = encode_seqs_padded([seq])
                    v, p, ok = extract_aa_kmers_dna(codes, lens, k=KMER_LEN)
                v, ok = np.asarray(v).reshape(-1), np.asarray(ok).reshape(-1)
                q = np.sort(v[ok])
                counts = self._match_counts(q)
                best, score = self._assign(counts)
                name = self.tree.names[best] if best else "unclassified"
                out.write(f"{rec.name}\t{len(seq)}\t{name}\t{score}\t{len(q)}\n")
                n += 1
                classified += best != 0
        return {"queries": n, "classified": classified, "out": out_path}
