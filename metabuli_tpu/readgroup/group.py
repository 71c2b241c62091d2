"""Read grouping: overlap graph from shared metamers + label propagation.

Re-provides the capability of the reference's experimental read-group module
(`/root/reference/src/read-group/GroupGenerator.{h,cpp}`, `grouping`
workflow): reads sharing enough k-mers are joined in a union-find
(`GroupGenerator.h:73-109`); classification labels then propagate from
classified members to unclassified members of each group.

TPU-first shape: metamer extraction runs on device; the overlap join is a
sort of (kmer, read) pairs; union-find and label propagation are host-side
(numpy + path compression).
"""

from __future__ import annotations

import os

import numpy as np

from ..io import fasta
from ..ops import encode
from ..ops.genetic_code import encode_seqs_padded


class DisjointSet:
    """Union-find with path halving (`GroupGenerator.h:73-109`)."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return int(x)

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)

    def labels(self) -> np.ndarray:
        return np.array([self.find(i) for i in range(len(self.parent))])


def build_read_groups(
    reads: list[bytes],
    min_shared_kmers: int = 2,
    max_kmer_degree: int = 64,
    batch: int = 2048,
) -> np.ndarray:
    """Group labels per read: reads sharing >= min_shared_kmers metamers
    join one group. K-mers hitting more than ``max_kmer_degree`` reads are
    treated as repeats and skipped (hub suppression)."""
    pairs_k: list[np.ndarray] = []
    pairs_r: list[np.ndarray] = []
    for i in range(0, len(reads), batch):
        chunk = reads[i : i + batch]
        max_len = max((len(r) for r in chunk), default=0)
        bucket = 64
        while bucket < max_len:
            bucket *= 2
        codes, lens = encode_seqs_padded(chunk, bucket)
        mm = encode.extract_metamers(codes, lens)
        v = np.asarray(mm.value)
        ok = np.asarray(mm.valid)
        b, f, w = np.nonzero(ok)
        pairs_k.append(v[b, f, w])
        pairs_r.append((b + i).astype(np.int64))
    if not pairs_k:
        return np.zeros(0, np.int64)
    kmers = np.concatenate(pairs_k)
    rids = np.concatenate(pairs_r)
    # dedup (kmer, read) then sort by kmer
    order = np.lexsort((rids, kmers))
    kmers, rids = kmers[order], rids[order]
    uniq = np.ones(len(kmers), bool)
    uniq[1:] = (kmers[1:] != kmers[:-1]) | (rids[1:] != rids[:-1])
    kmers, rids = kmers[uniq], rids[uniq]

    # count shared kmers per read pair within each kmer group
    new_group = np.ones(len(kmers), bool)
    new_group[1:] = kmers[1:] != kmers[:-1]
    starts = np.nonzero(new_group)[0]
    ends = np.append(starts[1:], len(kmers))
    pair_counts: dict[tuple[int, int], int] = {}
    for a, b in zip(starts, ends):
        size = b - a
        if size < 2 or size > max_kmer_degree:
            continue
        members = rids[a:b]
        first = int(members[0])
        for m in members[1:]:
            key = (first, int(m))
            pair_counts[key] = pair_counts.get(key, 0) + 1

    ds = DisjointSet(len(reads))
    for (x, y), cnt in pair_counts.items():
        if cnt >= min_shared_kmers:
            ds.union(x, y)
    return ds.labels()


def propagate_labels(
    group_labels: np.ndarray,
    classifications: list[int],
    min_votes: int = 1,
) -> list[int]:
    """Assign each unclassified read the majority classification of its
    group (0 stays if the group has no classified member)."""
    votes: dict[int, dict[int, int]] = {}
    for rid, g in enumerate(group_labels):
        t = classifications[rid]
        if t > 0:
            votes.setdefault(int(g), {}).setdefault(t, 0)
            votes[int(g)][t] += 1
    out = list(classifications)
    for rid, g in enumerate(group_labels):
        if out[rid] == 0:
            v = votes.get(int(g))
            if v:
                best = max(v.items(), key=lambda kv: kv[1])
                if best[1] >= min_votes:
                    out[rid] = best[0]
    return out


def group_reads_file(
    query_path: str,
    classifications_path: str,
    out_dir: str,
    min_shared_kmers: int = 2,
) -> dict:
    """`grouping` workflow: read groups + propagated classifications."""
    os.makedirs(out_dir, exist_ok=True)
    reads = []
    names = []
    for rec in fasta.read_records(query_path):
        reads.append(rec.seq)
        names.append(rec.name)
    labels = build_read_groups(reads, min_shared_kmers)

    cls = [0] * len(reads)
    rows = []
    with open(classifications_path) as fh:
        idx = 0
        for line in fh:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            if idx < len(cls) and len(cols) >= 3:
                cls[idx] = int(cols[2]) if cols[0] == "1" else 0
                rows.append(cols)
            idx += 1
    propagated = propagate_labels(labels, cls)

    groups_path = os.path.join(out_dir, "read_groups.tsv")
    with open(groups_path, "w") as fh:
        fh.write("#read\tgroup\ttaxID\tpropagated_taxID\n")
        for i, name in enumerate(names):
            fh.write(f"{name}\t{int(labels[i])}\t{cls[i]}\t{propagated[i]}\n")
    rescued = sum(1 for a, b in zip(cls, propagated) if a == 0 and b != 0)
    return {
        "reads": len(reads),
        "groups": int(len(np.unique(labels))),
        "rescued": rescued,
        "out": groups_path,
    }
