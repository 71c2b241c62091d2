"""Reference-compatible database file formats.

Metabuli databases are a directory of flat files
(`/root/reference/src/commons/IndexCreator.cpp:1251-1272`,
`SURVEY.md` §2.4):

  diffIdx        u16 stream: sorted u64 metamers stored as deltas in 15-bit
                 chunks, most-significant first, MSB=1 terminates a number
                 (`IndexCreator.cpp:874-892`, reader `KmerMatcher.h:282-297`).
  info           u32 per-metamer taxid; bit 31 flags redundancy unless the
                 DB was built with --skip-redundancy (`KmerMatcher.cpp:204-205`).
  split          4096 x {u64 ADkmer, u64 diffIdxOffset, u64 infoIdxOffset}
                 entries at amino-acid boundaries (`Kmer.h:111-119`).
  taxID_list     one internal taxid per line.
  acc2taxid.map  accession\ttaxid (3 columns in accession-level DBs).
  db.parameters  text key\tvalue metadata re-applied at classify time
                 (`/root/reference/src/commons/common.cpp:88-133`).

The codec here is numpy-vectorized (no per-element Python); the delta format
is retained as the *interchange* format only — in memory / HBM the table is
kept decompressed for binary search.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

SPLIT_DTYPE = np.dtype(
    [("ADkmer", "<u8"), ("diffIdxOffset", "<u8"), ("infoIdxOffset", "<u8")]
)


def delta_encode(values: np.ndarray) -> np.ndarray:
    """Sorted uint64 values -> u16 delta stream (`IndexCreator.cpp:874-892`)."""
    values = np.asarray(values, dtype=np.uint64)
    if len(values) == 0:
        return np.zeros(0, np.uint16)
    diffs = np.empty_like(values)
    diffs[0] = values[0]
    np.subtract(values[1:], values[:-1], out=diffs[1:])
    # chunks per diff: 1 + floor(bit_length(diff)-1, /15) with diff=0 -> 1
    bl = np.zeros(len(diffs), np.int64)
    tmp = diffs.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    bl += tmp.astype(np.int64)  # add 1 if tmp==1 (diff>0), 0 if diff==0
    nchunks = np.maximum(1, (bl + 14) // 15)
    total = int(nchunks.sum())
    out = np.zeros(total, np.uint16)
    ends = np.cumsum(nchunks) - 1
    starts = ends - nchunks + 1
    max_chunks = int(nchunks.max())
    for j in range(max_chunks):
        sel = nchunks > j
        # chunk j (most-significant first) of each selected diff
        shift = ((nchunks[sel] - 1 - j) * 15).astype(np.uint64)
        chunk = ((diffs[sel] >> shift) & np.uint64(0x7FFF)).astype(np.uint16)
        is_last = nchunks[sel] - 1 == j
        out[(starts[sel] + j)] = chunk | (is_last.astype(np.uint16) << 15)
    return out


def delta_decode(stream: np.ndarray, base: int = 0) -> np.ndarray:
    """u16 delta stream -> sorted uint64 values (vectorized reader)."""
    stream = np.asarray(stream, dtype=np.uint16)
    if len(stream) == 0:
        return np.zeros(0, np.uint64)
    flags = (stream & 0x8000) != 0
    ends = np.nonzero(flags)[0]
    n = len(ends)
    starts = np.empty(n, np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    chunk_num = np.repeat(np.arange(n), ends - starts + 1)
    pos = np.arange(len(stream), dtype=np.int64)
    rev = (ends[chunk_num] - pos).astype(np.uint64)
    contrib = (stream.astype(np.uint64) & np.uint64(0x7FFF)) << (rev * np.uint64(15))
    diffs = np.add.reduceat(contrib, starts)
    return np.cumsum(diffs, dtype=np.uint64) + np.uint64(base)


def count_deltas(stream: np.ndarray) -> int:
    """Number of encoded values (validateDatabase's consistency check,
    `/root/reference/src/util/validateDatabase.cpp:17-143`)."""
    stream = np.asarray(stream, dtype=np.uint16)
    return int(((stream & 0x8000) != 0).sum())


@dataclass
class DbParameters:
    """db.parameters contents (`IndexCreator.cpp:1249-1272`)."""

    db_name: str = ""
    creation_date: str = ""
    version: str = "metabuli_tpu"
    reduced_aa: int = 0
    accession_level: int = 0
    mask_mode: int = 1
    mask_prob: float = 0.9
    skip_redundancy: int = 1
    syncmer: int = 0
    smer_len: int = 5
    kmer_format: int = 2
    extras: dict = field(default_factory=dict)

    def write(self, path: str):
        with open(path, "w") as fh:
            fh.write(f"DB_name\t{self.db_name}\n")
            fh.write(f"Creation_date\t{self.creation_date}\n")
            fh.write(f"Metabuli commit used to create the DB\t{self.version}\n")
            fh.write(f"Reduced_alphabet\t{self.reduced_aa}\n")
            fh.write(f"Accession_level\t{self.accession_level}\n")
            fh.write(f"Mask_mode\t{self.mask_mode}\n")
            fh.write(f"Mask_prob\t{self.mask_prob:f}\n")
            fh.write(f"Skip_redundancy\t{self.skip_redundancy}\n")
            fh.write(f"Syncmer\t{self.syncmer}\n")
            if self.syncmer == 1:
                fh.write(f"Syncmer_len\t{self.smer_len}\n")
            fh.write(f"Kmer_format\t{self.kmer_format}\n")
            for k, v in self.extras.items():
                fh.write(f"{k}\t{v}\n")

    @classmethod
    def read(cls, path: str) -> "DbParameters":
        p = cls()
        with open(path) as fh:
            for line in fh:
                if "\t" not in line:
                    continue
                key, _, val = line.rstrip("\n").partition("\t")
                if key == "DB_name":
                    p.db_name = val
                elif key == "Creation_date":
                    p.creation_date = val
                elif key == "Metabuli commit used to create the DB":
                    p.version = val
                elif key == "Reduced_alphabet":
                    p.reduced_aa = int(val)
                elif key == "Accession_level":
                    p.accession_level = int(val)
                elif key == "Mask_mode":
                    p.mask_mode = int(val)
                elif key == "Mask_prob":
                    p.mask_prob = float(val)
                elif key == "Skip_redundancy":
                    p.skip_redundancy = int(val)
                elif key == "Syncmer":
                    p.syncmer = int(val)
                elif key == "Syncmer_len":
                    p.smer_len = int(val)
                elif key == "Kmer_format":
                    p.kmer_format = int(val)
                else:
                    p.extras[key] = val
        return p


def write_db_files(
    db_dir: str,
    values: np.ndarray,
    taxids: np.ndarray,
    split_num: int = 4096,
):
    """Write diffIdx / info / split for a sorted, deduplicated metamer table.

    Split entries are placed at the first amino-acid-part change at or after
    every (total/(split_num-1))-th k-mer, mirroring
    `IndexCreator.cpp:817-872` (entry i records the k-mer value *before* the
    boundary and the offsets where the next k-mer starts).
    """
    os.makedirs(db_dir, exist_ok=True)
    values = np.asarray(values, np.uint64)
    taxids = np.asarray(taxids, np.uint32)
    n = len(values)
    stream = delta_encode(values)
    stream.tofile(os.path.join(db_dir, "diffIdx"))
    taxids.tofile(os.path.join(db_dir, "info"))

    splits = np.zeros(split_num, SPLIT_DTYPE)
    if n > 0:
        # cumulative u16 count after writing each k-mer
        flags_end = np.nonzero((stream & 0x8000) != 0)[0]
        diff_cnt_after = flags_end + 1  # per k-mer i: chunks written so far
        aa = values >> np.uint64(24)
        size_of_split = max(1, n // max(1, split_num - 1))
        split_idx = 1
        checkpoints = np.arange(1, split_num) * size_of_split
        ci = 0
        # first AA change at or after each checkpoint
        aa_change = np.nonzero(aa[1:] != aa[:-1])[0] + 1  # index where new AA starts
        for cp in checkpoints:
            if split_idx >= split_num:
                break
            j = np.searchsorted(aa_change, cp, side="left")
            if j >= len(aa_change):
                break
            boundary = int(aa_change[j])  # first k-mer of the new AA group
            prev = boundary - 1
            splits[split_idx] = (
                values[prev],
                int(diff_cnt_after[prev]),
                boundary,
            )
            split_idx += 1
            ci += 1
        # deduplicate identical consecutive boundaries
        seen = set()
        for i in range(1, split_num):
            key = (int(splits[i]["ADkmer"]), int(splits[i]["diffIdxOffset"]))
            if splits[i]["ADkmer"] != 0 and key in seen:
                splits[i] = (0, 0, 0)
            elif splits[i]["ADkmer"] != 0:
                seen.add(key)
    splits.tofile(os.path.join(db_dir, "split"))


def read_db_values(db_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Load and decompress diffIdx + info into (values u64, taxids u32)."""
    stream = np.fromfile(os.path.join(db_dir, "diffIdx"), dtype=np.uint16)
    taxids = np.fromfile(os.path.join(db_dir, "info"), dtype=np.uint32)
    values = delta_decode(stream)
    if len(values) != len(taxids):
        raise ValueError(
            f"diffIdx k-mer count {len(values)} != info count {len(taxids)}"
        )
    return values, taxids


def write_taxid_list(path: str, taxids) -> None:
    with open(path, "w") as fh:
        for t in taxids:
            fh.write(f"{int(t)}\n")


def read_taxid_list(path: str) -> np.ndarray:
    with open(path) as fh:
        return np.array([int(x) for x in fh.read().split()], np.int64)
