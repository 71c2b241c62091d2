"""--cds-info support: coding-region extraction without gene prediction.

Re-provides `IndexCreator::loadCdsInfo` (`/root/reference/src/commons/IndexCreator.cpp:1275-1380`)
and `SeqIterator::devideToCdsAndNonCds` (`/root/reference/src/commons/SeqIterator.cpp:180-250`):
parse NCBI ``*_cds_from_genomic.fna`` headers ([protein_id=..], [location=..]
with complement()/join(), pseudo/hypothetical skipped), then split each
genome into CDS blocks (boundaries extended 7 codons into the flanks,
reverse-complemented when on the minus strand) and non-CDS remainders.
CDS blocks are extracted in their single coding frame; this is the exact
alternative to the Prodigal pipeline for assemblies with annotation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..io import fasta

KMER_LEN = 8
_RC = bytes.maketrans(b"ACGTacgtNn", b"TGCAtgcaNn")


@dataclass
class CdsInfo:
    protein_id: str
    is_complement: bool = False
    loc: list = field(default_factory=list)  # [(begin, end)] 1-based inclusive


def _parse_location(value: str, info: CdsInfo):
    value = value.strip()
    if value.startswith("complement(") and value.endswith(")"):
        info.is_complement = True
        value = value[len("complement(") : -1]
    if value.startswith("join(") and value.endswith(")"):
        value = value[len("join(") : -1]
    for part in value.split(","):
        part = part.strip().lstrip("<").replace(">", "")
        if ".." in part:
            a, b = part.split("..", 1)
            info.loc.append((int(a.lstrip("<")), int(b.lstrip(">"))))
        elif part:
            info.loc.append((int(part), int(part)))


def parse_cds_file(path: str, cds_map: dict[str, list[CdsInfo]]):
    """Accumulate accession -> CDS list from one cds_from_genomic FASTA."""
    for rec in fasta.read_records(path):
        # name like lcl|NC_000001.1_cds_NP_0001.1_1 -> accession NC_000001.1
        name = rec.name
        m = re.match(r"^(?:lcl\|)?([A-Za-z0-9_]+\.\d+)", name.split("|")[-1])
        accession = m.group(1) if m else name.split("_cds_")[0].split("|")[-1]
        comment = rec.comment
        features = dict(re.findall(r"\[([^=\]]+)=([^\]]*)\]", comment))
        if "pseudo" in features:
            continue
        if features.get("protein") == "hypothetical protein":
            continue
        if "protein_id" not in features or "location" not in features:
            continue
        info = CdsInfo(protein_id=features["protein_id"])
        try:
            _parse_location(features["location"], info)
        except ValueError:
            continue
        if info.loc:
            cds_map.setdefault(accession, []).append(info)


def load_cds_info(cds_list_file: str) -> dict[str, list[CdsInfo]]:
    cds_map: dict[str, list[CdsInfo]] = {}
    with open(cds_list_file) as fh:
        for line in fh:
            path = line.strip()
            if path:
                parse_cds_file(path, cds_map)
    return cds_map


def divide_cds_noncds(
    seq: bytes, cds_list: list[CdsInfo]
) -> tuple[list[bytes], list[bytes]]:
    """(cds blocks, non-cds blocks). CDS boundaries extended 7 codons into
    the flanks; minus-strand CDS reverse-complemented (so a single forward
    frame-0 scan covers the coding frame)."""
    n = len(seq)
    cds_out: list[bytes] = []
    covered = bytearray(n)
    for info in cds_list:
        parts = []
        for j, (b1, e1) in enumerate(info.loc):
            begin = b1 - 1
            end = e1 - 1
            if j == 0:
                k = 0
                while k < KMER_LEN - 1 and begin >= 3:
                    begin -= 3
                    k += 1
            if j == len(info.loc) - 1:
                k = 0
                while k < KMER_LEN - 1 and end + 3 < n:
                    end += 3
                    k += 1
            parts.append(seq[begin : end + 1])
        block = b"".join(parts)
        if info.is_complement:
            block = block.translate(_RC)[::-1]
        cds_out.append(block)
        for b1, e1 in info.loc:
            for k in range(b1 - 1, min(e1, n)):
                covered[k] = 1
    non_cds: list[bytes] = []
    i = 0
    while i < n:
        if covered[i]:
            i += 1
            continue
        j = i
        while j < n and not covered[j]:
            j += 1
        if j - i >= 24:
            non_cds.append(seq[i:j])
        i = j
    return cds_out, non_cds
