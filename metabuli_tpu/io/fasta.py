"""FASTA/FASTQ reading (plain or gzip), replacing the reference's kseq usage.

Provides streaming batch iteration sized for device batches. Parsing is
byte-oriented; sequences stay as ``bytes`` until encoded into code arrays.
Re-provides the capabilities of MMseqs2's KSeqWrapper as used by
`/root/reference/src/commons/KmerExtractor.cpp` and
`/root/reference/src/commons/QueryIndexer.cpp`.
"""

from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass
from typing import Iterator


@dataclass
class SeqRecord:
    name: str       # first whitespace-delimited token of the header
    comment: str    # remainder of the header ("" if none)
    seq: bytes
    qual: bytes | None = None  # None for FASTA


FASTA_EXTS = (".fna", ".fasta", ".fa")
FASTQ_EXTS = (".fq", ".fastq")


def is_fasta(path: str) -> bool:
    base = path[:-3] if path.endswith(".gz") else path
    return base.endswith(FASTA_EXTS)


def is_fastq(path: str) -> bool:
    base = path[:-3] if path.endswith(".gz") else path
    return base.endswith(FASTQ_EXTS)


def is_valid_query_file(path: str) -> bool:
    return is_fasta(path) or is_fastq(path)


def query_base_name(path: str) -> str:
    """LocalUtil::getQueryBaseName: file name minus fasta/fastq(+gz) suffix."""
    name = os.path.basename(path)
    if name.endswith(".gz"):
        name = name[:-3]
    for ext in FASTA_EXTS + FASTQ_EXTS:
        if name.endswith(ext):
            return name[: -len(ext)]
    return name


def _open(path: str) -> io.BufferedReader:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_records(path: str) -> Iterator[SeqRecord]:
    """Stream records; auto-detects FASTA vs FASTQ from the first byte."""
    with _open(path) as fh:
        first = fh.peek(1)[:1] if hasattr(fh, "peek") else b""
        if not first:
            head = fh.read(1)
            if not head:
                return
            first = head
            fh.seek(0)
        if first == b">" or (not first and False):
            yield from _read_fasta(fh)
        elif first == b"@":
            yield from _read_fastq(fh)
        else:
            # fall back on extension
            if is_fastq(path):
                yield from _read_fastq(fh)
            else:
                yield from _read_fasta(fh)


def _split_header(line: bytes) -> tuple[str, str]:
    text = line.decode("utf-8", "replace").strip()
    if " " in text:
        name, comment = text.split(" ", 1)
        return name, comment
    if "\t" in text:
        name, comment = text.split("\t", 1)
        return name, comment
    return text, ""


def _read_fasta(fh) -> Iterator[SeqRecord]:
    name = comment = None
    chunks: list[bytes] = []
    for line in fh:
        line = line.rstrip(b"\r\n")
        if line.startswith(b">"):
            if name is not None:
                yield SeqRecord(name, comment, b"".join(chunks))
            name, comment = _split_header(line[1:])
            chunks = []
        elif line:
            chunks.append(line)
    if name is not None:
        yield SeqRecord(name, comment, b"".join(chunks))


def _read_fastq(fh) -> Iterator[SeqRecord]:
    while True:
        header = fh.readline()
        if not header:
            return
        header = header.rstrip(b"\r\n")
        if not header:
            continue
        if not header.startswith(b"@"):
            raise ValueError(f"malformed FASTQ header: {header[:50]!r}")
        seq = fh.readline().rstrip(b"\r\n")
        plus = fh.readline()
        if not plus.startswith(b"+"):
            raise ValueError("malformed FASTQ: missing '+' line")
        qual = fh.readline().rstrip(b"\r\n")
        name, comment = _split_header(header[1:])
        yield SeqRecord(name, comment, seq, qual)


def count_records(path: str) -> tuple[int, int]:
    """(record count, total bases) — the QueryIndexer pre-scan
    (`/root/reference/src/commons/QueryIndexer.cpp:30-147`)."""
    n = 0
    total = 0
    for rec in read_records(path):
        n += 1
        total += len(rec.seq)
    return n, total


def write_fasta(path: str, records) -> None:
    with open(path, "w") as fh:
        for rec in records:
            header = rec.name if not rec.comment else f"{rec.name} {rec.comment}"
            fh.write(f">{header}\n{rec.seq.decode()}\n")


def write_fastq(path: str, records) -> None:
    with open(path, "w") as fh:
        for rec in records:
            header = rec.name if not rec.comment else f"{rec.name} {rec.comment}"
            fh.write(f"@{header}\n{rec.seq.decode()}\n+{header}\n{(rec.qual or b'').decode()}\n")
