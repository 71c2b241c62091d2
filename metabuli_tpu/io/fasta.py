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
    """Stream records; auto-detects FASTA vs FASTQ from the first byte.

    A native zlib-backed block reader exists (`native/fastx.cpp`,
    METABULI_TPU_NATIVE_FASTX=1) but the default stays the Python parser:
    measured end to end, per-record SeqRecord construction dominates and
    the Python line parser (C-accelerated file iteration) is faster
    through this record-at-a-time interface. The native reader's bulk
    buffers pay off only with a bulk consumer (planned: direct
    block -> encoded-code-matrix path in the classifier)."""
    if os.environ.get("METABULI_TPU_NATIVE_FASTX"):
        gen = _read_records_native(path)
        if gen is not None:
            yield from gen
            return
    yield from _read_records_py(path)


def _read_records_native(path: str):
    from ..native import get_lib

    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    import ctypes

    lib.fastx_open.restype = ctypes.c_int64
    lib.fastx_block.restype = ctypes.c_int64
    handle = lib.fastx_open(path.encode())
    if not handle:
        return None

    def gen():
        import numpy as np

        max_rec = 8192
        seq_cap = 8 << 20
        name_cap = 1 << 20
        try:
            while True:
                seq_buf = np.empty(seq_cap, np.uint8)
                qual_buf = np.empty(seq_cap, np.uint8)
                name_buf = np.empty(name_cap, np.uint8)
                seq_off = np.zeros(max_rec + 1, np.int64)
                name_off = np.zeros(max_rec + 1, np.int64)
                has_q = np.zeros(max_rec, np.uint8)
                n = int(lib.fastx_block(
                    ctypes.c_int64(handle), ctypes.c_int64(max_rec),
                    ctypes.c_int64(seq_cap), ctypes.c_int64(name_cap),
                    seq_buf.ctypes, seq_off.ctypes, name_buf.ctypes,
                    name_off.ctypes, qual_buf.ctypes, has_q.ctypes,
                ))
                if n == -2:  # one record larger than the caps: grow
                    seq_cap *= 4
                    name_cap *= 4
                    continue
                if n <= 0:
                    break
                seq_bytes = seq_buf.tobytes()
                qual_bytes = qual_buf.tobytes()
                name_bytes = name_buf.tobytes()
                for i in range(n):
                    hdr = name_bytes[name_off[i]:name_off[i + 1]].decode(
                        errors="replace")
                    sp = hdr.split(None, 1)
                    name = sp[0] if sp else ""
                    comment = sp[1] if len(sp) > 1 else ""
                    s0, s1 = int(seq_off[i]), int(seq_off[i + 1])
                    yield SeqRecord(
                        name=name, comment=comment,
                        seq=seq_bytes[s0:s1],
                        qual=qual_bytes[s0:s1] if has_q[i] else None,
                    )
        finally:
            lib.fastx_close(ctypes.c_int64(handle))

    return gen()


def _read_records_py(path: str) -> Iterator[SeqRecord]:
    """Pure-Python fallback parser."""
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


class FastaEntry:
    """Index entry from ``scan_fasta``: sequence location, not content."""

    __slots__ = ("name", "length", "offset", "end")

    def __init__(self, name, length, offset, end):
        self.name = name
        self.length = length
        self.offset = offset
        self.end = end


def scan_fasta(path: str):
    """Index a PLAIN (uncompressed) FASTA: per record (name, seq length,
    byte offset of the '>' line, byte offset one past the record).

    Returns None for gzip/FASTQ inputs (callers fall back to in-memory
    reading). The index lets the DB build load accession batches by seek
    instead of holding every sequence in RAM (the streaming analogue of
    the reference's mmap + AccessionBatch scheme,
    `/root/reference/src/commons/IndexCreator.cpp:735-785`)."""
    with open(path, "rb") as fh:
        head = fh.read(1)
        if head != b">":
            return None
        fh.seek(0)
        entries = []
        name = None
        start = 0
        length = 0
        pos = 0
        for line in fh:
            if line.startswith(b">"):
                if name is not None:
                    entries.append(FastaEntry(name, length, start, pos))
                name, _ = _split_header(line[1:])
                start = pos
                length = 0
            else:
                length += len(line.rstrip(b"\r\n"))
            pos += len(line)
        if name is not None:
            entries.append(FastaEntry(name, length, start, pos))
    return entries


def read_fasta_at(fh, offset: int, end: int) -> bytes:
    """Load one record's sequence bytes from a ``scan_fasta`` entry."""
    fh.seek(offset)
    data = fh.read(end - offset)
    nl = data.find(b"\n")
    return data[nl + 1:].replace(b"\n", b"").replace(b"\r", b"")


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
