"""--validate-input: FASTA/FASTQ well-formedness checks.

Re-provides `lib/fasta_validator` and `lib/fastq_utils` as used by
`/root/reference/src/workflow/classify.cpp:67-94`: structural validation
plus duplicate-header detection for FASTA and per-record consistency
(sequence/quality length match, '+' separator) for FASTQ.
"""

from __future__ import annotations

from ..io import fasta

_VALID_SEQ = frozenset(b"ABCDGHKMNRSTUVWYabcdghkmnrstuvwy-.")


def validate_fasta(path: str) -> list[str]:
    problems: list[str] = []
    seen: set[str] = set()
    n = 0
    try:
        for rec in fasta.read_records(path):
            n += 1
            if not rec.name:
                problems.append(f"record {n}: empty header")
            if rec.name in seen:
                problems.append(f"record {n}: duplicate header '{rec.name}'")
            seen.add(rec.name)
            if not rec.seq:
                problems.append(f"record {n} ({rec.name}): empty sequence")
            bad = set(rec.seq) - set(_VALID_SEQ)
            if bad:
                problems.append(
                    f"record {n} ({rec.name}): invalid characters "
                    f"{sorted(chr(b) for b in bad)[:5]}"
                )
            if len(problems) > 20:
                problems.append("... (more problems suppressed)")
                break
    except ValueError as e:
        problems.append(str(e))
    if n == 0:
        problems.append("no records found")
    return problems


def validate_fastq(path: str) -> list[str]:
    problems: list[str] = []
    n = 0
    try:
        for rec in fasta.read_records(path):
            n += 1
            if rec.qual is None:
                problems.append(f"record {n}: not FASTQ (no quality line)")
                break
            if len(rec.qual) != len(rec.seq):
                problems.append(
                    f"record {n} ({rec.name}): sequence length {len(rec.seq)} "
                    f"!= quality length {len(rec.qual)}"
                )
            if len(problems) > 20:
                problems.append("... (more problems suppressed)")
                break
    except ValueError as e:
        problems.append(str(e))
    if n == 0:
        problems.append("no records found")
    return problems


def validate_query_file(path: str) -> list[str]:
    if fasta.is_fastq(path):
        return validate_fastq(path)
    return validate_fasta(path)
