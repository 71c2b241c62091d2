"""Small expert utilities: editNames, createnewtaxalist, printDeltaIdx,
gradeByCladeSize, query2reference.

Each mirrors the same-named reference command (`/root/reference/src/util/`).
"""

from __future__ import annotations

import os

import numpy as np

from ..db.formats import delta_decode
from ..db.index import load_db_taxonomy
from .grade import read_answer_sheet, read_classifications


def edit_names(names_dmp: str, taxid_map: str) -> int:
    """Fix taxonkit-generated names.dmp for GTDB: replace bare assembly
    *numbers* with the full assembly accession
    (`/root/reference/src/util/editNames.cpp`). Rewrites in place."""
    number2assacc: dict[str, str] = {}
    with open(taxid_map) as fh:
        for line in fh:
            assacc, _, _ = line.rstrip("\n").partition("\t")
            if "_" in assacc:
                number = assacc.split("_", 1)[1].split(".")[0]
                number2assacc[number] = assacc
    out_lines = []
    changed = 0
    with open(names_dmp) as fh:
        for line in fh:
            parts = line.split("\t")
            if len(parts) >= 3:
                name = parts[2]
                key = name.split(".")[0]
                if key in number2assacc:
                    parts[2] = number2assacc[key]
                    changed += 1
            out_lines.append("\t".join(parts))
    with open(names_dmp, "w") as fh:
        fh.writelines(out_lines)
    return changed


def create_new_taxa_list(library_dir: str, taxid_map: str, out_path: str = "") -> str:
    """Produce a --new-taxa TSV (taxid, parent, rank, name) for assemblies
    whose taxid is not yet in the taxonomy
    (`/root/reference/src/util/createnewtaxalist.cpp` capability)."""
    out_path = out_path or os.path.join(library_dir, "newtaxa.tsv")
    rows = []
    with open(taxid_map) as fh:
        for line in fh:
            cols = line.rstrip("\n").split("\t")
            if len(cols) >= 2 and cols[1].lstrip("-").isdigit():
                # assembly accession gets a new leaf under its mapped taxid
                rows.append((cols[0], int(cols[1])))
    with open(out_path, "w") as fh:
        next_id = 9_000_000_000
        for name, parent in rows:
            fh.write(f"{next_id}\t{parent}\tsubspecies\t{name}\n")
            next_id += 1
    return out_path


def print_delta_idx(diff_idx_path: str, n: int = 20) -> list[int]:
    stream = np.fromfile(diff_idx_path, dtype=np.uint16)
    values = delta_decode(stream)
    return [int(v) for v in values[:n]]


def query2reference(classifications: str, acc2taxid_path: str, out_path: str) -> int:
    """Map classified reads back to reference accessions sharing their taxid
    (`/root/reference/src/util/query2reference.cpp` capability)."""
    from ..db.build import read_acc2taxid

    acc2taxid = read_acc2taxid(acc2taxid_path)
    taxid2accs: dict[int, list[str]] = {}
    for acc, taxid in acc2taxid.items():
        taxid2accs.setdefault(taxid, []).append(acc)
    n = 0
    with open(classifications) as fh, open(out_path, "w") as out:
        for line in fh:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 3 or cols[0] != "1":
                continue
            accs = taxid2accs.get(int(cols[2]), [])
            out.write(f"{cols[1]}\t{cols[2]}\t{','.join(sorted(set(accs))[:5])}\n")
            n += 1
    return n


def grade_by_clade_size(
    classifications: str,
    answer_sheet: str,
    db_dir: str,
    rank: str = "species",
    bins=(1, 2, 5, 10, 100),
) -> dict:
    """Accuracy stratified by how many answer-sheet reads each true clade
    has (`/root/reference/src/util/gradeByCladeSize.cpp` capability)."""
    from ..db.taxonomy import rank_index

    tax = load_db_taxonomy(db_dir)
    answers = read_answer_sheet(answer_sheet)
    shots = read_classifications(classifications)

    clade_sizes: dict[int, int] = {}
    target_at: dict[str, int] = {}
    for read, target_org in answers.items():
        t = tax.to_internal(target_org)
        if t < 0:
            continue
        at = tax.at_rank(t, rank)
        target_at[read] = at
        clade_sizes[at] = clade_sizes.get(at, 0) + 1

    r_idx = rank_index(rank)
    result = {}
    edges = list(bins) + [float("inf")]
    for lo, hi in zip(edges[:-1], edges[1:]):
        tp = fp = fn = total = 0
        for read, at in target_at.items():
            size = clade_sizes.get(at, 0)
            if not (lo <= size < hi):
                continue
            if rank_index(tax.rank_of(at)) > r_idx:
                continue
            shot_org = shots.get(read, 0)
            shot = tax.to_internal(shot_org) if shot_org > 0 else 0
            if shot <= 1:
                fn += 1
                total += 1
                continue
            shot_at = tax.at_rank(shot, rank)
            total += 1
            if shot_at == at:
                tp += 1
            else:
                fp += 1
        label = f"[{lo},{'inf' if hi == float('inf') else hi})"
        precision = tp / (tp + fp) if tp + fp else 0.0
        sensitivity = tp / total if total else 0.0
        result[label] = {
            "total": total, "TP": tp, "FP": fp, "FN": fn,
            "precision": precision, "sensitivity": sensitivity,
        }
    return result
