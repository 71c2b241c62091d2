"""`validatedb`: database file presence + k-mer count consistency.

Mirrors `/root/reference/src/util/validateDatabase.cpp:17-143`: required
files exist, and the number of MSB-terminated deltas in diffIdx equals the
number of info entries.
"""

from __future__ import annotations

import os

import numpy as np

from ..db.formats import count_deltas

REQUIRED = ["diffIdx", "info", "split", "taxID_list", "db.parameters"]


def validate_database(db_dir: str) -> list[str]:
    problems: list[str] = []
    for name in REQUIRED:
        if not os.path.exists(os.path.join(db_dir, name)):
            problems.append(f"missing file: {name}")
    tax_ok = (
        os.path.exists(os.path.join(db_dir, "taxonomyDB.npz"))
        or os.path.isdir(os.path.join(db_dir, "taxonomy"))
    )
    if not tax_ok:
        problems.append("missing taxonomy (taxonomyDB.npz or taxonomy/)")
    diff_path = os.path.join(db_dir, "diffIdx")
    info_path = os.path.join(db_dir, "info")
    if os.path.exists(diff_path) and os.path.exists(info_path):
        stream = np.fromfile(diff_path, dtype=np.uint16)
        n_values = count_deltas(stream)
        n_info = os.path.getsize(info_path) // 4
        if n_values != n_info:
            problems.append(
                f"k-mer count mismatch: diffIdx has {n_values}, info has {n_info}"
            )
    return problems
