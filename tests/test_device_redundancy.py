"""Device per-quotient redundancy filter vs the Python implementation."""

import numpy as np
import pytest

from metabuli_tpu.classify.device_redundancy import (
    device_taxonomy,
    lca_pairs,
    quotient_best,
)
from metabuli_tpu.classify.taxonomer import Taxonomer, TaxonomerParams
from metabuli_tpu.db.taxonomy import Taxonomy


def _taxonomy(tmp_path):
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom")]
    names = {1: "root", 2: "B"}
    tid = 3
    for g in range(3):
        gid = tid; nodes.append((tid, 2, "genus")); names[tid] = f"G{g}"; tid += 1
        for s in range(2):
            sid = tid; nodes.append((tid, gid, "species")); names[tid] = f"S{g}{s}"; tid += 1
            for u in range(2):
                nodes.append((tid, sid, "subspecies")); names[tid] = f"U{g}{s}{u}"; tid += 1
    (tmp_path / "nodes.dmp").write_text("".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (tmp_path / "names.dmp").write_text("".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n" for t, n in names.items()))
    (tmp_path / "merged.dmp").write_text("")
    return Taxonomy.from_dmp(str(tmp_path / "names.dmp"), str(tmp_path / "nodes.dmp"), str(tmp_path / "merged.dmp"))


def test_lca_pairs_device(tmp_path):
    tax = _taxonomy(tmp_path)
    dt = device_taxonomy(tax)
    rng = np.random.default_rng(0)
    a = rng.integers(1, tax.n_nodes() + 1, 200).astype(np.int32)
    b = rng.integers(1, tax.n_nodes() + 1, 200).astype(np.int32)
    got = np.asarray(lca_pairs(dt, a, b))
    want = tax.lca_pairwise(a, b)
    assert np.array_equal(got, want)
    # zero propagation
    assert int(lca_pairs(dt, np.int32(0), np.int32(5))) == 5


@pytest.mark.parametrize("seed,dna_shift", [(0, 3), (1, 3), (2, 9), (3, 9)])
def test_quotient_best_matches_python(tmp_path, seed, dna_shift):
    tax = _taxonomy(tmp_path)
    dt = device_taxonomy(tax)
    tp = TaxonomerParams(syncmer=dna_shift > 3, smer_len=8 - dna_shift // 3)
    assert tp.dna_shift == dna_shift
    py = Taxonomer(tp, tax)
    rng = np.random.default_rng(seed)

    rows = []
    for read in range(20):
        for sp in sorted(rng.choice(range(4, 16, 4), rng.integers(1, 3), replace=False)):
            n = int(rng.integers(1, 30))
            for _ in range(n):
                pos = int(rng.integers(0, 150))
                ham = int(rng.integers(0, 5))
                taxid = int(rng.integers(1, tax.n_nodes() + 1))
                rows.append((read, sp, pos, ham, taxid))
    rows.sort()
    arr = np.array(rows, np.int32)
    m = {"pos": arr[:, 2], "hamming": arr[:, 3], "taxid": arr[:, 4]}

    # python oracle per (read, species)
    want = {}
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and rows[j][0] == rows[i][0] and rows[j][1] == rows[i][1]:
            j += 1
        counts = py._filter_redundant(m, (i, j), 150)
        want[(rows[i][0], rows[i][1])] = counts
        i = j

    res = quotient_best(
        dt, arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4],
        np.ones(len(rows), bool), dna_shift=dna_shift, max_rows=4096,
    )
    got = {}
    n_rows = int(res.n_rows)
    rr = np.asarray(res.row_read)[:n_rows]
    rs = np.asarray(res.row_species)[:n_rows]
    rt = np.asarray(res.row_taxid)[:n_rows]
    for r, s, t in zip(rr, rs, rt):
        d = got.setdefault((int(r), int(s)), {})
        d[int(t)] = d.get(int(t), 0) + 1
    assert got == want


@pytest.mark.parametrize("seed", [0, 2])
def test_quotient_best_tie_compaction(tmp_path, seed):
    """tie_budget > 0 compacts the LCA range queries to genuine tie rows;
    results must equal the full-width (tie_budget=0) path, and n_ties must
    flag truncation for the retry ladder."""
    tax = _taxonomy(tmp_path)
    dt = device_taxonomy(tax)
    rng = np.random.default_rng(seed)
    rows = []
    for read in range(30):
        for sp in sorted(rng.choice(range(4, 16, 4), 2, replace=False)):
            for _ in range(int(rng.integers(5, 40))):
                rows.append((read, sp, int(rng.integers(0, 90)),
                             int(rng.integers(0, 3)),
                             int(rng.integers(1, tax.n_nodes() + 1))))
    rows.sort()
    arr = np.array(rows, np.int32)
    args = (dt, arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4],
            np.ones(len(rows), bool))
    full = quotient_best(*args, dna_shift=3, max_rows=4096)
    tied = quotient_best(*args, dna_shift=3, max_rows=4096,
                         tie_budget=2048)
    n = int(full.n_rows)
    assert int(tied.n_rows) == n
    assert 0 < int(tied.n_ties) <= 2048
    for f in ("row_read", "row_species", "row_taxid"):
        assert np.array_equal(np.asarray(getattr(full, f))[:n],
                              np.asarray(getattr(tied, f))[:n]), f
    # truncation detection: a tie list smaller than the tie count must
    # raise the overflow counter past the budget
    small = quotient_best(*args, dna_shift=3, max_rows=4096, tie_budget=8)
    assert int(small.n_ties) == int(tied.n_ties) > 8
