"""Chunked (out-of-core) DB streaming equals single-pass classification."""

import numpy as np

from metabuli_tpu.classify.chunked import ChunkedIndex, classify_batch_chunked
from metabuli_tpu.classify.pipeline import classify_batch, matches_to_host


def _db(seed=0, n=16384):
    rng = np.random.default_rng(seed)
    aa = np.sort(rng.choice((1 << 28), size=n // 2, replace=False).astype(np.uint64))
    aa = np.repeat(aa, 2)
    dna = rng.integers(0, 1 << 24, size=n).astype(np.uint64)
    values = np.sort((aa << np.uint64(24)) | dna)
    taxids = rng.integers(1, 64, size=n).astype(np.int32)
    t2s = (np.arange(64, dtype=np.int32) % 16) + 1
    return values, taxids, t2s


def test_chunked_equals_single():
    values, taxids, t2s = _db()
    rng = np.random.default_rng(1)
    B = 8
    codes = rng.integers(0, 4, size=(B, 150)).astype(np.uint8)
    lens = np.full(B, 150, np.int32)
    offs = np.zeros(B, np.int32)
    qids = np.arange(B, dtype=np.int32)

    bm = classify_batch(values, taxids, t2s, codes, lens, offs, qids,
                        cap=8, max_matches=8192)
    single = matches_to_host(bm, t2s)

    # force 4 chunks via a tiny budget
    chunked = ChunkedIndex(values, taxids, hbm_budget_bytes=len(values) * 6)
    assert chunked.n_chunks >= 3
    merged = classify_batch_chunked(
        chunked, t2s, t2s, codes, lens, offs, qids, cap=8, max_matches=8192
    )
    assert merged["n_matches"] == single["n_matches"]
    for key in ("qid", "species", "pos", "taxid", "hamming", "dna", "h16"):
        assert np.array_equal(merged[key], single[key]), key


def test_classifier_chunked_end_to_end(tmp_path):
    """Classifier with a tiny max_ram forces the chunked path and still
    classifies correctly."""
    import os
    from metabuli_tpu.classify.classifier import Classifier
    from metabuli_tpu.db.build import build_database
    from metabuli_tpu.params import BuildParams, ClassifyParams

    rng = np.random.default_rng(9)
    genome = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 3000))
    taxdir = tmp_path / "taxonomy"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n4\t|\t2\t|\tspecies\t|\n")
    (taxdir / "names.dmp").write_text(
        "".join(f"{t}\t|\tN{t}\t|\t\t|\tscientific name\t|\n" for t in (1, 2, 4)))
    (taxdir / "merged.dmp").write_text("")
    fa = tmp_path / "g.fna"
    fa.write_text(f">ACC_X.1\n{genome.decode()}\n")
    (tmp_path / "lib.txt").write_text(str(fa) + "\n")
    (tmp_path / "map.tsv").write_text("accession\taccession.version\ttaxid\tgi\nACC_X\tACC_X.1\t4\t0\n")
    db = str(tmp_path / "db")
    build_database(db, str(tmp_path / "lib.txt"), str(tmp_path / "map.tsv"),
                   str(taxdir), BuildParams(gene_prediction=0))

    reads = [genome[i * 150 : i * 150 + 150] for i in range(10)]
    q = tmp_path / "r.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))

    par = ClassifyParams(seq_mode=1, batch_reads=16)
    par.max_ram = 0  # force chunking (budget 0 -> per-entry chunks clamp)
    par.max_ram = 1
    clf = Classifier(db, par)
    # force multi-chunk regardless of DB size
    from metabuli_tpu.classify.chunked import ChunkedIndex
    clf.chunked_index = ChunkedIndex(
        clf.index.values, clf.index.taxids.astype(np.int32),
        hbm_budget_bytes=len(clf.index.values) * 6,
    )
    clf.dev_index = None
    assert clf.chunked_index.n_chunks >= 3
    out = str(tmp_path / "out")
    summary = clf.classify_file(str(q), None, out, "cj")
    assert summary["classified"] >= 9
    lines = open(os.path.join(out, "cj_classifications.tsv")).read().splitlines()
    assert sum(1 for ln in lines[1:] if ln.split("\t")[2] == "4") >= 9
