"""Differential tests: the native Prodigal single-mode port vs the compiled
reference's own ProdigalWrapper (tests/ref_oracle/prodigal_oracle).

Byte-compares the trained model (`_training` contents incl. dicodon and
motif weight tables at %.17g), the fully scored node list, and the raw /
deduplicated gene lists on GC-varied synthetic genomes. This locks the port
(`metabuli_tpu/native/prodigal.cpp`) to `trainASpecies` +
`getPredictedGenes` (`ProdigalWrapper.cpp:54-127,188-240`) bit-for-bit.
"""

import ctypes

import numpy as np
import pytest

from metabuli_tpu.native import get_lib

from helpers import ref_oracle


def _genome(seed: int, n: int, gc: float = 0.5) -> bytes:
    rng = np.random.default_rng(seed)
    p_gc = gc / 2
    p_at = (1 - gc) / 2
    return bytes(
        rng.choice(
            np.frombuffer(b"ACGT", np.uint8), n, p=[p_at, p_gc, p_gc, p_at]
        )
    )


def _genome_with_orfs(seed: int, n: int, gc: float = 0.5) -> bytes:
    """Random genome with planted long ORFs so training finds real genes."""
    rng = np.random.default_rng(seed)
    g = bytearray(_genome(seed, n, gc))
    codons = [b"GCT", b"GAA", b"AAA", b"CTG", b"GGC", b"GAT", b"ATT", b"CGT"]
    i = 100
    while i + 1200 < n:
        orf = bytearray(b"AGGAGG" + b"TATA" + b"ATG")
        for _ in range(rng.integers(150, 350)):
            orf += codons[int(rng.integers(0, len(codons)))]
        orf += b"TAA"
        g[i : i + len(orf)] = orf
        i += len(orf) + int(rng.integers(200, 800))
    return bytes(g)


def _pdg_train(lib, seq: bytes) -> int:
    lib.pdg_train.restype = ctypes.c_int64
    return int(lib.pdg_train(seq, ctypes.c_int64(len(seq))))


def _pdg_dump(lib, h: int, seq: bytes, stage: int) -> str:
    lib.pdg_dump.restype = ctypes.c_int64
    cap = 1 << 24
    buf = ctypes.create_string_buffer(cap)
    n = int(
        lib.pdg_dump(
            ctypes.c_int64(h), seq, ctypes.c_int64(len(seq)),
            ctypes.c_int32(stage), buf, ctypes.c_int64(cap),
        )
    )
    assert 0 <= n < cap - 1
    return buf.value.decode()


def _oracle_dump(train: bytes, target: bytes, stage: int) -> str:
    return ref_oracle.run(
        "prodigal_oracle", [str(stage)],
        train.decode() + "\n" + target.decode() + "\n",
    )


WORLDS = [
    ("orfs-mid-gc", lambda: _genome_with_orfs(11, 120_000, 0.5)),
    ("orfs-high-gc", lambda: _genome_with_orfs(12, 120_000, 0.65)),
    ("random", lambda: _genome(13, 110_000, 0.45)),
]


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


@pytest.mark.parametrize("name,mk", WORLDS, ids=[w[0] for w in WORLDS])
def test_training_matches_reference(lib, name, mk):
    g = mk()
    h = _pdg_train(lib, g)
    try:
        got = _pdg_dump(lib, h, g, 0)
    finally:
        lib.pdg_free(ctypes.c_int64(h))
    want = _oracle_dump(g, g, 0)
    assert got == want


@pytest.mark.parametrize("name,mk", WORLDS, ids=[w[0] for w in WORLDS])
def test_scored_nodes_match_reference(lib, name, mk):
    g = mk()
    target = _genome_with_orfs(99, 60_000, 0.5)
    h = _pdg_train(lib, g)
    try:
        got = _pdg_dump(lib, h, target, 1)
    finally:
        lib.pdg_free(ctypes.c_int64(h))
    want = _oracle_dump(g, target, 1)
    assert got == want


@pytest.mark.parametrize("stage", [2, 3], ids=["raw-genes", "final-genes"])
def test_genes_match_reference(lib, stage):
    train = _genome_with_orfs(21, 130_000, 0.55)
    h = _pdg_train(lib, train)
    try:
        for tseed, tlen in ((31, 80_000), (32, 25_000), (33, 130_000)):
            target = _genome_with_orfs(tseed, tlen, 0.5)
            got = _pdg_dump(lib, h, target, stage)
            want = _oracle_dump(train, target, stage)
            assert got == want, (tseed, tlen)
    finally:
        lib.pdg_free(ctypes.c_int64(h))


def _pdg_predict(lib, h: int, seq: bytes, final_only: int):
    lib.pdg_predict.restype = ctypes.c_int64
    cap = 65536
    b = np.zeros(cap, np.int32)
    e = np.zeros(cap, np.int32)
    st = np.zeros(cap, np.int32)
    n = int(lib.pdg_predict(
        ctypes.c_int64(h), seq, ctypes.c_int64(len(seq)),
        b.ctypes, e.ctypes, st.ctypes, ctypes.c_int64(cap),
        ctypes.c_int32(final_only)))
    assert 0 <= n <= cap
    return [(int(b[i]), int(e[i]), int(st[i])) for i in range(n)]


@pytest.mark.parametrize("target_gc,target_len", [(0.5, 30_000), (0.62, 18_000)])
def test_meta_mode_vs_compiled_reference(tmp_path, target_gc, target_len):
    """Meta-mode machinery differential (`ProdigalWrapper.cpp:129-186,
    217-250`): with the SAME externally-supplied training bins on both
    sides (the reference's 50 real bins are a missing blob — training.cpp
    in .MISSING_LARGE_BLOBS), bin selection and predicted genes must match
    the compiled reference exactly. Bins are synthesized from bit-exact
    single-mode trainings over GC-varied genomes, with a translation-table
    change in the middle to exercise the node-rebuild grouping."""
    import os

    lib = get_lib()
    assert lib is not None
    lib.pdg_meta_load.restype = ctypes.c_int64
    lib.pdg_meta_append.restype = ctypes.c_int64
    lib.pdg_set_trans_table.restype = ctypes.c_int32
    lib.pdg_train_meta.restype = ctypes.c_int64

    bins_path = str(tmp_path / "bins.bin").encode()
    tables = [11, 4, 11]
    for i, gc in enumerate((0.35, 0.5, 0.65)):
        g = _genome_with_orfs(40 + i, 110_000, gc)
        h = _pdg_train(lib, g)
        assert lib.pdg_set_trans_table(
            ctypes.c_int64(h), ctypes.c_int32(tables[i])) == 0
        assert int(lib.pdg_meta_append(bins_path, ctypes.c_int64(h))) == i + 1
        lib.pdg_free(ctypes.c_int64(h))
    assert int(lib.pdg_meta_load(bins_path)) == 3

    target = _genome_with_orfs(77, target_len, target_gc)

    os.environ["METABULI_META_BINS"] = bins_path.decode()
    try:
        want_raw = _oracle_dump(target, target, 4).splitlines()
        want_fin = _oracle_dump(target, target, 5).splitlines()
    finally:
        os.environ.pop("METABULI_META_BINS", None)
    assert want_raw and want_raw[0].startswith("max_phase ")
    oracle_bin = int(want_raw[0].split()[1]) % 3

    out_bin = ctypes.c_int32(-1)
    mh = int(lib.pdg_train_meta(target, ctypes.c_int64(len(target)),
                                ctypes.byref(out_bin)))
    assert mh > 0, f"pdg_train_meta failed: {mh}"
    assert out_bin.value == oracle_bin
    got_raw = _pdg_predict(lib, mh, target, 0)
    got_fin = _pdg_predict(lib, mh, target, 1)
    lib.pdg_free(ctypes.c_int64(mh))

    want_raw_genes = [tuple(map(int, l.split()[1:]))
                      for l in want_raw[1:] if l.startswith("gene ")]
    want_fin_genes = [tuple(map(int, l.split()[1:]))
                      for l in want_fin if l.startswith("gene ")]
    assert len(want_raw_genes) > 0, "oracle predicted no genes"
    assert got_raw == want_raw_genes
    assert got_fin == want_fin_genes
