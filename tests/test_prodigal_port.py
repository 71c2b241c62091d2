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
