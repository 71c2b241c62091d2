"""Native gene-prediction module: xxh64 parity, min-hash semantics,
extended-ORF behavior, end-to-end block extraction."""

import numpy as np
import pytest

try:
    from metabuli_tpu.db.genes import GenePredictor, revcomp
    _HAVE = GenePredictor() is not None
except Exception:
    _HAVE = False

pytestmark = pytest.mark.skipif(not _HAVE, reason="native lib unavailable")


def _rand_dna(rng, n):
    return bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), n))


def test_xxh64_matches_official():
    import ctypes
    import xxhash

    from metabuli_tpu.native import get_lib

    lib = get_lib()
    lib.gp_xxh64.restype = ctypes.c_uint64
    rng = np.random.default_rng(0)
    for n in (0, 1, 3, 4, 7, 8, 23, 24, 31, 32, 33, 100, 1000):
        s = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        got = lib.gp_xxh64(s, ctypes.c_int64(n), ctypes.c_uint64(0))
        assert got == xxhash.xxh64(s, seed=0).intdigest(), n


def test_minhash_matches_reference_semantics():
    """Bottom-3000 sketch with the UINT64_MAX sentinel
    (SeqIterator::getMinHashList, SeqIterator.cpp:88-112)."""
    import xxhash

    rng = np.random.default_rng(1)
    seq = _rand_dna(rng, 2000)
    gp = GenePredictor()
    got = gp.minhash(seq)

    # oracle: literal replay (max-heap keeping smallest, sentinel start)
    import heapq

    heap = [-(2**64 - 1)]  # python heapq is a min-heap; store negatives
    que_len = 0
    for i in range(len(seq) - 23):
        h = xxhash.xxh64(seq[i : i + 24], seed=0).intdigest()
        if h < -heap[0]:
            if que_len < 3000:
                heapq.heappush(heap, -h)
                que_len += 1
            else:
                heapq.heapreplace(heap, -h)
    want = np.array(sorted(-x for x in heap), np.uint64)
    assert np.array_equal(got, want)


def test_strandedness_check():
    rng = np.random.default_rng(2)
    g = _rand_dna(rng, 5000)
    gp = GenePredictor()
    gp.train(g)
    assert gp.same_strand(g)
    assert not gp.same_strand(revcomp(g))
    # an unrelated sequence is not "same strand" either
    assert not gp.same_strand(_rand_dna(rng, 5000))


def test_extended_orfs_edge_cases():
    rng = np.random.default_rng(3)
    gp = GenePredictor()
    # random sequence: predictor finds ~no genes -> whole-seq forward block
    seq = _rand_dna(rng, 1500)
    gp.train(seq)
    bs, be, bt = gp.extended_orfs(seq)
    assert len(bs) >= 1
    total = sum(int(be[i]) - int(bs[i]) + 1 for i in range(len(bs)))
    assert total >= 0.5 * len(seq)
    for i in range(len(bs)):
        assert 0 <= bs[i] <= be[i] < len(seq)
        assert bt[i] in (1, -1)


def test_predictor_finds_implanted_genes():
    rng = np.random.default_rng(4)
    aa_codons = [b"GCT", b"GAA", b"AAA", b"CTG", b"GAT", b"ATT", b"GGT", b"CGT"]

    def make_gene(n):
        return (b"ATG" + b"".join(
            aa_codons[int(rng.integers(0, len(aa_codons)))]
            for _ in range(n)) + b"TAA")

    parts, truth, pos = [], [], 0
    for i in range(10):
        inter = _rand_dna(rng, 140)
        parts.append(inter)
        pos += len(inter)
        g = make_gene(150)
        if i % 2:
            g = revcomp(g)
        truth.append((pos, pos + len(g) - 1, -1 if i % 2 else 1))
        parts.append(g)
        pos += len(g)
    genome = b"".join(parts)
    gp = GenePredictor()
    gp.train(genome)
    b, e, s = gp.predict(genome)
    hits = 0
    for tb, te, st in truth:
        for i in range(len(b)):
            ov = min(te, int(e[i]) - 1) - max(tb, int(b[i]) - 1) + 1
            if ov > 0.8 * (te - tb + 1) and int(s[i]) == st:
                hits += 1
                break
    assert hits >= 8, hits


def test_native_fastx_parity(tmp_path):
    """Native block reader == Python parser on FASTA/FASTQ/gzip."""
    import gzip

    from metabuli_tpu.io import fasta

    rng = np.random.default_rng(9)
    fa = tmp_path / "t.fna"
    with open(fa, "w") as fh:
        for i in range(500):
            seq = "".join(rng.choice(list("ACGT"), int(rng.integers(50, 300))))
            fh.write(f">r{i} comment {i}\n")
            for j in range(0, len(seq), 60):
                fh.write(seq[j : j + 60] + "\n")
    fq = tmp_path / "t.fq"
    with open(fq, "w") as fh:
        for i in range(500):
            seq = "".join(rng.choice(list("ACGT"), 150))
            fh.write(f"@q{i}/1\n{seq}\n+\n{'I' * 150}\n")
    fagz = tmp_path / "t.fna.gz"
    with open(fa, "rb") as src, gzip.open(fagz, "wb") as dst:
        dst.write(src.read())

    for path in (fa, fq, fagz):
        nat = list(fasta._read_records_native(str(path)))
        py = list(fasta._read_records_py(str(path)))
        assert len(nat) == len(py)
        for a, b in zip(nat, py):
            assert (a.name, a.comment, a.seq, a.qual) == \
                (b.name, b.comment, b.seq, b.qual)
