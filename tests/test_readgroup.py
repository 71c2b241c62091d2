"""Read grouping: overlap graph + label propagation."""

import numpy as np

from metabuli_tpu.readgroup.group import (
    DisjointSet,
    build_read_groups,
    propagate_labels,
)


def test_disjoint_set():
    ds = DisjointSet(6)
    ds.union(0, 1)
    ds.union(1, 2)
    ds.union(4, 5)
    labels = ds.labels()
    assert labels[0] == labels[1] == labels[2]
    assert labels[4] == labels[5]
    assert labels[3] not in (labels[0], labels[4])


def test_overlapping_reads_group_together():
    rng = np.random.default_rng(0)
    genome_a = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 2000))
    genome_b = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 2000))
    reads = [
        genome_a[0:150], genome_a[100:250], genome_a[200:350],   # overlapping chain
        genome_b[500:650], genome_b[600:750],                    # second group
        bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 150)),  # loner
    ]
    labels = build_read_groups(reads, min_shared_kmers=2)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]
    assert labels[5] not in (labels[0], labels[3])


def test_propagation():
    labels = np.array([0, 0, 0, 3, 3, 5])
    cls = [101, 101, 0, 0, 202, 0]
    out = propagate_labels(labels, cls)
    assert out == [101, 101, 101, 202, 202, 0]


def test_weighted_propagation():
    from metabuli_tpu.readgroup.group import propagate_labels

    labels = np.array([0, 0, 0, 0])
    cls = [101, 202, 202, 0]
    scores = [0.9, 0.3, 0.3, 0.0]
    # uniform: 202 wins 2:1
    assert propagate_labels(labels, cls)[3] == 202
    # score-weighted: 101 (0.9) beats 202 (0.6)
    assert propagate_labels(labels, cls, scores, weight_mode=1)[3] == 101
    # min-vote-score gates out the 0.3 votes entirely
    assert propagate_labels(labels, cls, scores, weight_mode=1,
                            min_vote_score=0.5)[3] == 101
    # score^2: 101 (0.81) beats 202 (0.18)
    assert propagate_labels(labels, cls, scores, weight_mode=2)[3] == 101


def test_weighted_majority_lca():
    from metabuli_tpu.readgroup.group import weighted_majority_lca

    class FakeTax:
        # 1 <- 2 <- {3, 4}
        parent = np.array([0, 1, 1, 2, 2])

    # split vote between siblings: LCA (2) reaches majority, neither leaf does
    assert weighted_majority_lca([(3, 1.0), (4, 1.0)], FakeTax()) == 2
    # dominant leaf wins outright
    assert weighted_majority_lca([(3, 3.0), (4, 1.0)], FakeTax()) == 3


def test_common_kmer_suppression_behavior():
    """--neighbor-kmers drops query k-mers near common-DB matches before
    pair counting (`GroupGenerator.cpp:349-534`): reads whose only shared
    k-mers sit inside the suppressed window lose their edge."""
    import numpy as np

    from metabuli_tpu.readgroup.group import build_read_groups
    from metabuli_tpu.ops import encode
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    rng = np.random.default_rng(5)
    g = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 400))
    r1, r2 = g[:200], g[140:340]
    decoy = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 200))
    reads = [r1, r2, decoy]
    lab0 = build_read_groups(reads, min_shared_kmers=2)
    assert lab0[0] == lab0[1] != lab0[2]
    # a common-kmer DB holding every metamer of the overlap region plus a
    # window covering the whole read suppresses all shared k-mers
    codes, lens = encode_seqs_padded([g[140:200]], 64)
    mm = encode.extract_metamers(codes, lens)
    common = np.unique(np.asarray(mm.value)[np.asarray(mm.valid)])
    lab1 = build_read_groups(reads, min_shared_kmers=2, neighbor_kmers=300,
                             common_values=common)
    assert lab1[0] != lab1[1]
    # an empty common DB changes nothing
    lab2 = build_read_groups(reads, min_shared_kmers=2, neighbor_kmers=3,
                             common_values=np.zeros(0, np.uint64))
    assert lab2[0] == lab2[1]


def test_suppression_vs_compiled_reference(tmp_path):
    """suppress_common_kmers must keep the EXACT k-mer set the reference's
    GroupGenerator::filterCommonKmers2 keeps (compiled oracle: real
    KmerDbReader over a real diffIdx common DB + the +-neighborKmers merge
    walk, `GroupGenerator.cpp:349-534`)."""
    import subprocess

    import numpy as np

    from helpers import ref_oracle
    from metabuli_tpu.db.formats import write_db_files
    from metabuli_tpu.ops import encode
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded
    from metabuli_tpu.readgroup.group import suppress_common_kmers

    rng = np.random.default_rng(77)
    base = np.array(list(b"ACGT"), np.uint8)
    g = bytes(rng.choice(base, 1200))
    reads = [g[i * 90 : i * 90 + 180] for i in range(10)] + [
        bytes(rng.choice(base, 180)) for _ in range(4)
    ]
    codes, lens = encode_seqs_padded(reads, 192)
    mm = encode.extract_metamers(codes, lens)
    v = np.asarray(mm.value)
    ok = np.asarray(mm.valid)
    pos = np.asarray(mm.pos)
    b, f, w = np.nonzero(ok)
    kmers, rids, poss = v[b, f, w], b.astype(np.int64), pos[b, f, w].astype(
        np.int64)

    # common DB: metamers of a slice of the genome (hits several reads)
    ccodes, clens = encode_seqs_padded([g[200:420]], 224)
    cmm = encode.extract_metamers(ccodes, clens)
    common = np.unique(np.asarray(cmm.value)[np.asarray(cmm.valid)])
    db = tmp_path / "commondb"
    write_db_files(str(db), common,
                   np.ones(len(common), np.uint32), 64)

    taxdir = tmp_path / "tax"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text("1\t|\t1\t|\tno rank\t|\t\t|\n")
    (taxdir / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n")
    (taxdir / "merged.dmp").write_text("")
    (tmp_path / "q.fna").write_text(">r0\nACGT\n")
    outdir = tmp_path / "out"
    outdir.mkdir()

    for nk in (0, 3, 24):
        stdin = "".join(
            f"{int(r) + 1} {int(p)} {int(k):x}\n"
            for k, r, p in zip(kmers, rids, poss))
        res = subprocess.run(
            [ref_oracle.build("group_oracle"), str(tmp_path / "q.fna"),
             str(db), str(taxdir), str(outdir), str(nk)],
            input=stdin, capture_output=True, text=True, timeout=300)
        assert res.returncode == 0, res.stderr[-2000:]
        want = sorted(
            (int(t[1]) - 1, int(t[2]), int(t[3], 16))
            for t in (ln.split() for ln in res.stdout.splitlines())
            if t[0] == "K")
        keep = suppress_common_kmers(kmers, rids, poss, common, nk)
        got = sorted(zip(rids[keep].tolist(), poss[keep].tolist(),
                         kmers[keep].tolist()))
        assert got == want, f"nk={nk}: {len(got)} vs {len(want)} kept"
        if nk == 24:
            # the window must actually drop something in this world
            assert len(got) < len(kmers)
