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


def test_neighbor_kmers_window():
    """--neighbor-kmers collapses adjacent shared k-mers into one edge
    unit (`GroupGenerator.cpp:317-329` suppression window)."""
    import numpy as np

    from metabuli_tpu.readgroup.group import build_read_groups

    rng = np.random.default_rng(5)
    g = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 400))
    # two reads overlapping by 60 bases: the shared metamers sit in one
    # contiguous run
    r1, r2 = g[:200], g[140:340]
    decoy = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 200))
    reads = [r1, r2, decoy]
    # without the window the run counts every shared k-mer -> grouped
    lab0 = build_read_groups(reads, min_shared_kmers=2)
    assert lab0[0] == lab0[1] != lab0[2]
    # a window spanning the whole overlap collapses the run to weight 1,
    # which is below min_shared_kmers=2 -> no longer grouped
    lab1 = build_read_groups(reads, min_shared_kmers=2, neighbor_kmers=200)
    assert lab1[0] != lab1[1]
    # a small window keeps >= 2 separated clusters -> still grouped
    lab2 = build_read_groups(reads, min_shared_kmers=2, neighbor_kmers=3)
    assert lab2[0] == lab2[1]
