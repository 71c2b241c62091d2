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
