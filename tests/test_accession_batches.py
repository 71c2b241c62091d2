"""Reference accession-batching rules (`IndexCreator.cpp:735-785`)."""

import numpy as np

from metabuli_tpu.db.build import AccEntry, get_accession_batches


def E(sp, fi, order, length):
    return AccEntry(sp, fi, order, length, taxid=sp, offset=0, end=0)


def test_species_and_fasta_boundaries():
    entries = [E(1, 0, 0, 10), E(2, 0, 1, 10), E(1, 1, 0, 10), E(1, 0, 1, 10)]
    batches = get_accession_batches(entries)
    keys = sorted(
        tuple((e.species, e.fasta_idx) for e in b) for b in batches
    )
    # one batch per (species, fasta) pair; species 1 / fasta 0 holds both
    assert keys == [((1, 0), (1, 0)), ((1, 1),), ((2, 0),)]


def test_sequence_count_cut():
    # post-add cut (IndexCreator.cpp:769: orders.size() > 300 AFTER the
    # append): the 301st sequence lands in the batch that triggers the cut
    entries = [E(1, 0, i, 10) for i in range(650)]
    batches = get_accession_batches(entries)
    assert [len(b) for b in sorted(batches, key=lambda b: -len(b))] == [
        301, 301, 48]


def test_length_sum_cut():
    # 3 x 60 Mbp, post-add: the second sequence pushes the sum past 100 Mbp
    # and stays in that batch (IndexCreator.cpp:763-771)
    entries = [E(1, 0, i, 60_000_000) for i in range(3)]
    batches = get_accession_batches(entries)
    assert sorted(len(b) for b in batches) == [1, 2]


def test_mid_count_length_cut():
    # >100 seqs and >50 Mbp cuts even below the 100 Mbp rule
    entries = [E(1, 0, i, 400_000) for i in range(200)]
    batches = get_accession_batches(entries)
    assert max(len(b) for b in batches) <= 126
    assert sum(len(b) for b in batches) == 200


def test_buffer_kmer_cut_and_length_order():
    entries = [E(1, 0, 0, 3000), E(1, 0, 1, 3000), E(2, 0, 0, 10)]
    batches = get_accession_batches(entries, buffer_kmers=2000)
    # post-add: the second 3000-base sequence pushes the k-mer estimate
    # past the buffer and stays in the cut batch; batches come back in
    # ascending total length
    lens = [sum(e.length for e in b) for b in batches]
    assert lens == sorted(lens)
    assert sorted(len(b) for b in batches) == [1, 2]


def test_order_preserved_within_species():
    rng = np.random.default_rng(0)
    entries = [E(1, 0, i, int(rng.integers(1, 100))) for i in range(40)]
    rng.shuffle(entries)
    batches = get_accession_batches(entries)
    flat = [e.order for b in batches for e in b]
    assert flat == sorted(flat)
