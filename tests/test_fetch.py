"""start_fetch/fetched_to_host must equal matches_to_host exactly.

The sliced-async transfer path is what the classifier's depth-2 pipeline
uses to overlap D2H with the previous batch's host taxonomer; it must be a
pure refactoring of the blocking matches_to_host drain.
"""

import numpy as np
import pytest

from metabuli_tpu.classify.pipeline import (
    FIELDS,
    classify_batch,
    fetched_to_host,
    matches_to_host,
    prefetch_counts,
    start_fetch,
)
from metabuli_tpu.ops import encode
from metabuli_tpu.ops.genetic_code import encode_seqs_padded


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(5)
    genomes = [
        (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 2000)), 3 + g)
        for g in range(6)
    ]
    all_v, all_t = [], []
    for seq, t in genomes:
        codes, lens = encode_seqs_padded([seq])
        mm = encode.extract_metamers(codes, lens)
        v = np.asarray(mm.value)[np.asarray(mm.valid)]
        all_v.append(v)
        all_t.append(np.full(len(v), t, np.uint32))
    values = np.concatenate(all_v)
    taxids = np.concatenate(all_t)
    order = np.lexsort((taxids, values))
    values, taxids = values[order], taxids[order]
    ng = np.ones(len(values), bool)
    ng[1:] = (values[1:] != values[:-1]) | (taxids[1:] != taxids[:-1])
    values, taxids = values[ng], taxids[ng].astype(np.int32)
    reads = []
    for i in range(24):
        g, _ = genomes[i % len(genomes)]
        st = int(rng.integers(0, len(g) - 150))
        reads.append(g[st : st + 150])
    t2s = np.arange(32, dtype=np.int32)
    return values, taxids, t2s, reads


@pytest.mark.parametrize("pack4", [False, True])
@pytest.mark.parametrize("sort_device", [False, True])
def test_fetch_equals_blocking_drain(world, pack4, sort_device):
    values, taxids, t2s, reads = world
    codes, lens = encode_seqs_padded(reads, 160)
    offs = np.zeros(len(reads), np.int32)
    qids = np.arange(len(reads), dtype=np.int32)
    kw = dict(cap=32, max_matches=1 << 16, sort_device=sort_device,
              pack4=pack4)
    bm = classify_batch(values, taxids, t2s, codes, lens, offs, qids, **kw)
    m_ref = matches_to_host(bm, t2s, sorted_rows=sort_device)
    assert m_ref["n_matches"] > 0

    bm2 = classify_batch(values, taxids, t2s, codes, lens, offs, qids, **kw)
    prefetch_counts(bm2)
    fetch = start_fetch(bm2)
    m = fetched_to_host(fetch, t2s, sorted_rows=sort_device)

    for k in FIELDS + ("n_matches", "n_over_cap", "total_kmers", "n_ov",
                       "sorted"):
        np.testing.assert_array_equal(m[k], m_ref[k], err_msg=k)


def test_fetch_empty(world):
    values, taxids, t2s, _ = world
    # reads of pure N yield no valid metamers -> zero matches
    reads = [b"N" * 150 for _ in range(4)]
    codes, lens = encode_seqs_padded(reads, 160)
    offs = np.zeros(len(reads), np.int32)
    qids = np.arange(len(reads), dtype=np.int32)
    bm = classify_batch(values, taxids, t2s, codes, lens, offs, qids,
                        cap=8, max_matches=1 << 12)
    fetch = start_fetch(bm)
    m = fetched_to_host(fetch, t2s)
    assert m["n_matches"] == 0
    assert len(m["qid"]) == 0
