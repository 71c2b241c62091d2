"""Aligned deep-group tier == scattered two-tier gather, byte for byte.

Groups deeper than DEEP_T are padded/aligned at index build
(`DevIndex.deep_w`) so the deep tier fetches a query's whole candidate
window with ONE row descriptor. Match output must be identical to the
scattered cap2 gather (`ovd_budget=0` disables the deep tier on the same
padded index), and padding must be invisible to the classic bucketed
flow too.
"""

import numpy as np
import pytest

from metabuli_tpu.classify.pipeline import (
    DEEP_T,
    build_dev_index,
    classify_batch_indexed,
    matches_to_host,
)
from metabuli_tpu.ops import encode
from metabuli_tpu.ops.genetic_code import encode_seqs_padded


@pytest.fixture(scope="module")
def deep_world():
    """30 wobble-diverged copies of one genome -> AA groups up to ~30 deep."""
    rng = np.random.default_rng(11)
    acgt = np.array(list(b"ACGT"), np.uint8)
    core = rng.choice(acgt, 3000)
    seqs = []
    for _ in range(30):
        c = core.copy()
        w = np.arange(2, 3000, 3)
        m = w[rng.random(len(w)) < 0.15]
        c[m] = acgt[(np.searchsorted(acgt, c[m])
                     + rng.integers(1, 4, len(m))) % 4]
        seqs.append(bytes(c))
    all_v, all_t = [], []
    for si, s in enumerate(seqs):
        codes_g, lens_g = encode_seqs_padded([s])
        mm = encode.extract_metamers(codes_g, lens_g)
        v = np.unique(np.asarray(mm.value)[np.asarray(mm.valid)])
        all_v.append(v)
        all_t.append(np.full(len(v), si + 2, np.int32))
    values = np.concatenate(all_v)
    taxids = np.concatenate(all_t)
    o = np.argsort(values, kind="stable")
    return seqs, values[o], taxids[o]


def _reads(seqs):
    reads = [seqs[i % 30][j * 200:j * 200 + 150]
             for i in range(16) for j in (1, 5)]
    codes, lens = encode_seqs_padded(reads, 152)
    n = len(reads)
    return (codes, lens, np.zeros(n, np.int32),
            np.arange(n, dtype=np.int32))


def test_index_aligns_deep_groups(deep_world):
    _, values, taxids = deep_world
    index = build_dev_index(values, taxids)
    assert index.deep_w > DEEP_T  # world has groups deeper than DEEP_T
    assert index.n % index.deep_w == 0
    # padded rows exist but every group's (start, cnt) excludes them
    assert index.n > len(values)


def test_deep_tier_matches_scattered(deep_world):
    seqs, values, taxids = deep_world
    index = build_dev_index(values, taxids)
    t2s = np.arange(64, dtype=np.int32)
    args = _reads(seqs)
    kw = dict(cap=1, cap2=64, max_matches=1 << 17, hit_budget=16384,
              sovf_budget=8192, resid_budget=4096, ov_budget=8192)
    a = matches_to_host(
        classify_batch_indexed(index, t2s, *args, ovd_budget=8192, **kw),
        t2s)
    b = matches_to_host(
        classify_batch_indexed(index, t2s, *args, ovd_budget=0, **kw),
        t2s)
    assert a["n_matches"] == b["n_matches"] > 0
    assert a["n_ovd"] > 0  # the deep tier actually ran
    assert b["n_ovd"] == 0
    # deep routing shrinks the medium list by exactly the deep rows
    assert a["n_ov"] + a["n_ovd"] == b["n_ov"]
    for k in ("qid", "pos", "dna", "taxid", "hamming", "h16", "frame"):
        assert np.array_equal(a[k], b[k]), k


def test_padded_index_transparent_to_unpadded(deep_world):
    """The SAME world classified through a padding-disabled index must
    produce identical matches (padding rows are structurally invisible)."""
    import os

    seqs, values, taxids = deep_world
    t2s = np.arange(64, dtype=np.int32)
    args = _reads(seqs)
    kw = dict(cap=1, cap2=64, max_matches=1 << 17, hit_budget=16384,
              sovf_budget=8192, resid_budget=4096, ov_budget=8192)
    index = build_dev_index(values, taxids)
    a = matches_to_host(
        classify_batch_indexed(index, t2s, *args, ovd_budget=8192, **kw),
        t2s)
    os.environ["METABULI_TPU_NO_DEEP_ALIGN"] = "1"
    try:
        plain = build_dev_index(values, taxids)
    finally:
        del os.environ["METABULI_TPU_NO_DEEP_ALIGN"]
    assert plain.deep_w == 0 and plain.n == len(values)
    c = matches_to_host(
        classify_batch_indexed(plain, t2s, *args, **kw), t2s)
    assert a["n_matches"] == c["n_matches"]
    for k in ("qid", "pos", "dna", "taxid", "hamming", "h16", "frame"):
        assert np.array_equal(a[k], c[k]), k
