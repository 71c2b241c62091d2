"""Sharded classification on the virtual 8-device CPU mesh: identical
results at 1 and N shards; fused pipeline agrees with the simple match op."""

import numpy as np
import jax
import pytest

from metabuli_tpu.classify.pipeline import classify_batch, matches_to_host
from metabuli_tpu.parallel.mesh import (
    build_sharded_classify,
    make_mesh,
    merge_shard_matches,
    shard_index_aa_aligned,
)


def _db(seed=0, n=8192):
    rng = np.random.default_rng(seed)
    aa = np.sort(rng.choice((1 << 28), size=n // 2, replace=False).astype(np.uint64))
    aa = np.repeat(aa, 2)  # AA groups of size 2
    dna = rng.integers(0, 1 << 24, size=n).astype(np.uint64)
    values = np.sort((aa << np.uint64(24)) | dna)
    taxids = rng.integers(1, 64, size=n).astype(np.int32)
    t2s = (np.arange(64, dtype=np.int32) % 16) + 1
    return values, taxids, t2s


def _reads(seed=1, batch=8, length=120):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=(batch, length)).astype(np.uint8)
    lens = np.full(batch, length, np.int32)
    return codes, lens, np.zeros(batch, np.int32), np.arange(batch, dtype=np.int32)


def _run_single(values, taxids, t2s, codes, lens, offs, qids, cap=8, budget=8192):
    bm = classify_batch(
        values, taxids, t2s, codes, lens, offs, qids, cap=cap, max_matches=budget
    )
    return matches_to_host(bm, np.asarray(t2s, np.int32))


def _run_sharded(values, taxids, t2s, codes, lens, offs, qids, n_db_shards,
                 cap=8, budget=8192):
    mesh = make_mesh(jax.devices(), n_db=n_db_shards)
    db, n_pad, iters = shard_index_aa_aligned(values, taxids, n_db_shards)
    step = build_sharded_classify(
        mesh, n_pad=n_pad, search_iters=iters, cap=cap, max_matches=budget
    )
    out = step(db, t2s, codes, lens, offs, qids)
    return merge_shard_matches(out, len(qids), np.asarray(t2s, np.int32))


def test_device_count():
    assert len(jax.devices()) == 8


def test_fused_pipeline_matches_simple_op():
    """classify_batch (optimized path) vs ops.match.match_metamers."""
    from metabuli_tpu.ops import encode
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded
    from metabuli_tpu.ops.match import match_metamers

    rng = np.random.default_rng(7)
    # DB from a real sequence so queries genuinely hit
    genome = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 5000))
    codes_g, lens_g = encode_seqs_padded([genome])
    mmres = encode.extract_metamers(codes_g, lens_g)
    values = np.unique(np.asarray(mmres.value)[np.asarray(mmres.valid)])
    taxids = (np.arange(len(values)) % 50 + 1).astype(np.uint32)
    t2s = (np.arange(64, dtype=np.uint32) % 10) + 1

    reads = [genome[i * 200 : i * 200 + 150] for i in range(12)]
    codes, lens = encode_seqs_padded(reads, 160)
    offs = np.zeros(len(reads), np.int32)
    qids = np.arange(len(reads), dtype=np.int32)

    m = _run_single(values, taxids.astype(np.int32), t2s.astype(np.int32),
                    codes, lens, offs, qids, cap=8, budget=65536)

    # oracle: simple op over flat queries
    mm = encode.extract_metamers(codes, lens)
    q_values = np.asarray(mm.value).reshape(-1)
    q_valid = np.asarray(mm.valid).reshape(-1)
    q_frames = np.broadcast_to(
        np.arange(6, dtype=np.int32)[None, :, None], mm.value.shape
    ).reshape(-1)
    res = match_metamers(
        values, taxids, t2s, q_values, q_frames, q_valid, cap=8
    )
    keep = np.asarray(res.keep)
    assert m["n_matches"] == int(keep.sum()) > 0
    # compare as multisets of (taxid, dna, hamming, h16)
    got = sorted(zip(m["taxid"], m["dna"], m["hamming"], m["h16"]))
    k_tax = np.asarray(res.taxid)[keep]
    k_dna = np.asarray(res.dna)[keep]
    k_h = np.asarray(res.hamming_sum)[keep]
    k_h16 = np.asarray(res.hamming16)[keep]
    want = sorted(zip(k_tax, k_dna, k_h, k_h16))
    assert got == want


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_equals_single(n_shards):
    values, taxids, t2s = _db()
    codes, lens, offs, qids = _reads()
    single = _run_single(values, taxids, t2s, codes, lens, offs, qids)
    merged = _run_sharded(values, taxids, t2s, codes, lens, offs, qids, n_shards)
    assert merged["n_matches"] == single["n_matches"]
    for key in ("qid", "species", "pos", "taxid", "hamming", "dna", "h16"):
        assert np.array_equal(merged[key], single[key]), key


def test_sharded_mixed_lengths_and_ns():
    """Invalid windows (short reads, Ns) must not match DB shard padding."""
    values, taxids, t2s = _db(seed=9)
    rng = np.random.default_rng(10)
    batch, length = 8, 150
    codes = rng.integers(0, 4, size=(batch, length)).astype(np.uint8)
    codes[0, 30:90] = 7
    codes[1, :] = 7
    lens = np.full(batch, length, np.int32)
    lens[2] = 20
    lens[3] = 60
    offs = np.zeros(batch, np.int32)
    qids = np.arange(batch, dtype=np.int32)
    single = _run_single(values, taxids, t2s, codes, lens, offs, qids)
    merged = _run_sharded(values, taxids, t2s, codes, lens, offs, qids, 4)
    assert merged["n_matches"] == single["n_matches"]


def test_graft_entry_single():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(np.asarray(out.counts)[2]) > 0


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    g.dryrun_multichip(4)
