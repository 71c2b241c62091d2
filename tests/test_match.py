"""Hamming ops and sorted-table matching vs scalar oracles."""

import numpy as np
import jax.numpy as jnp

from metabuli_tpu.ops.hamming import hamming_all
from metabuli_tpu.ops.match import match_metamers

import ref_impl


def test_hamming_all_matches_reference():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 1 << 24, size=512, dtype=np.int64).astype(np.int32)
    t = rng.integers(0, 1 << 24, size=512, dtype=np.int64).astype(np.int32)
    total, fwd, rev = hamming_all(jnp.asarray(q), jnp.asarray(t))
    total, fwd, rev = np.asarray(total), np.asarray(fwd), np.asarray(rev)
    for i in range(len(q)):
        assert total[i] == ref_impl.hamming_sum_ref(int(q[i]), int(t[i]))
        assert fwd[i] == ref_impl.hammings_ref(int(q[i]), int(t[i]))
        assert rev[i] == ref_impl.hammings_rev_ref(int(q[i]), int(t[i]))


def test_hamming_identical_is_zero():
    x = jnp.asarray(np.arange(100, dtype=np.int32) * 37 % (1 << 24))
    total, fwd, rev = hamming_all(x, x)
    assert not np.any(np.asarray(total))
    assert not np.any(np.asarray(fwd))
    assert not np.any(np.asarray(rev))


def _make_db(rng, n_groups, max_group=6):
    """Random sorted DB with controlled AA-group sizes."""
    aa_keys = np.sort(
        rng.choice(np.arange(1 << 30, dtype=np.uint64), size=n_groups, replace=False)
    )
    values, taxids = [], []
    for g, aa in enumerate(aa_keys):
        for _ in range(int(rng.integers(1, max_group + 1))):
            dna = int(rng.integers(0, 1 << 24))
            values.append((int(aa) << 24) | dna)
            taxids.append(int(rng.integers(1, 50)))
    order = np.argsort(np.array(values, dtype=np.uint64), kind="stable")
    values = np.array(values, dtype=np.uint64)[order]
    taxids = np.array(taxids, dtype=np.uint32)[order]
    # dedup exact duplicates of (value) to keep oracle simple
    uniq = np.concatenate([[True], values[1:] != values[:-1]])
    return values[uniq], taxids[uniq]


def test_match_metamers_vs_oracle():
    rng = np.random.default_rng(3)
    db_values, db_taxids = _make_db(rng, 200)
    tax2species = (np.arange(64, dtype=np.uint32) % 10) + 1

    # queries: half hit existing AA groups, half random
    n_q = 64
    hit_aa = rng.choice(db_values >> np.uint64(24), size=n_q // 2)
    miss_aa = rng.integers(0, 1 << 30, size=n_q - n_q // 2).astype(np.uint64)
    q_aa = np.concatenate([hit_aa, miss_aa])
    q_dna = rng.integers(0, 1 << 24, size=n_q).astype(np.uint64)
    q_values = (q_aa << np.uint64(24)) | q_dna
    q_frames = rng.integers(0, 6, size=n_q).astype(np.int32)
    q_valid = np.ones(n_q, bool)
    q_valid[-3:] = False

    res = match_metamers(
        jnp.asarray(db_values),
        jnp.asarray(db_taxids),
        jnp.asarray(tax2species),
        jnp.asarray(q_values),
        jnp.asarray(q_frames),
        jnp.asarray(q_valid),
        cap=16,
    )
    keep = np.asarray(res.keep)
    taxid = np.asarray(res.taxid)
    species = np.asarray(res.species)
    h16 = np.asarray(res.hamming16)
    hsum = np.asarray(res.hamming_sum)
    dna = np.asarray(res.dna)

    for qi in range(n_q):
        if not q_valid[qi]:
            assert not keep[qi].any()
            continue
        # oracle candidate set: all db entries with equal AA part
        aa = q_values[qi] >> np.uint64(24)
        cand_idx = np.nonzero((db_values >> np.uint64(24)) == aa)[0]
        targets = [int(db_values[i]) for i in cand_idx]
        sel, sums, packed = ref_impl.compare_dna_ref(
            int(q_values[qi]), targets, int(q_frames[qi])
        )
        got = [
            (int(taxid[qi, c]), int(dna[qi, c]), int(hsum[qi, c]), int(h16[qi, c]))
            for c in range(keep.shape[1])
            if keep[qi, c]
        ]
        want = [
            (
                int(db_taxids[cand_idx[s]]),
                int(targets[s] & 0xFFFFFF),
                sums[j],
                packed[j],
            )
            for j, s in enumerate(sel)
        ]
        assert sorted(got) == sorted(want), f"query {qi}"
        # species resolution
        for c in range(keep.shape[1]):
            if keep[qi, c]:
                assert species[qi, c] == tax2species[taxid[qi, c]]


def test_match_overflow_reporting():
    rng = np.random.default_rng(4)
    # one AA group with 30 entries
    aa = np.uint64(12345)
    values = np.sort(((aa << np.uint64(24)) | rng.choice(1 << 24, 30, replace=False).astype(np.uint64)))
    taxids = np.ones(30, dtype=np.uint32)
    res = match_metamers(
        jnp.asarray(values),
        jnp.asarray(taxids),
        jnp.asarray(np.ones(4, np.uint32)),
        jnp.asarray(np.array([(aa << np.uint64(24)) | np.uint64(5)])),
        jnp.asarray(np.zeros(1, np.int32)),
        jnp.asarray(np.ones(1, bool)),
        cap=8,
    )
    assert int(res.n_candidates[0]) == 30  # caller must detect cap overflow
