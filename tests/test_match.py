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


def test_reduced_hamming_matches_reference():
    from metabuli_tpu.ops.hamming import hamming_all_reduced

    rng = np.random.default_rng(11)
    # 4-bit codon fields, values 0..10 per codon
    def pack(rng, n):
        out = np.zeros(n, np.int64)
        for i in range(8):
            out |= rng.integers(0, 11, size=n).astype(np.int64) << (4 * i)
        return out

    q = pack(rng, 512).astype(np.uint32).view(np.int32)
    t = pack(rng, 512).astype(np.uint32).view(np.int32)
    total, fwd, rev = hamming_all_reduced(jnp.asarray(q), jnp.asarray(t))
    total, fwd, rev = np.asarray(total), np.asarray(fwd), np.asarray(rev)
    for i in range(len(q)):
        qi, ti = int(q[i]) & 0xFFFFFFFF, int(t[i]) & 0xFFFFFFFF
        assert total[i] == ref_impl.reduced_hamming_sum_ref(qi, ti)
        assert fwd[i] == ref_impl.reduced_hammings_ref(qi, ti)
        assert rev[i] == ref_impl.reduced_hammings_rev_ref(qi, ti)


def _compare_dna_reduced_ref(query, targets, frame):
    """compareDna with ReducedKmerMatcher overrides (32-bit dna part)."""
    dists = [
        ref_impl.reduced_hamming_sum_ref(query & 0xFFFFFFFF, t & 0xFFFFFFFF)
        for t in targets
    ]
    if not dists:
        return [], [], []
    cutoff = min(min(dists) * 2, 7)
    sel, sums, packed = [], [], []
    for i, (t, d) in enumerate(zip(targets, dists)):
        if d <= cutoff:
            sel.append(i)
            sums.append(d)
            if frame < 3:
                packed.append(
                    ref_impl.reduced_hammings_ref(query & 0xFFFFFFFF, t & 0xFFFFFFFF))
            else:
                packed.append(
                    ref_impl.reduced_hammings_rev_ref(query & 0xFFFFFFFF, t & 0xFFFFFFFF))
    return sel, sums, packed


def test_match_metamers_reduced_vs_oracle():
    rng = np.random.default_rng(21)

    def rand_dna32(n):
        out = np.zeros(n, np.uint64)
        for i in range(8):
            out |= rng.integers(0, 11, size=n).astype(np.uint64) << np.uint64(4 * i)
        return out

    # DB: AA keys in 32 bits, dna in 32 bits
    aa_keys = np.sort(rng.choice(
        np.arange(1 << 20, dtype=np.uint64), size=150, replace=False))
    values, taxids = [], []
    for aa in aa_keys:
        for _ in range(int(rng.integers(1, 6))):
            values.append((int(aa) << 32) | int(rand_dna32(1)[0]))
            taxids.append(int(rng.integers(1, 50)))
    values = np.array(values, np.uint64)
    order = np.argsort(values, kind="stable")
    values, taxids = values[order], np.array(taxids, np.uint32)[order]
    uniq = np.concatenate([[True], values[1:] != values[:-1]])
    values, taxids = values[uniq], taxids[uniq]

    tax2species = (np.arange(64, dtype=np.uint32) % 10) + 1
    n_q = 48
    hit_aa = rng.choice(values >> np.uint64(32), size=n_q // 2)
    miss_aa = rng.integers(0, 1 << 20, size=n_q - n_q // 2).astype(np.uint64)
    q_values = (np.concatenate([hit_aa, miss_aa]) << np.uint64(32)) | rand_dna32(n_q)
    q_frames = rng.integers(0, 6, size=n_q).astype(np.int32)
    q_valid = np.ones(n_q, bool)

    res = match_metamers(
        jnp.asarray(values), jnp.asarray(taxids), jnp.asarray(tax2species),
        jnp.asarray(q_values), jnp.asarray(q_frames), jnp.asarray(q_valid),
        cap=8, reduced=True,
    )
    keep = np.asarray(res.keep)
    taxid = np.asarray(res.taxid)
    hsum = np.asarray(res.hamming_sum)
    h16 = np.asarray(res.hamming16)
    dna = np.asarray(res.dna)
    for qi in range(n_q):
        aa = q_values[qi] >> np.uint64(32)
        cand_idx = np.nonzero((values >> np.uint64(32)) == aa)[0]
        targets = [int(values[i]) for i in cand_idx]
        sel, sums, packed = _compare_dna_reduced_ref(
            int(q_values[qi]), targets, int(q_frames[qi]))
        got = [
            (int(taxid[qi, c]), int(dna[qi, c]) & 0xFFFFFFFF,
             int(hsum[qi, c]), int(h16[qi, c]))
            for c in range(keep.shape[1]) if keep[qi, c]
        ]
        want = [
            (int(taxids[cand_idx[s]]), targets[s] & 0xFFFFFFFF, sums[j], packed[j])
            for j, s in enumerate(sel)
        ]
        assert sorted(got) == sorted(want), f"query {qi}"
