"""Direct-map search (pass 1 + dmap2 pass 2 + residual) vs classic search.

The direct-probe flow (`pipeline._classify_core` direct_mode) must produce
byte-identical match sets to the bucketed binary search: pass-1 hits via
the dmap u64 probe, pass-2 overflow via the second-hash dmap2 probe, and
dmap2 double collisions via the compacted residual binary search. The
world is sized so ALL three resolution paths are exercised (asserted via
the device counters), mirroring the per-AA-group candidate semantics of
`/root/reference/src/commons/KmerMatcher.cpp:362-406`.
"""

import numpy as np
import pytest

from metabuli_tpu.classify.pipeline import (
    FIELDS,
    build_dev_index,
    classify_batch_indexed,
    matches_to_host,
)
from metabuli_tpu.ops import encode
from metabuli_tpu.ops.genetic_code import encode_seqs_padded


@pytest.fixture(scope="module")
def world():
    """~300k distinct AA groups so the dmap (2^22) gets real multi-group
    slots and dmap2 gets double collisions."""
    rng = np.random.default_rng(202)
    base = np.array(list(b"ACGT"), np.uint8)
    source = [bytes(rng.choice(base, 112)) for _ in range(2000)]
    codes, lens = encode_seqs_padded(source, 112)
    mm = encode.extract_metamers(codes, lens)
    v = np.asarray(mm.value)[np.asarray(mm.valid)]
    values = np.unique(v)
    taxids = (
        (values % np.uint64(37)).astype(np.int64) % 40 + 3
    ).astype(np.int32)
    t2s = np.arange(64, dtype=np.int32)
    reads = source[::7][:300]
    return values, taxids, t2s, reads


def _run(world, direct: bool):
    values, taxids, t2s, reads = world
    import jax.numpy as jnp

    index = build_dev_index(values, taxids)
    codes, lens = encode_seqs_padded(reads, 112)
    offs = np.zeros(len(reads), np.int32)
    qids = np.arange(len(reads), dtype=np.int32)
    kw = {}
    if direct:
        assert index.direct_bits > 0, "world too small for the direct map"
        assert index.direct2_bits > 0, "world too small for dmap2"
        kw = dict(hit_budget=1 << 16, sovf_budget=8192, resid_budget=4096)
    bm = classify_batch_indexed(
        index, jnp.asarray(t2s), codes, lens, offs, qids,
        cap=2, max_matches=1 << 17, **kw,
    )
    return matches_to_host(bm, t2s)


def rows(m):
    return sorted(zip(*(np.asarray(m[k]).tolist() for k in FIELDS)))


def test_direct_equals_classic_with_dmap2(world):
    got = _run(world, direct=True)
    want = _run(world, direct=False)
    # every resolution path must actually run in this world
    assert got["n_hits"] > 0, "no pass-1 hits: world broken"
    assert got["n_sovf"] > 0, "no pass-2 overflow: dmap too empty"
    assert got["n_sovf2"] > 0, "no dmap2 double collisions: resize world"
    assert got["n_hits"] <= (1 << 16) and got["n_sovf"] <= 8192
    assert got["n_sovf2"] <= 4096
    assert got["n_matches"] == want["n_matches"]
    assert rows(got) == rows(want)
