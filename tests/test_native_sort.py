"""Native parallel argsort == numpy stable lexsort, bit for bit."""

import numpy as np
import pytest

from metabuli_tpu.native import get_lib
from metabuli_tpu.native.sort import argsort_pair, lexsort_vst

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("n", [0, 1, 100, (1 << 15) + 13, 300_000])
def test_argsort_pair_matches_lexsort(n):
    rng = _rng()
    # heavy duplication (stability matters) + full-range values
    k1 = rng.integers(0, 1 << 12, n).astype(np.uint64) << np.uint64(40)
    k2 = rng.integers(0, 50, n).astype(np.uint64)
    got = argsort_pair(k1, k2)
    want = np.lexsort((k2, k1))
    np.testing.assert_array_equal(got, want)


def test_argsort_single_key_stable():
    rng = _rng()
    n = 200_000
    k1 = rng.integers(0, 97, n).astype(np.uint64)  # tiny range: skew path
    got = argsort_pair(k1)
    want = np.argsort(k1, kind="stable")
    np.testing.assert_array_equal(got, want)


def test_argsort_common_prefix_keys():
    # all keys share a long common prefix: the range-derived shift must
    # still fan buckets out instead of collapsing to one
    rng = _rng()
    n = 150_000
    base = np.uint64(0xABCD_EF00_0000_0000)
    k1 = base + rng.integers(0, 1 << 20, n).astype(np.uint64)
    got = argsort_pair(k1, None)
    want = np.argsort(k1, kind="stable")
    np.testing.assert_array_equal(got, want)


def test_argsort_all_equal():
    n = 100_000
    k1 = np.full(n, 42, np.uint64)
    got = argsort_pair(k1)
    np.testing.assert_array_equal(got, np.arange(n))


def test_lexsort_vst_matches_numpy():
    rng = _rng()
    n = 250_000
    values = rng.integers(0, 1 << 24, n).astype(np.uint64)
    species = rng.integers(0, 30, n).astype(np.uint32)
    taxids = rng.integers(0, 300, n).astype(np.uint32)
    got = lexsort_vst(values, species, taxids)
    want = np.lexsort((taxids, species, values))
    np.testing.assert_array_equal(got, want)
