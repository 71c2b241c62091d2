"""Parallel argsort wrappers over the native library (numpy fallback).

The DB build's sort-dedup pass is the single-threaded bottleneck for
multi-GB builds (`IndexCreator`'s equivalent is a parallel Kmer sort);
``mtb_argsort_u64_pair`` replaces ``np.lexsort`` with an OpenMP MSB-radix
+ per-bucket sort that reproduces stable lexsort order exactly (original
index is the final tiebreak).
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import get_lib

_MIN_NATIVE = 1 << 15  # below this, numpy's lexsort overhead is irrelevant


def argsort_pair(k1: np.ndarray, k2: np.ndarray | None = None) -> np.ndarray:
    """Indices sorting by (k1, k2, original position) — i.e. exactly
    ``np.lexsort((k2, k1))`` (or a stable argsort of k1 when k2 is None).

    k1 must be uint64; k2 (optional) is converted to uint64.
    """
    n = len(k1)
    lib = get_lib() if n >= _MIN_NATIVE else None
    if lib is None:
        if k2 is None:
            return np.argsort(k1, kind="stable")
        return np.lexsort((k2, k1))
    k1 = np.ascontiguousarray(k1, np.uint64)
    out = np.empty(n, np.int64)
    if k2 is None:
        k2p = None
    else:
        k2 = np.ascontiguousarray(k2, np.uint64)
        k2p = k2.ctypes
    lib.mtb_argsort_u64_pair(
        k1.ctypes, k2p, ctypes.c_int64(n), out.ctypes
    )
    return out


def lexsort_vst(values: np.ndarray, species: np.ndarray,
                taxids: np.ndarray) -> np.ndarray:
    """``np.lexsort((taxids, species, values))`` for the build's
    (value, species, taxid) order (`Kmer.h:77-87`): species and taxid
    pack into one 64-bit secondary key."""
    if len(values) < _MIN_NATIVE or get_lib() is None:
        return np.lexsort((taxids, species, values))
    k2 = (species.astype(np.uint64) << np.uint64(32)) | taxids.astype(
        np.uint64
    )
    return argsort_pair(values, k2)
