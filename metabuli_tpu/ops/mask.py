"""Low-complexity masking (tantan-style), host-side native call.

Wraps the native HMM masker with the reference's constants
(`/root/reference/src/commons/SeqIterator.cpp:154-175`): maxCycleLength 50,
repeatProb 0.005, repeatEndProb 0.05, offsetProbDecay 0.9, minMaskProb =
--mask-prob (default 0.9). Masked positions become the invalid base code so
metamer windows covering them are skipped — the reference rewrites them to
'N' with the same effect.

The emission matrix follows MMseqs2's nucleotide matrix semantics
(match +2 / mismatch -3, likelihood ratios exp(lambda*score)); exact
bit-parity with the reference's ProbabilityMatrix is tracked in PARITY.md.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native import get_lib
from .genetic_code import INVALID

MAX_CYCLE = 50
REPEAT_PROB = 0.005
REPEAT_END_PROB = 0.05
DECAY = 0.9
MATCH_SCORE = 2.0
MISMATCH_SCORE = -3.0


def mask_bytes(seq: bytes, min_mask_prob: float = 0.9) -> bytes:
    """Whole-sequence byte-level mask: repetitive positions become b'N'.

    The reference masks the ENTIRE (strand-corrected) sequence once and
    then cuts CDS / extended-ORF blocks out of the masked copy
    (`IndexCreator.cpp:1082-1099,1196-1203`) — tantan posteriors depend on
    the surrounding context, so masking a block after cutting diverges."""
    from .genetic_code import encode_seq

    lib = get_lib()
    if lib is None:
        return seq
    codes = np.ascontiguousarray(encode_seq(seq), np.uint8)
    out_mask = np.zeros(len(codes), np.uint8)
    lib.tantan_mask(
        codes.ctypes, ctypes.c_int64(len(codes)), ctypes.c_int32(MAX_CYCLE),
        ctypes.c_double(REPEAT_PROB), ctypes.c_double(REPEAT_END_PROB),
        ctypes.c_double(DECAY), ctypes.c_double(min_mask_prob),
        ctypes.c_double(MATCH_SCORE), ctypes.c_double(MISMATCH_SCORE),
        out_mask.ctypes,
    )
    arr = np.frombuffer(seq, np.uint8).copy()
    arr[out_mask == 1] = ord("N")
    return arr.tobytes()


def mask_codes(codes: np.ndarray, min_mask_prob: float = 0.9) -> np.ndarray:
    """Return a copy of a 1-D base-code array with repetitive positions set
    to the invalid code. No-op (with a one-time warning) if the native
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        if not getattr(mask_codes, "_warned", False):
            print("[metabuli_tpu] native masker unavailable; masking skipped")
            mask_codes._warned = True
        return codes
    codes = np.ascontiguousarray(codes, np.uint8)
    out_mask = np.zeros(len(codes), np.uint8)
    lib.tantan_mask(
        codes.ctypes, ctypes.c_int64(len(codes)), ctypes.c_int32(MAX_CYCLE),
        ctypes.c_double(REPEAT_PROB), ctypes.c_double(REPEAT_END_PROB),
        ctypes.c_double(DECAY), ctypes.c_double(min_mask_prob),
        ctypes.c_double(MATCH_SCORE), ctypes.c_double(MISMATCH_SCORE),
        out_mask.ctypes,
    )
    masked = codes.copy()
    masked[out_mask == 1] = INVALID
    return masked
