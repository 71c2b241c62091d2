"""Scalar reference implementations used as test oracles.

These are independent Python state machines implementing the *semantics*
documented from the reference scanners/matcher (file:line citations in each
function). They intentionally mirror the sequential control flow so the
vectorized device ops in metabuli_tpu.ops can be validated against them on
random inputs.
"""

from __future__ import annotations

import numpy as np

from metabuli_tpu.ops.genetic_code import CHAR_CODE, CHAR_CODE_RC, codon_tables
from metabuli_tpu.ops.hamming import HAMMING_SUM_LUT, PACKED_LUT_HI, PACKED_LUT_LO

UINT64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def max_covered_length(length: int) -> int:
    """`/root/reference/src/commons/LocalUtil.h:51-59`."""
    if length % 3 == 2:
        return length - 2
    if length % 3 == 1:
        return length - 4
    return length - 3


def _codon_codes(seq: bytes, start: int, end: int, forward: bool,
                 reduced: bool = False):
    """Yield per-codon (aa, codon_number) exactly like MetamerScanner reads
    them (`KmerScanner.h:82-117`): forward reads chars start+3i..+2, reverse
    reads chars end-3i, end-3i-1, end-3i-2 through the complement table."""
    aa_tab, num_tab = codon_tables(reduced)
    aa_len = (end - start + 1) // 3
    out = []
    for i in range(aa_len):
        if forward:
            ci = start + i * 3
            chars = [seq[ci + d] if 0 <= ci + d < len(seq) else 0 for d in (0, 1, 2)]
            codes = [CHAR_CODE[c] for c in chars]
        else:
            ci = end - i * 3
            chars = [seq[ci - d] if 0 <= ci - d < len(seq) else 0 for d in (0, 1, 2)]
            codes = [CHAR_CODE_RC[c] for c in chars]
        if any(c > 3 for c in codes):
            out.append((-1, -1))
        else:
            idx = codes[0] * 16 + codes[1] * 4 + codes[2]
            out.append((int(aa_tab[idx]), int(num_tab[idx])))
    return out


def scan_metamers(seq: bytes, start: int, end: int, forward: bool,
                  reduced: bool = False):
    """MetamerScanner::next loop (`KmerScanner.h:82-117`). Returns
    [(value, pos)] for one frame. ``reduced`` uses the coherent 16-letter
    layout (4-bit AAs + 4-bit codon numbers, AA part at bits 63..32;
    `SeqIterator.cpp:29-43`, `ReducedKmerMatcher.h:63-66`)."""
    codons = _codon_codes(seq, start, end, forward, reduced)
    bits_aa = 4 if reduced else 5
    bits_num = 4 if reduced else 3
    aa_shift = 32 if reduced else 24
    aa_mask = (1 << (32 if reduced else 40)) - 1
    aa_len = len(codons)
    results = []
    for p in range(aa_len - 7):
        window = codons[p : p + 8]
        if any(aa < 0 for aa, _ in window):
            continue
        aa_part = 0
        dna_part = 0
        for aa, num in window:
            aa_part = (aa_part << bits_aa) | aa
            dna_part = (dna_part << bits_num) | num
        value = ((aa_part & aa_mask) << aa_shift) | (
            dna_part & ((1 << aa_shift) - 1)
        )
        if forward:
            pos = start + p * 3
        else:
            pos = end - (p + 8) * 3 + 1
        results.append((value, pos))
    return results


def scan_old_metamers(seq: bytes, start: int, end: int, forward: bool):
    """OldMetamerScanner semantics (`KmerScanner.h:120-182`): base-21
    little-endian amino-acid packing, little-endian codon numbers."""
    # The old scanner walks the *other* direction but covers the same codon
    # windows; expressed per left-window q:
    codons = _codon_codes(seq, start, end, forward)
    aa_len = len(codons)
    results = []
    for q in range(aa_len - 7):
        window = codons[q : q + 8]
        if any(aa < 0 for aa, _ in window):
            continue
        aa_part = 0
        dna_part = 0
        for j, (aa, num) in enumerate(window):
            aa_part += aa * 21**j
            dna_part |= num << (3 * j)
        value = ((aa_part & ((1 << 40) - 1)) << 24) | (dna_part & 0xFFFFFF)
        if forward:
            pos = start + q * 3
        else:
            pos = end - (q + 8) * 3 + 1
        results.append((value, pos))
    return results


def scan_syncmers(seq: bytes, start: int, end: int, forward: bool, smer_len: int):
    """Literal replay of the SyncmerScanner::next state machine
    (`SyncmerScanner.h:36-102`): monotonic deque over s-mers, N-skip jumps,
    running aaPart/dnaPart shifted in by `shifts` codons per emission.
    Used to validate the vectorized closed form (first-min-at-anchor)."""
    codons = _codon_codes(seq, start, end, forward)
    aa_len = len(codons)
    s = smer_len
    smask = (1 << (5 * s)) - 1
    results = []

    pos_start = 0
    loaded = 0
    smer_cnt = 0
    smer = 0
    prev_pos = -8
    aa_part = 0
    dna_part = 0
    dq: list[tuple[int, int]] = []  # (value, pos)

    while True:
        found = False
        while pos_start <= aa_len - 8 and not found:
            saw_n = False
            if smer_cnt > 0:
                smer_cnt -= 1
            while smer_cnt < 8 - s + 1:
                if loaded == s:
                    loaded -= 1
                while loaded < s:
                    aa = codons[pos_start + smer_cnt + loaded][0]
                    if aa < 0:
                        saw_n = True
                        break
                    smer = (smer << 5) | aa
                    loaded += 1
                if saw_n:
                    break
                smer &= smask
                while dq and dq[-1][0] > smer:
                    dq.pop()
                dq.append((smer, pos_start + smer_cnt))
                smer_cnt += 1
            if saw_n:
                pos_start += smer_cnt + loaded + 1
                prev_pos = pos_start - 8
                dq.clear()
                smer_cnt = loaded = 0
                smer = 0
                continue
            if dq and dq[0][1] < pos_start:
                dq.pop(0)
            if dq and dq[0][1] in (pos_start, pos_start + 8 - s):
                shifts = pos_start - prev_pos
                for i in range(shifts):
                    aa, num = codons[prev_pos + 8 + i]
                    aa_part = (aa_part << 5) | aa
                    dna_part = (dna_part << 3) | num
                prev_pos = pos_start
                found = True
            pos_start += 1
        if not found:
            return results
        value = ((aa_part & ((1 << 40) - 1)) << 24) | (dna_part & 0xFFFFFF)
        if forward:
            pos = start + prev_pos * 3
        else:
            pos = end - (prev_pos + 8) * 3 + 1
        results.append((value, pos))


def extract_all_frames(seq: bytes, syncmer=False, smer_len=5, old=False,
                       reduced=False):
    """fillQueryKmerBuffer frame loop (`KmerExtractor.cpp:342-373`)."""
    L = len(seq)
    used = max_covered_length(L)
    out = []  # (value, pos, frame)
    if used < 24:
        return out
    for frame in range(6):
        forward = frame < 3
        if forward:
            begin = frame % 3
        else:
            begin = (L % 3) - (frame % 3)
            if begin < 0:
                begin += 3
        if syncmer:
            kmers = scan_syncmers(seq, begin, begin + used - 1, forward, smer_len)
        elif old:
            kmers = scan_old_metamers(seq, begin, begin + used - 1, forward)
        else:
            kmers = scan_metamers(seq, begin, begin + used - 1, forward, reduced)
        for value, pos in kmers:
            out.append((value, pos, frame))
    return out


def hamming_sum_ref(q_dna: int, t_dna: int) -> int:
    s = 0
    for i in range(8):
        s += HAMMING_SUM_LUT[(q_dna >> (3 * i)) & 7][(t_dna >> (3 * i)) & 7]
    return int(s)


def hammings_ref(q_dna: int, t_dna: int) -> int:
    h = 0
    for i in range(8):
        tab = PACKED_LUT_HI if i == 7 else PACKED_LUT_LO
        h |= int(tab[(q_dna >> (3 * i)) & 7][(t_dna >> (3 * i)) & 7]) << (2 * i)
    return h


def hammings_rev_ref(q_dna: int, t_dna: int) -> int:
    h = 0
    for i in range(8):
        tab = PACKED_LUT_HI if i == 0 else PACKED_LUT_LO
        h |= int(tab[(q_dna >> (3 * i)) & 7][(t_dna >> (3 * i)) & 7]) << (2 * (7 - i))
    return h


def compare_dna_ref(query: int, targets: list[int], frame: int, kmer_format=2):
    """compareDna (`KmerMatcher.cpp:1117-1146`): returns (selected indices,
    hamming sums, packed hammings)."""
    dists = [hamming_sum_ref(query & 0xFFFFFF, t & 0xFFFFFF) for t in targets]
    if not dists:
        return [], [], []
    cutoff = min(min(dists) * 2, 7)
    sel, sums, packed = [], [], []
    for i, (t, d) in enumerate(zip(targets, dists)):
        if d <= cutoff:
            sel.append(i)
            sums.append(d)
            if not ((frame < 3) ^ (kmer_format == 2)):
                packed.append(hammings_ref(query & 0xFFFFFF, t & 0xFFFFFF))
            else:
                packed.append(hammings_rev_ref(query & 0xFFFFFF, t & 0xFFFFFF))
    return sel, sums, packed


def reduced_hamming_sum_ref(q_dna: int, t_dna: int) -> int:
    """ReducedKmerMatcher::getHammingDistanceSum (`ReducedKmerMatcher.h:24-35`)."""
    from metabuli_tpu.ops.hamming import REDUCED_SUM_LUT

    s = 0
    for i in range(8):
        s += REDUCED_SUM_LUT[(q_dna >> (4 * i)) & 15][(t_dna >> (4 * i)) & 15]
    return int(s)


def reduced_hammings_ref(q_dna: int, t_dna: int) -> int:
    """ReducedKmerMatcher::getHammings (`ReducedKmerMatcher.h:38-47`):
    uint16 OR of 3-bit distances shifted by 2i (spill preserved)."""
    from metabuli_tpu.ops.hamming import REDUCED_SUM_LUT

    h = 0
    for i in range(8):
        h |= int(REDUCED_SUM_LUT[(q_dna >> (4 * i)) & 15][(t_dna >> (4 * i)) & 15]) << (2 * i)
    return h & 0xFFFF


def reduced_hammings_rev_ref(q_dna: int, t_dna: int) -> int:
    """ReducedKmerMatcher::getHammings_reverse (`ReducedKmerMatcher.h:49-56`)."""
    from metabuli_tpu.ops.hamming import REDUCED_SUM_LUT

    h = 0
    for i in range(8):
        h |= int(REDUCED_SUM_LUT[(q_dna >> (4 * i)) & 15][(t_dna >> (4 * i)) & 15]) << (2 * (7 - i))
    return h & 0xFFFF


def random_dna(rng: np.random.Generator, length: int, n_prob=0.02) -> bytes:
    letters = np.array(list(b"ACGTN"), dtype=np.uint8)
    probs = np.array([0.25, 0.25, 0.25, 0.25, 0.0]) * (1 - n_prob)
    probs[4] = n_prob
    probs /= probs.sum()
    return bytes(rng.choice(letters, size=length, p=probs))
