"""Degeneracy-aware per-codon Hamming distance, vectorized.

The reference compares the 24-bit codon parts of two metamers codon-by-codon
through 8x8 lookup tables (`/root/reference/src/commons/KmerMatcher.h:66-158`):

  * ``hammingLookup`` gives the true per-codon distance (0..4) used for the
    selection sum (`KmerMatcher.h:348-360`).
  * ``HAMMING_LUT0..7`` give the 2-bit per-codon distances packed into a
    16-bit word for scoring (`KmerMatcher.h:386-416`). These tables are NOT
    simple clamps of ``hammingLookup``: entries that would be 4 are stored as
    0 in LUT0..6 but as 1 in LUT7 for rows/cols 4,5 (compare
    `KmerMatcher.h:72-81` with `:149-158`). We reproduce the tables exactly.

Codon i occupies bits [3i, 3i+3) of the DNA part. ``hammings16`` packs codon
i's 2-bit distance at bit 2i (forward frames of the new k-mer format) while
``hammings16_reverse`` packs it at bit 2*(7-i) (`KmerMatcher.h:402-416`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# True per-codon distances (row = query codon number, col = target codon
# number), `KmerMatcher.h:66-70`.
HAMMING_SUM_LUT = np.array(
    [
        [0, 1, 1, 1, 2, 1, 3, 3],
        [1, 0, 1, 1, 2, 2, 3, 2],
        [1, 1, 0, 1, 2, 2, 2, 3],
        [1, 1, 1, 0, 1, 2, 3, 3],
        [2, 2, 2, 1, 0, 1, 4, 4],
        [1, 2, 2, 2, 1, 0, 4, 4],
        [3, 3, 2, 3, 4, 4, 0, 1],
        [3, 2, 3, 3, 4, 4, 1, 0],
    ],
    dtype=np.int32,
)

# 2-bit tables. LUT0..6 share one pattern (`KmerMatcher.h:72-81`, scaled by
# 4**i which we apply via shifts); LUT7 differs in rows 4,5 (`:149-158`).
PACKED_LUT_LO = np.array(
    [
        [0, 1, 1, 1, 2, 1, 3, 3],
        [1, 0, 1, 1, 2, 2, 3, 2],
        [1, 1, 0, 1, 2, 2, 2, 3],
        [1, 1, 1, 0, 1, 2, 3, 3],
        [2, 2, 2, 1, 0, 1, 0, 0],
        [1, 2, 2, 2, 1, 0, 0, 0],
        [3, 3, 2, 3, 0, 0, 0, 1],
        [3, 2, 3, 3, 0, 0, 1, 0],
    ],
    dtype=np.int32,
)

PACKED_LUT_HI = np.array(
    [
        [0, 1, 1, 1, 2, 1, 3, 3],
        [1, 0, 1, 1, 2, 2, 3, 2],
        [1, 1, 0, 1, 2, 2, 2, 3],
        [1, 1, 1, 0, 1, 2, 3, 3],
        [2, 2, 2, 1, 0, 1, 1, 1],
        [1, 2, 2, 2, 1, 0, 1, 1],
        [3, 3, 2, 3, 0, 0, 0, 1],
        [3, 2, 3, 3, 0, 0, 1, 0],
    ],
    dtype=np.int32,
)

_SUM_FLAT = HAMMING_SUM_LUT.reshape(-1)
_LO_FLAT = PACKED_LUT_LO.reshape(-1)
_HI_FLAT = PACKED_LUT_HI.reshape(-1)

# Reduced 16-letter alphabet: 11x11 per-codon distances over 4-bit codon
# numbers (`/root/reference/src/commons/ReducedKmerMatcher.h:10-21`). Padded
# to 16x16 (unreachable codon numbers 11..15 get 0).
REDUCED_SUM_LUT = np.zeros((16, 16), np.int32)
REDUCED_SUM_LUT[:11, :11] = np.array(
    [
        [0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3],
        [1, 0, 1, 1, 2, 1, 2, 2, 2, 2, 3],
        [1, 1, 0, 1, 2, 2, 1, 2, 2, 3, 2],
        [1, 1, 1, 0, 2, 2, 2, 1, 1, 3, 3],
        [1, 2, 2, 2, 0, 1, 1, 1, 2, 4, 4],
        [2, 1, 2, 2, 1, 0, 1, 2, 4, 4, 4],
        [2, 2, 1, 2, 1, 1, 0, 2, 4, 4, 4],
        [2, 2, 2, 1, 1, 2, 2, 0, 1, 4, 4],
        [2, 2, 2, 1, 2, 4, 4, 1, 0, 4, 4],
        [3, 2, 3, 3, 4, 4, 4, 4, 4, 0, 4],
        [3, 3, 2, 3, 4, 4, 4, 4, 4, 4, 0],
    ],
    dtype=np.int32,
)
_REDUCED_FLAT = REDUCED_SUM_LUT.reshape(-1)


def hamming_all(q_dna: jax.Array, t_dna: jax.Array):
    """(sum, packed_fwd, packed_rev) for int32 24-bit DNA parts, elementwise.

    sum        -- total distance (`getHammingDistanceSum`)
    packed_fwd -- 16-bit word, codon i at bit 2i (`getHammings`)
    packed_rev -- 16-bit word, codon i at bit 2*(7-i) (`getHammings_reverse`)
    """
    sum_tab = jnp.asarray(_SUM_FLAT)
    lo_tab = jnp.asarray(_LO_FLAT)
    hi_tab = jnp.asarray(_HI_FLAT)
    total = jnp.zeros(q_dna.shape, jnp.int32)
    fwd = jnp.zeros(q_dna.shape, jnp.int32)
    rev = jnp.zeros(q_dna.shape, jnp.int32)
    for i in range(8):
        pair = (((q_dna >> (3 * i)) & 7) << 3) | ((t_dna >> (3 * i)) & 7)
        total = total + sum_tab[pair]
        fwd = fwd | ((hi_tab if i == 7 else lo_tab)[pair] << (2 * i))
        rev = rev | ((hi_tab if i == 0 else lo_tab)[pair] << (2 * (7 - i)))
    return total, fwd, rev


def hamming_all_reduced(q_dna: jax.Array, t_dna: jax.Array):
    """Reduced-alphabet variant over 32-bit DNA parts (4-bit codon fields).

    Mirrors ``ReducedKmerMatcher`` exactly (`ReducedKmerMatcher.h:24-56`),
    including its quirk: the packed words OR 3-bit distances (up to 4) into
    2-bit lanes, so a distance of 4 at codon i spills a bit into codon
    i+1's lane (``hammings |= lut << 2*i`` with no masking). We keep that
    behavior bit-for-bit rather than "fixing" it.
    """
    sum_tab = jnp.asarray(_REDUCED_FLAT)
    total = jnp.zeros(q_dna.shape, jnp.int32)
    fwd = jnp.zeros(q_dna.shape, jnp.int32)
    rev = jnp.zeros(q_dna.shape, jnp.int32)
    for i in range(8):
        pair = (((q_dna >> (4 * i)) & 15) << 4) | ((t_dna >> (4 * i)) & 15)
        d = sum_tab[pair]
        total = total + d
        fwd = fwd | (d << (2 * i))
        rev = rev | (d << (2 * (7 - i)))
    return total, fwd & 0xFFFF, rev & 0xFFFF
