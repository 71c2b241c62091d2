"""Genetic-code lookup tables for metamer encoding.

Reproduces the encoding semantics of the reference implementation
(`/root/reference/src/commons/GeneticCode.h`):

  - Nucleotide characters are first canonicalized through a 256-entry table
    (IUPAC degenerate codes collapse to one of A/C/G/T, 'N' and everything
    else to invalid), then mapped to 3-bit integers with
    ``nuc2int(c) = (c & 14) >> 1`` giving A=0, C=1, T=2, G=3 and N/invalid=7
    (`GeneticCode.h:6`, the ``atcg``/``iRCT`` strings at `GeneticCode.h:9-17`).
  - A codon (three 2-bit bases) maps to a 5-bit amino-acid index 0..20
    (20 = stop) and a 3-bit degeneracy-aware codon number
    (`GeneticCode.h:32-194`); the reduced 16-letter alphabet uses 4-bit
    codon numbers (`GeneticCode.h:195-320`).

All tables are plain numpy arrays; device code materializes them as jnp
constants once per compile.
"""

from __future__ import annotations

import functools

import numpy as np

# Amino-acid alphabets (index -> letter). `GeneticCode.h:34,196`.
AMINO_ACIDS = "ARNDCQEGHILKMFPSTWYVX"
AMINO_ACIDS_REDUCED = "ARNDCQGHILKFPSTX"

# Canonicalization of raw sequence characters, equivalent to the reference's
# `atcg` 256-char string (`GeneticCode.h:9-12`): degenerate IUPAC codes pick a
# fixed representative base; 'N' stays 'N'; anything else is invalid ('.').
_CANON = {
    "A": "A", "B": "G", "C": "C", "D": "G", "G": "G", "H": "T", "K": "G",
    "M": "C", "N": "N", "R": "A", "S": "C", "T": "T", "U": "G", "W": "A",
    "Y": "T",
}

# Complement of canonicalized chars, equivalent to `iRCT` (`GeneticCode.h:14-17`)
# restricted to the canonical output alphabet {A, C, G, T, N}.
_COMPLEMENT = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}

INVALID = 7  # 3-bit code for N / non-nucleotide characters


def _nuc2int(ch: str) -> int:
    """`nuc2int(x) = (x & 14) >> 1` (`GeneticCode.h:6`): A=0 C=1 T=2 G=3 N=7."""
    return (ord(ch) & 14) >> 1


def _build_char_tables() -> tuple[np.ndarray, np.ndarray]:
    """256-entry char -> 3-bit code tables, forward and reverse-complement."""
    fwd = np.full(256, INVALID, dtype=np.uint8)
    rc = np.full(256, INVALID, dtype=np.uint8)
    for raw_ord in range(256):
        ch = chr(raw_ord)
        canon = _CANON.get(ch.upper())
        if canon is None:
            continue
        code = _nuc2int(canon)
        rc_code = _nuc2int(_COMPLEMENT[canon])
        fwd[raw_ord] = code
        rc[raw_ord] = rc_code
    # 'N' canonicalizes to 'N' whose nuc2int is 7 already; keep as INVALID.
    return fwd, rc


#: Raw char byte -> base code (A=0 C=1 T=2 G=3, 7=N/invalid).
CHAR_CODE, CHAR_CODE_RC = _build_char_tables()

# Codon tables, indexed by c1*16 + c2*4 + c3 with 2-bit base codes
# (valid bases only; callers mask invalid codons separately).
# Laid out per `GeneticCode.h:36-194` (standard) and `:195-320` (reduced).

_STD_AA_CODONS = {
    # aa index -> list of codons (over the A=0 C=1 T=2 G=3 alphabet)
    0: ["GCA", "GCC", "GCT", "GCG"],                    # A
    1: ["CGA", "CGC", "CGT", "CGG", "AGG", "AGA"],      # R
    2: ["AAT", "AAC"],                                  # N
    3: ["GAT", "GAC"],                                  # D
    4: ["TGT", "TGC"],                                  # C
    5: ["CAA", "CAG"],                                  # Q
    6: ["GAA", "GAG"],                                  # E
    7: ["GGA", "GGC", "GGT", "GGG"],                    # G
    8: ["CAT", "CAC"],                                  # H
    9: ["ATT", "ATC", "ATA"],                           # I
    10: ["TTA", "TTG", "CTA", "CTC", "CTT", "CTG"],     # L
    11: ["AAA", "AAG"],                                 # K
    12: ["ATG"],                                        # M
    13: ["TTT", "TTC"],                                 # F
    14: ["CCA", "CCC", "CCT", "CCG"],                   # P
    15: ["TCA", "TCC", "TCT", "TCG", "AGT", "AGC"],     # S
    16: ["ACA", "ACC", "ACT", "ACG"],                   # T
    17: ["TGG"],                                        # W
    18: ["TAT", "TAC"],                                 # Y
    19: ["GTA", "GTC", "GTT", "GTG"],                   # V
    20: ["TAA", "TGA", "TAG"],                          # stop
}

# Codon-number overrides beyond the default "third base" rule
# (`GeneticCode.h:174-193`). Keys are codon strings, values 3-bit numbers.
_STD_NUM_OVERRIDES = {
    "AGG": 4, "AGA": 5,          # Arg
    "TTG": 4, "TTA": 5,          # Leu
    "AGT": 6, "AGC": 7,          # Ser
    "TGA": 5,                    # stop
}

_REDUCED_AA_CODONS = {
    0: ["GCA", "GCC", "GCT", "GCG"],                                  # A
    1: ["CGA", "CGC", "CGT", "CGG", "AGA", "AGG"],                    # R
    2: ["AAT", "AAC"],                                                # N
    3: ["GAT", "GAC"],                                                # D
    4: ["TGT", "TGC"],                                                # C
    5: ["CAA", "CAG", "GAA", "GAG"],                                  # QE
    6: ["GGA", "GGC", "GGT", "GGG"],                                  # G
    7: ["CAT", "CAC"],                                                # H
    8: ["ATT", "ATC", "ATA", "GTA", "GTC", "GTT", "GTG"],             # IV
    9: ["TTA", "TTG", "CTA", "CTC", "CTT", "CTG", "ATG"],             # ML
    10: ["AAA", "AAG"],                                               # K
    11: ["TTT", "TTC", "TAT", "TAC", "TGG"],                          # FYW
    12: ["CCA", "CCC", "CCT", "CCG"],                                 # P
    13: ["TCA", "TCC", "TCT", "TCG", "AGT", "AGC"],                   # S
    14: ["ACA", "ACC", "ACT", "ACG"],                                 # T
    15: ["TAA", "TGA", "TAG"],                                        # stop
}

# Reduced-alphabet codon-number overrides (`GeneticCode.h:287-319`), 4-bit.
_REDUCED_NUM_OVERRIDES = {
    "AGG": 7, "AGA": 4,                       # Arg
    "TTG": 7, "TTA": 4, "ATG": 8,             # Leu/M
    "AGT": 10, "AGC": 9,                      # Ser
    "TAC": 5, "TAT": 6, "TGG": 7,             # FYW
    "ATA": 4, "ATC": 5, "ATT": 6,             # IV
    "GAA": 4, "GAG": 7,                       # QE
    "TGA": 4,                                 # stop
}

_BASE = {"A": 0, "C": 1, "T": 2, "G": 3}


def _codon_index(codon: str) -> int:
    return _BASE[codon[0]] * 16 + _BASE[codon[1]] * 4 + _BASE[codon[2]]


@functools.lru_cache(maxsize=2)
def codon_tables(reduced: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """(aa_table[64], codon_number_table[64]) over 2-bit base codes.

    ``aa_table[c1*16+c2*4+c3]`` is the amino-acid index; the codon-number table
    defaults to the third-base code (`GeneticCode.h:175-182`) with the
    degeneracy overrides applied.
    """
    aa = np.full(64, -1, dtype=np.int32)
    num = np.full(64, -1, dtype=np.int32)
    aa_codons = _REDUCED_AA_CODONS if reduced else _STD_AA_CODONS
    overrides = _REDUCED_NUM_OVERRIDES if reduced else _STD_NUM_OVERRIDES
    for aa_idx, codons in aa_codons.items():
        for codon in codons:
            aa[_codon_index(codon)] = aa_idx
    for c1 in "ACTG":
        for c2 in "ACTG":
            for c3 in "ACTG":
                num[_codon_index(c1 + c2 + c3)] = _BASE[c3]
    for codon, value in overrides.items():
        num[_codon_index(codon)] = value
    assert (aa >= 0).all() and (num >= 0).all()
    return aa, num


def encode_seq(seq: bytes | str) -> np.ndarray:
    """Raw sequence -> base-code array (uint8; A=0 C=1 T=2 G=3, 7=invalid)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return CHAR_CODE[np.frombuffer(seq, dtype=np.uint8)]


def encode_seqs_padded(seqs: list[bytes], max_len: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Encode a batch of sequences into a padded [B, L] code matrix.

    Padding positions hold the INVALID code, mirroring the reference reading
    '\\0' past the end of a C string (-> '.' -> invalid codon).
    Returns (codes, lengths).
    """
    lens = np.array([len(s) for s in seqs], dtype=np.int32)
    if max_len is None:
        max_len = int(lens.max()) if len(seqs) else 0
    out = np.full((len(seqs), max_len), INVALID, dtype=np.uint8)
    for i, s in enumerate(seqs):
        if isinstance(s, str):
            s = s.encode()
        n = min(len(s), max_len)
        out[i, :n] = CHAR_CODE[np.frombuffer(s, dtype=np.uint8)[:n]]
    return out, lens
