"""Low-complexity masker: repeats masked, unique sequence untouched."""

import numpy as np
import pytest

from metabuli_tpu.native import get_lib
from metabuli_tpu.ops.genetic_code import encode_seq, INVALID
from metabuli_tpu.ops.mask import mask_codes


pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


def test_tandem_repeat_masked():
    rng = np.random.default_rng(0)
    flank = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 300))
    repeat = b"ACGTT" * 60  # 5-periodic tandem repeat
    seq = flank + repeat + flank
    codes = encode_seq(seq)
    masked = mask_codes(codes, 0.9)
    core = masked[320 : 300 + len(repeat) - 20]
    assert np.mean(core == INVALID) > 0.8
    # flanks untouched
    assert np.all(masked[:280] == codes[:280])
    assert np.all(masked[-280:] == codes[-280:])


def test_homopolymer_masked():
    rng = np.random.default_rng(1)
    flank = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 200))
    seq = flank + b"A" * 200 + flank
    masked = mask_codes(encode_seq(seq), 0.9)
    assert np.mean(masked[220:380] == INVALID) > 0.8


def test_random_sequence_unmasked():
    rng = np.random.default_rng(2)
    seq = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 2000))
    codes = encode_seq(seq)
    masked = mask_codes(codes, 0.9)
    assert np.mean(masked == INVALID) < 0.02


def test_build_with_masking(tmp_path):
    """mask_mode=1 build drops k-mers inside repeats."""
    from metabuli_tpu.db.build import IndexBuilder, SeqTask
    from metabuli_tpu.db.taxonomy import Taxonomy
    from metabuli_tpu.params import BuildParams

    (tmp_path / "nodes.dmp").write_text("1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tspecies\t|\n")
    (tmp_path / "names.dmp").write_text("1\t|\troot\t|\t\t|\tscientific name\t|\n2\t|\tSp\t|\t\t|\tscientific name\t|\n")
    (tmp_path / "merged.dmp").write_text("")
    tax = Taxonomy.from_dmp(str(tmp_path / "names.dmp"), str(tmp_path / "nodes.dmp"),
                            str(tmp_path / "merged.dmp"))
    rng = np.random.default_rng(3)
    seq = (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 1000))
           + b"ATATATATAT" * 50
           + bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 1000)))
    from metabuli_tpu.ops.mask import mask_bytes

    counts = {}
    for mask_mode in (0, 1):
        # masking is a task-creation concern (whole sequences before any
        # block cutting — see build.py); the builder itself never masks
        seq_in = mask_bytes(seq, 0.9) if mask_mode else seq
        b = IndexBuilder(BuildParams(gene_prediction=0, mask_mode=mask_mode), tax)
        b.add_sequences([SeqTask(seq_in, 2, 2)])
        counts[mask_mode] = sum(len(v) for v in b._values)
    assert counts[1] < counts[0] - 1000
