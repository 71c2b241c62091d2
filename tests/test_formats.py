"""Delta codec round-trips and db.parameters persistence."""

import numpy as np

from metabuli_tpu.db import formats


def _scalar_encode(values):
    """Scalar oracle for getDiffIdx (`IndexCreator.cpp:874-892`)."""
    out = []
    last = 0
    for v in values:
        diff = int(v) - last
        chunks = [0x8000 | (diff & 0x7FFF)]
        diff >>= 15
        while diff:
            chunks.append(diff & 0x7FFF)
            diff >>= 15
        out.extend(reversed(chunks))
        last = int(v)
    return np.array(out, np.uint16)


def test_delta_encode_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    values = np.sort(rng.integers(0, 1 << 63, size=5000, dtype=np.uint64))
    got = formats.delta_encode(values)
    want = _scalar_encode(values)
    assert np.array_equal(got, want)


def test_delta_roundtrip():
    rng = np.random.default_rng(1)
    for size in (1, 2, 100, 10000):
        values = np.sort(rng.integers(0, 1 << 62, size=size, dtype=np.uint64))
        stream = formats.delta_encode(values)
        back = formats.delta_decode(stream)
        assert np.array_equal(back, values)
        assert formats.count_deltas(stream) == size


def test_delta_with_duplicam_and_zero():
    values = np.array([0, 0, 5, 5, 5, 1 << 40, (1 << 40) + 1], np.uint64)
    stream = formats.delta_encode(values)
    assert np.array_equal(formats.delta_decode(stream), values)


def test_db_files_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    values = np.sort(rng.integers(0, 1 << 63, size=3000, dtype=np.uint64))
    values = np.unique(values)
    taxids = rng.integers(1, 1000, size=len(values)).astype(np.uint32)
    formats.write_db_files(str(tmp_path), values, taxids, split_num=16)
    v2, t2 = formats.read_db_values(str(tmp_path))
    assert np.array_equal(v2, values)
    assert np.array_equal(t2, taxids)
    splits = np.fromfile(tmp_path / "split", dtype=formats.SPLIT_DTYPE)
    assert len(splits) == 16
    # split entries must sit at AA boundaries and round-trip by offset
    stream = np.fromfile(tmp_path / "diffIdx", dtype=np.uint16)
    for s in splits:
        if s["ADkmer"] == 0:
            continue
        # decoding from the recorded offset with ADkmer as base reproduces the tail
        tail = formats.delta_decode(stream[int(s["diffIdxOffset"]):], base=int(s["ADkmer"]))
        assert np.array_equal(tail, values[int(s["infoIdxOffset"]):])


def test_db_parameters_roundtrip(tmp_path):
    p = formats.DbParameters(db_name="testdb", syncmer=1, smer_len=6, kmer_format=2)
    path = str(tmp_path / "db.parameters")
    p.write(path)
    q = formats.DbParameters.read(path)
    assert q.db_name == "testdb"
    assert q.syncmer == 1 and q.smer_len == 6
    assert q.kmer_format == 2 and q.skip_redundancy == 1


def _scalar_mtbl_encode(values, ids):
    """Scalar oracle for Metamer::substract + 15-bit chunking
    (`Kmer.h:127-165`, `IndexCreator.cpp:874-892` chunk layout)."""
    out = []
    prev = 0
    for v, i in zip(values, ids):
        combined = (int(v) << 30) | int(i)
        diff = combined - prev
        chunks = [0x8000 | (diff & 0x7FFF)]
        diff >>= 15
        while diff:
            chunks.append(diff & 0x7FFF)
            diff >>= 15
        out.extend(reversed(chunks))
        prev = combined
    return np.array(out, np.uint16)


def test_mtbl_codec_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    values = np.sort(rng.integers(0, 1 << 63, size=3000, dtype=np.uint64))
    ids = rng.integers(0, 1 << 30, size=3000).astype(np.uint32)
    # enforce (value, id) sort like compareTargetKmer
    order = np.lexsort((ids, values))
    values, ids = values[order], ids[order]
    got = formats.mtbl_encode(values, ids)
    want = _scalar_mtbl_encode(values, ids)
    assert np.array_equal(got, want)
    v2, i2 = formats.mtbl_decode(got)
    assert np.array_equal(v2, values)
    assert np.array_equal(i2, ids)


def test_mtbl_borrow_cases():
    # same metamer with decreasing... ids must be non-decreasing per sort,
    # but borrow happens when the next pair has a larger metamer + smaller id
    values = np.array([5, 5, 6, 6, 1 << 40], np.uint64)
    ids = np.array([7, 9, 2, 3, 0], np.uint32)
    stream = formats.mtbl_encode(values, ids)
    v2, i2 = formats.mtbl_decode(stream)
    assert np.array_equal(v2, values)
    assert np.array_equal(i2, ids)


def test_mtbl_db_read(tmp_path):
    rng = np.random.default_rng(1)
    values = np.unique(np.sort(rng.integers(0, 1 << 62, 2000, dtype=np.uint64)))
    ids = rng.integers(1, 1000, len(values)).astype(np.uint32)
    formats.write_mtbl_files(str(tmp_path), values, ids)
    v2, i2 = formats.read_mtbl_values(str(tmp_path))
    assert np.array_equal(v2, values)
    assert np.array_equal(i2, ids)
