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


def test_streaming_delta_reader_roundtrip():
    from metabuli_tpu.db.formats import StreamingDeltaReader, delta_encode

    rng = np.random.default_rng(31)
    values = np.unique(rng.integers(0, 1 << 40, size=6000).astype(np.uint64))[:5000]
    taxids = rng.integers(1, 100, size=len(values)).astype(np.uint32)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        dp, ip = os.path.join(d, "x_diffIdx"), os.path.join(d, "x_info")
        delta_encode(values).tofile(dp)
        taxids.tofile(ip)
        r = StreamingDeltaReader(dp, ip, block_values=700)
        assert r.total_values == len(values)
        got_v, got_t = [], []
        while not r.exhausted:
            v, t = r.read_block()
            got_v.append(v)
            got_t.append(t)
        assert np.array_equal(np.concatenate(got_v), values)
        assert np.array_equal(np.concatenate(got_t), taxids)


def test_streaming_writer_matches_write_db_files():
    from metabuli_tpu.db.formats import StreamingDbWriter, write_db_files

    rng = np.random.default_rng(32)
    values = np.unique(rng.integers(0, 1 << 44, size=21000).astype(np.uint64))[:20000]
    taxids = rng.integers(1, 500, size=len(values)).astype(np.uint32)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        a, b = os.path.join(d, "a"), os.path.join(d, "b")
        write_db_files(a, values, taxids, split_num=64)
        w = StreamingDbWriter(b, len(values), split_num=64)
        for s in range(0, len(values), 3000):
            w.write_block(values[s : s + 3000], taxids[s : s + 3000])
        assert w.finalize() == len(values)
        for f in ("diffIdx", "info", "split"):
            with open(os.path.join(a, f), "rb") as fa, \
                 open(os.path.join(b, f), "rb") as fb:
                assert fa.read() == fb.read(), f


def test_tiny_db_split_semantics():
    """Reference split protocol on tiny DBs (`IndexCreator.cpp:825-831`):
    sizeOfSplit = n/(splitNum-1) with NO floor, so n < splitNum-1 writes an
    all-zero split file; the finite offset list has only splitNum-1
    entries, so no checkpoint past (splitNum-1)*sizeOfSplit is armed."""
    from metabuli_tpu.db.formats import (SPLIT_DTYPE, StreamingDbWriter,
                                         write_db_files)
    import tempfile, os

    rng = np.random.default_rng(7)
    for n, split_num in ((10, 64), (63, 64), (64, 64), (200, 64), (40, 16)):
        values = np.unique(
            rng.integers(0, 1 << 44, size=3 * n).astype(np.uint64))[:n]
        taxids = rng.integers(1, 50, size=len(values)).astype(np.uint32)
        with tempfile.TemporaryDirectory() as d:
            a, b = os.path.join(d, "a"), os.path.join(d, "b")
            write_db_files(a, values, taxids, split_num=split_num)
            w = StreamingDbWriter(b, len(values), split_num=split_num)
            for s in range(0, len(values), 7):
                w.write_block(values[s : s + 7], taxids[s : s + 7])
            w.finalize()
            with open(os.path.join(a, "split"), "rb") as fa, \
                 open(os.path.join(b, "split"), "rb") as fb:
                ba, bb = fa.read(), fb.read()
            assert ba == bb, (n, split_num)
            splits = np.frombuffer(ba, dtype=SPLIT_DTYPE)
            size_of_split = len(values) // (split_num - 1)
            if size_of_split == 0:
                assert not splits["ADkmer"].any(), (n, split_num)
            else:
                # no checkpoint may record an info offset beyond the last
                # finite offset + one AA-group (the arm point is bounded
                # by (splitNum-1)*sizeOfSplit)
                nz = splits[splits["infoIdxOffset"] > 0]
                assert len(nz) <= split_num - 1


def test_merge_flush_files_equals_in_memory():
    """K-way merge with (value, species)-dedup + LCA == one-shot dedup."""
    from metabuli_tpu.db.formats import (
        delta_encode, merge_flush_files, read_db_values)
    from metabuli_tpu.db.taxonomy import Taxonomy

    # taxonomy: root(1) -> genus(2) -> species 3,4; species 3 -> sub 5,6
    nodes = [(1, 1, "no rank"), (2, 1, "genus"), (3, 2, "species"),
             (4, 2, "species"), (5, 3, "subspecies"), (6, 3, "subspecies")]
    names = {i: f"n{i}" for i in range(1, 7)}
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        td = os.path.join(d, "tax")
        os.makedirs(td)
        open(os.path.join(td, "nodes.dmp"), "w").write(
            "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
        open(os.path.join(td, "names.dmp"), "w").write(
            "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n"
                    for t, n in names.items()))
        open(os.path.join(td, "merged.dmp"), "w").write("")
        tax = Taxonomy.from_dmp(
            os.path.join(td, "names.dmp"), os.path.join(td, "nodes.dmp"),
            os.path.join(td, "merged.dmp"))
        sp_of = tax.species_of.astype(np.uint32)

        rng = np.random.default_rng(33)
        # overlapping values across 3 flushes; taxids = internal ids of
        # subspecies/species so LCA-on-duplicate matters
        cand_tax = [tax.to_internal(x) for x in (3, 4, 5, 6)]
        pool = np.unique(rng.integers(0, 1 << 30, size=4200).astype(np.uint64))[:4000]
        all_v, all_t = [], []
        pairs = []
        for i in range(3):
            v = rng.choice(pool, 2500)
            t = rng.choice(cand_tax, 2500).astype(np.uint32)
            sp = sp_of[t]
            order = np.lexsort((t, sp, v))
            v, t, sp = v[order], t[order], sp[order]
            ng = np.ones(len(v), bool)
            ng[1:] = (v[1:] != v[:-1]) | (sp[1:] != sp[:-1])
            gid = np.cumsum(ng) - 1
            lca = tax.lca_segments(t.astype(np.int64), gid)
            v, t = v[ng], lca.astype(np.uint32)
            dp, ip = os.path.join(d, f"{i}_diffIdx"), os.path.join(d, f"{i}_info")
            delta_encode(v).tofile(dp)
            t.tofile(ip)
            pairs.append((dp, ip))
            all_v.append(v)
            all_t.append(t)

        out = os.path.join(d, "merged")
        n = merge_flush_files(out, pairs, sp_of, tax.lca_segments,
                              split_num=16, block_values=600)

        # oracle: concatenate everything, sort, dedup per (value, species)
        v = np.concatenate(all_v)
        t = np.concatenate(all_t)
        sp = sp_of[t]
        order = np.lexsort((t, sp, v))
        v, t, sp = v[order], t[order], sp[order]
        ng = np.ones(len(v), bool)
        ng[1:] = (v[1:] != v[:-1]) | (sp[1:] != sp[:-1])
        gid = np.cumsum(ng) - 1
        lca = tax.lca_segments(t.astype(np.int64), gid)
        want_v, want_t = v[ng], lca.astype(np.uint32)

        got_v, got_t = read_db_values(out)
        assert n == len(want_v)
        assert np.array_equal(got_v, want_v)
        assert np.array_equal(got_t, want_t)


def test_update_streaming_equals_in_memory(tmp_path, monkeypatch):
    """updateDB's streaming old-DB merge == the in-memory merge path."""
    import os

    from metabuli_tpu.db.build import build_database
    from metabuli_tpu.db.update import update_database
    from metabuli_tpu.params import BuildParams

    rng = np.random.default_rng(41)
    taxdir = tmp_path / "taxonomy"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n"
        "4\t|\t2\t|\tspecies\t|\n8\t|\t2\t|\tspecies\t|\n")
    (taxdir / "names.dmp").write_text(
        "".join(f"{t}\t|\tN{t}\t|\t\t|\tscientific name\t|\n"
                for t in (1, 2, 4, 8)))
    (taxdir / "merged.dmp").write_text("")
    g = lambda n: bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), n))
    # overlapping content so cross-merge dedup+LCA actually triggers
    shared = g(1500)
    (tmp_path / "a.fna").write_text(f">U_A.1\n{(shared + g(1500)).decode()}\n")
    (tmp_path / "b.fna").write_text(f">U_B.1\n{(shared + g(1500)).decode()}\n")
    (tmp_path / "lib1.txt").write_text(str(tmp_path / "a.fna") + "\n")
    (tmp_path / "lib2.txt").write_text(str(tmp_path / "b.fna") + "\n")
    (tmp_path / "map.tsv").write_text("U_A.1\t4\nU_B.1\t8\n")
    old_db = str(tmp_path / "old")
    build_database(old_db, str(tmp_path / "lib1.txt"),
                   str(tmp_path / "map.tsv"), str(taxdir),
                   BuildParams(gene_prediction=0, mask_mode=0))

    new_s = str(tmp_path / "new_stream")
    update_database(new_s, old_db, str(tmp_path / "lib2.txt"),
                    str(tmp_path / "map.tsv"), BuildParams(gene_prediction=0, mask_mode=0))

    # force the in-memory path by making the streaming predicate fail
    import metabuli_tpu.db.update as upd

    real_abspath = os.path.abspath
    monkeypatch.setattr(
        upd.os.path, "abspath", lambda p: "SAME"
    )
    new_m = str(tmp_path / "new_mem")
    update_database(new_m, old_db, str(tmp_path / "lib2.txt"),
                    str(tmp_path / "map.tsv"), BuildParams(gene_prediction=0, mask_mode=0))
    monkeypatch.setattr(upd.os.path, "abspath", real_abspath)

    for f in ("diffIdx", "info"):
        a = open(os.path.join(new_s, f), "rb").read()
        b = open(os.path.join(new_m, f), "rb").read()
        assert a == b, f

    from metabuli_tpu.db.index import MetamerIndex

    assert len(MetamerIndex.load(new_s).values) > \
        len(MetamerIndex.load(old_db).values)
