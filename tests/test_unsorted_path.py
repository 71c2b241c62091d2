"""Equivalence of the host-sort fast path (sort_device=False + pack4) with
the device-sorted baseline, and of the native per-read sort."""

import numpy as np
import pytest

from metabuli_tpu.classify.pipeline import (
    FIELDS,
    classify_batch,
    matches_to_host,
)
from metabuli_tpu.db.taxonomy import Taxonomy
from metabuli_tpu.ops.genetic_code import encode_seqs_padded

N_READS = 64
READ_LEN = 150


def _taxonomy(tmp_path):
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom")]
    names = {1: "root", 2: "Bacteria"}
    tid = 3
    for g in range(2):
        gid = tid
        nodes.append((tid, 2, "genus")); names[tid] = f"G{g}"; tid += 1
        for s in range(2):
            sid = tid
            nodes.append((tid, gid, "species")); names[tid] = f"S{g}_{s}"; tid += 1
            nodes.append((tid, sid, "subspecies")); names[tid] = f"SS{g}_{s}"; tid += 1
    (tmp_path / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (tmp_path / "names.dmp").write_text(
        "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n"
                for t, n in names.items()))
    (tmp_path / "merged.dmp").write_text("")
    return Taxonomy.from_dmp(
        str(tmp_path / "names.dmp"), str(tmp_path / "nodes.dmp"),
        str(tmp_path / "merged.dmp"))


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("unsorted")
    tax = _taxonomy(tmp_path)
    rng = np.random.default_rng(5)
    ss_nodes = [i for i in range(1, tax.n_nodes() + 1)
                if tax.rank_of(i) == "subspecies"]
    genomes = [
        (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 20_000)), t)
        for t in ss_nodes
    ]
    from metabuli_tpu.ops import encode

    all_v, all_t, all_s = [], [], []
    for seq, t in genomes:
        codes, lens = encode_seqs_padded([seq])
        mm = encode.extract_metamers(codes, lens)
        v = np.asarray(mm.value)[np.asarray(mm.valid)]
        all_v.append(v)
        all_t.append(np.full(len(v), t, np.uint32))
        all_s.append(np.full(len(v), tax.species_of[t], np.uint32))
    values = np.concatenate(all_v)
    taxids = np.concatenate(all_t)
    species = np.concatenate(all_s)
    order = np.lexsort((taxids, species, values))
    values, taxids, species = values[order], taxids[order], species[order]
    ng = np.ones(len(values), bool)
    ng[1:] = (values[1:] != values[:-1]) | (species[1:] != species[:-1])
    gid = np.cumsum(ng) - 1
    lca = tax.lca_segments(taxids.astype(np.int64), gid)
    values = values[ng]
    taxids = lca.astype(np.int32)

    reads = []
    for i in range(N_READS):
        if i % 8 == 7:
            reads.append(bytes(
                rng.choice(np.array(list(b"ACGT"), np.uint8), READ_LEN)))
            continue
        g, _ = genomes[i % len(genomes)]
        st = int(rng.integers(0, len(g) - READ_LEN))
        read = bytearray(g[st:st + READ_LEN])
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, READ_LEN))
            read[p] = b"ACGT"[int(rng.integers(0, 4))]
        reads.append(bytes(read))
    return tax, values, taxids, reads


def _classify(world, sort_device, pack4):
    tax, values, taxids, reads = world
    codes, lens = encode_seqs_padded(reads, 160)
    offs = np.zeros(len(reads), np.int32)
    qids = np.arange(len(reads), dtype=np.int32)
    bm = classify_batch(
        values, taxids, tax.species_of.astype(np.int32),
        codes, lens, offs, qids,
        cap=64, max_matches=1 << 16,
        sort_device=sort_device, pack4=pack4,
    )
    return matches_to_host(
        bm, tax.species_of.astype(np.int32), sorted_rows=sort_device
    )


def test_unsorted_pack4_matches_sorted(world):
    ref = _classify(world, sort_device=True, pack4=False)
    fast = _classify(world, sort_device=False, pack4=True)
    assert ref["n_matches"] > 0
    assert fast["n_matches"] == ref["n_matches"]
    assert fast["n_over_cap"] == ref["n_over_cap"]

    # same multiset of rows; the fast path is only unsorted within a read
    def rows(m):
        return sorted(zip(*(np.asarray(m[k]).tolist() for k in FIELDS)))

    assert rows(fast) == rows(ref)
    # fast path is still qid-major with padding trimmed
    assert (np.diff(fast["qid"]) >= 0).all()


def test_native_per_read_sort_equivalence(world):
    from metabuli_tpu.classify.native_taxonomer import NativeTaxonomer
    from metabuli_tpu.classify.taxonomer import TaxonomerParams

    tax = world[0]
    try:
        nt = NativeTaxonomer(TaxonomerParams(), tax)
    except RuntimeError:
        pytest.skip("native library unavailable")
    ref = _classify(world, sort_device=True, pack4=False)
    fast = _classify(world, sort_device=False, pack4=True)
    read_len = 3 * ((READ_LEN - 2) // 3)
    rl = np.full(N_READS, read_len, np.int32)

    def assign(m):
        starts = np.searchsorted(m["qid"], np.arange(N_READS), side="left")
        ends = np.searchsorted(m["qid"], np.arange(N_READS), side="right")
        res, _ = nt.assign_batch(m, starts, ends, rl)
        return [(r.is_classified, r.taxid, round(r.score, 6)) for r in res]

    assert assign(fast) == assign(ref)
