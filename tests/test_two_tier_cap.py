"""Two-tier candidate cap must reproduce the single-tier match set exactly."""

import numpy as np
import pytest

from metabuli_tpu.classify.pipeline import (
    FIELDS,
    classify_batch,
    matches_to_host,
)
from metabuli_tpu.ops import encode
from metabuli_tpu.ops.genetic_code import encode_seqs_padded


@pytest.fixture(scope="module")
def world():
    """Genomes with a shared low-complexity region -> one huge AA group."""
    rng = np.random.default_rng(11)
    # a block shared VERBATIM by every genome: its metamers collect one
    # entry per distinct taxid in the same AA group (the skew driver)
    shared = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 120))
    genomes = []
    for g in range(40):
        pre = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 400))
        post = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 400))
        genomes.append((pre + shared + post, 3 + g))

    all_v, all_t = [], []
    for seq, t in genomes:
        codes, lens = encode_seqs_padded([seq])
        mm = encode.extract_metamers(codes, lens)
        v = np.asarray(mm.value)[np.asarray(mm.valid)]
        all_v.append(v)
        all_t.append(np.full(len(v), t, np.uint32))
    values = np.concatenate(all_v)
    taxids = np.concatenate(all_t)
    order = np.lexsort((taxids, values))
    values, taxids = values[order], taxids[order]
    ng = np.ones(len(values), bool)
    ng[1:] = (values[1:] != values[:-1]) | (taxids[1:] != taxids[:-1])
    values, taxids = values[ng], taxids[ng].astype(np.int32)

    aa = values >> np.uint64(24)
    change = np.nonzero(aa[1:] != aa[:-1])[0]
    bounds = np.concatenate([[-1], change, [len(aa) - 1]])
    max_group = int(np.diff(bounds).max())
    assert max_group > 8, "world must have a skewed AA group"

    reads = []
    for i in range(48):
        g, _ = genomes[i % len(genomes)]
        st = int(rng.integers(0, len(g) - 150))
        reads.append(g[st : st + 150])
    # make sure some reads overlap the shared block
    reads += [genomes[i][0][350:500] for i in range(8)]
    t2s = np.arange(64, dtype=np.int32)  # identity species map
    return values, taxids, t2s, reads, max_group


def _run(world, cap, cap2=0, ov_budget=0):
    values, taxids, t2s, reads, _ = world
    codes, lens = encode_seqs_padded(reads, 160)
    offs = np.zeros(len(reads), np.int32)
    qids = np.arange(len(reads), dtype=np.int32)
    bm = classify_batch(
        values, taxids, t2s, codes, lens, offs, qids,
        cap=cap, max_matches=1 << 17, cap2=cap2, ov_budget=ov_budget,
    )
    return matches_to_host(bm, t2s)


def rows(m):
    return sorted(zip(*(np.asarray(m[k]).tolist() for k in FIELDS)))


def test_two_tier_equals_single_tier(world):
    max_group = world[4]
    ref = _run(world, cap=max_group)
    two = _run(world, cap=4, cap2=max_group, ov_budget=4096)
    assert ref["n_matches"] > 0
    assert two["n_matches"] == ref["n_matches"]
    assert two["n_over_cap"] == ref["n_over_cap"] == 0
    assert two["n_ov"] > 0, "tier 2 must actually trigger on this world"
    assert rows(two) == rows(ref)


def test_two_tier_ov_overflow_reported(world):
    max_group = world[4]
    two = _run(world, cap=4, cap2=max_group, ov_budget=1024)
    ref = _run(world, cap=max_group)
    # either the budget was enough (same rows) or n_ov reports the need
    if two["n_ov"] <= 1024:
        assert rows(two) == rows(ref)
    else:
        assert two["n_ov"] > 1024


def test_two_tier_classifier_end_to_end(tmp_path, world):
    """CLI-level: small_cap=2 vs huge small_cap give identical outputs."""
    values, taxids, t2s, reads, max_group = world
    import pathlib

    from metabuli_tpu.classify.classifier import Classifier
    from metabuli_tpu.db.formats import DbParameters, write_db_files, write_taxid_list
    from metabuli_tpu.db.taxonomy import Taxonomy

    d = tmp_path
    nodes = [(1, 1, "no rank"), (2, 1, "genus")]
    names = {1: "root", 2: "G"}
    for t in range(3, 43):
        nodes.append((t, 2, "species")); names[t] = f"S{t}"
    (d / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (d / "names.dmp").write_text(
        "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n"
                for t, n in names.items()))
    (d / "merged.dmp").write_text("")
    tax = Taxonomy.from_dmp(str(d / "names.dmp"), str(d / "nodes.dmp"),
                            str(d / "merged.dmp"))
    db = d / "db"
    db.mkdir()
    # taxids in `values` are already internal-id-compatible (3..42 map to
    # themselves through this taxonomy's dense internal ids via to_internal)
    ext = np.array([tax.internal2org[t] if False else t for t in taxids])
    internal = np.array([tax.to_internal(int(t)) for t in taxids],
                        np.int32)
    write_db_files(str(db), values, internal.astype(np.uint32), 16)
    DbParameters(db_name="tt", creation_date="2026-08-18",
                 skip_redundancy=1).write(str(db / "db.parameters"))
    tax.save(str(db / "taxonomyDB"))
    write_taxid_list(str(db / "taxID_list"), np.unique(internal))

    q = d / "reads.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n"
                         for i, r in enumerate(reads)))
    from metabuli_tpu.params import ClassifyParams

    outs = {}
    for sc, dtx in ((2, 0), (100000, 0), (2, 1)):
        par = ClassifyParams(seq_mode=1, batch_reads=16, small_cap=sc,
                             device_tax=dtx)
        clf = Classifier(str(db), par)
        out = d / f"out{sc}_{dtx}"
        clf.classify_file(str(q), None, str(out), "tt")
        outs[sc, dtx] = (out / "tt_classifications.tsv").read_text()
    assert outs[2, 0] == outs[100000, 0]
    assert outs[2, 1] == outs[2, 0]  # fused path honors the two-tier cap
