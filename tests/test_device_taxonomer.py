"""Full device taxonomer vs the host taxonomer on pipeline-generated matches."""

import numpy as np
import pytest

from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
from metabuli_tpu.classify.pipeline import FIELDS, classify_batch, matches_to_host
from metabuli_tpu.classify.taxonomer import Taxonomer, TaxonomerParams
from metabuli_tpu.db.taxonomy import Taxonomy
from metabuli_tpu.ops.genetic_code import encode_seqs_padded


def _taxonomy(tmp_path):
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom")]
    names = {1: "root", 2: "Bacteria"}
    tid = 3
    for g in range(4):
        gid = tid
        nodes.append((tid, 2, "genus")); names[tid] = f"G{g}"; tid += 1
        for s in range(2):
            sid = tid
            nodes.append((tid, gid, "species")); names[tid] = f"S{g}_{s}"; tid += 1
            nodes.append((tid, sid, "subspecies")); names[tid] = f"SS{g}_{s}"; tid += 1
    (tmp_path / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (tmp_path / "names.dmp").write_text(
        "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n" for t, n in names.items()))
    (tmp_path / "merged.dmp").write_text("")
    return Taxonomy.from_dmp(
        str(tmp_path / "names.dmp"), str(tmp_path / "nodes.dmp"),
        str(tmp_path / "merged.dmp"))


@pytest.mark.parametrize("em", [False, True])
def test_device_taxonomer_matches_host(tmp_path, em):
    tax = _taxonomy(tmp_path)
    rng = np.random.default_rng(0)
    ss_nodes = [i for i in range(1, tax.n_nodes() + 1)
                if tax.rank_of(i) == "subspecies"]
    genomes = [(bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 50_000)), t)
               for t in ss_nodes]

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
    values = values[order]
    taxids = taxids[order]
    species = species[order]
    ng = np.ones(len(values), bool)
    ng[1:] = (values[1:] != values[:-1]) | (species[1:] != species[:-1])
    gid = np.cumsum(ng) - 1
    lca = tax.lca_segments(taxids.astype(np.int64), gid)
    values = values[ng]
    taxids = lca.astype(np.int32)

    n_reads = 128
    reads = []
    for i in range(n_reads):
        if i % 8 == 7:
            reads.append(bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 150)))
            continue
        g, t = genomes[i % len(genomes)]
        st = int(rng.integers(0, len(g) - 150))
        read = bytearray(g[st:st + 150])
        for _ in range(int(rng.integers(0, 4))):
            pp = int(rng.integers(0, 150))
            read[pp] = b"ACGT"[int(rng.integers(0, 4))]
        reads.append(bytes(read))
    codes, lens = encode_seqs_padded(reads, 160)
    qids = np.arange(n_reads, dtype=np.int32)
    bm = classify_batch(
        values, taxids, tax.species_of.astype(np.int32), codes, lens,
        np.zeros(n_reads, np.int32), qids, cap=32, max_matches=300_000,
    )
    m = matches_to_host(bm, tax.species_of.astype(np.int32))

    tp = TaxonomerParams(em=em)
    host = Taxonomer(tp, tax)
    dev = DeviceTaxonomer(tp, tax)

    read_lens = np.full(n_reads, 3 * ((150 - 2) // 3), np.int32)
    got = dev.assign_batch(m, read_lens, n_reads)

    starts = np.searchsorted(m["qid"], np.arange(n_reads), side="left")
    ends = np.searchsorted(m["qid"], np.arange(n_reads), side="right")
    n_checked = 0
    for i in range(n_reads):
        lo, hi = int(starts[i]), int(ends[i])
        if lo == hi:
            assert not got[i].is_classified
            continue
        sub = {k: m[k][lo:hi] for k in FIELDS}
        want = host.choose_best_taxon(sub, int(read_lens[i]))
        assert got[i].is_classified == want.is_classified, f"read {i}"
        assert got[i].taxid == want.taxid, (
            f"read {i}: {got[i].taxid} != {want.taxid}"
        )
        assert abs(got[i].score - want.score) < 1e-5, f"read {i}"
        if want.is_classified:
            n_checked += 1
            assert got[i].tax_counts == want.tax_counts, f"read {i}"
        if em:
            assert [s for s, _ in got[i].species_scores] == [
                s for s, _ in want.species_scores], f"read {i}"
    assert n_checked >= 0.7 * n_reads


def test_classifier_with_device_tax(tmp_path):
    """End-to-end classify with --device-tax matches the default path."""
    import os
    from metabuli_tpu.classify.classifier import Classifier
    from metabuli_tpu.db.build import build_database
    from metabuli_tpu.params import BuildParams, ClassifyParams

    rng = np.random.default_rng(6)
    genomes = {
        "DT_A.1": (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 5000)), 4),
        "DT_B.1": (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 5000)), 8),
    }
    taxdir = tmp_path / "taxonomy"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n"
        "4\t|\t2\t|\tspecies\t|\n8\t|\t2\t|\tspecies\t|\n")
    (taxdir / "names.dmp").write_text(
        "".join(f"{t}\t|\tN{t}\t|\t\t|\tscientific name\t|\n" for t in (1, 2, 4, 8)))
    (taxdir / "merged.dmp").write_text("")
    paths = []
    for acc, (seq, _) in genomes.items():
        fp = tmp_path / f"{acc}.fna"
        fp.write_text(f">{acc}\n{seq.decode()}\n")
        paths.append(str(fp))
    (tmp_path / "lib.txt").write_text("\n".join(paths) + "\n")
    (tmp_path / "map.tsv").write_text(
        "".join(f"{a}\t{t}\n" for a, (_, t) in genomes.items()))
    db = str(tmp_path / "db")
    build_database(db, str(tmp_path / "lib.txt"), str(tmp_path / "map.tsv"),
                   str(taxdir), BuildParams(gene_prediction=0, mask_mode=0))

    reads = []
    for acc, (g, _) in genomes.items():
        for i in range(8):
            read = bytearray(g[i * 300 : i * 300 + 150])
            read[50] = ord("A") if read[50] != ord("A") else ord("T")
            reads.append(bytes(read))
    q = tmp_path / "r.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))

    outs = {}
    for flag in (0, 1):
        par = ClassifyParams(seq_mode=1, batch_reads=4, device_tax=flag)
        clf = Classifier(db, par)
        if flag:
            assert clf.device_taxonomer is not None
        out = str(tmp_path / f"out{flag}")
        clf.classify_file(str(q), None, out, "dt")
        outs[flag] = open(os.path.join(out, "dt_classifications.tsv")).read()
    assert outs[0] == outs[1]


def test_fused_path_overflow_host_recombine(tmp_path):
    """Groups exceeding the device path-slot capacity re-combine exactly on
    the host: force tiny p_max and compare byte-identical output."""
    import os
    from metabuli_tpu.classify.classifier import Classifier
    from metabuli_tpu.db.build import build_database
    from metabuli_tpu.params import BuildParams, ClassifyParams

    rng = np.random.default_rng(61)
    genomes = {
        "OV_A.1": (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 6000)), 4),
        "OV_B.1": (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 6000)), 8),
    }
    taxdir = tmp_path / "taxonomy"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n"
        "4\t|\t2\t|\tspecies\t|\n8\t|\t2\t|\tspecies\t|\n")
    (taxdir / "names.dmp").write_text(
        "".join(f"{t}\t|\tN{t}\t|\t\t|\tscientific name\t|\n" for t in (1, 2, 4, 8)))
    (taxdir / "merged.dmp").write_text("")
    paths = []
    for acc, (seq, _) in genomes.items():
        fp = tmp_path / f"{acc}.fna"
        fp.write_text(f">{acc}\n{seq.decode()}\n")
        paths.append(str(fp))
    (tmp_path / "lib.txt").write_text("\n".join(paths) + "\n")
    (tmp_path / "map.tsv").write_text(
        "".join(f"{a}\t{t}\n" for a, (_, t) in genomes.items()))
    db = str(tmp_path / "db")
    build_database(db, str(tmp_path / "lib.txt"), str(tmp_path / "map.tsv"),
                   str(taxdir), BuildParams(gene_prediction=0, mask_mode=0))

    # scattered mutations give many short disjoint paths per (read, species)
    reads = []
    for acc, (g, _) in genomes.items():
        for i in range(6):
            r = bytearray(g[i * 900 : i * 900 + 600])
            for p in range(40, 600, 80):
                r[p] = ord("A") if r[p] != ord("A") else ord("T")
            reads.append(bytes(r))
    q = tmp_path / "r.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))

    outs = {}
    recombines = []
    for flag in (0, 1):
        par = ClassifyParams(seq_mode=3, batch_reads=4, device_tax=flag)
        clf = Classifier(db, par)
        if flag:
            clf._fused_pmax = 2  # force path-slot overflow -> host recombine
            orig = clf.device_taxonomer._recombine_overflow_groups

            def spy(*a, **kw):
                recombines.append(1)
                return orig(*a, **kw)

            clf.device_taxonomer._recombine_overflow_groups = spy
        out = str(tmp_path / f"out{flag}")
        clf.classify_file(str(q), None, out, "ov")
        outs[flag] = open(os.path.join(out, "ov_classifications.tsv")).read()
    assert outs[0] == outs[1]
    assert recombines, "host recombine path was not exercised"


def test_quarter_pow2_quantization():
    """fused_sizes quantizes data-dependent budgets to quarter-pow2 steps
    ({1, 1.25, 1.5, 1.75} x 2^k): never below the hinted need, slack
    capped at 25%."""
    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.taxonomer import TaxonomerParams

    dtx = DeviceTaxonomer.__new__(DeviceTaxonomer)
    dtx.p = TaxonomerParams()
    for paths in (1, 1000, 5000, 700_000, 920_000, 1_500_000):
        dtx.hints = {"paths": paths}
        sizes = dtx.fused_sizes(1024, 4096, 150)
        need = int(paths * 1.5)
        b = sizes["path_budget"]
        assert b >= min(max(need, 1024), 1 << 23)
        if 1024 < need <= (1 << 23):
            assert b <= need * 1.25 + 4, (paths, b)
        # quarter-step membership: b / 2^floor(log2 b) in {1,1.25,1.5,1.75}
        p2 = 1 << (b.bit_length() - 1)
        assert b * 4 % p2 == 0 and b // p2 in (1,), (b, p2)
