"""CLI commands and post-processing tools over a tiny built DB."""

import json
import os

import numpy as np
import pytest

from metabuli_tpu import cli
from metabuli_tpu.db.build import build_database
from metabuli_tpu.params import BuildParams


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliworld")
    rng = np.random.default_rng(99)
    genomes = {
        "ACC_A.1": (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 3000)), 4),
        "ACC_B.1": (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 3000)), 8),
    }
    nodes = [
        (1, 1, "no rank"), (2, 1, "superkingdom"), (3, 2, "genus"),
        (4, 3, "species"), (7, 2, "genus"), (8, 7, "species"),
    ]
    names = {1: "root", 2: "Bacteria", 3: "GenusA", 4: "SpA1", 7: "GenusB", 8: "SpB1"}
    taxdir = root / "taxonomy"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (taxdir / "names.dmp").write_text(
        "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n" for t, n in names.items()))
    (taxdir / "merged.dmp").write_text("")
    fdir = root / "fasta"
    fdir.mkdir()
    paths = []
    for acc, (seq, _) in genomes.items():
        p = fdir / f"{acc}.fna"
        p.write_text(f">{acc}\n{seq.decode()}\n")
        paths.append(str(p))
    (root / "library.txt").write_text("\n".join(paths) + "\n")
    (root / "acc2taxid.map").write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        + "".join(f"{a.split('.')[0]}\t{a}\t{t}\t0\n" for a, (_, t) in genomes.items())
    )
    db = str(root / "db")
    build_database(db, str(root / "library.txt"), str(root / "acc2taxid.map"),
                   str(taxdir), BuildParams(gene_prediction=0))
    # query reads from genome A
    reads = []
    g = genomes["ACC_A.1"][0]
    for i in range(10):
        reads.append(g[i * 150 : i * 150 + 150])
    q = root / "reads.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))
    return {"root": root, "db": db, "query": str(q), "genomes": genomes}


def test_cli_classify_and_validatedb(world, capsys):
    out_dir = str(world["root"] / "cls_out")
    rc = cli.main([
        "classify", world["query"], world["db"], out_dir, "cj",
        "--seq-mode", "1", "--batch-reads", "16",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["reads"] == 10
    assert summary["classified"] >= 9

    assert cli.main(["validatedb", world["db"]]) == 0


def test_cli_extract(world, capsys):
    out_dir = str(world["root"] / "cls_out")
    cls_file = os.path.join(out_dir, "cj_classifications.tsv")
    rc = cli.main([
        "extract", world["query"], cls_file, world["db"], "--tax-id", "4",
    ])
    assert rc == 0
    out_path = capsys.readouterr().out.strip().splitlines()[-1]
    assert os.path.exists(out_path)
    content = open(out_path).read()
    assert content.count(">") >= 9


def test_cli_taxdump_and_dbreport(world, tmp_path):
    assert cli.main(["taxdump", world["db"], str(tmp_path / "dump")]) == 0
    assert os.path.exists(tmp_path / "dump" / "nodes.dmp")
    assert cli.main(["database-report", world["db"]]) == 0
    report = open(os.path.join(world["db"], "database_report.tsv")).read()
    assert "SpA1" in report


def test_cli_expand_and_printinfo(world, tmp_path, capsys):
    out = str(tmp_path / "expanded.bin")
    assert cli.main(["expand_diffidx", os.path.join(world["db"], "diffIdx"), out]) == 0
    capsys.readouterr()
    vals = np.fromfile(out, dtype=np.uint64)
    assert len(vals) > 1000 and bool(np.all(vals[1:] >= vals[:-1]))
    assert cli.main(["printInfo", os.path.join(world["db"], "info"), "5"]) == 0


def test_grade(world, tmp_path, capsys):
    out_dir = str(world["root"] / "cls_out")
    cls_file = os.path.join(out_dir, "cj_classifications.tsv")
    answers = tmp_path / "answers.tsv"
    answers.write_text("".join(f"r{i}\t4\n" for i in range(10)))
    rc = cli.main(["grade", cls_file, str(answers), world["db"], "--rank", "species,genus"])
    assert rc == 0
    result = json.loads(capsys.readouterr().out)
    assert result["species"]["TP"] >= 9
    assert result["genus"]["precision"] == 1.0


def test_update_db(world, tmp_path):
    rng = np.random.default_rng(123)
    new_genome = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 2000))
    p = tmp_path / "ACC_C.1.fna"
    p.write_text(f">ACC_C.1\n{new_genome.decode()}\n")
    (tmp_path / "newlist.txt").write_text(str(p) + "\n")
    (tmp_path / "acc2taxid.new").write_text(
        "accession\taccession.version\ttaxid\tgi\nACC_C\tACC_C.1\t20\t0\n"
    )
    new_taxa = tmp_path / "newtaxa.tsv"
    new_taxa.write_text("19\t2\tgenus\tGenusC\n20\t19\tspecies\tSpC1\n")
    new_db = str(tmp_path / "db2")
    rc = cli.main([
        "updateDB", new_db, str(tmp_path / "newlist.txt"),
        str(tmp_path / "acc2taxid.new"), "--old-db", world["db"],
        "--new-taxa", str(new_taxa),
    ])
    assert rc == 0
    # new DB classifies reads from the new genome
    q = tmp_path / "newreads.fna"
    q.write_text("".join(
        f">n{i}\n{new_genome[i*150:i*150+150].decode()}\n" for i in range(5)
    ))
    out_dir = str(tmp_path / "out")
    rc = cli.main([
        "classify", str(q), new_db, out_dir, "uj", "--seq-mode", "1",
    ])
    assert rc == 0
    lines = open(os.path.join(out_dir, "uj_classifications.tsv")).read().splitlines()
    hits = [ln for ln in lines[1:] if ln.split("\t")[2] == "20"]
    assert len(hits) >= 4
    # old genomes still classified
    qa = tmp_path / "oldreads.fna"
    g = world["genomes"]["ACC_A.1"][0]
    qa.write_text("".join(f">o{i}\n{g[i*150:i*150+150].decode()}\n" for i in range(5)))
    rc = cli.main(["classify", str(qa), new_db, str(tmp_path / "out2"), "oj", "--seq-mode", "1"])
    assert rc == 0
    lines = open(os.path.join(tmp_path / "out2", "oj_classifications.tsv")).read().splitlines()
    hits = [ln for ln in lines[1:] if ln.split("\t")[2] == "4"]
    assert len(hits) >= 4


def test_classify_with_em(world, tmp_path):
    from metabuli_tpu.classify.classifier import Classifier
    from metabuli_tpu.params import ClassifyParams

    par = ClassifyParams(seq_mode=1, em=1, batch_reads=32)
    clf = Classifier(world["db"], par)
    out_dir = str(tmp_path / "em_out")
    summary = clf.classify_file(world["query"], None, out_dir, "emj")
    assert summary["reads"] == 10
    assert os.path.exists(os.path.join(out_dir, "emj_EM_report.tsv"))
    results = open(os.path.join(out_dir, "emj_EM+reclassify_results.tsv")).read().splitlines()
    # reads from genome A should reclassify to species 4
    hits = [ln for ln in results[1:] if ln.split("\t")[2] == "4"]
    assert len(hits) >= 9
    em_report = open(os.path.join(out_dir, "emj_EM_report.tsv")).read()
    assert "SpA1" in em_report


def test_classified_refiner(world, tmp_path, capsys):
    out_dir = str(world["root"] / "cls_out")
    cls_file = os.path.join(out_dir, "cj_classifications.tsv")
    rc = cli.main([
        "classifiedRefiner", cls_file, world["db"],
        "--rank", "genus", "--report", "1",
        "--out", str(tmp_path / "refined.tsv"),
    ])
    assert rc == 0
    lines = open(tmp_path / "refined.tsv").read().splitlines()
    body = [ln for ln in lines if not ln.startswith("#")]
    # reads were classified to species 4 -> re-ranked to genus 3
    assert all(ln.split("\t")[2] == "3" for ln in body if ln.split("\t")[0] == "1")
    assert os.path.exists(tmp_path / "refined_report.tsv")

    # subtree selection keeps genus-A reads, excluding B removes nothing here
    rc = cli.main([
        "classifiedRefiner", cls_file, world["db"],
        "--select-taxid", "3", "--out", str(tmp_path / "sel.tsv"),
    ])
    assert rc == 0
    sel = [ln for ln in open(tmp_path / "sel.tsv").read().splitlines()
           if not ln.startswith("#")]
    assert len(sel) >= 9


def test_old_format_db_roundtrip(world, tmp_path):
    """kmerFormat=1 (old metamer packing) build + classify."""
    from metabuli_tpu.db.build import build_database
    from metabuli_tpu.classify.classifier import Classifier
    from metabuli_tpu.params import BuildParams, ClassifyParams

    root = world["root"]
    db1 = str(tmp_path / "db_fmt1")
    build_database(
        db1, str(root / "library.txt"), str(root / "acc2taxid.map"),
        str(root / "taxonomy"), BuildParams(gene_prediction=0, kmer_format=1),
    )
    par = ClassifyParams(seq_mode=1, batch_reads=16)
    clf = Classifier(db1, par)
    assert clf.par.kmer_format == 1  # picked up from db.parameters
    out_dir = str(tmp_path / "fmt1_out")
    summary = clf.classify_file(world["query"], None, out_dir, "f1")
    assert summary["classified"] >= 9


def test_syncmer_db_roundtrip(world, tmp_path):
    """Syncmer-selected DB builds and classifies (smaller index)."""
    from metabuli_tpu.db.build import build_database
    from metabuli_tpu.classify.classifier import Classifier
    from metabuli_tpu.params import BuildParams, ClassifyParams

    root = world["root"]
    dbs = str(tmp_path / "db_sync")
    stats = build_database(
        dbs, str(root / "library.txt"), str(root / "acc2taxid.map"),
        str(root / "taxonomy"), BuildParams(gene_prediction=0, syncmer=1, smer_len=5),
    )
    par = ClassifyParams(seq_mode=1, batch_reads=16)
    clf = Classifier(dbs, par)
    assert clf.par.syncmer == 1
    out_dir = str(tmp_path / "sync_out")
    summary = clf.classify_file(world["query"], None, out_dir, "sj")
    assert summary["classified"] >= 9


def test_make_report_and_library_tools(world, tmp_path, capsys):
    out_dir = str(world["root"] / "cls_out")
    cls_file = os.path.join(out_dir, "cj_classifications.tsv")
    rc = cli.main(["make-report", cls_file, world["db"], str(tmp_path / "rep.tsv")])
    assert rc == 0
    capsys.readouterr()
    rep = open(tmp_path / "rep.tsv").read()
    assert "SpA1" in rep

    # add-to-library
    rc = cli.main([
        "add-to-library", str(world["root"] / "library.txt"),
        str(world["root"] / "acc2taxid.map"), world["db"],
        "--library-path", str(tmp_path / "lib"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["added"] == 2 and out["species_files"] == 2
    assert os.path.exists(tmp_path / "lib" / "4.fna")


def test_kmer_list_commands(world, tmp_path, capsys):
    rc = cli.main(["count-common-kmers", world["db"]])
    assert rc == 0
    counts = json.loads(capsys.readouterr().out)
    assert counts["total"] > 1000
    # two random genomes share essentially no metamers
    assert counts["common"] < counts["total"] * 0.01

    rc = cli.main(["create-unique-kmer-list", world["db"],
                   str(tmp_path / "uniq")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["kmers"] > 1000
    assert os.path.exists(tmp_path / "uniq" / "diffIdx")


def test_misc_utilities(world, tmp_path, capsys):
    out_dir = str(world["root"] / "cls_out")
    cls_file = os.path.join(out_dir, "cj_classifications.tsv")

    rc = cli.main(["printDeltaIdx", os.path.join(world["db"], "diffIdx"), "5"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 5

    # query2reference
    rc = cli.main(["query2reference", cls_file,
                   str(world["root"] / "acc2taxid.map"),
                   str(tmp_path / "q2r.tsv")])
    assert rc == 0
    capsys.readouterr()
    assert open(tmp_path / "q2r.tsv").read().count("ACC_A") >= 9

    # gradeByCladeSize
    answers = tmp_path / "ans.tsv"
    answers.write_text("".join(f"r{i}\t4\n" for i in range(10)))
    rc = cli.main(["gradeByCladeSize", cls_file, str(answers), world["db"]])
    assert rc == 0
    result = json.loads(capsys.readouterr().out)
    assert any(v["TP"] >= 9 for v in result.values())

    # editNames
    names = tmp_path / "names.dmp"
    names.write_text("5\t|\t000001.1\t|\t\t|\tscientific name\t|\n")
    tmap = tmp_path / "map.tsv"
    tmap.write_text("GCA_000001.1\t5\n")
    rc = cli.main(["editNames", str(names), str(tmap)])
    assert rc == 0
    capsys.readouterr()
    assert "GCA_000001.1" in names.read_text()


def test_maketestsets_and_grade_roundtrip(world, tmp_path, capsys):
    rc = cli.main([
        "maketestsets", str(world["root"] / "library.txt"),
        str(world["root"] / "acc2taxid.map"), str(tmp_path / "bench"),
        "--reads-per-assembly", "10", "--error-rate", "0.01",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["reads"] == 20
    # classify the generated set and grade against the answer sheet
    out_dir = str(tmp_path / "bench_out")
    rc = cli.main(["classify", str(tmp_path / "bench.fna"), world["db"],
                   out_dir, "bj", "--seq-mode", "1"])
    assert rc == 0
    capsys.readouterr()
    rc = cli.main([
        "grade", os.path.join(out_dir, "bj_classifications.tsv"),
        str(tmp_path / "bench_answers.tsv"), world["db"], "--rank", "species",
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out)
    assert result["species"]["sensitivity"] > 0.8


def test_filter_contaminants(world, tmp_path, capsys):
    """filter command removes reads matching the contam DB."""
    rng = np.random.default_rng(77)
    g = world["genomes"]["ACC_A.1"][0]
    reads = [g[i * 150 : i * 150 + 150] for i in range(5)]
    reads += [bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 150))
              for _ in range(5)]
    q = tmp_path / "mix.fna"
    q.write_text("".join(f">m{i}\n{r.decode()}\n" for i, r in enumerate(reads)))
    out_dir = str(tmp_path / "fout")
    from metabuli_tpu.tools.filter import filter_reads
    from metabuli_tpu.params import ClassifyParams

    summary = filter_reads(str(q), None, world["db"], out_dir, "fj",
                           world["db"],  # contam list: the DB itself
                           ClassifyParams(seq_mode=1, batch_reads=16),
                           print_mode=2)
    # genome-A reads are contaminants (classified) -> removed
    assert summary["removed"] == 5 and summary["kept"] == 5
    kept = open(os.path.join(out_dir, "mix_filtered.fna")).read()
    assert kept.count(">") == 5


def test_ictv_and_aa_offset_and_genus_filter(world, tmp_path, capsys):
    out_dir = str(world["root"] / "cls_out")
    cls_file = os.path.join(out_dir, "cj_classifications.tsv")

    rc = cli.main(["ictv-format", cls_file, world["db"],
                   str(tmp_path / "ictv.csv")])
    assert rc == 0
    capsys.readouterr()
    lines = open(tmp_path / "ictv.csv").read().splitlines()
    assert lines[0].startswith("SequenceID,Realm")
    assert any("SpA1" in ln for ln in lines[1:])

    rc = cli.main(["makeAAoffset", os.path.join(world["db"], "diffIdx")])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["aa_groups"] > 100
    assert os.path.exists(os.path.join(world["db"], "diffIdx.aa"))

    genus_list = tmp_path / "genera.txt"
    genus_list.write_text("3\n")
    rc = cli.main(["filter_by_genus", cls_file, str(genus_list), world["db"],
                   "--out", str(tmp_path / "bygenus.tsv")])
    assert rc == 0
    capsys.readouterr()
    body = [ln for ln in open(tmp_path / "bygenus.tsv").read().splitlines()
            if not ln.startswith("#")]
    assert len(body) >= 9


def test_grade_test_type_and_skip_secondary(tmp_path):
    from metabuli_tpu.tools.grade import read_classifications

    p = tmp_path / "cls.tsv"
    p.write_text(
        "#is_classified\tname\ttaxid\tlen\tscore\trank\ttaxcnt\n"
        "1\tGCA_000123.1_r0/1\t4\t150\t0.9\tspecies\t-\n"
        "0\tGCA_000123.1_r0/2\t0\t150\t0\t-\t-\n"
        "1\tGCA_000456.2_r1/1\t8\t150\t0.8\tspecies\t-\n"
    )
    # gtdb mangling: accession without version
    shots = read_classifications(str(p), test_type="gtdb")
    assert shots == {"GCA_000123": 4, "GCA_000456": 8}
    # skip-secondary: second observation of a classified read is dropped
    shots = read_classifications(str(p), skip_secondary=True)
    assert "GCA_000123.1_r0/2" not in shots
    # cami mangling: prefix before '/'
    shots = read_classifications(str(p), test_type="cami")
    assert shots["GCA_000123.1_r0"] == 4


def test_refiner_rank_file_type(world, tmp_path, capsys):
    # classification at genus level (above species) must be routed per flag
    cls = tmp_path / "c.tsv"
    cls.write_text(
        "#is_classified\tname\ttaxid\tlen\tscore\trank\ttaxcnt\n"
        "1\tr0\t4\t150\t0.9\tspecies\t-\n"
        "1\tr1\t3\t150\t0.5\tgenus\t-\n"
    )
    from metabuli_tpu.tools.refiner import refine

    # 0: drop rows above the rank
    out0 = refine(str(cls), world["db"], str(tmp_path / "r0.tsv"),
                  rank="species", rank_file_type=0)
    body = [l for l in open(out0).read().splitlines() if not l.startswith("#")]
    assert len(body) == 1 and "\tr0\t" in body[0]
    # 1: keep them in the main file
    out1 = refine(str(cls), world["db"], str(tmp_path / "r1.tsv"),
                  rank="species", rank_file_type=1)
    body = [l for l in open(out1).read().splitlines() if not l.startswith("#")]
    assert len(body) == 2
    # 2: separate higherRanks file
    out2 = refine(str(cls), world["db"], str(tmp_path / "r2.tsv"),
                  rank="species", rank_file_type=2)
    body = [l for l in open(out2).read().splitlines() if not l.startswith("#")]
    assert len(body) == 1
    higher = open(str(tmp_path / "r2_higherRanks.tsv")).read()
    assert "\tr1\t" in higher


def test_cli_flag_aliases(world, tmp_path, capsys):
    # --lineage alias, --kmer-begin/--kmer-end on printDeltaIdx
    rc = cli.main(["printDeltaIdx", os.path.join(world["db"], "diffIdx"),
                   "--kmer-begin", "5", "--kmer-end", "8"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
