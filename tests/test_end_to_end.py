"""End-to-end slice: build a tiny DB -> classify reads -> check outputs."""

import os

import numpy as np
import pytest

from metabuli_tpu.classify.classifier import Classifier
from metabuli_tpu.db.build import build_database
from metabuli_tpu.params import BuildParams, ClassifyParams


def _random_genome(rng, length):
    return bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), size=length))


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory):
    """Two species, one genome each + taxonomy + built DB."""
    root = tmp_path_factory.mktemp("world")
    rng = np.random.default_rng(1234)
    genomes = {
        "ACC_A.1": (_random_genome(rng, 4000), 4),   # SpA1
        "ACC_B.1": (_random_genome(rng, 4000), 8),   # SpB1
    }
    # taxonomy: same shape as test_taxonomy
    nodes = [
        (1, 1, "no rank"), (2, 1, "superkingdom"), (3, 2, "genus"),
        (4, 3, "species"), (5, 3, "species"), (6, 4, "subspecies"),
        (7, 2, "genus"), (8, 7, "species"), (9, 1, "superkingdom"),
        (10, 9, "species"),
    ]
    names = {1: "root", 2: "Bacteria", 3: "GenusA", 4: "SpA1", 5: "SpA2",
             6: "SpA1s", 7: "GenusB", 8: "SpB1", 9: "Eukaryota", 10: "Yeast"}
    taxdir = root / "taxonomy"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (taxdir / "names.dmp").write_text(
        "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n" for t, n in names.items()))
    (taxdir / "merged.dmp").write_text("")

    fasta_dir = root / "fasta"
    fasta_dir.mkdir()
    paths = []
    for acc, (seq, taxid) in genomes.items():
        p = fasta_dir / f"{acc}.fna"
        p.write_text(f">{acc} test genome\n{seq.decode()}\n")
        paths.append(str(p))
    (root / "library.txt").write_text("\n".join(paths) + "\n")
    (root / "acc2taxid.map").write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        + "".join(
            f"{acc.split('.')[0]}\t{acc}\t{taxid}\t0\n"
            for acc, (_, taxid) in genomes.items()
        )
    )
    db_dir = str(root / "db")
    stats = build_database(
        db_dir,
        str(root / "library.txt"),
        str(root / "acc2taxid.map"),
        str(taxdir),
        BuildParams(gene_prediction=0, batch_bases=100_000),
    )
    assert stats["sequences"] == 2
    assert stats["unique_kmers"] > 1000
    return {"root": root, "db": db_dir, "genomes": genomes, "rng": rng}


def _sample_reads(rng, genome, n, length):
    reads = []
    for _ in range(n):
        start = int(rng.integers(0, len(genome) - length))
        read = genome[start : start + length]
        if rng.integers(0, 2):  # reverse complement half of the reads
            comp = bytes(read).translate(bytes.maketrans(b"ACGT", b"TGCA"))
            read = comp[::-1]
        reads.append(read)
    return reads


def test_classify_single_end(tiny_world, tmp_path):
    root = tiny_world["root"]
    rng = tiny_world["rng"]
    reads = []
    truth = []
    for acc, (genome, taxid) in tiny_world["genomes"].items():
        rs = _sample_reads(rng, genome, 20, 150)
        reads += rs
        truth += [taxid] * len(rs)
    q = tmp_path / "reads.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))

    par = ClassifyParams(seq_mode=1, batch_reads=64)
    clf = Classifier(tiny_world["db"], par)
    out_dir = str(tmp_path / "out")
    summary = clf.classify_file(str(q), None, out_dir, "job")
    assert summary["reads"] == len(reads)
    assert summary["classified"] >= 0.95 * len(reads)

    # check per-read classifications hit the true species
    lines = open(os.path.join(out_dir, "job_classifications.tsv")).read().splitlines()
    assert lines[0].startswith("#is_classified")
    correct = 0
    for line in lines[1:]:
        cols = line.split("\t")
        idx = int(cols[1][1:])
        if cols[0] == "1" and int(cols[2]) == truth[idx]:
            correct += 1
    assert correct >= 0.9 * len(reads)

    report = open(os.path.join(out_dir, "job_report.tsv")).read()
    assert "SpA1" in report and "SpB1" in report
    assert os.path.exists(os.path.join(out_dir, "job_krona.html"))


def test_classify_paired_end(tiny_world, tmp_path):
    rng = np.random.default_rng(77)
    genome, taxid = tiny_world["genomes"]["ACC_A.1"]
    n = 12
    r1, r2 = [], []
    for _ in range(n):
        start = int(rng.integers(0, len(genome) - 400))
        frag = genome[start : start + 400]
        r1.append(frag[:150])
        mate = frag[-150:]
        comp = bytes(mate).translate(bytes.maketrans(b"ACGT", b"TGCA"))
        r2.append(comp[::-1])
    (tmp_path / "r1.fq").write_text(
        "".join(f"@p{i}\n{r.decode()}\n+\n{'I'*len(r)}\n" for i, r in enumerate(r1)))
    (tmp_path / "r2.fq").write_text(
        "".join(f"@p{i}\n{r.decode()}\n+\n{'I'*len(r)}\n" for i, r in enumerate(r2)))

    par = ClassifyParams(seq_mode=2, batch_reads=32)
    clf = Classifier(tiny_world["db"], par)
    out_dir = str(tmp_path / "out2")
    summary = clf.classify_file(
        str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"), out_dir, "pe"
    )
    assert summary["reads"] == n
    lines = open(os.path.join(out_dir, "pe_classifications.tsv")).read().splitlines()
    good = sum(
        1 for ln in lines[1:]
        if ln.split("\t")[0] == "1" and int(ln.split("\t")[2]) == taxid
    )
    assert good >= 0.9 * n


def test_unclassified_reads(tiny_world, tmp_path):
    rng = np.random.default_rng(5150)
    reads = [_random_genome(rng, 150) for _ in range(8)]
    q = tmp_path / "noise.fna"
    q.write_text("".join(f">n{i}\n{r.decode()}\n" for i, r in enumerate(reads)))
    par = ClassifyParams(seq_mode=1, batch_reads=16)
    clf = Classifier(tiny_world["db"], par)
    out_dir = str(tmp_path / "out3")
    summary = clf.classify_file(str(q), None, out_dir, "noise")
    # random 150-mers should almost never chain 4+ consecutive matches
    assert summary["classified"] <= 1


def test_long_read_mode(tiny_world, tmp_path):
    """seq-mode 3: long reads / contigs use the 1000 denominator and the
    same pipeline; 2kb fragments classify to their species."""
    rng = np.random.default_rng(404)
    frags = []
    truth = []
    for acc, (genome, taxid) in tiny_world["genomes"].items():
        st = int(rng.integers(0, len(genome) - 2000))
        frags.append(genome[st : st + 2000])
        truth.append(taxid)
    q = tmp_path / "long.fna"
    q.write_text("".join(f">L{i}\n{f.decode()}\n" for i, f in enumerate(frags)))
    par = ClassifyParams(seq_mode=3, batch_reads=8)
    clf = Classifier(tiny_world["db"], par)
    assert clf.taxonomer.p.denominator == 1000
    out = str(tmp_path / "long_out")
    summary = clf.classify_file(str(q), None, out, "lj")
    lines = open(os.path.join(out, "lj_classifications.tsv")).read().splitlines()
    good = sum(
        1 for i, ln in enumerate(lines[1:])
        if ln.split("\t")[0] == "1" and int(ln.split("\t")[2]) == truth[i]
    )
    assert good == len(frags)


def test_resume_classification(tiny_world, tmp_path):
    """--resume appends only unprocessed reads to an existing output."""
    rng = np.random.default_rng(11)
    genome, taxid = tiny_world["genomes"]["ACC_A.1"]
    reads = [genome[i * 100 : i * 100 + 150] for i in range(10)]
    q = tmp_path / "r.fna"
    q.write_text("".join(f">x{i}\n{r.decode()}\n" for i, r in enumerate(reads)))
    out = str(tmp_path / "res_out")
    par = ClassifyParams(seq_mode=1, batch_reads=4)
    clf = Classifier(tiny_world["db"], par)
    clf.classify_file(str(q), None, out, "rj")
    full = open(os.path.join(out, "rj_classifications.tsv")).read().splitlines()

    # truncate the output to simulate an interrupted run (header + 6 rows)
    cls_path = os.path.join(out, "rj_classifications.tsv")
    with open(cls_path, "w") as fh:
        fh.write("\n".join(full[:7]) + "\n")
    clf2 = Classifier(tiny_world["db"], par)
    summary = clf2.classify_file(str(q), None, out, "rj", resume=True)
    assert summary["reads"] == 4  # only the remaining reads processed
    resumed = open(cls_path).read().splitlines()
    assert resumed == full


def test_gzip_inputs(tiny_world, tmp_path):
    """Gzipped FASTQ queries work end to end."""
    import gzip

    genome, taxid = tiny_world["genomes"]["ACC_B.1"]
    reads = [genome[i * 120 : i * 120 + 150] for i in range(6)]
    q = tmp_path / "r.fq.gz"
    payload = "".join(f"@z{i}\n{r.decode()}\n+\n{'I'*len(r)}\n"
                      for i, r in enumerate(reads))
    with gzip.open(q, "wt") as fh:
        fh.write(payload)
    par = ClassifyParams(seq_mode=1, batch_reads=8)
    clf = Classifier(tiny_world["db"], par)
    out = str(tmp_path / "gz_out")
    summary = clf.classify_file(str(q), None, out, "gz")
    assert summary["classified"] == 6
    lines = open(os.path.join(out, "gz_classifications.tsv")).read().splitlines()
    assert all(ln.split("\t")[2] == str(taxid) for ln in lines[1:])


def test_empty_and_tiny_query_files(tiny_world, tmp_path):
    q = tmp_path / "empty.fna"
    q.write_text("")
    par = ClassifyParams(seq_mode=1, batch_reads=8)
    clf = Classifier(tiny_world["db"], par)
    summary = clf.classify_file(str(q), None, str(tmp_path / "e_out"), "e")
    assert summary["reads"] == 0

    q2 = tmp_path / "tiny.fna"
    q2.write_text(">t0\nACGT\n>t1\n" + "A" * 23 + "\n")  # below k-mer minimum
    summary = clf.classify_file(str(q2), None, str(tmp_path / "t_out"), "t")
    assert summary["reads"] == 2 and summary["classified"] == 0


def test_iupac_genome_build(tmp_path):
    """Degenerate IUPAC codes in reference genomes canonicalize like the
    reference's atcg table; Ns break k-mer windows."""
    from metabuli_tpu.db.build import build_database
    rng = np.random.default_rng(21)
    core = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 3000))
    messy = core[:1000] + b"RYSWKMBDHVN" * 10 + core[1000:]
    taxdir = tmp_path / "tax"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text("1\t|\t1\t|\tno rank\t|\n4\t|\t1\t|\tspecies\t|\n")
    (taxdir / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n4\t|\tSp\t|\t\t|\tscientific name\t|\n")
    (taxdir / "merged.dmp").write_text("")
    fa = tmp_path / "g.fna"
    fa.write_text(f">ACC_M.1\n{messy.decode()}\n")
    (tmp_path / "lib.txt").write_text(str(fa) + "\n")
    (tmp_path / "map.tsv").write_text("ACC_M.1\t4\n")
    db = str(tmp_path / "db")
    stats = build_database(db, str(tmp_path / "lib.txt"), str(tmp_path / "map.tsv"),
                           str(taxdir), BuildParams(gene_prediction=0, mask_mode=0))
    assert stats["unique_kmers"] > 1000
    # reads from the clean core still classify
    q = tmp_path / "r.fna"
    q.write_text("".join(f">c{i}\n{core[i*150:i*150+150].decode()}\n" for i in range(5)))
    clf = Classifier(db, ClassifyParams(seq_mode=1, batch_reads=8))
    summary = clf.classify_file(str(q), None, str(tmp_path / "out"), "m")
    assert summary["classified"] == 5


def test_reduced_alphabet_end_to_end(tmp_path):
    """--reduced-aa 1: build + classify with the 16-letter alphabet
    (4-bit AA / 4-bit codon layout) works end to end, and the native and
    Python taxonomer paths agree."""
    rng = np.random.default_rng(616)
    root = tmp_path
    genomes = {
        "RED_A.1": (_random_genome(rng, 3000), 4),
        "RED_B.1": (_random_genome(rng, 3000), 8),
    }
    nodes = [
        (1, 1, "no rank"), (2, 1, "superkingdom"), (3, 2, "genus"),
        (4, 3, "species"), (7, 2, "genus"), (8, 7, "species"),
    ]
    names = {1: "root", 2: "Bacteria", 3: "GenusA", 4: "SpA1",
             7: "GenusB", 8: "SpB1"}
    taxdir = root / "taxonomy"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (taxdir / "names.dmp").write_text(
        "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n"
                for t, n in names.items()))
    (taxdir / "merged.dmp").write_text("")
    fasta_dir = root / "fasta"
    fasta_dir.mkdir()
    paths = []
    for acc, (seq, taxid) in genomes.items():
        p = fasta_dir / f"{acc}.fna"
        p.write_text(f">{acc}\n{seq.decode()}\n")
        paths.append(str(p))
    (root / "library.txt").write_text("\n".join(paths) + "\n")
    (root / "acc2taxid.map").write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        + "".join(f"{acc.split('.')[0]}\t{acc}\t{taxid}\t0\n"
                  for acc, (_, taxid) in genomes.items()))
    db_dir = str(root / "db")
    build_database(
        db_dir, str(root / "library.txt"), str(root / "acc2taxid.map"),
        str(taxdir), BuildParams(gene_prediction=0, batch_bases=100_000, reduced_aa=1),
    )
    # db.parameters must record + re-apply the reduced alphabet
    from metabuli_tpu.db.formats import DbParameters
    dbp = DbParameters.read(os.path.join(db_dir, "db.parameters"))
    assert dbp.reduced_aa == 1

    reads, truth = [], []
    for acc, (genome, taxid) in genomes.items():
        rs = _sample_reads(rng, genome, 12, 150)
        reads += rs
        truth += [taxid] * len(rs)
    q = root / "reads.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))

    par = ClassifyParams(seq_mode=1, batch_reads=32)
    clf = Classifier(db_dir, par)
    assert clf.par.reduced_aa == 1  # picked up from db.parameters
    out_dir = str(root / "out")
    summary = clf.classify_file(str(q), None, out_dir, "red")
    assert summary["reads"] == len(reads)
    assert summary["classified"] >= 0.9 * len(reads)
    lines = open(os.path.join(out_dir, "red_classifications.tsv")).read().splitlines()
    correct = sum(
        1 for ln in lines[1:]
        if ln.split("\t")[0] == "1"
        and int(ln.split("\t")[2]) == truth[int(ln.split("\t")[1][1:])]
    )
    assert correct >= 0.85 * len(reads)

    # python-taxonomer path must agree byte-for-byte with the native one
    os.environ["METABULI_TPU_NO_NATIVE"] = "1"
    try:
        clf2 = Classifier(db_dir, ClassifyParams(seq_mode=1, batch_reads=32))
        assert clf2.native_taxonomer is None
        out_dir2 = str(root / "out_py")
        clf2.classify_file(str(q), None, out_dir2, "red")
        a = open(os.path.join(out_dir, "red_classifications.tsv")).read()
        b = open(os.path.join(out_dir2, "red_classifications.tsv")).read()
        assert a == b
    finally:
        del os.environ["METABULI_TPU_NO_NATIVE"]


def test_out_of_core_build_matches_in_memory(tiny_world, tmp_path):
    """flush + k-way merge (the --max-ram analogue of
    IndexCreator.h:322-472) produces the same diffIdx/info as the
    in-memory build."""
    root = tiny_world["root"]
    db2 = str(tmp_path / "db_ooc")
    build_database(
        db2, str(root / "library.txt"), str(root / "acc2taxid.map"),
        str(root / "taxonomy"),
        BuildParams(gene_prediction=0, batch_bases=30_000, flush_kmers=1500),
    )
    # multiple flushes must actually have happened for this to test merging
    for f in ("diffIdx", "info"):
        with open(os.path.join(tiny_world["db"], f), "rb") as fa, \
             open(os.path.join(db2, f), "rb") as fb:
            assert fa.read() == fb.read(), f
    assert not os.path.exists(os.path.join(db2, "flush")) or \
        not os.listdir(os.path.join(db2, "flush"))

    # classify against the merged DB: identical outputs
    rng = np.random.default_rng(99)
    genome, _ = tiny_world["genomes"]["ACC_A.1"]
    reads = _sample_reads(rng, genome, 10, 150)
    q = tmp_path / "r.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))
    outs = []
    for db in (tiny_world["db"], db2):
        clf = Classifier(db, ClassifyParams(seq_mode=1, batch_reads=16))
        od = str(tmp_path / f"out_{os.path.basename(db)}")
        clf.classify_file(str(q), None, od, "j")
        outs.append(open(os.path.join(od, "j_classifications.tsv")).read())
    assert outs[0] == outs[1]


def test_gene_prediction_build(tmp_path):
    """--gene-prediction 1: coding-frame-restricted DB (native predictor +
    extended ORFs) classifies gene-region reads and is smaller than the
    6-frame superset DB."""
    from metabuli_tpu.db.genes import revcomp

    rng = np.random.default_rng(777)

    def make_genome(n_genes):
        aa_codons = [b"GCT", b"GAA", b"AAA", b"CTG", b"GAT", b"ATT",
                     b"GGT", b"CGT", b"TTC", b"CAG"]
        parts = []
        for i in range(n_genes):
            parts.append(bytes(rng.choice(
                np.array(list(b"ACGT"), np.uint8), 120)))
            gene = b"ATG" + b"".join(
                aa_codons[int(rng.integers(0, len(aa_codons)))]
                for _ in range(180)) + b"TAA"
            parts.append(revcomp(gene) if i % 3 == 2 else gene)
        parts.append(bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 120)))
        return b"".join(parts)

    genomes = {"GP_A.1": (make_genome(8), 4), "GP_B.1": (make_genome(8), 8)}
    taxdir = tmp_path / "taxonomy"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n"
        "4\t|\t2\t|\tspecies\t|\n8\t|\t2\t|\tspecies\t|\n")
    (taxdir / "names.dmp").write_text(
        "".join(f"{t}\t|\tN{t}\t|\t\t|\tscientific name\t|\n"
                for t in (1, 2, 4, 8)))
    (taxdir / "merged.dmp").write_text("")
    paths = []
    for acc, (seq, _) in genomes.items():
        fp = tmp_path / f"{acc}.fna"
        fp.write_text(f">{acc}\n{seq.decode()}\n")
        paths.append(str(fp))
    (tmp_path / "lib.txt").write_text("\n".join(paths) + "\n")
    (tmp_path / "map.tsv").write_text(
        "".join(f"{a}\t{t}\n" for a, (_, t) in genomes.items()))

    stats = {}
    for gp_flag in (0, 1):
        db = str(tmp_path / f"db{gp_flag}")
        stats[gp_flag] = build_database(
            db, str(tmp_path / "lib.txt"), str(tmp_path / "map.tsv"),
            str(taxdir), BuildParams(mask_mode=0, gene_prediction=gp_flag))
    assert stats[1]["unique_kmers"] < stats[0]["unique_kmers"]

    reads, truth = [], []
    for acc, (g, taxid) in genomes.items():
        rs = _sample_reads(rng, g, 15, 150)
        reads += rs
        truth += [taxid] * len(rs)
    q = tmp_path / "r.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))
    clf = Classifier(str(tmp_path / "db1"),
                     ClassifyParams(seq_mode=1, batch_reads=32))
    out = str(tmp_path / "out")
    summary = clf.classify_file(str(q), None, out, "gp")
    lines = open(os.path.join(out, "gp_classifications.tsv")).read().splitlines()
    correct = sum(
        1 for ln in lines[1:]
        if ln.split("\t")[0] == "1"
        and int(ln.split("\t")[2]) == truth[int(ln.split("\t")[1][1:])]
    )
    assert correct >= 0.8 * len(reads)


def test_auto_batch_reads(tiny_world, tmp_path):
    """--batch-reads 0 derives the batch size from device memory and
    still classifies correctly."""
    rng = np.random.default_rng(31)
    genome, taxid = tiny_world["genomes"]["ACC_A.1"]
    reads = _sample_reads(rng, genome, 8, 150)
    q = tmp_path / "r.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))
    par = ClassifyParams(seq_mode=1, batch_reads=0)
    clf = Classifier(tiny_world["db"], par)
    assert par.batch_reads >= 512 and par.batch_reads & (par.batch_reads - 1) == 0
    out = str(tmp_path / "out")
    summary = clf.classify_file(str(q), None, out, "ab")
    assert summary["classified"] >= 7


def test_print_log_and_verbosity(tiny_world, tmp_path, capfd):
    """--print-log dumps per-species match paths during combination (the
    active reference debug branch, Taxonomer.cpp:346-353) and --verbosity 0
    suppresses the summary line (Debug::setDebugLevel,
    LocalParameters.cpp:1098)."""
    import re

    from metabuli_tpu import cli

    acc, (genome, taxid) = next(iter(tiny_world["genomes"].items()))
    rng = tiny_world["rng"]
    reads = _sample_reads(rng, genome, 6, 150)
    q = tmp_path / "r.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n"
                         for i, r in enumerate(reads)))
    out = str(tmp_path / "out")
    assert cli.main(["classify", str(q), tiny_world["db"], out, "j",
                     "--seq-mode", "1", "--batch-reads", "8",
                     "--print-log", "1", "--verbosity", "0"]) == 0
    captured = capfd.readouterr()
    # per-species path dumps: "Current species: <orig> <internal>" followed
    # by "start end score hamming depth" rows
    assert "Current species: " in captured.out
    assert re.search(r"\n\d+ \d+ [0-9.]+ \d+ \d+\n", captured.out)
    # verbosity 0: no JSON summary line
    assert not re.search(r'\{"reads":', captured.out)
