"""--cds-info build path: single-frame CDS extraction without Prodigal."""

import numpy as np

from metabuli_tpu.db.cds import CdsInfo, divide_cds_noncds, parse_cds_file


def test_parse_cds_file(tmp_path):
    f = tmp_path / "g_cds_from_genomic.fna"
    # headers lead with [locus_tag=...] like real NCBI files: the reference
    # starts its bracket scan at an offset into the comment and would skip
    # a leading [protein_id=...] (IndexCreator.cpp:1294-1300)
    f.write_text(
        ">lcl|NC_0001.1_cds_NP_1.1_1 [locus_tag=LT1] [protein_id=NP_1.1] "
        "[location=10..60] [gbkey=CDS]\n"
        "ATG\n"
        ">lcl|NC_0001.1_cds_NP_2.1_2 [locus_tag=LT2] [protein_id=NP_2.1] "
        "[location=complement(join(100..150,200..250))] [gbkey=CDS]\n"
        "ATG\n"
        ">lcl|NC_0001.1_cds_3 [locus_tag=LT3] [pseudo=true] "
        "[location=300..350]\nATG\n"
    )
    cds_map = {}
    parse_cds_file(str(f), cds_map)
    infos = cds_map["NC_0001.1"]
    assert len(infos) == 2  # pseudo skipped
    assert infos[0].loc == [(10, 60)] and not infos[0].is_complement
    assert infos[1].is_complement
    assert infos[1].loc == [(100, 150), (200, 250)]


def test_divide_cds_noncds():
    rng = np.random.default_rng(0)
    seq = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 500))
    infos = [CdsInfo("P1", False, [(101, 200)]),
             CdsInfo("P2", True, [(301, 400)])]
    cds, non = divide_cds_noncds(seq, infos)
    assert len(cds) == 2
    # boundary extension: (kmerLen-1)=11 codons = 33 bases each side
    # (SeqIterator.h:46 kmerLen=12, SeqIterator.cpp:195-206)
    assert len(cds[0]) == 100 + 66
    assert cds[0][33:-33] == seq[100:200]
    # complement block is the reverse complement of the extended region
    rc = cds[1]
    want = seq[267:433][::-1].translate(bytes.maketrans(b"ACGT", b"TGCA"))
    assert rc == want
    # non-CDS block 0 is the leading gap truncated to len(cds[0])
    # (the reference scans gap i over len(cds[i]) bases,
    # IndexCreator.cpp:1118-1124)
    assert non[0] == seq[0:100][: len(cds[0])]


def test_build_with_cds_restricts_frames(tmp_path):
    from metabuli_tpu.db.build import build_database
    from metabuli_tpu.params import BuildParams

    rng = np.random.default_rng(1)
    genome = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 2000))
    taxdir = tmp_path / "tax"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n4\t|\t1\t|\tspecies\t|\n")
    (taxdir / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n4\t|\tSp\t|\t\t|\tscientific name\t|\n")
    (taxdir / "merged.dmp").write_text("")
    fa = tmp_path / "g.fna"
    fa.write_text(f">ACC_1.1\n{genome.decode()}\n")
    (tmp_path / "lib.txt").write_text(str(fa) + "\n")
    (tmp_path / "map.tsv").write_text("ACC_1.1\t4\n")
    cds_fa = tmp_path / "cds.fna"
    cds_fa.write_text(
        ">lcl|ACC_1.1_cds_P1_1 [locus_tag=LT1] [protein_id=P1.1] "
        "[location=31..630]\nATG\n"
    )
    (tmp_path / "cds_list.txt").write_text(str(cds_fa) + "\n")

    stats_all = build_database(
        str(tmp_path / "db_all"), str(tmp_path / "lib.txt"),
        str(tmp_path / "map.tsv"), str(taxdir), BuildParams(gene_prediction=0, mask_mode=0))
    stats_cds = build_database(
        str(tmp_path / "db_cds"), str(tmp_path / "lib.txt"),
        str(tmp_path / "map.tsv"), str(taxdir),
        BuildParams(gene_prediction=0, mask_mode=0, cds_info=str(tmp_path / "cds_list.txt")))
    # single-frame CDS extraction yields far fewer k-mers than 6-frame
    assert stats_cds["unique_kmers"] < stats_all["unique_kmers"] / 3
    assert stats_cds["unique_kmers"] > 100


def test_accession_level_build_and_classify(tmp_path):
    """--accession-level 1: per-accession taxa; accessionLevel 2 prunes them."""
    from metabuli_tpu.classify.classifier import Classifier
    from metabuli_tpu.db.build import build_database
    from metabuli_tpu.db.index import load_db_taxonomy
    from metabuli_tpu.params import BuildParams, ClassifyParams

    rng = np.random.default_rng(5)
    g1 = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 2000))
    g2 = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 2000))
    taxdir = tmp_path / "tax"
    taxdir.mkdir()
    (taxdir / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n4\t|\t1\t|\tspecies\t|\n")
    (taxdir / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n4\t|\tSp\t|\t\t|\tscientific name\t|\n")
    (taxdir / "merged.dmp").write_text("")
    fa = tmp_path / "g.fna"
    fa.write_text(f">ACC_1.1\n{g1.decode()}\n>ACC_2.1\n{g2.decode()}\n")
    (tmp_path / "lib.txt").write_text(str(fa) + "\n")
    (tmp_path / "map.tsv").write_text("ACC_1.1\t4\nACC_2.1\t4\n")
    db = str(tmp_path / "db")
    build_database(db, str(tmp_path / "lib.txt"), str(tmp_path / "map.tsv"),
                   str(taxdir), BuildParams(gene_prediction=0, mask_mode=0, accession_level=1))
    tax = load_db_taxonomy(db)
    # two accession nodes under species 4
    acc_nodes = [i for i in range(1, tax.n_nodes() + 1)
                 if tax.rank_of(i) == "accession"]
    assert len(acc_nodes) == 2
    assert all(tax.to_original(int(tax.parent[i])) == 4 for i in acc_nodes)
    mapfile = open(os.path.join(db, "acc2taxid.map")).read().splitlines()
    assert mapfile[0].count("\t") == 2  # 3 columns

    # reads from genome 1 classify to its accession node
    reads = [g1[i * 150 : i * 150 + 150] for i in range(8)]
    q = tmp_path / "r.fna"
    q.write_text("".join(f">r{i}\n{r.decode()}\n" for i, r in enumerate(reads)))
    par = ClassifyParams(seq_mode=1, batch_reads=16, accession_level=1)
    clf = Classifier(db, par)
    out = str(tmp_path / "out")
    clf.classify_file(str(q), None, out, "aj")
    lines = open(os.path.join(out, "aj_classifications.tsv")).read().splitlines()
    acc1_org = tax.to_original(acc_nodes[0])
    hits = [ln for ln in lines[1:] if ln.split("\t")[0] == "1"]
    assert len(hits) >= 7
    # classified below species level (to an accession node)
    sub_species = [ln for ln in hits if int(ln.split("\t")[2]) != 4]
    assert len(sub_species) >= 6


import os
