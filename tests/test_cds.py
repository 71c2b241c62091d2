"""--cds-info build path: single-frame CDS extraction without Prodigal."""

import numpy as np

from metabuli_tpu.db.cds import CdsInfo, divide_cds_noncds, parse_cds_file


def test_parse_cds_file(tmp_path):
    f = tmp_path / "g_cds_from_genomic.fna"
    f.write_text(
        ">lcl|NC_0001.1_cds_NP_1.1_1 [protein_id=NP_1.1] [location=10..60] [gbkey=CDS]\n"
        "ATG\n"
        ">lcl|NC_0001.1_cds_NP_2.1_2 [protein_id=NP_2.1] "
        "[location=complement(join(100..150,200..250))] [gbkey=CDS]\n"
        "ATG\n"
        ">lcl|NC_0001.1_cds_3 [pseudo=true] [location=300..350]\nATG\n"
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
    # boundary extension: 21 bases each side
    assert len(cds[0]) == 100 + 42
    assert cds[0][21:-21] == seq[100:200]
    # complement block is the reverse complement of the extended region
    rc = cds[1]
    want = seq[279:421][::-1].translate(bytes.maketrans(b"ACGT", b"TGCA"))
    assert rc == want
    # non-CDS covers the uncovered gaps
    assert any(seq[0:100] in b for b in non)


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
        ">lcl|ACC_1.1_cds_P1_1 [protein_id=P1.1] [location=31..630]\nATG\n"
    )
    (tmp_path / "cds_list.txt").write_text(str(cds_fa) + "\n")

    stats_all = build_database(
        str(tmp_path / "db_all"), str(tmp_path / "lib.txt"),
        str(tmp_path / "map.tsv"), str(taxdir), BuildParams(mask_mode=0))
    stats_cds = build_database(
        str(tmp_path / "db_cds"), str(tmp_path / "lib.txt"),
        str(tmp_path / "map.tsv"), str(taxdir),
        BuildParams(mask_mode=0, cds_info=str(tmp_path / "cds_list.txt")))
    # single-frame CDS extraction yields far fewer k-mers than 6-frame
    assert stats_cds["unique_kmers"] < stats_all["unique_kmers"] / 3
    assert stats_cds["unique_kmers"] > 100
