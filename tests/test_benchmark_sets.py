"""Behavior tests for the distinct benchmark-set builders + uniref2taxonomy
(`/root/reference/src/benchmark/makeInclusionQuerySet.cpp`,
`makeVirusBenchmarkSet.cpp`, `src/util/uniref2taxonomy.cpp`)."""

import os

import numpy as np

from metabuli_tpu import cli


def _world(tmp_path, n_fam=4, n_gen=3, n_sp=3, n_asm=3):
    """Taxonomy with accession-named assembly leaves + assembly list."""
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom")]
    names = {1: "root", 2: "Viruses"}
    tid = 3
    accs = []
    acc2taxid = {}
    for f in range(n_fam):
        fid = tid
        nodes.append((tid, 2, "family")); names[tid] = f"F{f}"; tid += 1
        for g in range(n_gen):
            gid = tid
            nodes.append((tid, fid, "genus")); names[tid] = f"G{f}_{g}"
            tid += 1
            for s in range(n_sp):
                sid = tid
                nodes.append((tid, gid, "species"))
                names[tid] = f"S{f}_{g}_{s}"; tid += 1
                for a in range(n_asm):
                    acc = f"GCF_{f}{g}{s}{a}.1"
                    nodes.append((tid, sid, "subspecies"))
                    names[tid] = acc
                    accs.append(acc)
                    acc2taxid[acc] = tid
                    tid += 1
    d = tmp_path / "taxonomy"
    d.mkdir()
    (d / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (d / "names.dmp").write_text("".join(
        f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n"
        for t, n in names.items()))
    (d / "merged.dmp").write_text("")
    lst = tmp_path / "assemblies.txt"
    lst.write_text("".join(a + "\n" for a in accs))
    mapping = tmp_path / "acc2taxid.tsv"
    mapping.write_text("".join(f"{a}\t{t}\n" for a, t in acc2taxid.items()))
    return str(lst), str(d), str(mapping), accs


def test_make_inclusion_queries(tmp_path):
    lst, taxdir, _, accs = _world(tmp_path, n_fam=4, n_gen=4, n_sp=4)
    assert cli.main(["makeInclusionTestQueries", lst, taxdir]) == 0
    # 64 multi-assembly species -> an eighth = 8 species x 2 assemblies
    qs = open(lst + ".subspeciesInclusionQuerySet").read().splitlines()
    assert qs[0] == "Species\tSpecies_Size\tQuery_Assemblies"
    assert len(qs) == 1 + 8
    asm = open(lst + ".subspeciesInclusionAssemblies").read().split()
    assert len(asm) == 16 and len(set(asm)) == 16
    for row in qs[1:]:
        sp, size, pair = row.split("\t")
        a1, a2 = pair.split(",")
        assert a1 != a2 and int(size) == 3
        assert a1 in accs and a2 in accs
    # 16 multi-species genera -> a quarter = 4 genera x 2 assemblies
    qg = open(lst + ".speciesInclusionQuerySet").read().splitlines()
    assert qg[0] == "Genus\tGenus_Size\tQuery_Species\tQuery_Assemblies"
    assert len(qg) == 1 + 4
    for row in qg[1:]:
        genus, size, spp, pair = row.split("\t")
        s1, s2 = spp.split(",")
        assert s1 != s2 and int(size) == 4


def test_make_inclusion_queries_unknown_accession(tmp_path):
    lst, taxdir, _, _ = _world(tmp_path, n_fam=1, n_gen=1)
    with open(lst, "a") as fh:
        fh.write("GCF_NOPE.9\n")
    assert cli.main(["makeInclusionTestQueries", lst, taxdir]) == 1


def test_make_virus_benchmark_set(tmp_path):
    lst, taxdir, mapping, accs = _world(tmp_path, n_fam=4, n_gen=3,
                                        n_sp=3, n_asm=3)
    assert cli.main(["make-virus-benchmark-set", lst, taxdir, mapping]) == 0
    excluded = open(lst + ".totalExcludedAssembly").read().split()
    database = open(lst + ".databaseAssembly").read().split()
    # partition: database + excluded == all assemblies
    assert set(excluded) | set(database) == set(accs)
    assert not set(excluded) & set(database)
    # one whole genus excluded per selected family (1/4 of 4 families)
    genera_rows = open(lst + ".excludedGenera").read().splitlines()
    assert genera_rows[1].startswith("Family\t")
    assert len(genera_rows) == 2 + 1  # header x2 + 1 selected family
    family, fsize, genus, gsize, asm_list, query = \
        genera_rows[2].split("\t")
    genus_asms = asm_list.split(",")
    assert len(genus_asms) == 9 and query in genus_asms  # 3 sp x 3 asm
    assert all(a in excluded for a in genus_asms)
    # included assemblies stay in the database list
    inc_rows = open(lst + ".includedAssembly").read().splitlines()[1:]
    for row in inc_rows:
        _, _, a = row.split("\t")
        assert a in database


def test_uniref2taxonomy(tmp_path):
    db = tmp_path / "db"
    db.mkdir()
    mapping = tmp_path / "idmapping.tsv"
    rows = []
    for i in range(5):
        cols = ["x"] * 7 + [f"UniRef100_A{i}", f"UniRef90_B{i % 2}",
                            f"UniRef50_C0"]
        rows.append("\t".join(cols))
    mapping.write_text("".join(r + "\n" for r in rows))
    assert cli.main(["uniref2taxonomy", str(mapping), str(db)]) == 0
    m100 = dict(l.split("\t") for l in
                (db / "uniref100to90.tsv").read_text().splitlines())
    assert len(m100) == 5 and m100["UniRef100_A3"] == "UniRef90_B1"
    m90 = dict(l.split("\t") for l in
               (db / "uniref90to50.tsv").read_text().splitlines())
    assert m90 == {"UniRef90_B0": "UniRef50_C0", "UniRef90_B1": "UniRef50_C0"}
    # reference-matching validation failures
    assert cli.main(["uniref2taxonomy", str(tmp_path / "nope"), str(db)]) == 1
    assert cli.main(["uniref2taxonomy", str(mapping),
                     str(tmp_path / "nodir")]) == 1
