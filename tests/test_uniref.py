"""UniRef tree, DB creation and protein classification."""

import numpy as np
import pytest

from metabuli_tpu.uniref.classifier import UnirefClassifier, create_uniref_db
from metabuli_tpu.uniref.tree import UnirefTree, build_tree

AA = "ARNDCQEGHILKMFPSTWYV"


def _random_protein(rng, n):
    return "".join(AA[i] for i in rng.integers(0, 20, n))


def _write_xml(path, entries):
    """entries: [(u100, u90, u50, seq)]"""
    ns = 'xmlns="http://uniprot.org/uniref"'
    parts = [f'<?xml version="1.0"?><UniRef100 {ns}>']
    for u100, u90, u50, seq in entries:
        parts.append(
            f'<entry id="{u100}" updated="2024-01-01">'
            "<representativeMember><dbReference type=\"UniProtKB ID\" id=\"x\">"
            f'<property type="UniRef90 ID" value="{u90}"/>'
            f'<property type="UniRef50 ID" value="{u50}"/>'
            "</dbReference>"
            f'<sequence length="{len(seq)}">{seq}</sequence>'
            "</representativeMember></entry>"
        )
    parts.append("</UniRef100>")
    path.write_text("".join(parts))


@pytest.fixture(scope="module")
def uniref_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("uniref")
    rng = np.random.default_rng(0)
    seqs = [_random_protein(rng, 120) for _ in range(4)]
    entries = [
        ("UniRef100_A1", "UniRef90_A", "UniRef50_AB", seqs[0]),
        ("UniRef100_A2", "UniRef90_A", "UniRef50_AB", seqs[1]),
        ("UniRef100_B1", "UniRef90_B", "UniRef50_AB", seqs[2]),
        ("UniRef100_C1", "UniRef90_C", "UniRef50_C", seqs[3]),
    ]
    xml = root / "uniref100.xml"
    _write_xml(xml, entries)
    db = root / "db"
    stats = create_uniref_db(str(xml), str(db))
    assert stats["clusters"] == 4 + 3 + 2  # 100s + 90s + 50s
    assert stats["kmers"] > 300
    return {"root": root, "db": str(db), "seqs": seqs}


def test_tree_structure(uniref_world):
    tree = UnirefTree.load(uniref_world["db"] + "/unirefTree")
    a1 = tree.name2id["UniRef100_A1"]
    a90 = tree.name2id["UniRef90_A"]
    ab50 = tree.name2id["UniRef50_AB"]
    b1 = tree.name2id["UniRef100_B1"]
    c1 = tree.name2id["UniRef100_C1"]
    assert tree.is_ancestor(a90, a1)
    assert tree.is_ancestor(ab50, b1)
    assert not tree.is_ancestor(a90, b1)
    assert tree.lca2(a1, tree.name2id["UniRef100_A2"]) == a90
    assert tree.lca2(a1, b1) == ab50
    assert tree.lca2(a1, c1) == 0


def test_classify_protein_queries(uniref_world, tmp_path):
    seqs = uniref_world["seqs"]
    q = tmp_path / "queries.fasta"
    q.write_text(
        f">q0 exact\n{seqs[0]}\n"
        f">q1 fragment\n{seqs[2][20:80]}\n"
        f">q2 noise\n{_random_protein(np.random.default_rng(42), 80)}\n"
    )
    clf = UnirefClassifier(uniref_world["db"])
    summary = clf.classify_file(str(q), str(tmp_path / "out"), protein=True)
    assert summary["queries"] == 3
    lines = open(summary["out"]).read().splitlines()
    rows = {ln.split("\t")[0]: ln.split("\t") for ln in lines[1:]}
    assert rows["q0"][2] == "UniRef100_A1"
    assert rows["q1"][2] == "UniRef100_B1"
    assert rows["q2"][2] == "unclassified"


def test_classify_dna_queries(uniref_world, tmp_path):
    # reverse-translate protein 0 with arbitrary codons
    from metabuli_tpu.ops.genetic_code import codon_tables
    import numpy as np

    aa_tab, _ = codon_tables(False)
    codon_of = {}
    bases = "ACTG"
    for c1 in range(4):
        for c2 in range(4):
            for c3 in range(4):
                aa = int(aa_tab[c1 * 16 + c2 * 4 + c3])
                codon_of.setdefault(aa, bases[c1] + bases[c2] + bases[c3])
    aa_index = {ch: i for i, ch in enumerate(AA)}
    protein = uniref_world["seqs"][3]
    dna = "".join(codon_of[aa_index[ch]] for ch in protein)
    q = tmp_path / "dna.fna"
    q.write_text(f">d0\n{dna}\n")
    clf = UnirefClassifier(uniref_world["db"])
    summary = clf.classify_file(str(q), str(tmp_path / "out2"), protein=False)
    lines = open(summary["out"]).read().splitlines()
    assert lines[1].split("\t")[2] == "UniRef100_C1"
