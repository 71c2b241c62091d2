"""Native C++ taxonomer must agree with the annotated Python implementation."""

import numpy as np
import pytest

import jax

from metabuli_tpu.classify.pipeline import classify_batch
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
def test_native_matches_python(tmp_path, em):
    from metabuli_tpu.classify.native_taxonomer import NativeTaxonomer

    tax = _taxonomy(tmp_path)
    rng = np.random.default_rng(0)

    # genomes per subspecies node
    ss_nodes = [i for i in range(1, tax.n_nodes() + 1)
                if tax.rank_of(i) == "subspecies"]
    genomes = [(bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 50_000)), t)
               for t in ss_nodes]

    # build db arrays directly
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

    # reads, some with mutations to create nonzero hammings, some noise
    n_reads = 96
    reads = []
    for i in range(n_reads):
        if i % 8 == 7:
            reads.append(bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 150)))
            continue
        g, t = genomes[i % len(genomes)]
        st = int(rng.integers(0, len(g) - 150))
        read = bytearray(g[st:st + 150])
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, 150))
            read[p] = b"ACGT"[int(rng.integers(0, 4))]
        reads.append(bytes(read))
    codes, lens = encode_seqs_padded(reads, 160)
    qids = np.arange(n_reads, dtype=np.int32)
    bm = classify_batch(
        values, taxids, tax.species_of.astype(np.int32), codes, lens,
        np.zeros(n_reads, np.int32), qids, cap=32, max_matches=200_000,
    )
    from metabuli_tpu.classify.pipeline import matches_to_host
    m = matches_to_host(bm, tax.species_of.astype(np.int32))

    tp = TaxonomerParams(em=em)
    py = Taxonomer(tp, tax)
    native = NativeTaxonomer(tp, tax)

    starts = np.searchsorted(m["qid"], np.arange(n_reads), side="left")
    ends = np.searchsorted(m["qid"], np.arange(n_reads), side="right")
    read_lens = np.full(n_reads, 3 * ((150 - 2) // 3), np.int32)

    nat_results, _ = native.assign_batch(m, starts, ends, read_lens)

    n_classified = 0
    for i in range(n_reads):
        lo, hi = int(starts[i]), int(ends[i])
        from metabuli_tpu.classify.pipeline import FIELDS
        sub = {k: m[k][lo:hi] for k in FIELDS}
        want = py.choose_best_taxon(sub, int(read_lens[i])) if lo < hi else None
        got = nat_results[i]
        if want is None:
            assert not got.is_classified
            continue
        assert got.is_classified == want.is_classified, f"read {i}"
        assert got.taxid == want.taxid, f"read {i}: {got.taxid} != {want.taxid}"
        assert abs(got.score - want.score) < 1e-5, f"read {i}"
        if want.is_classified:
            n_classified += 1
            assert got.tax_counts == want.tax_counts, f"read {i}"
        if em:
            assert [s for s, _ in got.species_scores] == [
                s for s, _ in want.species_scores
            ], f"read {i}"
    assert n_classified >= 0.7 * n_reads
