"""Sharded FUSED classify+taxonomer on the CPU mesh == single-chip fused.

The (data, db) mesh program matches per shard, all_gathers + merge-sorts
the match columns over the db axis, and runs the device-taxonomer tail on
device — only packed group/taxcount tensors leave. Results must equal the
single-device fused path read for read.
"""

import numpy as np
import jax
import pytest

from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
from metabuli_tpu.classify.pipeline import (
    build_dev_index,
    classify_batch,
    matches_to_host,
)
from metabuli_tpu.classify.taxonomer import TaxonomerParams
from metabuli_tpu.db.taxonomy import Taxonomy
from metabuli_tpu.ops.genetic_code import encode_seqs_padded
from metabuli_tpu.parallel.mesh import (
    build_sharded_fused,
    make_mesh,
    shard_index_aa_aligned,
)


def _taxonomy(tmp_path):
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom")]
    names = {1: "root", 2: "Bacteria"}
    tid = 3
    for g in range(4):
        gid = tid
        nodes.append((tid, 2, "genus")); names[tid] = f"G{g}"; tid += 1
        for s in range(2):
            nodes.append((tid, gid, "species")); names[tid] = f"S{g}_{s}"
            tid += 1
    (tmp_path / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (tmp_path / "names.dmp").write_text(
        "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n"
                for t, n in names.items()))
    (tmp_path / "merged.dmp").write_text("")
    return Taxonomy.from_dmp(
        str(tmp_path / "names.dmp"), str(tmp_path / "nodes.dmp"),
        str(tmp_path / "merged.dmp"))


@pytest.mark.parametrize("route", ["gather", "alltoall"])
def test_sharded_fused_equals_single_fused(tmp_path, route):
    tax = _taxonomy(tmp_path)
    rng = np.random.default_rng(3)
    sp_nodes = [i for i in range(1, tax.n_nodes() + 1)
                if tax.rank_of(i) == "species"]
    genomes = [(bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 30_000)),
                t) for t in sp_nodes]

    from metabuli_tpu.ops import encode
    all_v, all_t, all_s = [], [], []
    for seq, t in genomes:
        codes_g, lens_g = encode_seqs_padded([seq])
        mm = encode.extract_metamers(codes_g, lens_g)
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
    t2s = tax.species_of.astype(np.int32)

    mesh = make_mesh(jax.devices(), n_db=2)
    n_data = mesh.shape["data"]
    per_row = 8
    n_reads = n_data * per_row
    reads = []
    for i in range(n_reads):
        g, _ = genomes[i % len(genomes)]
        st = int(rng.integers(0, len(g) - 150))
        read = bytearray(g[st:st + 150])
        read[40] = ord("A") if read[40] != ord("A") else ord("T")
        reads.append(bytes(read))
    codes, lens = encode_seqs_padded(reads, 160)
    offs = np.zeros(n_reads, np.int32)
    qids = np.tile(np.arange(per_row, dtype=np.int32), n_data)  # local qids
    read_len = 3 * ((150 - 2) // 3)
    rl = np.full(n_reads, read_len, np.int32)

    tp = TaxonomerParams()
    dtx = DeviceTaxonomer(tp, tax)

    # hints from a host match pass so both fused programs compile small
    bm = classify_batch(values, taxids, t2s, codes, lens, offs,
                        np.arange(n_reads, dtype=np.int32),
                        cap=16, max_matches=1 << 16)
    m = matches_to_host(bm, t2s)
    dtx.set_hints(m, tp.dna_shift)
    max_matches = 1 << 15
    sizes = dtx.fused_sizes(per_row, max_matches, read_len)

    db, n_pad, iters = shard_index_aa_aligned(values, taxids, 2)
    step = build_sharded_fused(
        mesh, n_pad=n_pad, search_iters=iters, cap=16,
        max_matches=max_matches, sizes=sizes, route=route,
    )
    d_t2s = np.asarray(t2s, np.int32)
    packed, ovp, counts = step(
        db, d_t2s, dtx.dt, dtx.min_depth, rl, codes, lens, offs, qids
    )
    packed, ovp, counts = (np.asarray(packed), np.asarray(ovp),
                           np.asarray(counts))
    assert packed.shape[0] == n_data
    n_db = mesh.shape["db"]

    def drain_row(row):
        """Row results; alltoall partitions reads across db ranks."""
        if route == "gather":
            got, ginfo = dtx.drain_fused(
                (packed[row], ovp[row], counts[row], sizes), rl[:per_row],
                per_row)
            assert ginfo["tax_overflow"] == 0
            return got, ginfo["n_matches"]
        merged = [None] * per_row
        n_matches = 0
        stride = -(-per_row // n_db)
        for rank in range(n_db):
            got, ginfo = dtx.drain_fused(
                (packed[row, rank], ovp[row, rank], counts[row, rank],
                 sizes), rl[:per_row], per_row)
            assert ginfo["tax_overflow"] == 0, f"rank {rank}"
            n_matches += ginfo["n_matches"]
            for q in range(rank * stride, min((rank + 1) * stride,
                                              per_row)):
                merged[q] = got[q]
        return merged, n_matches

    # reference: single-device fused per data row
    index = build_dev_index(values, taxids)
    for row in range(n_data):
        sl = slice(row * per_row, (row + 1) * per_row)
        h = dtx.dispatch_fused(
            index,
            d_t2s, codes[sl], lens[sl], offs[sl],
            np.arange(per_row, dtype=np.int32),
            n_reads=per_row, max_read_len=read_len,
            cap=16, max_matches=max_matches,
            reduced=False, syncmer=False, smer_len=5, kmer_format=2,
            read_lens_by_qid=rl[sl],
        )
        want, winfo = dtx.drain_fused(h, rl[sl], per_row)
        assert winfo["tax_overflow"] == 0
        got, n_matches = drain_row(row)
        if route == "gather":
            assert n_matches == winfo["n_matches"], f"row {row}"
        for i, (a, b) in enumerate(zip(got, want)):
            assert a.is_classified == b.is_classified, f"row {row} read {i}"
            assert a.taxid == b.taxid, f"row {row} read {i}"
            assert abs(a.score - b.score) < 1e-6, f"row {row} read {i}"
