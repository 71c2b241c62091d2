"""Benchmark: end-to-end classification throughput on one TPU chip.

Builds a synthetic multi-species database (~3M metamers from 8 random
200kb genomes), classifies 150bp reads sampled from those genomes (plus 10%
random-noise reads), and reports steady-state reads/second through the full
pipeline (device extraction+search+sort and native host taxonomer).

Baseline: the reference publishes no absolute throughput numbers
(BASELINE.md); `BASELINE.json` targets >= 10x reads/s over one CPU socket.
We use 20,000 reads/s as the assumed single-socket reference throughput for
short paired reads (order of magnitude consistent with the README's
"15M reads vs 69GiB DB on a MacBook Air" feasibility claim,
`/root/reference/README.md:247`); vs_baseline = value / 20000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_READS_PER_S = 20_000.0


def adaptive_budget(n_matches: int) -> int:
    """Pow2 match budget from an observed count (+30% headroom).

    Every post-compaction tensor (taxdna gathers, chain-grid scatters, the
    final multi-key sort, quotient reduction) is sized by the match budget,
    so a conservative static budget multiplies their cost; the classifier
    CLI path sizes it from observed density the same way (classifier.py
    `_obs_ratio`), with the overflow counter driving a retry."""
    b = 4096
    while b < int(n_matches * 1.3) + 1024:
        b *= 2
    return b

N_GENOMES = 8
GENOME_LEN = 200_000
N_READS = 32_768
READ_LEN = 150
BATCH = 8192


def build_world(tmp):
    import pathlib

    rng = np.random.default_rng(0)
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom")]
    names = {1: "root", 2: "Bacteria"}
    tid = 3
    species = []
    for g in range(N_GENOMES // 2):
        gid = tid
        nodes.append((tid, 2, "genus")); names[tid] = f"G{g}"; tid += 1
        for s in range(2):
            nodes.append((tid, gid, "species")); names[tid] = f"S{g}_{s}"
            species.append(tid); tid += 1
    d = pathlib.Path(tmp)
    (d / "nodes.dmp").write_text(
        "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
    (d / "names.dmp").write_text(
        "".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n" for t, n in names.items()))
    (d / "merged.dmp").write_text("")

    from metabuli_tpu.db.taxonomy import Taxonomy

    tax = Taxonomy.from_dmp(
        str(d / "names.dmp"), str(d / "nodes.dmp"), str(d / "merged.dmp"))
    genomes = [
        (bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), GENOME_LEN)), sp)
        for sp in species
    ]
    return tax, genomes, rng


def build_db(tax, genomes):
    from metabuli_tpu.db.build import IndexBuilder, SeqTask, predict_gene_blocks
    from metabuli_tpu.params import BuildParams

    builder = IndexBuilder(BuildParams(batch_bases=4_000_000), tax)
    tasks = [
        SeqTask(g, tax.to_internal(sp), int(tax.species_of[tax.to_internal(sp)]))
        for g, sp in genomes
    ]
    # reference DBs are always gene-predicted (IndexCreator.cpp:1128-1218
    # runs Prodigal unconditionally): one coding frame per block, not a
    # 6-frame superset — the bench DB mirrors that pipeline shape
    tasks = predict_gene_blocks(tasks, tax)
    builder.add_sequences(tasks)
    values = np.concatenate(builder._values)
    taxids = np.concatenate(builder._taxids)
    species = np.concatenate(builder._species)
    order = np.lexsort((taxids, species, values))
    values, taxids, species = values[order], taxids[order], species[order]
    ng = np.ones(len(values), bool)
    ng[1:] = (values[1:] != values[:-1]) | (species[1:] != species[:-1])
    gid = np.cumsum(ng) - 1
    lca = tax.lca_segments(taxids.astype(np.int64), gid)
    values = values[ng]
    taxids = lca.astype(np.int32)
    aa = values >> np.uint64(24)
    change = np.nonzero(aa[1:] != aa[:-1])[0]
    bounds = np.concatenate([[-1], change, [len(aa) - 1]])
    cap = int(np.diff(bounds).max()) if len(values) else 1
    return values, taxids, cap


def sample_reads(genomes, rng):
    reads = []
    for i in range(N_READS):
        if i % 10 == 9:
            reads.append(bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), READ_LEN)))
            continue
        g, _ = genomes[i % len(genomes)]
        st = int(rng.integers(0, len(g) - READ_LEN))
        read = bytearray(g[st : st + READ_LEN])
        for _ in range(int(rng.integers(0, 3))):  # up to 2 mutations
            p = int(rng.integers(0, READ_LEN))
            read[p] = b"ACGT"[int(rng.integers(0, 4))]
        if rng.integers(0, 2):
            read = bytearray(
                bytes(read).translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
            )
        reads.append(bytes(read))
    return reads


def main():
    import os
    import tempfile

    import jax

    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.native_taxonomer import NativeTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index,
        classify_batch_indexed,
        fetched_to_host,
        matches_to_host,
        prefetch_counts,
        start_fetch,
    )
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    use_fused = os.environ.get("METABULI_BENCH_PATH", "fused") == "fused"

    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = build_world(tmp)
        t0 = time.time()
        values, taxids, cap = build_db(tax, genomes)
        sys.stderr.write(
            f"db: {len(values)} kmers, cap {cap}, built in {time.time()-t0:.1f}s\n"
        )
        reads = sample_reads(genomes, rng)
        t2s = tax.species_of.astype(np.int32)
        index = build_dev_index(values, taxids)
        d_t2s = jax.device_put(t2s)

        taxonomer = NativeTaxonomer(TaxonomerParams(), tax)
        read_len = 3 * ((READ_LEN - 2) // 3)

        # pre-encode batches (host prep excluded from the steady-state timing
        # of a single chip; in production encoding overlaps device compute)
        batches = []
        for i in range(0, N_READS, BATCH):
            chunk = reads[i : i + BATCH]
            codes, lens = encode_seqs_padded(chunk, 160)
            batches.append(
                (
                    codes,
                    lens,
                    np.zeros(len(chunk), np.int32),
                    np.arange(len(chunk), dtype=np.int32),
                    len(chunk),
                )
            )

        max_matches = BATCH * 230

        if use_fused:
            # fused device taxonomer: matches never leave HBM; only the
            # ~170KB group/taxcount tensors transfer per batch (the
            # dev-chip tunnel link runs at ~40MB/s, so the plain path's
            # per-batch ~13MB match transfer dominates there)
            tp = TaxonomerParams()
            dtx = DeviceTaxonomer(tp, tax)
            rl = np.full(BATCH, read_len, np.int32)

            # warmup: one plain batch seeds the fused grid-size hints
            t0 = time.time()
            bm = classify_batch_indexed(
                index, d_t2s, *batches[0][:4],
                cap=max(1, cap), max_matches=max_matches,
            )
            m = matches_to_host(bm, t2s)
            dtx.set_hints(m, tp.dna_shift)
            # right-size the match budget to the observed density; the
            # drain loop below grows it again if a later batch overflows
            max_matches = adaptive_budget(m["n_matches"])

            # two-tier candidate cap: almost every AA group in this DB has
            # one row, so tier 1 gathers a single candidate per k-mer and
            # the rare multi-row groups re-gather at the full cap
            cap1 = 1 if cap > 1 else max(1, cap)
            cap2 = max(1, cap) if cap > 1 else 0
            ovb = 65536 if cap > 1 else 0

            def dispatch(b):
                codes, lens, offs, qids, n_chunk = b
                h = dtx.dispatch_fused(
                    index, d_t2s, codes, lens, offs, qids,
                    n_reads=n_chunk, max_read_len=read_len,
                    cap=cap1, max_matches=max_matches,
                    reduced=False, syncmer=False, smer_len=5, kmer_format=2,
                    read_lens_by_qid=rl[:n_chunk],
                    cap2=cap2, cap_ov_budget=ovb,
                )
                return h, b

            def drain(h, b):
                nonlocal max_matches
                n_chunk = b[4]
                results, info = dtx.drain_fused(h, rl[:n_chunk], n_chunk)
                # relaunch on grid overflow (hints already folded in the
                # observed sizes) or match-budget overflow (budget regrows
                # from the true count)
                while results is None or info["n_matches"] > max_matches:
                    if info["n_matches"] > max_matches:
                        max_matches = adaptive_budget(info["n_matches"])
                    h, _ = dispatch(b)
                    results, info = dtx.drain_fused(h, rl[:n_chunk], n_chunk)
                assert info["n_over_cap"] == 0, "cap retry needed"
                assert not ovb or info["n_ov_cap"] <= ovb, "ov budget"
                return sum(r.is_classified for r in results)

            drain(*dispatch(batches[0]))
            sys.stderr.write(f"warmup (compile): {time.time()-t0:.1f}s\n")

            t0 = time.time()
            classified = 0
            pending = dispatch(batches[0])
            for b in batches[1:]:
                nxt = dispatch(b)
                classified += drain(*pending)
                pending = nxt
            classified += drain(*pending)
            dt = time.time() - t0
        else:
            # fast host-taxonomer path: no device-wide sort (native per-read
            # sort instead), 4-word packed transfer
            kw = dict(cap=max(1, cap), max_matches=max_matches,
                      sort_device=False, pack4=True)

            def dispatch(codes, lens, offs, qids, n_chunk):
                bm = classify_batch_indexed(
                    index, d_t2s, codes, lens, offs, qids, **kw
                )
                prefetch_counts(bm)
                return bm, n_chunk

            def begin_fetch(bm, n_chunk):
                # slice the buffer to the REAL match count and start the
                # async D2H copy; the previous batch's taxonomer overlaps
                # the transfer
                return start_fetch(bm), n_chunk

            def drain(fetch, n_chunk):
                m = fetched_to_host(fetch, t2s, sorted_rows=False)
                starts = np.searchsorted(m["qid"], np.arange(n_chunk), "left")
                ends = np.searchsorted(m["qid"], np.arange(n_chunk), "right")
                res, _ = taxonomer.assign_batch(
                    m, starts, ends, np.full(n_chunk, read_len, np.int32)
                )
                return sum(r.is_classified for r in res)

            # warmup: compile
            t0 = time.time()
            drain(*begin_fetch(*dispatch(*batches[0])))
            sys.stderr.write(f"warmup (compile): {time.time()-t0:.1f}s\n")

            # depth-2 software pipeline: while batch i's sliced match
            # transfer flows D2H, batch i+1's device program runs and
            # batch i-1's host taxonomer executes
            t0 = time.time()
            classified = 0
            in_dev = dispatch(*batches[0])  # program in flight
            in_xfer = None                  # transfer in flight
            for b in batches[1:]:
                nxt = dispatch(*b)
                xfer = begin_fetch(*in_dev)
                if in_xfer is not None:
                    classified += drain(*in_xfer)
                in_dev, in_xfer = nxt, xfer
            classified += drain(*begin_fetch(*in_dev)) + (
                drain(*in_xfer) if in_xfer is not None else 0
            )
            dt = time.time() - t0
        value = N_READS / dt
        sys.stderr.write(
            f"{N_READS} reads in {dt:.2f}s; classified {classified} "
            f"({100*classified/N_READS:.1f}%)\n"
        )
        print(
            json.dumps(
                {
                    "metric": "classification_throughput",
                    "value": round(value, 1),
                    "unit": "reads/s",
                    "vs_baseline": round(value / BASELINE_READS_PER_S, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
