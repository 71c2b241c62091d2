"""Per-line device trace of the fused program on the decoy-padded bench
world (the BENCH_r04 configuration: 60M rows, 16k-read batches)."""

import glob
import gzip
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401
import bench as B


def main():
    import tempfile

    import jax

    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index, classify_batch_indexed, matches_to_host, pack_codes)
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.ops import encode
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        cache = "/tmp/prof_db_big.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        else:
            values, taxids, cap = B.build_db(tax, genomes)
            sp = np.unique(
                tax.species_of[np.asarray(taxids, np.int64)]).astype(np.int32)
            values, taxids = B.pad_with_decoys(values, taxids, sp, rng,
                                               B.N_DECOYS)
            np.savez(cache, values=values, taxids=taxids, cap=cap)
        print(f"db {len(values)} rows", flush=True)
        reads = B.sample_reads(genomes, rng)
        index = build_dev_index(values, taxids)
        d_t2s = jax.device_put(tax.species_of.astype(np.int32))
        print(f"staged, direct_bits {index.direct_bits}", flush=True)
        tp = TaxonomerParams()
        dtx = DeviceTaxonomer(tp, tax)
        read_len = 3 * ((B.READ_LEN - 2) // 3)
        chunk = reads[: B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        pc = jax.device_put(pack_codes(codes))
        lens_d = jax.device_put(lens)
        offs = jax.device_put(np.zeros(len(chunk), np.int32))
        qids = jax.device_put(np.arange(len(chunk), dtype=np.int32))
        rl = np.full(B.BATCH, read_len, np.int32)
        max_matches = B.BATCH * 230

        bm = classify_batch_indexed(
            index, d_t2s, pc, lens_d, offs, qids,
            cap=max(1, cap), max_matches=max_matches, codes_packed=True)
        m = matches_to_host(bm, tax.species_of.astype(np.int32))
        dtx.set_hints(m, tp.dna_shift)
        n_win = encode.max_codons(160) - 7
        B.seed_search_hints(dtx, index, values, B.BATCH * 6 * n_win)
        max_matches = B.adaptive_budget(m["n_matches"])

        cap1 = 1 if cap > 1 else max(1, cap)
        cap2 = max(1, cap) if cap > 1 else 0
        ovb = 131072 if cap > 1 else 0

        def run():
            h = dtx.dispatch_fused(
                index, d_t2s, pc, lens_d, offs, qids,
                n_reads=B.BATCH, max_read_len=read_len,
                cap=cap1, max_matches=max_matches,
                reduced=False, syncmer=False, smer_len=5, kmer_format=2,
                read_lens_by_qid=rl, cap2=cap2, cap_ov_budget=ovb,
                codes_packed=True)
            np.asarray(h[1])

        run()
        print("warm", flush=True)
        shutil.rmtree("/tmp/jaxtrace_b", ignore_errors=True)
        with jax.profiler.trace("/tmp/jaxtrace_b"):
            run()

    tr = sorted(glob.glob("/tmp/jaxtrace_b/**/*.trace.json.gz",
                          recursive=True))[-1]
    data = json.load(gzip.open(tr))
    events = data["traceEvents"]
    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if e.get("pid") != 3:
            continue
        args = e.get("args", {})
        src = args.get("source", "")
        src = src.replace("/root/repo/metabuli_tpu/", "")
        key = src or e.get("name", "").split(".")[0]
        agg.setdefault(key, [0.0, 0])
        agg[key][0] += e["dur"] / 1e3
        agg[key][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
    for key, (dur, cnt) in rows:
        print(f"{dur:9.1f} ms  x{cnt:<5d} {key[:110]}")


if __name__ == "__main__":
    main()
