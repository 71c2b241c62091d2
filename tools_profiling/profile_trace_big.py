"""Per-line device trace of the fused program on the UNIFORM bench world
(round-5 secondary configuration: 60M rows, cap 2, 16k-read batches)."""

import glob
import gzip
import json
import shutil
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401
import bench as B


def main():
    import jax

    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index, classify_batch_indexed, matches_to_host, pack_codes)
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.ops import encode
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    c = B.CONFIGS["uniform"]
    tax, genomes, values, taxids, cap, n_real, reads = B.prepare_world(
        "uniform")
    print(f"db {len(values)} rows, cap {cap}", flush=True)
    batch = c["batch"]
    index = build_dev_index(values, taxids)
    d_t2s = jax.device_put(tax.species_of.astype(np.int32))
    print(f"staged, direct_bits {index.direct_bits}", flush=True)
    tp = TaxonomerParams()
    dtx = DeviceTaxonomer(tp, tax)
    pad_len = 152
    read_len = 3 * ((c["read_len"] - 2) // 3)
    chunk = reads[:batch]
    codes, lens = encode_seqs_padded(chunk, pad_len)
    pc = jax.device_put(pack_codes(codes))
    lens_d = jax.device_put(lens)
    offs = jax.device_put(np.zeros(len(chunk), np.int32))
    qids = jax.device_put(np.arange(len(chunk), dtype=np.int32))
    rl = np.full(batch, read_len, np.int32)
    n_win = encode.max_codons(pad_len) - 7
    n_queries = batch * 6 * n_win

    cap1 = 1 if cap > 1 else max(1, cap)
    cap2 = max(1, cap) if cap > 1 else 0
    ovb_warm = B.quarter_pow2(int(n_queries * 0.15) + 32768) if cap2 else 0
    max_matches = batch * c["warm_mpr"]

    bm = classify_batch_indexed(
        index, d_t2s, pc, lens_d, offs, qids,
        cap=cap1, cap2=cap2, ov_budget=ovb_warm, ovd_budget=ovb_warm,
        max_matches=max_matches, codes_packed=True)
    m = matches_to_host(bm, tax.species_of.astype(np.int32))
    dtx.set_hints(m, tp.dna_shift)
    B.seed_search_hints(dtx, index, values, n_queries)
    max_matches = B.adaptive_budget(m["n_matches"])
    ovb = B.quarter_pow2(int(m["n_ov"] * 1.3) + 8192) if cap2 else 0
    ovdb = (B.quarter_pow2(int(m["n_ovd"] * 1.3) + 4096)
            if cap2 and index.deep_w else 0)
    print(f"budgets: matches {max_matches}, ov {ovb}, ovd {ovdb}",
          flush=True)

    def run():
        h = dtx.dispatch_fused(
            index, d_t2s, pc, lens_d, offs, qids,
            n_reads=batch, max_read_len=read_len,
            cap=cap1, max_matches=max_matches,
            reduced=False, syncmer=False, smer_len=5, kmer_format=2,
            read_lens_by_qid=rl, cap2=cap2, cap_ov_budget=ovb,
            cap_ovd_budget=ovdb, codes_packed=True)
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
