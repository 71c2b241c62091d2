"""Quick steady-state fused-path timing using the cached /tmp/prof_db.npz.

Mirrors bench.py's fused loop (warmup via plain path, hint seeding,
depth-1 pipeline) but skips the ~200s DB build; prints ms/batch and
reads/s. Use for perf iteration; the official number is bench.py.
"""

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401
import bench as B


def main():
    import jax

    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index, classify_batch_indexed, matches_to_host)
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        z = np.load("/tmp/prof_db.npz")
        values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        reads = B.sample_reads(genomes, rng)
        t2s = tax.species_of.astype(np.int32)
        index = build_dev_index(values, taxids)
        d_t2s = jax.device_put(t2s)
        tp = TaxonomerParams()
        dtx = DeviceTaxonomer(tp, tax)
        read_len = 3 * ((B.READ_LEN - 2) // 3)
        batches = []
        for i in range(0, B.N_READS, B.BATCH):
            chunk = reads[i : i + B.BATCH]
            codes, lens = encode_seqs_padded(chunk, 160)
            batches.append((codes, lens, np.zeros(len(chunk), np.int32),
                            np.arange(len(chunk), dtype=np.int32),
                            len(chunk)))
        max_matches = B.BATCH * 230
        rl = np.full(B.BATCH, read_len, np.int32)

        t0 = time.time()
        bm = classify_batch_indexed(
            index, d_t2s, *batches[0][:4],
            cap=max(1, cap), max_matches=max_matches)
        m = matches_to_host(bm, t2s)
        dtx.set_hints(m, tp.dna_shift)
        print(f"warmup plain: {time.time()-t0:.1f}s; "
              f"n_matches={m['n_matches']}", flush=True)
        max_matches = B.adaptive_budget(m["n_matches"]) \
            if hasattr(B, "adaptive_budget") else max_matches
        print(f"match budget: {max_matches}", flush=True)

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
                cap2=cap2, cap_ov_budget=ovb)
            return h, b

        def drain(h, b):
            nonlocal max_matches
            n_chunk = b[4]
            results, info = dtx.drain_fused(h, rl[:n_chunk], n_chunk)
            while results is None or info["n_matches"] > max_matches:
                if info["n_matches"] > max_matches:
                    max_matches = B.adaptive_budget(info["n_matches"]) \
                        if hasattr(B, "adaptive_budget") else \
                        int(info["n_matches"] * 1.3)
                h, _ = dispatch(b)
                results, info = dtx.drain_fused(h, rl[:n_chunk], n_chunk)
            assert info["n_over_cap"] == 0
            return sum(r.is_classified for r in results), info

        t0 = time.time()
        c, info = drain(*dispatch(batches[0]))
        print(f"warmup fused (compile): {time.time()-t0:.1f}s", flush=True)
        print({k: v for k, v in info.items()}, flush=True)

        for trial in range(3):
            t0 = time.time()
            classified = 0
            pending = dispatch(batches[0])
            for b in batches[1:]:
                nxt = dispatch(b)
                classified += drain(*pending)[0]
                pending = nxt
            classified += drain(*pending)[0]
            dt = time.time() - t0
            print(f"trial {trial}: {B.N_READS/dt:,.0f} reads/s "
                  f"({dt/len(batches)*1000:.0f} ms/batch), "
                  f"classified {classified}", flush=True)


if __name__ == "__main__":
    main()
