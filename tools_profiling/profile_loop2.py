"""Instrument bench.py's exact pipeline loop phase by phase."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401
import bench as B


def main():
    import tempfile

    import jax

    from metabuli_tpu.classify.native_taxonomer import NativeTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index, classify_batch_indexed, matches_to_host,
        prefetch_matches)
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
        taxonomer = NativeTaxonomer(TaxonomerParams(), tax)
        read_len = 3 * ((B.READ_LEN - 2) // 3)
        batches = []
        for i in range(0, B.N_READS, B.BATCH):
            chunk = reads[i: i + B.BATCH]
            codes, lens = encode_seqs_padded(chunk, 160)
            batches.append((codes, lens, np.zeros(len(chunk), np.int32),
                            np.arange(len(chunk), dtype=np.int32),
                            len(chunk)))
        max_matches = B.BATCH * 230
        kw = dict(cap=max(1, cap), max_matches=max_matches,
                  sort_device=False, pack4=True)
        T = {}

        def tick(k, t0):
            T[k] = T.get(k, 0.0) + (time.time() - t0)
            return time.time()

        def dispatch(codes, lens, offs, qids, n_chunk):
            t0 = time.time()
            bm = classify_batch_indexed(
                index, d_t2s, codes, lens, offs, qids, **kw)
            t0 = tick("dispatch", t0)
            prefetch_matches(bm)
            tick("prefetch", t0)
            return bm, n_chunk

        def drain(bm, n_chunk):
            t0 = time.time()
            m = matches_to_host(bm, t2s, sorted_rows=False, prefetched=True)
            t0 = tick("to_host", t0)
            starts = np.searchsorted(m["qid"], np.arange(n_chunk), "left")
            ends = np.searchsorted(m["qid"], np.arange(n_chunk), "right")
            t0 = tick("searchsorted", t0)
            res, _ = taxonomer.assign_batch(
                m, starts, ends, np.full(n_chunk, read_len, np.int32))
            tick("taxonomer", t0)
            return sum(r.is_classified for r in res)

        drain(*dispatch(*batches[0]))  # warm
        T.clear()
        t0 = time.time()
        classified = 0
        pending = dispatch(*batches[0])
        for b in batches[1:]:
            nxt = dispatch(*b)
            classified += drain(*pending)
            pending = nxt
        classified += drain(*pending)
        dt = time.time() - t0
        print(f"total {dt*1000:.0f} ms for {B.N_READS} reads "
              f"({B.N_READS/dt:.0f} r/s), classified {classified}")
        for k, v in T.items():
            print(f"  {k}: {v*1000:.0f} ms")


if __name__ == "__main__":
    main()
