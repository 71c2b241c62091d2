"""Per-phase timing of the bench steady-state loop on the current device."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402


def main():
    import os
    import tempfile

    import jax

    from metabuli_tpu.classify.native_taxonomer import NativeTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index,
        classify_batch_indexed,
        matches_to_host,
        prefetch_matches,
    )
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    cache = "/tmp/prof_db.npz"
    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        import os
        if os.path.exists(cache):
            z = np.load(cache)
            values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        else:
            values, taxids, cap = B.build_db(tax, genomes)
            np.savez(cache, values=values, taxids=taxids, cap=cap)
        reads = B.sample_reads(genomes, rng)
        t2s = tax.species_of.astype(np.int32)
        index = build_dev_index(values, taxids)
        d_t2s = jax.device_put(t2s)
        taxonomer = NativeTaxonomer(TaxonomerParams(), tax)
        read_len = 3 * ((B.READ_LEN - 2) // 3)

        batches = []
        for i in range(0, B.N_READS, B.BATCH):
            chunk = reads[i : i + B.BATCH]
            codes, lens = encode_seqs_padded(chunk, 160)
            batches.append((codes, lens, np.zeros(len(chunk), np.int32),
                            np.arange(len(chunk), dtype=np.int32), len(chunk)))

        kw = dict(cap=max(1, cap), max_matches=B.BATCH * 300,
                  sort_device=False, pack4=True)

        def dispatch(codes, lens, offs, qids, n_chunk):
            t0 = time.time()
            bm = classify_batch_indexed(index, d_t2s, codes, lens, offs,
                                        qids, **kw)
            prefetch_matches(bm)
            return bm, n_chunk, time.time() - t0

        def drain(bm, n_chunk, _):
            t0 = time.time()
            counts = np.asarray(bm.counts)
            t_counts = time.time() - t0
            t0 = time.time()
            m = matches_to_host(bm, t2s, sorted_rows=False, prefetched=True)
            t_data = time.time() - t0
            t0 = time.time()
            starts = np.searchsorted(m["qid"], np.arange(n_chunk), "left")
            ends = np.searchsorted(m["qid"], np.arange(n_chunk), "right")
            res, _ = taxonomer.assign_batch(
                m, starts, ends, np.full(n_chunk, read_len, np.int32))
            t_tax = time.time() - t0
            return t_counts, t_data, t_tax

        drain(*dispatch(*batches[0]))  # warm

        pending = dispatch(*batches[0])
        for i, b in enumerate(batches[1:], 1):
            t0 = time.time()
            nxt = dispatch(*b)
            td = time.time() - t0
            t0 = time.time()
            tc, tdata, ttax = drain(*pending)
            print(f"batch {i}: dispatch {td*1000:.0f} | counts_wait "
                  f"{tc*1000:.0f} | data_fetch {tdata*1000:.0f} | "
                  f"tax {ttax*1000:.0f} ms", flush=True)
            pending = nxt
        drain(*pending)

        # pure device throughput: N programs back-to-back, one final sync
        t0 = time.time()
        outs = []
        for b in batches:
            bm, _, _ = dispatch(*b)
            outs.append(bm)
        for o in outs:
            np.asarray(o.counts)
        dt = time.time() - t0
        print(f"4 programs back-to-back + counts: {dt*1000:.0f} ms "
              f"({dt/4*1000:.0f}/batch)", flush=True)


if __name__ == "__main__":
    main()
