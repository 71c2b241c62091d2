"""Stage-level profiling of the classify hot path on the current device.

Reuses bench.py's synthetic world; caches the built DB in /tmp so repeat
runs skip the build. Times each stage separately:
  extract | full fused match program | D2H transfer | native taxonomer
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402


def main():
    import tempfile

    import jax

    from metabuli_tpu.classify.native_taxonomer import NativeTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index,
        classify_batch_indexed,
        matches_to_host,
    )
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.ops import encode
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    cache = "/tmp/prof_db.npz"
    import os
    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        if os.path.exists(cache):
            z = np.load(cache)
            values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        else:
            t0 = time.time()
            values, taxids, cap = B.build_db(tax, genomes)
            np.savez(cache, values=values, taxids=taxids, cap=cap)
            print(f"db build: {time.time()-t0:.1f}s", flush=True)
        reads = B.sample_reads(genomes, rng)
        t2s = tax.species_of.astype(np.int32)
        index = build_dev_index(values, taxids)
        d_t2s = jax.device_put(t2s)
        taxonomer = NativeTaxonomer(TaxonomerParams(), tax)
        read_len = 3 * ((B.READ_LEN - 2) // 3)

        chunk = reads[: B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        offs = np.zeros(len(chunk), np.int32)
        qids = np.arange(len(chunk), dtype=np.int32)
        max_matches = B.BATCH * 300
        kw = dict(cap=max(1, cap), max_matches=max_matches)

        d_codes = jax.device_put(codes)
        d_lens = jax.device_put(lens)

        def timeit(label, fn, n=5):
            fn()  # warm
            t0 = time.time()
            for _ in range(n):
                fn()
            print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

        # 1. H2D input transfer
        timeit("h2d codes", lambda: jax.device_put(codes).block_until_ready())

        # 2. extraction alone
        timeit(
            "extract",
            lambda: jax.block_until_ready(
                encode.extract_metamers(d_codes, d_lens)
            ),
        )

        # 3. full fused match program (device)
        def full():
            bm = classify_batch_indexed(
                index, d_t2s, d_codes, d_lens, offs, qids, **kw
            )
            jax.block_until_ready(bm.data)
            return bm

        timeit("match program (device)", full)

        bm = full()
        counts = np.asarray(bm.counts)
        print(f"  n_matches={counts[0]} over_cap={counts[1]} kmers={counts[2]}")

        # 4. D2H of match tensors
        timeit("d2h matches", lambda: matches_to_host(bm, t2s), n=5)

        # 5. native taxonomer
        m = matches_to_host(bm, t2s)
        starts = np.searchsorted(m["qid"], np.arange(len(chunk)), side="left")
        ends = np.searchsorted(m["qid"], np.arange(len(chunk)), side="right")
        rl = np.full(len(chunk), read_len, np.int32)
        timeit(
            "native taxonomer",
            lambda: taxonomer.assign_batch(m, starts, ends, rl),
        )

        # 6. host-side encode of a batch
        timeit("host encode", lambda: encode_seqs_padded(chunk, 160), n=3)


if __name__ == "__main__":
    main()
