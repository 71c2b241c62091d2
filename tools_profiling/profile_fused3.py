"""Fused program at hint-derived (right-sized) grids on the TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402


def main():
    import tempfile

    import jax

    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index,
        classify_batch_indexed,
        matches_to_host,
    )
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        z = np.load("/tmp/prof_db.npz")
        values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        reads = B.sample_reads(genomes, rng)
        index = build_dev_index(values, taxids)
        d_t2s = jax.device_put(tax.species_of.astype(np.int32))
        tp = TaxonomerParams()
        dtx = DeviceTaxonomer(tp, tax)
        read_len = 3 * ((B.READ_LEN - 2) // 3)

        chunk = reads[: B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        offs = np.zeros(len(chunk), np.int32)
        qids = np.arange(len(chunk), dtype=np.int32)
        rl = np.full(B.BATCH, read_len, np.int32)
        max_matches = B.BATCH * 300

        # warmup: plain path -> hints
        bm = classify_batch_indexed(
            index, d_t2s, codes, lens, offs, qids,
            cap=max(1, cap), max_matches=max_matches,
        )
        m = matches_to_host(bm, tax.species_of.astype(np.int32))
        dtx.set_hints(m, tp.dna_shift)
        print(f"hints: {dtx.hints}", flush=True)
        sizes = dtx.fused_sizes(B.BATCH, max_matches, read_len)
        print(f"sizes: {sizes}", flush=True)

        def run():
            handle = dtx.dispatch_fused(
                index, d_t2s, codes, lens, offs, qids,
                n_reads=B.BATCH, max_read_len=read_len,
                cap=max(1, cap), max_matches=max_matches,
                reduced=False, syncmer=False, smer_len=5, kmer_format=2,
                read_lens_by_qid=rl,
            )
            return dtx.drain_fused(handle, rl, B.BATCH)

        t0 = time.time()
        results, info = run()
        print(f"fused compile+run: {time.time()-t0:.1f}s "
              f"overflow={info['tax_overflow']}", flush=True)
        if results is None:
            print(f"OVERFLOW info={info}", flush=True)
            t0 = time.time()
            results, info = run()
            print(f"retry: {time.time()-t0:.1f}s overflow="
                  f"{info['tax_overflow']}", flush=True)
        n_cls = sum(r.is_classified for r in results or [])
        print(f"classified {n_cls}/{B.BATCH} info={info}", flush=True)
        for rep in range(3):
            t0 = time.time()
            results, info = run()
            print(f"rep {rep}: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
