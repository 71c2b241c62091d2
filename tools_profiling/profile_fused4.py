"""Fused path: device vs drain-host split timing (true sync)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401
import bench as B


def main():
    import tempfile

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

        bm = classify_batch_indexed(
            index, d_t2s, codes, lens, offs, qids,
            cap=max(1, cap), max_matches=max_matches)
        m = matches_to_host(bm, tax.species_of.astype(np.int32))
        dtx.set_hints(m, tp.dna_shift)

        def dispatch():
            return dtx.dispatch_fused(
                index, d_t2s, codes, lens, offs, qids,
                n_reads=B.BATCH, max_read_len=read_len,
                cap=max(1, cap), max_matches=max_matches,
                reduced=False, syncmer=False, smer_len=5, kmer_format=2,
                read_lens_by_qid=rl)

        h = dispatch()
        r, info = dtx.drain_fused(h, rl, B.BATCH)
        print(f"warm overflow={info['tax_overflow']}", flush=True)
        for rep in range(3):
            t0 = time.time()
            h = dispatch()
            np.asarray(h[1])  # counts: device program completion
            t1 = time.time()
            results, info = dtx.drain_fused(h, rl, B.BATCH)
            t2 = time.time()
            ncls = sum(x.is_classified for x in results)
            print(f"rep{rep}: device {t1-t0:.3f}s drain {t2-t1:.3f}s "
                  f"cls={ncls}", flush=True)


if __name__ == "__main__":
    main()
