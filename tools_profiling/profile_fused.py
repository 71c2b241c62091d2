"""Run the fused classify+taxonomer program on the current device at bench
shapes: reproduce the TPU backend error (if still present) and time it."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402


def main():
    import tempfile

    import jax

    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.pipeline import build_dev_index
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    cache = "/tmp/prof_db.npz"
    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        z = np.load(cache)
        values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        reads = B.sample_reads(genomes, rng)
        index = build_dev_index(values, taxids)
        d_t2s = jax.device_put(tax.species_of.astype(np.int32))

        tp = TaxonomerParams()
        dt = DeviceTaxonomer(tp, tax)
        read_len = 3 * ((B.READ_LEN - 2) // 3)

        chunk = reads[: B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        offs = np.zeros(len(chunk), np.int32)
        qids = np.arange(len(chunk), dtype=np.int32)
        rl = np.full(B.BATCH, read_len, np.int32)

        t0 = time.time()
        try:
            handle = dt.dispatch_fused(
                index, d_t2s, codes, lens, offs, qids,
                n_reads=B.BATCH, max_read_len=read_len,
                cap=max(1, cap), max_matches=B.BATCH * 300,
                reduced=False, syncmer=False, smer_len=5, kmer_format=2,
                read_lens_by_qid=rl,
            )
            results, info = dt.drain_fused(handle, rl, B.BATCH)
        except Exception as e:
            print(f"FUSED FAILED after {time.time()-t0:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:1500]}", flush=True)
            return
        print(f"fused compile+run: {time.time()-t0:.1f}s info={info}",
              flush=True)
        n_cls = sum(r.is_classified for r in results)
        print(f"classified {n_cls}/{B.BATCH}", flush=True)

        for rep in range(3):
            t0 = time.time()
            handle = dt.dispatch_fused(
                index, d_t2s, codes, lens, offs, qids,
                n_reads=B.BATCH, max_read_len=read_len,
                cap=max(1, cap), max_matches=B.BATCH * 300,
                reduced=False, syncmer=False, smer_len=5, kmer_format=2,
                read_lens_by_qid=rl,
            )
            results, info = dt.drain_fused(handle, rl, B.BATCH)
            print(f"rep {rep}: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
