"""Stage-dissect the fused classify+taxonomer program (true sync)."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401
import bench as B


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from metabuli_tpu.classify import pipeline as P
    from metabuli_tpu.classify.device_chain import chain_matches
    from metabuli_tpu.classify.device_combine import combine_paths
    from metabuli_tpu.classify.device_compact import (
        compact_groups, compact_paths)
    from metabuli_tpu.classify.device_redundancy import quotient_best
    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    INT32_MAX = jnp.int32(2**31 - 1)

    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        z = np.load("/tmp/prof_db.npz")
        values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        reads = B.sample_reads(genomes, rng)
        index = P.build_dev_index(values, taxids)
        d_t2s = jax.device_put(tax.species_of.astype(np.int32))
        tp = TaxonomerParams()
        dtx = DeviceTaxonomer(tp, tax)
        read_len = 3 * ((B.READ_LEN - 2) // 3)
        chunk = reads[: B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        offs = jax.device_put(np.zeros(len(chunk), np.int32))
        qids = jax.device_put(np.arange(len(chunk), dtype=np.int32))
        d_codes = jax.device_put(codes)
        d_lens = jax.device_put(lens)
        rl = np.full(B.BATCH, read_len, np.int32)
        max_matches = B.BATCH * 300

        # hints from a plain warmup
        bm = P.classify_batch_indexed(
            index, d_t2s, d_codes, d_lens, offs, qids,
            cap=max(1, cap), max_matches=max_matches)
        m = P.matches_to_host(bm, tax.species_of.astype(np.int32))
        dtx.set_hints(m, tp.dna_shift)
        sizes = dtx.fused_sizes(B.BATCH, max_matches, read_len)
        print(f"sizes: {sizes}", flush=True)

        core_kw = dict(
            n_db=index.n, search_iters=index.search_iters, cap=max(1, cap),
            max_matches=max_matches, reduced=False, syncmer=False,
            smer_len=5, kmer_format=2, prefix_bits=index.prefix_bits,
            cap2=0, ov_budget=0)

        @functools.partial(jax.jit, static_argnames=("stage",))
        def run(db, t2s, dt, min_depth, rlj, codes, lens, offs, qids, stage):
            s_qid, s_species, s_pos, s_dna, s_taxid, s_packed, cls_counts = \
                P._classify_core(db, t2s, codes, lens, offs, qids, **core_kw)
            if stage == "core":
                return cls_counts.sum()
            valid = s_qid != INT32_MAX
            s_frame = jnp.where(valid, s_packed & 7, 0)
            s_ham = jnp.where(valid, (s_packed >> 3) & 0xFF, 0)
            s_h16 = jnp.where(valid, (s_packed >> 11) & 0xFFFF, 0)
            chain_res = chain_matches(
                s_qid, s_species, s_frame, s_pos, s_ham, s_dna, s_h16,
                valid, min_depth, n_blocks=sizes["n_blocks"], w=sizes["w"],
                k=sizes["k"], max_shift=sizes["max_shift"], kmer_format=2)
            if stage == "chain":
                return chain_res.n_real_blocks.sum()
            flat = compact_paths(chain_res, budget=sizes["path_budget"])
            if stage == "cpaths":
                return flat.n_paths.sum()
            comb = combine_paths(
                flat.read, flat.species, flat.start, flat.end, flat.score,
                flat.ham, flat.sh16, flat.eh16, flat.valid, rlj,
                n_groups=sizes["g_budget"], p_max=sizes["p_max"],
                ov_budget=sizes["ov_budget"])
            if stage == "combine":
                return comb.n_ov.sum() + comb.score.sum()
            groups = compact_groups(comb, budget=sizes["g_budget"])
            if stage == "cgroups":
                return groups.n_groups.sum()
            qres = quotient_best(
                dt, s_qid, s_species, s_pos, s_ham, s_taxid, valid,
                dna_shift=sizes["dna_shift"], max_rows=sizes["max_rows"])
            if stage == "quot":
                return qres.n_rows.sum()
            rr, rs, rt = jax.lax.sort(
                (qres.row_read, qres.row_species, qres.row_taxid),
                num_keys=3)
            return rr.sum() + rs.sum() + rt.sum()

        def timeit(label, fn, n=5):
            np.asarray(fn())
            t0 = time.time()
            for _ in range(n):
                np.asarray(fn())
            print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

        args = (index.db, d_t2s, dtx.dt, jax.device_put(dtx.min_depth),
                jax.device_put(rl), d_codes, d_lens, offs, qids)
        for stage in ("core", "chain", "cpaths", "combine", "cgroups",
                      "quot", "aggsort"):
            timeit(f"{stage}", lambda s=stage: run(*args, s))


if __name__ == "__main__":
    main()
