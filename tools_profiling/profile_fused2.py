"""Time each device-taxonomer block separately at bench shapes."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402


def main():
    import functools
    import tempfile

    import jax
    import jax.numpy as jnp

    from metabuli_tpu.classify.device_chain import chain_matches
    from metabuli_tpu.classify.device_combine import combine_paths
    from metabuli_tpu.classify.device_compact import compact_groups, compact_paths
    from metabuli_tpu.classify.device_redundancy import quotient_best
    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index,
        classify_batch_indexed,
    )
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
            cap=max(1, cap), max_matches=max_matches,
        )
        # unpack the sorted 5-word layout on device
        data = jax.block_until_ready(bm.data)
        s_qid, s_pos, s_dna, s_taxid, s_packed = (data[i] for i in range(5))
        INT32_MAX = jnp.int32(2**31 - 1)
        valid = s_qid != INT32_MAX
        s_frame = jnp.where(valid, s_packed & 7, 0)
        s_ham = jnp.where(valid, (s_packed >> 3) & 0xFF, 0)
        s_h16 = jnp.where(valid, (s_packed >> 11) & 0xFFFF, 0)
        t2s_np = tax.species_of.astype(np.int32)
        s_species = jnp.where(valid, jnp.asarray(t2s_np)[s_taxid], INT32_MAX)
        args_np = [jax.block_until_ready(x) for x in
                   (s_qid, s_species, s_frame, s_pos, s_ham, s_dna, s_h16,
                    s_taxid, valid)]
        (s_qid, s_species, s_frame, s_pos, s_ham, s_dna, s_h16, s_taxid,
         valid) = args_np

        sizes = dtx.fused_sizes(B.BATCH, max_matches, read_len)
        print(f"sizes: {sizes}", flush=True)

        def sync(r):
            leaf = jax.tree.leaves(r)[0]
            np.asarray(jax.numpy.ravel(leaf)[:1])

        def timeit(label, fn, n=3):
            t0 = time.time()
            r = fn()
            sync(r)
            print(f"{label}: compile+run {time.time()-t0:.1f}s", flush=True)
            t0 = time.time()
            for _ in range(n):
                r = fn()
                sync(r)
            print(f"{label}: {(time.time()-t0)/n*1000:.0f} ms", flush=True)
            return r

        chain_fn = functools.partial(
            chain_matches, s_qid, s_species, s_frame, s_pos, s_ham, s_dna,
            s_h16, valid, jnp.asarray(dtx.min_depth),
            n_blocks=sizes["n_blocks"], w=sizes["w"], k=sizes["k"],
            max_shift=sizes["max_shift"], kmer_format=2,
        )
        chain_res = timeit("chain_matches", chain_fn)

        cp_fn = functools.partial(
            compact_paths, chain_res, budget=sizes["path_budget"])
        flat = timeit("compact_paths", jax.jit(
            lambda: compact_paths(chain_fn(), budget=sizes["path_budget"])))
        # time compact separately by jitting over chain outputs as inputs
        chain_np = jax.tree.map(jax.block_until_ready, chain_res)

        cp2 = jax.jit(functools.partial(compact_paths,
                                        budget=sizes["path_budget"]))
        flat = timeit("compact_paths (alone)", lambda: cp2(chain_np))

        comb_fn = jax.jit(functools.partial(
            combine_paths, n_groups=sizes["g_budget"], p_max=sizes["p_max"],
            ov_budget=sizes["ov_budget"]))
        flat_r = jax.tree.map(jax.block_until_ready, flat)
        comb = timeit("combine_paths", lambda: comb_fn(
            flat_r.read, flat_r.species, flat_r.start, flat_r.end,
            flat_r.score, flat_r.ham, flat_r.sh16, flat_r.eh16, flat_r.valid,
            jnp.asarray(rl)))

        cg = jax.jit(functools.partial(compact_groups,
                                       budget=sizes["g_budget"]))
        comb_r = jax.tree.map(jax.block_until_ready, comb)
        timeit("compact_groups", lambda: cg(comb_r))

        qb = jax.jit(functools.partial(
            quotient_best, dna_shift=sizes["dna_shift"],
            max_rows=sizes["max_rows"]))
        timeit("quotient_best", lambda: qb(
            dtx.dt, s_qid, s_species, s_pos, s_ham, s_taxid, valid))


if __name__ == "__main__":
    main()
