"""Dissect the fused match program: extract | search | tier | compact | sort."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402


def main():
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    from metabuli_tpu.classify import pipeline as P
    from metabuli_tpu.ops import encode
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    cache = "/tmp/prof_db.npz"
    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        if os.path.exists(cache):
            z = np.load(cache)
            values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        else:
            values, taxids, cap = B.build_db(tax, genomes)
            np.savez(cache, values=values, taxids=taxids, cap=cap)
        reads = B.sample_reads(genomes, rng)
        t2s = tax.species_of.astype(np.int32)
        index = P.build_dev_index(values, taxids)
        d_t2s = jax.device_put(t2s)
        chunk = reads[: B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        offs = np.zeros(len(chunk), np.int32)
        qids = np.arange(len(chunk), dtype=np.int32)
        max_matches = B.BATCH * 300
        d_codes = jax.device_put(codes)
        d_lens = jax.device_put(lens)
        print(f"cap={cap} iters={index.search_iters} pb={index.prefix_bits} "
              f"n={index.n} groups={index.db[0].shape[0]}")

        def timeit(label, fn, n=10):
            r = fn()
            jax.block_until_ready(r)
            t0 = time.time()
            for _ in range(n):
                jax.block_until_ready(fn())
            print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

        db = index.db
        db_grest, db_gstart, db_gend, db_taxdna, db_d48, db_prefix = db
        rb = P.rest_bits(False, index.prefix_bits)

        @jax.jit
        def stage_extract(codes, lens):
            mm = encode.extract_metamers(codes, lens)
            return mm.value.sum(), mm.valid.sum()

        @functools.partial(jax.jit, static_argnames=("iters",))
        def stage_search(codes, lens, iters):
            mm = encode.extract_metamers(codes, lens)
            q_values = mm.value.reshape(-1)
            q_valid = mm.valid.reshape(-1)
            q_aa = q_values >> jnp.uint64(24)
            q_pi = (q_aa * jnp.uint64(P.AA_PERM_MULT)) & jnp.uint64((1 << 40) - 1)
            q_rest = (q_pi & jnp.uint64((1 << rb) - 1)).astype(jnp.int32)
            bucket = (q_pi >> jnp.uint64(rb)).astype(jnp.int32)
            n_g = db_grest.shape[0]
            lo = db_prefix[bucket]
            bucket_end = db_prefix[bucket + 1]
            hi = bucket_end
            for _ in range(iters):
                active = lo < hi
                mid = (lo + hi) >> 1
                mid_c = jnp.minimum(mid, jnp.int32(max(n_g - 1, 0)))
                less = db_grest[mid_c] < q_rest
                lo = jnp.where(active & less, mid + 1, lo)
                hi = jnp.where(active & ~less, mid, hi)
            g_c = jnp.minimum(lo, jnp.int32(max(n_g - 1, 0)))
            hit = q_valid & (lo < bucket_end) & (db_grest[g_c] == q_rest)
            start = db_gstart[g_c]
            gend = jnp.where(hit, db_gend[g_c], start)
            return start.sum(), gend.sum()

        @functools.partial(jax.jit, static_argnames=("capv",))
        def stage_tier(codes, lens, capv):
            mm = encode.extract_metamers(codes, lens)
            q_values = mm.value.reshape(-1)
            q_valid = mm.valid.reshape(-1)
            q_aa = q_values >> jnp.uint64(24)
            q_pi = (q_aa * jnp.uint64(P.AA_PERM_MULT)) & jnp.uint64((1 << 40) - 1)
            q_rest = (q_pi & jnp.uint64((1 << rb) - 1)).astype(jnp.int32)
            bucket = (q_pi >> jnp.uint64(rb)).astype(jnp.int32)
            n_g = db_grest.shape[0]
            lo = db_prefix[bucket]
            bucket_end = db_prefix[bucket + 1]
            hi = bucket_end
            for _ in range(index.search_iters):
                active = lo < hi
                mid = (lo + hi) >> 1
                mid_c = jnp.minimum(mid, jnp.int32(max(n_g - 1, 0)))
                less = db_grest[mid_c] < q_rest
                lo = jnp.where(active & less, mid + 1, lo)
                hi = jnp.where(active & ~less, mid, hi)
            g_c = jnp.minimum(lo, jnp.int32(max(n_g - 1, 0)))
            hit = q_valid & (lo < bucket_end) & (db_grest[g_c] == q_rest)
            start = db_gstart[g_c]
            gend = jnp.where(hit, db_gend[g_c], start)
            bc32 = lambda x: jax.lax.bitcast_convert_type(
                x.astype(jnp.uint32), jnp.int32)
            q_d48 = mm.dna48.reshape(-1)
            q_d48lo = bc32(q_d48 & jnp.uint64(0xFFFFFFFF))
            q_d48hi = bc32(q_d48 >> jnp.uint64(32))
            n_safe = jnp.int32(index.n - 1)
            idx = start[:, None] + jnp.arange(capv, dtype=jnp.int32)[None, :]
            idx_c = jnp.minimum(idx, n_safe)
            same_aa = (idx < gend[:, None]) & hit[:, None]
            dd = db_d48[idx_c]
            hsum, h_fwd, h_rev = P.hamming_dna48_split(
                q_d48lo[:, None], q_d48hi[:, None],
                bc32(dd & jnp.uint64(0xFFFFFFFF)),
                bc32(dd >> jnp.uint64(32)))
            hsum_m = jnp.where(same_aa, hsum, jnp.int32(255))
            cutoff = jnp.minimum(jnp.min(hsum_m, axis=1) * 2, 7)
            keep = same_aa & (hsum_m <= cutoff[:, None])
            return keep.sum(), h_fwd.sum()

        def full(sort_device):
            bm = P.classify_batch_indexed(
                index, d_t2s, d_codes, d_lens, offs, qids,
                cap=max(1, cap), max_matches=max_matches,
                sort_device=sort_device)
            return bm.data

        timeit("extract", lambda: stage_extract(d_codes, d_lens))
        timeit("extract+search", lambda: stage_search(
            d_codes, d_lens, index.search_iters))
        for it in (1, 2):
            timeit(f"extract+search[iters={it}]", lambda it=it: stage_search(
                d_codes, d_lens, it))
        timeit("extract+search+tier", lambda: stage_tier(
            d_codes, d_lens, max(1, cap)))
        timeit("full nosort", lambda: full(False))
        timeit("full sorted", lambda: full(True))


if __name__ == "__main__":
    main()
