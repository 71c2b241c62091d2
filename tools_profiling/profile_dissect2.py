"""Dissect the match program with DB tables passed as jit ARGUMENTS
(closure-captured constants hit a pathological XLA TPU path: a 1M-elem
gather from a captured table costs 44ms vs 0.1ms as an argument)."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401
import bench as B  # noqa: E402


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from metabuli_tpu.classify import pipeline as P
    from metabuli_tpu.ops import encode
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    cache = "/tmp/prof_db.npz"
    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        z = np.load(cache)
        values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        reads = B.sample_reads(genomes, rng)
        t2s = tax.species_of.astype(np.int32)
        index = P.build_dev_index(values, taxids)
        d_t2s = jax.device_put(t2s)
        chunk = reads[: B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        offs = jax.device_put(np.zeros(len(chunk), np.int32))
        qids = jax.device_put(np.arange(len(chunk), dtype=np.int32))
        max_matches = B.BATCH * 300
        d_codes = jax.device_put(codes)
        d_lens = jax.device_put(lens)
        rb = P.rest_bits(False, index.prefix_bits)
        print(f"cap={cap} iters={index.search_iters} pb={index.prefix_bits}")

        def timeit(label, fn, n=10):
            np.asarray(fn())  # warm + sync (block_until_ready lies on axon)
            t0 = time.time()
            for _ in range(n):
                np.asarray(fn())
            print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

        @functools.partial(jax.jit, static_argnames=("stage", "iters", "capv"))
        def run(db, codes, lens, stage, iters=0, capv=1):
            db_grest, db_gstart, db_gend, db_taxdna, db_d48, db_prefix = db
            mm = encode.extract_metamers(codes, lens)
            q_values = mm.value.reshape(-1)
            q_valid = mm.valid.reshape(-1)
            if stage == "extract":
                return q_values.sum()
            q_aa = q_values >> jnp.uint64(24)
            q_pi = (q_aa * jnp.uint64(P.AA_PERM_MULT)) & jnp.uint64(
                (1 << 40) - 1)
            q_rest = (q_pi & jnp.uint64((1 << rb) - 1)).astype(jnp.int32)
            bucket = (q_pi >> jnp.uint64(rb)).astype(jnp.int32)
            if stage == "keys":
                return q_rest.sum() + bucket.sum()
            n_g = db_grest.shape[0]
            lo = db_prefix[bucket]
            bucket_end = db_prefix[bucket + 1]
            if stage == "prefix":
                return lo.sum() + bucket_end.sum()
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
            if stage == "search":
                return start.sum() + gend.sum()
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
            if stage == "tier":
                return keep.sum() + h_fwd.sum()
            flat_keep = keep.reshape(-1)
            total_slots = flat_keep.shape[0]
            pos = jnp.cumsum(flat_keep.astype(jnp.int32)) - 1
            if stage == "cumsum":
                return pos[-1]
            scatter_idx = jnp.where(
                flat_keep & (pos < max_matches), pos, jnp.int32(max_matches))
            rows = (
                jnp.full(max_matches, total_slots, jnp.int32)
                .at[scatter_idx]
                .set(jnp.arange(total_slots, dtype=jnp.int32), mode="drop"))
            if stage == "scatter":
                return rows.sum()
            is_pad = rows >= total_slots
            safe = jnp.minimum(rows, total_slots - 1)
            qi = (safe // capv).astype(jnp.int32)
            ci = (safe % capv).astype(jnp.int32)
            midx = idx_c[qi, ci]
            row_hsum = hsum[qi, ci]
            row_h16 = jnp.where(fwd_sel(mm, capv, qi), 0, 0) if False else None
            if stage == "rowgather":
                return midx.sum() + row_hsum.sum()
            tw = db_taxdna[midx]
            if stage == "taxgather":
                return (tw & jnp.uint64(0xFFFF)).astype(jnp.int32).sum()
            return None

        db = index.db
        for stage, iters, capv in (
            ("extract", 0, 1), ("keys", 0, 1), ("prefix", 0, 1),
            ("search", 0, 1), ("search", index.search_iters, 1),
            ("tier", index.search_iters, max(1, cap)),
            ("cumsum", index.search_iters, max(1, cap)),
            ("scatter", index.search_iters, max(1, cap)),
            ("rowgather", index.search_iters, max(1, cap)),
            ("taxgather", index.search_iters, max(1, cap)),
        ):
            timeit(f"{stage} it={iters} cap={capv}",
                   lambda s=stage, i=iters, c=capv: run(
                       db, d_codes, d_lens, s, i, c))

        def full(sort_device, pack4=False):
            bm = P.classify_batch_indexed(
                index, d_t2s, d_codes, d_lens, offs, qids,
                cap=max(1, cap), max_matches=max_matches,
                sort_device=sort_device, pack4=pack4)
            return bm.counts

        timeit("FULL nosort pack4 (counts only)", lambda: full(False, True))
        timeit("FULL sorted (counts only)", lambda: full(True))


if __name__ == "__main__":
    main()
