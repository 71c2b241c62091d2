"""Break down the no-sort match program: search vs gather vs compaction."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402


def main():
    import functools
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    from metabuli_tpu.classify import pipeline as P
    from metabuli_tpu.ops import encode as E
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded

    cache = "/tmp/prof_db.npz"
    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        z = np.load(cache)
        values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        reads = B.sample_reads(genomes, rng)
        index = P.build_dev_index(values, taxids)
        print(f"search_iters={index.search_iters}", flush=True)

        chunk = reads[: B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        d_codes = jax.device_put(codes)
        d_lens = jax.device_put(lens)
        n_db = index.n

        def timeit(label, fn, n=5):
            r = fn()
            jax.block_until_ready(r)
            t0 = time.time()
            for _ in range(n):
                r = fn()
            jax.block_until_ready(r)
            print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

        # extraction result reused as on-device input for stage tests
        mm = E.extract_metamers(d_codes, d_lens)
        q_values = jax.block_until_ready(mm.value.reshape(-1))
        q_valid = mm.valid.reshape(-1)
        q_d48 = mm.dna48.reshape(-1)

        bc32 = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.uint32), jnp.int32)

        # ---- (a) current 2-gather search
        @functools.partial(jax.jit, static_argnames=("iters",))
        def search2(db_hi, db_lo, db_prefix, qv, *, iters):
            q_hi = bc32(qv >> jnp.uint64(32))
            q_lo = bc32(qv & jnp.uint64(0xFFFFFFFF))
            q_aa8 = q_lo & jnp.int32(-16777216)
            bucket = (jax.lax.bitcast_convert_type(q_hi, jnp.uint32)
                      >> jnp.uint32(32 - P.PREFIX_BITS)).astype(jnp.int32)
            lo = db_prefix[bucket]
            hi = db_prefix[bucket + 1]
            for _ in range(iters):
                active = lo < hi
                mid = (lo + hi) >> 1
                mid_c = jnp.minimum(mid, jnp.int32(n_db - 1))
                mh = db_hi[mid_c]
                ml = db_lo[mid_c]
                less = P._unsigned_less(mh, q_hi) | (
                    (mh == q_hi) & P._unsigned_less(ml, q_aa8))
                lo = jnp.where(active & less, mid + 1, lo)
                hi = jnp.where(active & ~less, mid, hi)
            return lo

        timeit("search 2-gather", lambda: search2(
            index.hi32, index.lo32, index.prefix, q_values,
            iters=index.search_iters))

        # ---- (b) single-word rest search (20-bit rest within bucket)
        hi_np = np.asarray(index.hi32).view(np.uint32)
        lo_np = np.asarray(index.lo32).view(np.uint32)
        rest_np = (((hi_np & np.uint32((1 << (32 - P.PREFIX_BITS)) - 1))
                    << np.uint32(8)) | (lo_np >> np.uint32(24))).astype(
                        np.int32)
        d_rest = jax.device_put(rest_np)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def search1(db_rest, db_prefix, qv, *, iters):
            q_hi = bc32(qv >> jnp.uint64(32))
            q_lo = bc32(qv & jnp.uint64(0xFFFFFFFF))
            q_rest = ((q_hi & jnp.int32((1 << (32 - P.PREFIX_BITS)) - 1))
                      << 8) | ((q_lo >> 24) & 0xFF)
            bucket = (jax.lax.bitcast_convert_type(q_hi, jnp.uint32)
                      >> jnp.uint32(32 - P.PREFIX_BITS)).astype(jnp.int32)
            lo = db_prefix[bucket]
            hi = db_prefix[bucket + 1]
            for _ in range(iters):
                active = lo < hi
                mid = (lo + hi) >> 1
                mid_c = jnp.minimum(mid, jnp.int32(n_db - 1))
                less = db_rest[mid_c] < q_rest
                lo = jnp.where(active & less, mid + 1, lo)
                hi = jnp.where(active & ~less, mid, hi)
            return lo

        timeit("search 1-gather", lambda: search1(
            d_rest, index.prefix, q_values, iters=index.search_iters))

        s2 = np.asarray(search2(index.hi32, index.lo32, index.prefix,
                                q_values, iters=index.search_iters))
        s1 = np.asarray(search1(d_rest, index.prefix, q_values,
                                iters=index.search_iters))
        print(f"search agreement: {(s2 == s1).mean():.6f}", flush=True)

        # ---- (c) sorted-query single-word search (locality)
        @functools.partial(jax.jit, static_argnames=("iters",))
        def search1_sorted(db_rest, db_prefix, qv, *, iters):
            qs = jax.lax.sort(qv)
            return search1(db_rest, db_prefix, qs, iters=iters)

        timeit("sort queries + search 1-gather", lambda: search1_sorted(
            d_rest, index.prefix, q_values, iters=index.search_iters))

        # ---- (d) candidate gather + hamming from given starts
        d_start = jax.device_put(s2)

        @functools.partial(jax.jit, static_argnames=("capv",))
        def cand(db_rest, db_lo, d48lo, d48hi, db_prefix, qv, qd48, start,
                 *, capv):
            q_hi = bc32(qv >> jnp.uint64(32))
            q_lo = bc32(qv & jnp.uint64(0xFFFFFFFF))
            q_rest = ((q_hi & jnp.int32((1 << (32 - P.PREFIX_BITS)) - 1))
                      << 8) | ((q_lo >> 24) & 0xFF)
            bucket = (jax.lax.bitcast_convert_type(q_hi, jnp.uint32)
                      >> jnp.uint32(32 - P.PREFIX_BITS)).astype(jnp.int32)
            bucket_end = db_prefix[bucket + 1]
            idx = start[:, None] + jnp.arange(capv, dtype=jnp.int32)[None, :]
            idx_c = jnp.minimum(idx, jnp.int32(n_db - 1))
            c_rest = db_rest[idx_c]
            c_lo = db_lo[idx_c]
            c_d48lo = d48lo[idx_c]
            c_d48hi = d48hi[idx_c]
            same_aa = (idx < bucket_end[:, None]) & (c_rest == q_rest[:, None])
            q_d48lo = bc32(qd48 & jnp.uint64(0xFFFFFFFF))
            q_d48hi = bc32(qd48 >> jnp.uint64(32))
            hsum, h_fwd, h_rev = P.hamming_dna48_split(
                q_d48lo[:, None], q_d48hi[:, None], c_d48lo, c_d48hi)
            hsum_m = jnp.where(same_aa, hsum, jnp.int32(255))
            min_h = jnp.min(hsum_m, axis=1)
            keep = same_aa & (hsum_m <= jnp.minimum(min_h * 2, 7)[:, None])
            return keep, hsum, h_fwd, c_lo

        timeit("cand gather+hamming", lambda: cand(
            d_rest, index.lo32, index.d48lo, index.d48hi, index.prefix,
            q_values, q_d48, d_start, capv=max(1, cap)))

        # ---- (e) compaction only (from keep mask)
        keep, hsum, h_fwd, c_lo = jax.block_until_ready(cand(
            d_rest, index.lo32, index.d48lo, index.d48hi, index.prefix,
            q_values, q_d48, d_start, capv=max(1, cap)))
        max_matches = B.BATCH * 300

        @jax.jit
        def compact(keep, hsum, h_fwd, c_lo):
            Q, capv = keep.shape
            flat_keep = keep.reshape(-1)
            pos = jnp.cumsum(flat_keep.astype(jnp.int32)) - 1
            scatter_idx = jnp.where(
                flat_keep & (pos < max_matches), pos, jnp.int32(max_matches))
            rows = (jnp.full(max_matches, Q * capv, jnp.int32)
                    .at[scatter_idx]
                    .set(jnp.arange(Q * capv, dtype=jnp.int32), mode="drop"))
            is_pad = rows >= Q * capv
            safe = jnp.minimum(rows, Q * capv - 1)
            qi = (safe // capv).astype(jnp.int32)
            ci = (safe % capv).astype(jnp.int32)
            return (jnp.where(is_pad, 0, hsum[qi, ci]),
                    jnp.where(is_pad, 0, h_fwd[qi, ci]),
                    jnp.where(is_pad, 0, c_lo[qi, ci]),
                    qi)

        timeit("compaction", lambda: compact(keep, hsum, h_fwd, c_lo))


if __name__ == "__main__":
    main()
