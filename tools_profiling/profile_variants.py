"""Isolate device-program stage costs: search/gather vs compaction vs sort."""

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

        core_kw = dict(
            n_db=index.n, search_iters=index.search_iters, cap=max(1, cap),
            max_matches=max_matches, reduced=False, syncmer=False,
            smer_len=5, kmer_format=2,
        )
        static = tuple(core_kw.keys())

        @functools.partial(jax.jit, static_argnames=static)
        def no_sort(db_hi, db_lo, d48lo, d48hi, db_tax, db_prefix, t2s_,
                    codes_, lens_, offs_, qids_, **kw):
            # replicate _classify_core but stop before the final sort:
            # patch via fori? simpler: call core pieces inline
            import metabuli_tpu.classify.pipeline as PP
            from metabuli_tpu.ops import encode as E

            B_, L = codes_.shape
            mm = E.extract_metamers(codes_, lens_)
            W = mm.value.shape[2]
            q_values = mm.value.reshape(-1)
            q_valid = mm.valid.reshape(-1)
            bc32 = lambda x: jax.lax.bitcast_convert_type(
                x.astype(jnp.uint32), jnp.int32)
            q_hi = bc32(q_values >> jnp.uint64(32))
            q_lo = bc32(q_values & jnp.uint64(0xFFFFFFFF))
            q_aa8 = q_lo & jnp.int32(-16777216)
            bucket = (jax.lax.bitcast_convert_type(q_hi, jnp.uint32)
                      >> jnp.uint32(32 - PP.PREFIX_BITS)).astype(jnp.int32)
            lo = db_prefix[bucket]
            hi = db_prefix[bucket + 1]
            for _ in range(kw["search_iters"]):
                active = lo < hi
                mid = (lo + hi) >> 1
                mid_c = jnp.minimum(mid, jnp.int32(max(kw["n_db"] - 1, 0)))
                mh = db_hi[mid_c]
                ml = db_lo[mid_c]
                less = PP._unsigned_less(mh, q_hi) | (
                    (mh == q_hi) & PP._unsigned_less(ml, q_aa8))
                lo = jnp.where(active & less, mid + 1, lo)
                hi = jnp.where(active & ~less, mid, hi)
            start = lo
            capv = kw["cap"]
            idx = start[:, None] + jnp.arange(capv, dtype=jnp.int32)[None, :]
            idx_c = jnp.minimum(idx, jnp.int32(max(kw["n_db"] - 1, 0)))
            c_hi = db_hi[idx_c]
            c_lo = db_lo[idx_c]
            c_d48lo = d48lo[idx_c]
            c_d48hi = d48hi[idx_c]
            in_range = idx < jnp.int32(kw["n_db"])
            same_aa = (in_range & (c_hi == q_hi[:, None])
                       & ((c_lo & jnp.int32(-16777216)) == q_aa8[:, None])
                       & q_valid[:, None])
            q_d48 = mm.dna48.reshape(-1)
            q_d48lo = bc32(q_d48 & jnp.uint64(0xFFFFFFFF))
            q_d48hi = bc32(q_d48 >> jnp.uint64(32))
            hsum, h_fwd, h_rev = PP.hamming_dna48_split(
                q_d48lo[:, None], q_d48hi[:, None], c_d48lo, c_d48hi)
            hsum_m = jnp.where(same_aa, hsum, jnp.int32(255))
            min_h = jnp.min(hsum_m, axis=1)
            cutoff = jnp.minimum(min_h * 2, 7)
            keep = same_aa & (hsum_m <= cutoff[:, None])
            # compaction
            flat_keep = keep.reshape(-1)
            Q = q_values.shape[0]
            pos = jnp.cumsum(flat_keep.astype(jnp.int32)) - 1
            n_matches = pos[-1] + 1
            scatter_idx = jnp.where(
                flat_keep & (pos < max_matches), pos, jnp.int32(max_matches))
            rows = (jnp.full(max_matches, Q * capv, jnp.int32)
                    .at[scatter_idx]
                    .set(jnp.arange(Q * capv, dtype=jnp.int32), mode="drop"))
            is_pad = rows >= Q * capv
            safe = jnp.minimum(rows, Q * capv - 1)
            qi = (safe // capv).astype(jnp.int32)
            ci = (safe % capv).astype(jnp.int32)
            m_taxid = db_tax[idx_c[qi, ci]]
            out = jnp.stack([
                jnp.where(is_pad, P.INT32_MAX, qi),
                jnp.where(is_pad, P.INT32_MAX, m_taxid),
                jnp.where(is_pad, P.INT32_MAX, hsum[qi, ci]),
                jnp.where(is_pad, P.INT32_MAX, h_fwd[qi, ci]),
            ])
            return out, n_matches

        def timeit(label, fn, n=5):
            fn()
            t0 = time.time()
            for _ in range(n):
                fn()
            print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

        args = (index.hi32, index.lo32, index.d48lo, index.d48hi,
                index.taxids, index.prefix, d_t2s,
                d_codes, d_lens, offs, qids)

        t0 = time.time()
        out, nm = no_sort(*args, **core_kw)
        jax.block_until_ready(out)
        print(f"no_sort compile+run: {time.time()-t0:.1f}s n={int(nm)}",
              flush=True)
        timeit("no_sort program", lambda: jax.block_until_ready(
            no_sort(*args, **core_kw)[0]))

        # isolate the 8-operand 5-key sort on the same shapes
        M = max_matches
        rng2 = np.random.default_rng(1)
        cols = [jax.device_put(rng2.integers(0, 1 << 30, M).astype(np.int32))
                for _ in range(8)]

        @jax.jit
        def just_sort(*ops):
            return jax.lax.sort(ops, num_keys=5)

        t0 = time.time()
        r = just_sort(*cols)
        jax.block_until_ready(r)
        print(f"sort compile+run: {time.time()-t0:.1f}s", flush=True)
        timeit("sort 8x5 1.2M", lambda: jax.block_until_ready(just_sort(*cols)))

        @jax.jit
        def sort2(*ops):
            return jax.lax.sort(ops, num_keys=2)

        t0 = time.time()
        r = sort2(*cols[:4])
        jax.block_until_ready(r)
        print(f"sort2 compile+run: {time.time()-t0:.1f}s", flush=True)
        timeit("sort 4x2 1.2M", lambda: jax.block_until_ready(sort2(*cols[:4])))


if __name__ == "__main__":
    main()
