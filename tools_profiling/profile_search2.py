"""Bisect the search block with x64 on (as the real pipeline runs)."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401  (enables x64)
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
        z = np.load(cache)
        values, taxids, cap = z["values"], z["taxids"], int(z["cap"])
        reads = B.sample_reads(genomes, rng)
        index = P.build_dev_index(values, taxids)
        chunk = reads[: B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        d_codes = jax.device_put(codes)
        d_lens = jax.device_put(lens)

        db_grest, db_gstart, db_gend, db_taxdna, db_d48, db_prefix = index.db
        rb = P.rest_bits(False, index.prefix_bits)

        def timeit(label, fn, n=10):
            r = fn()
            jax.block_until_ready(r)
            t0 = time.time()
            for _ in range(n):
                jax.block_until_ready(fn())
            print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

        @functools.partial(jax.jit, static_argnames=("stage", "iters"))
        def run(codes, lens, stage, iters=0):
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
            if stage == "iters":
                return lo.sum() + hi.sum()
            g_c = jnp.minimum(lo, jnp.int32(max(n_g - 1, 0)))
            hit = q_valid & (lo < bucket_end) & (db_grest[g_c] == q_rest)
            start = db_gstart[g_c]
            gend = jnp.where(hit, db_gend[g_c], start)
            return start.sum() + gend.sum()

        timeit("extract only", lambda: run(d_codes, d_lens, "extract"))
        timeit("+u64 keys", lambda: run(d_codes, d_lens, "keys"))
        timeit("+prefix gathers", lambda: run(d_codes, d_lens, "prefix"))
        timeit("+iters=0 finish", lambda: run(d_codes, d_lens, "full", 0))
        timeit("+iters=3 finish", lambda: run(d_codes, d_lens, "full", 3))

        # same gathers but with i32 indices from a plain array (no extract)
        Q = 4096 * 6 * 46
        rng2 = np.random.default_rng(1)
        bidx = jax.device_put(
            rng2.integers(0, 1 << index.prefix_bits, Q).astype(np.int32))

        @jax.jit
        def raw_prefix(b):
            return db_prefix[b].sum() + db_prefix[b + 1].sum()

        timeit("raw prefix gathers (no extract)", lambda: raw_prefix(bidx))


if __name__ == "__main__":
    main()
