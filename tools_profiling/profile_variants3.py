"""Careful remeasure: per-call block, varied inputs."""

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
        n_db = index.n

        # four distinct query batches
        qs = []
        for k in range(4):
            chunk = reads[k * B.BATCH : (k + 1) * B.BATCH]
            codes, lens = encode_seqs_padded(chunk, 160)
            mm = E.extract_metamers(jax.device_put(codes), jax.device_put(lens))
            qs.append(jax.block_until_ready(mm.value.reshape(-1)))

        bc32 = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.uint32), jnp.int32)

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

        hi_np = np.asarray(index.hi32).view(np.uint32)
        lo_np = np.asarray(index.lo32).view(np.uint32)
        rest_np = (((hi_np & np.uint32((1 << (32 - P.PREFIX_BITS)) - 1))
                    << np.uint32(8)) | (lo_np >> np.uint32(24))).astype(np.int32)
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

        def timeit(label, fn, n=8):
            jax.block_until_ready(fn(0))
            ts = []
            for i in range(n):
                t0 = time.time()
                jax.block_until_ready(fn(i % 4))
                ts.append(time.time() - t0)
            print(f"{label}: {np.median(ts)*1000:.1f} ms "
                  f"(min {min(ts)*1000:.1f})", flush=True)

        timeit("search2 varied", lambda i: search2(
            index.hi32, index.lo32, index.prefix, qs[i],
            iters=index.search_iters))
        timeit("search1 varied", lambda i: search1(
            d_rest, index.prefix, qs[i], iters=index.search_iters))
        timeit("search2 same-input", lambda i: search2(
            index.hi32, index.lo32, index.prefix, qs[0],
            iters=index.search_iters))


if __name__ == "__main__":
    main()
