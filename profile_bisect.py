"""Stage-bisection timing of the current classify program.

Each variant is a separate jit ending at stage k, returning a small
non-DCE-able reduction that is fetched (np.asarray) to force a true sync
on axon. Difference between consecutive variants ~= stage cost.
"""

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
        index = P.build_dev_index(values, taxids)
        n_db = index.n
        iters = index.search_iters
        pb = index.prefix_bits
        cap = max(1, int(cap))
        max_matches = B.BATCH * 300
        print(f"n_db={n_db} iters={iters} prefix_bits={pb} cap={cap}")

        batches = []
        for k in range(4):
            chunk = reads[k * B.BATCH : (k + 1) * B.BATCH]
            codes, lens = encode_seqs_padded(chunk, 160)
            batches.append((jax.device_put(codes), jax.device_put(lens)))

        bc32 = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.uint32), jnp.int32)
        rb = P.rest_bits(False, pb)

        def front(codes, lens, stage):
            mm = encode.extract_metamers(codes, lens)
            q_values = mm.value.reshape(-1)
            q_valid = mm.valid.reshape(-1)
            acc = jnp.sum(bc32(q_values & jnp.uint64(0xFFFFFFFF)))
            if stage == "extract":
                return acc
            q_rest = ((q_values >> jnp.uint64(24))
                      & jnp.uint64((1 << rb) - 1)).astype(jnp.int32)
            bucket = (q_values >> jnp.uint64(64 - pb)).astype(jnp.int32)
            lo = index.prefix[bucket]
            hi = index.prefix[bucket + 1]
            for _ in range(iters):
                active = lo < hi
                mid = (lo + hi) >> 1
                mid_c = jnp.minimum(mid, jnp.int32(max(n_db - 1, 0)))
                less = index.rest[mid_c] < q_rest
                lo = jnp.where(active & less, mid + 1, lo)
                hi = jnp.where(active & ~less, mid, hi)
            start = lo
            acc = acc + jnp.sum(start)
            if stage == "search":
                return acc
            bucket_end = index.prefix[bucket + 1]
            n_safe = jnp.int32(max(n_db - 1, 0))
            idx = start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
            idx_c = jnp.minimum(idx, n_safe)
            c_rest = index.rest[idx_c]
            same_aa = ((idx < bucket_end[:, None])
                       & (c_rest == q_rest[:, None]) & q_valid[:, None])
            acc = acc + jnp.sum(same_aa.astype(jnp.int32))
            if stage == "gather_rest":
                return acc
            q_d48 = mm.dna48.reshape(-1)
            q_d48lo = bc32(q_d48 & jnp.uint64(0xFFFFFFFF))
            q_d48hi = bc32(q_d48 >> jnp.uint64(32))
            hsum, h_fwd, h_rev = P.hamming_dna48_split(
                q_d48lo[:, None], q_d48hi[:, None],
                index.d48lo[idx_c], index.d48hi[idx_c])
            hsum_m = jnp.where(same_aa, hsum, jnp.int32(255))
            cutoff = jnp.minimum(jnp.min(hsum_m, axis=1) * 2, 7)
            keep = same_aa & (hsum_m <= cutoff[:, None])
            acc = acc + jnp.sum(keep) + jnp.sum(h_fwd) + jnp.sum(h_rev)
            if stage == "hamming":
                return acc
            flat_keep = keep.reshape(-1)
            Q = flat_keep.shape[0] // cap
            pos = jnp.cumsum(flat_keep.astype(jnp.int32)) - 1
            scatter_idx = jnp.where(
                flat_keep & (pos < max_matches), pos, jnp.int32(max_matches))
            rows = (jnp.full(max_matches, Q * cap, jnp.int32)
                    .at[scatter_idx]
                    .set(jnp.arange(Q * cap, dtype=jnp.int32), mode="drop"))
            acc = acc + jnp.sum(rows)
            if stage == "compact":
                return acc
            raise ValueError(stage)

        stages = ["extract", "search", "gather_rest", "hamming", "compact"]
        jits = {s: jax.jit(functools.partial(front, stage=s)) for s in stages}

        # full current program for reference
        t2s = jax.device_put(tax.species_of.astype(np.int32))

        def full(codes, lens):
            n = codes.shape[0]
            bm = P.classify_batch_indexed(
                index, t2s, codes, lens,
                jnp.zeros(n, jnp.int32), jnp.arange(n, dtype=jnp.int32),
                cap=cap, max_matches=max_matches,
                sort_device=False, pack4=True)
            return bm

        prev = 0.0
        for s in stages:
            f = jits[s]
            np.asarray(f(*batches[0]))  # compile
            t0 = time.time()
            for b in batches[1:]:
                np.asarray(f(*b))
            dt = (time.time() - t0) / 3 * 1000
            print(f"{s:12s}: {dt:7.1f} ms  (+{dt - prev:6.1f})", flush=True)
            prev = dt

        bm = full(*batches[0])
        np.asarray(bm.counts); np.asarray(bm.data)
        t0 = time.time()
        for b in batches[1:]:
            bm = full(*b)
            np.asarray(bm.counts)
        dt = (time.time() - t0) / 3 * 1000
        print(f"{'full':12s}: {dt:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
