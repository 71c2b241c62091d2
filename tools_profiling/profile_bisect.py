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
            (db_grest, db_gstart, db_gend, db_taxdna, db_d48,
             db_prefix) = index.db
            q_pi = ((q_values >> jnp.uint64(24)) * jnp.uint64(P.AA_PERM_MULT)
                    ) & jnp.uint64((1 << 40) - 1)
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
            acc = acc + jnp.sum(start) + jnp.sum(gend)
            if stage == "search":
                return acc
            n_safe = jnp.int32(max(n_db - 1, 0))
            idx = start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
            idx_c = jnp.minimum(idx, n_safe)
            same_aa = (idx < gend[:, None]) & hit[:, None]
            acc = acc + jnp.sum(same_aa.astype(jnp.int32))
            if stage == "gather_rest":
                return acc
            q_d48 = mm.dna48.reshape(-1)
            q_d48lo = bc32(q_d48 & jnp.uint64(0xFFFFFFFF))
            q_d48hi = bc32(q_d48 >> jnp.uint64(32))
            dd = db_d48[idx_c]
            hsum, h_fwd, h_rev = P.hamming_dna48_split(
                q_d48lo[:, None], q_d48hi[:, None],
                bc32(dd & jnp.uint64(0xFFFFFFFF)),
                bc32(dd >> jnp.uint64(32)))
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
            is_pad = rows >= Q * cap
            safe2 = jnp.minimum(rows, Q * cap - 1)
            qi = (safe2 // cap).astype(jnp.int32)
            ci = (safe2 % cap).astype(jnp.int32)
            midx = idx_c[qi, ci]
            row_hsum = hsum[qi, ci]
            row_h16 = h_fwd[qi, ci]
            W = mm.value.shape[2]
            w_s = max(W, 1)
            m_row = qi // (6 * w_s)
            m_frame_raw = (qi // w_s) % 6
            m_w = qi % w_s
            pos0 = mm.pos[:, :, 0]
            sign = jnp.array([1, 1, 1, -1, -1, -1], jnp.int32)
            m_pos = jnp.where(
                is_pad, jnp.int32(2**31 - 1),
                pos0[m_row, m_frame_raw] + sign[m_frame_raw] * 3 * m_w)
            acc = acc + jnp.sum(m_pos) + jnp.sum(row_hsum) + jnp.sum(row_h16)
            if stage == "tail_arith":
                return acc
            tw = db_taxdna[midx]
            m_taxid = bc32(tw & jnp.uint64(0xFFFFFFFF))
            m_dna = jnp.where(is_pad, jnp.int32(2**31 - 1),
                              bc32(tw >> jnp.uint64(32)) & jnp.int32(0xFFFFFF))
            acc = acc + jnp.sum(m_taxid) + jnp.sum(m_dna)
            if stage == "tail_gather":
                return acc
            raise ValueError(stage)

        stages = ["extract", "search", "gather_rest", "hamming", "compact",
                  "tail_arith", "tail_gather"]
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
