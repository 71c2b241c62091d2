"""Bisect chain_matches: grid construction vs the column scan; raw BW."""

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

    cache = "/tmp/prof_db.npz"

    def sync(r):
        # axon: block_until_ready does not truly sync; force a D2H
        leaf = jax.tree.leaves(r)[0]
        np.asarray(jax.numpy.ravel(leaf)[:1])

    def timeit(label, fn, n=3):
        t0 = time.time()
        r = fn()
        sync(r)
        c = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            r = fn()
            sync(r)
        print(f"{label}: {(time.time()-t0)/n*1000:.0f} ms "
              f"(compile+run {c:.1f}s)", flush=True)
        return r

    # ---- raw sequential bandwidth
    x = jax.device_put(np.zeros((64, 1 << 21), np.float32))  # 512MB

    @jax.jit
    def bump(x):
        return x + 1.0

    timeit("x+1 over 512MB (r+w 1GB)", lambda: bump(x))
    del x

    # ---- scatter microbenchmark: 1.2M updates into [65537, 64, 4]
    rng = np.random.default_rng(0)
    M = B.BATCH * 300
    NB, W, K = 65536, 64, 4
    b_i = jax.device_put(rng.integers(0, NB, M).astype(np.int32))
    c_i = jax.device_put(rng.integers(0, W, M).astype(np.int32))
    s_i = jax.device_put(rng.integers(0, K, M).astype(np.int32))
    vals = jax.device_put(rng.integers(0, 1 << 30, M).astype(np.int32))

    @jax.jit
    def scat(b_i, c_i, s_i, vals):
        g = jnp.zeros((NB + 1, W, K), jnp.int32)
        return g.at[b_i, c_i, s_i].set(vals, mode="drop")

    timeit("scatter 1.2M -> [65537,64,4]", lambda: scat(b_i, c_i, s_i, vals))

    @jax.jit
    def scat_flat(b_i, c_i, s_i, vals):
        g = jnp.zeros((NB + 1) * W * K, jnp.int32)
        flat = (b_i * W + c_i) * K + s_i
        return g.at[flat].set(vals, mode="drop")

    timeit("scatter 1.2M flat -> [16.8M]", lambda: scat_flat(b_i, c_i, s_i, vals))

    # ---- the scan alone on dummy grids
    from metabuli_tpu.classify import device_chain as DC

    g_occ = jax.device_put(rng.random((NB, W, K)) < 0.05)
    g_pos = jax.device_put((rng.integers(0, 50, (NB, W, K)) * 3).astype(np.int32))
    g_dna = jax.device_put(rng.integers(0, 1 << 24, (NB, W, K)).astype(np.int32))
    g_h16 = jax.device_put(rng.integers(0, 1 << 16, (NB, W, K)).astype(np.int32))
    g_ham = jax.device_put(rng.integers(0, 8, (NB, W, K)).astype(np.int32))
    block_forward = jax.device_put(np.ones(NB, bool))
    block_min_depth = jax.device_put(np.full(NB, 4, np.int32))

    @jax.jit
    def scan_only(g_occ, g_pos, g_dna, g_h16, g_ham, block_forward,
                  block_min_depth):
        base_score = jnp.where(g_occ, DC._match_score(g_h16), 0.0)

        class Carry(DC.NamedTuple):
            col: jax.Array
            n_groups: jax.Array
            occ: jax.Array
            dna: jax.Array
            h16: jax.Array
            pos: jax.Array
            p_score: jax.Array
            p_start: jax.Array
            p_ham: jax.Array
            p_depth: jax.Array
            p_sh16: jax.Array

        nb, w, k = g_occ.shape
        init = Carry(
            col=jnp.full(nb, -(2**30), jnp.int32),
            n_groups=jnp.zeros(nb, jnp.int32),
            occ=jnp.zeros((nb, k), bool),
            dna=jnp.zeros((nb, k), jnp.int32),
            h16=jnp.zeros((nb, k), jnp.int32),
            pos=jnp.zeros((nb, k), jnp.int32),
            p_score=jnp.zeros((nb, k), jnp.float32),
            p_start=jnp.zeros((nb, k), jnp.int32),
            p_ham=jnp.zeros((nb, k), jnp.int32),
            p_depth=jnp.zeros((nb, k), jnp.int32),
            p_sh16=jnp.zeros((nb, k), jnp.int32),
        )

        max_shift = 1

        def step(carry, xs):
            occ_c, pos_c, dna_c, h16_c, ham_c, score_c = xs
            has_cur = occ_c.any(axis=1)
            cur_col_q = jnp.where(occ_c, (pos_c // 3), 0).max(axis=1)
            prev_q = jnp.where(carry.occ, (carry.pos // 3), 0).max(axis=1)
            shift = jnp.where(carry.n_groups > 0, cur_col_q - prev_q,
                              jnp.int32(2**30))
            connectable = has_cur & (shift >= 1) & (shift <= max_shift)
            sh = jnp.clip(shift, 1, 8)[:, None, None]
            mask_bits = (jnp.int32(1) << (24 - 3 * sh)) - 1
            prev_d = carry.dna[:, :, None]
            cur_d = dna_c[:, None, :]
            conn_fwd = (prev_d & mask_bits) == (cur_d >> (3 * sh))
            conn_rev = (cur_d & mask_bits) == (prev_d >> (3 * sh))
            conn = jnp.where(block_forward[:, None, None], conn_fwd, conn_rev)
            conn = (conn & carry.occ[:, :, None] & occ_c[:, None, :]
                    & connectable[:, None, None])
            cand = jnp.where(conn, carry.p_score[:, :, None], DC.NEG)
            best_i = jnp.argmax(cand, axis=1)
            best_score = jnp.max(cand, axis=1)
            has_pred = best_score > 0.0
            take = lambda g: jnp.take_along_axis(g, best_i, axis=1)
            inc_s, inc_h = DC._increment(h16_c, jnp.clip(shift, 0, 8)[:, None])
            new_score = jnp.where(has_pred, take(carry.p_score) + inc_s, score_c)
            new_start = jnp.where(has_pred, take(carry.p_start), pos_c)
            new_ham = jnp.where(has_pred, take(carry.p_ham) + inc_h, ham_c)
            new_depth = jnp.where(
                has_pred, take(carry.p_depth) + jnp.clip(shift, 0, 8)[:, None], 1)
            new_sh16 = jnp.where(has_pred, take(carry.p_sh16), h16_c)
            connected_prev = conn.any(axis=2)
            emit = (carry.occ & has_cur[:, None] & ~connected_prev
                    & (carry.p_depth >= block_min_depth[:, None]))
            out = (emit, carry.p_start, carry.pos + 23, carry.p_score,
                   carry.p_ham, carry.p_depth, carry.p_sh16, carry.h16)
            sel = has_cur[:, None]
            new_carry = Carry(
                col=carry.col,
                n_groups=carry.n_groups + has_cur.astype(jnp.int32),
                occ=jnp.where(sel, occ_c, carry.occ),
                dna=jnp.where(sel, dna_c, carry.dna),
                h16=jnp.where(sel, h16_c, carry.h16),
                pos=jnp.where(sel, pos_c, carry.pos),
                p_score=jnp.where(sel, new_score, carry.p_score),
                p_start=jnp.where(sel, new_start, carry.p_start),
                p_ham=jnp.where(sel, new_ham, carry.p_ham),
                p_depth=jnp.where(sel, new_depth, carry.p_depth),
                p_sh16=jnp.where(sel, new_sh16, carry.p_sh16),
            )
            return new_carry, out

        xs = (g_occ.transpose(1, 0, 2), g_pos.transpose(1, 0, 2),
              g_dna.transpose(1, 0, 2), g_h16.transpose(1, 0, 2),
              g_ham.transpose(1, 0, 2), base_score.transpose(1, 0, 2))
        final, outs = jax.lax.scan(step, init, xs)
        return outs[0].sum(), outs[3].sum(), final.p_score.sum()

    timeit("scan only (64 steps, NB=65536, K=4)", lambda: scan_only(
        g_occ, g_pos, g_dna, g_h16, g_ham, block_forward, block_min_depth))


if __name__ == "__main__":
    main()
