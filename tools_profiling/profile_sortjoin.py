"""Prototype: concat-sort merge join vs the direct-map probe.

The direct-mode search pass costs (PERF.md, 8192-read batch, Q=2.26M):
  probe 35 ms + hit-field compaction sort 37 ms + pass-2 12 ms ~ 84 ms.
Cost model: random gathers ~6-10 ns / 32-bit element; lax.sort ~1.1 ms
per (i32 operand x 1.2M rows); scans near-free.

Sort-join formulation (no random gathers at all):
  1. one sort over G+Q rows keyed by (aa, is_query) with payloads,
  2. an associative "carry last db row" scan,
  3. one partition sort compacting hits back to slot order.

Run: python tools_profiling/profile_sortjoin.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import metabuli_tpu  # noqa: F401

import jax
import jax.numpy as jnp

Q = 2_260_992            # query slots (8192 reads x 276 padded)
G = 533_875              # db AA groups
HIT_BUDGET = 1 << 19     # compacted hits
N_HITS_FRAC = 0.125      # ~283k hits / 2.26M slots


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label:28s} {dt:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    # db: G sorted distinct 40-bit aa keys; queries: hit fraction drawn
    # from db keys, rest random (mostly misses)
    db_aa = np.sort(rng.choice(1 << 40, size=G, replace=False).astype(np.uint64))
    n_hit = int(Q * N_HITS_FRAC)
    q_aa = np.concatenate([
        db_aa[rng.integers(0, G, n_hit)],
        rng.integers(0, 1 << 40, Q - n_hit).astype(np.uint64),
    ])
    rng.shuffle(q_aa)
    gstart = np.arange(G, dtype=np.int32) * 2
    gcnt = np.full(G, 2, np.int32)

    d_db = jax.device_put(db_aa)
    d_q = jax.device_put(q_aa)
    d_gs = jax.device_put(gstart)
    d_gc = jax.device_put(gcnt)

    INT32_MAX = np.int32(2**31 - 1)

    @jax.jit
    def sortjoin(db_aa, q_aa, gstart, gcnt):
        # combined key: aa << 1 | is_query (41 bits, u64). db row sorts
        # immediately before its equal-aa queries.
        kdb = db_aa << jnp.uint64(1)
        kq = (q_aa << jnp.uint64(1)) | jnp.uint64(1)
        keys = jnp.concatenate([kdb, kq])
        # payload: db rows carry start(31b)<<16 | cnt(16b) (u64 is fine as
        # one operand; lax.sort charges per 32-bit element); query rows
        # carry their slot id in the same word tagged invalid start.
        pdb = (gstart.astype(jnp.uint64) << jnp.uint64(16)) | gcnt.astype(
            jnp.uint64)
        slotid = jnp.arange(Q, dtype=jnp.int32)
        pq = slotid.astype(jnp.uint64)
        pay = jnp.concatenate([pdb, pq])
        sk, sp = jax.lax.sort((keys, pay), num_keys=1)
        is_db = (sk & jnp.uint64(1)) == 0
        # carry-last-db scan over (aa, startcnt): op(l, r) = r if r.is_db
        sa = sk >> jnp.uint64(1)

        def op(l, r):
            l_aa, l_pay = l
            r_aa, r_pay = r
            take_r = r_aa != jnp.uint64(0xFFFFFFFFFFFFFFFF)
            return (jnp.where(take_r, r_aa, l_aa),
                    jnp.where(take_r, r_pay, l_pay))

        carry_aa = jnp.where(is_db, sa, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        carry_pay = jnp.where(is_db, sp, jnp.uint64(0))
        c_aa, c_pay = jax.lax.associative_scan(op, (carry_aa, carry_pay))
        hit = (~is_db) & (c_aa == sa)
        # compaction: back to slot order with (start,cnt) attached
        slot_or_max = jnp.where(hit, sp.astype(jnp.int32), INT32_MAX)
        ck, cp = jax.lax.sort((slot_or_max, c_pay), num_keys=1)
        ck = ck[:HIT_BUDGET]
        cp = cp[:HIT_BUDGET]
        start = (cp >> jnp.uint64(16)).astype(jnp.int32)
        cnt = (cp & jnp.uint64(0xFFFF)).astype(jnp.int32)
        n_hits = jnp.sum(hit.astype(jnp.int32))
        return ck, start, cnt, n_hits

    # i32-keyed variant: aa40 -> (hi31, lo10) two i32 keys; payloads i32
    @jax.jit
    def sortjoin_i32(db_aa, q_aa, gstart, gcnt):
        k_hi_db = (db_aa >> jnp.uint64(9)).astype(jnp.int32)
        k_lo_db = ((db_aa & jnp.uint64(0x1FF)) << jnp.uint64(1)).astype(
            jnp.int32)
        k_hi_q = (q_aa >> jnp.uint64(9)).astype(jnp.int32)
        k_lo_q = (((q_aa & jnp.uint64(0x1FF)) << jnp.uint64(1))
                  | jnp.uint64(1)).astype(jnp.int32)
        k_hi = jnp.concatenate([k_hi_db, k_hi_q])
        k_lo = jnp.concatenate([k_lo_db, k_lo_q])
        slotid = jnp.arange(Q, dtype=jnp.int32)
        p1 = jnp.concatenate([gstart, slotid])       # start | slot
        p2 = jnp.concatenate([gcnt, jnp.zeros(Q, jnp.int32)])
        sh, sl, sp1, sp2 = jax.lax.sort((k_hi, k_lo, p1, p2), num_keys=2)
        is_db = (sl & 1) == 0

        def op(l, r):
            lh, ll, ls, lc = l
            rh, rl, rs, rc = r
            take_r = rc >= 0
            w = lambda a, b: jnp.where(take_r, a, b)
            return (w(rh, lh), w(rl, ll), w(rs, ls), w(rc, lc))

        c = jax.lax.associative_scan(
            op,
            (jnp.where(is_db, sh, 0), jnp.where(is_db, sl, 0),
             jnp.where(is_db, sp1, 0),
             jnp.where(is_db, sp2, jnp.int32(-1))),
        )
        hit = (~is_db) & (c[0] == sh) & (c[1] == (sl & ~1)) & (c[3] >= 0)
        slot_or_max = jnp.where(hit, sp1, INT32_MAX)
        ck, cs, cc = jax.lax.sort((slot_or_max, c[2], c[3]), num_keys=1)
        return (ck[:HIT_BUDGET], cs[:HIT_BUDGET], cc[:HIT_BUDGET],
                jnp.sum(hit.astype(jnp.int32)))

    r64 = timeit("sortjoin_u64", sortjoin, d_db, d_q, d_gs, d_gc)
    r32 = timeit("sortjoin_i32", sortjoin_i32, d_db, d_q, d_gs, d_gc)
    print("hits u64:", int(r64[3]), " i32:", int(r32[3]),
          " expected ~", n_hit)

    # reference check on a small prefix: numpy join
    idx = np.searchsorted(db_aa, q_aa)
    idxc = np.minimum(idx, G - 1)
    want_hit = db_aa[idxc] == q_aa
    print("numpy hits:", int(want_hit.sum()))
    # slot-ordered compacted slots
    want_slots = np.nonzero(want_hit)[0][:HIT_BUDGET]
    got = np.asarray(r64[0])
    got = got[got != INT32_MAX]
    print("u64 slots match:", np.array_equal(got, want_slots))
    got32 = np.asarray(r32[0])
    got32 = got32[got32 != INT32_MAX]
    print("i32 slots match:", np.array_equal(got32, want_slots))
    # starts parity for u64
    st = np.asarray(r64[1])[: len(want_slots)]
    want_st = gstart[idxc[want_slots]]
    print("u64 starts match:", np.array_equal(st, want_st))


if __name__ == "__main__":
    main()
