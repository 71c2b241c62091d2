"""Bisect inside extract_metamers: gathers vs table lookups vs u64 packing."""

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

    from metabuli_tpu.ops.genetic_code import codon_tables, encode_seqs_padded
    from metabuli_tpu.ops.encode import _RC8, K, max_codons

    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        reads = B.sample_reads(genomes, rng)

    batches = []
    for k in range(4):
        chunk = reads[k * B.BATCH : (k + 1) * B.BATCH]
        codes, lens = encode_seqs_padded(chunk, 160)
        batches.append((jax.device_put(codes), jax.device_put(lens)))

    aa_tab_np, num_tab_np = codon_tables(False)

    def front(codes, lens, stage):
        B_, L = codes.shape
        A = max_codons(L)
        W = max(0, A - K + 1)
        aa_tab = jnp.asarray(aa_tab_np)
        num_tab = jnp.asarray(num_tab_np)
        rc_tab = jnp.asarray(_RC8)
        lens = lens.astype(jnp.int32)
        used_len = jnp.maximum(3 * ((lens - 2) // 3), 0)
        aa_len = used_len // 3
        codon_idx = jnp.arange(A, dtype=jnp.int32)

        def gather_codes(base_idx):
            safe = jnp.clip(base_idx, 0, L - 1)
            vals = jnp.take_along_axis(codes, safe.astype(jnp.int32), axis=1)
            return jnp.where((base_idx >= 0) & (base_idx < L), vals,
                             jnp.uint8(7))

        cis, oks = [], []
        for f in range(6):
            if f < 3:
                begin = jnp.full((B_,), f, dtype=jnp.int32)
                b1 = begin[:, None] + 3 * codon_idx[None, :]
                c1 = gather_codes(b1)
                c2 = gather_codes(b1 + 1)
                c3 = gather_codes(b1 + 2)
            else:
                begin = jnp.mod(lens % 3 - (f - 3), 3)
                end = begin + used_len - 1
                b1 = end[:, None] - 3 * codon_idx[None, :]
                c1 = rc_tab[gather_codes(b1)]
                c2 = rc_tab[gather_codes(b1 - 1)]
                c3 = rc_tab[gather_codes(b1 - 2)]
            ok = ((c1 < 4) & (c2 < 4) & (c3 < 4)
                  & (codon_idx[None, :] < aa_len[:, None]))
            ci = (c1.astype(jnp.int32) * 16 + c2.astype(jnp.int32) * 4
                  + c3.astype(jnp.int32)) & 63
            cis.append(ci)
            oks.append(ok)
        ci = jnp.stack(cis, axis=1)
        ok = jnp.stack(oks, axis=1)
        acc = jnp.sum(ci) + jnp.sum(ok.astype(jnp.int32))
        if stage == "gathers":
            return acc
        aa = jnp.where(ok, aa_tab[ci], -1)
        num = jnp.where(ok, num_tab[ci], 0)
        acc = acc + jnp.sum(aa) + jnp.sum(num)
        if stage == "tables":
            return acc
        aa_u = aa.astype(jnp.uint64)
        num_u = num.astype(jnp.uint64)
        c6_u = ci.astype(jnp.uint64)
        aa_part = jnp.zeros(aa_u[..., :W].shape, jnp.uint64)
        dna_part = jnp.zeros_like(aa_part)
        dna48 = jnp.zeros_like(aa_part)
        valid = jnp.ones(aa_part.shape, bool)
        for j in range(K):
            aa_part = (aa_part << 5) | aa_u[..., j : j + W]
            dna_part = (dna_part << 3) | num_u[..., j : j + W]
            valid = valid & ok[..., j : j + W]
        for j in range(K):
            dna48 = (dna48 << 6) | c6_u[..., j : j + W]
        value = ((aa_part & ((jnp.uint64(1) << 40) - 1)) << 24) | (
            dna_part & ((jnp.uint64(1) << 24) - 1))
        bc = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.uint32), jnp.int32)
        acc = (acc + jnp.sum(bc(value & jnp.uint64(0xFFFFFFFF)))
               + jnp.sum(bc(dna48 & jnp.uint64(0xFFFFFFFF)))
               + jnp.sum(valid.astype(jnp.int32)))
        if stage == "pack64":
            return acc
        raise ValueError(stage)

    prev = 0.0
    for s in ["gathers", "tables", "pack64"]:
        f = jax.jit(functools.partial(front, stage=s))
        np.asarray(f(*batches[0]))
        t0 = time.time()
        for b in batches[1:]:
            np.asarray(f(*b))
        dt = (time.time() - t0) / 3 * 1000
        print(f"{s:8s}: {dt:7.1f} ms  (+{dt - prev:6.1f})", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
