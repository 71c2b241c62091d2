"""Data-axis scaling curve for the sharded fused classify step.

Runs the FULL sharded program (search + merge + fused taxonomer tail,
`parallel/mesh.build_sharded_fused`) on an N-device virtual CPU mesh at
data = 1, 2, 4, 8 with a FIXED per-device read count (weak scaling: ideal
is flat time as devices grow). Matches never cross data rows — the only
cross-device traffic is the db-axis all_gather of per-shard match columns
(here db=1, so none) — so parallel efficiency measures the runtime's
dispatch/collective overhead, not algorithmic serialization.

CPU timings do not transfer to TPU absolute numbers; the SHAPE of the
curve (flat = linear scale-out) is the datapoint: reads/s at N chips =
N x single-chip reads/s to within the printed efficiency.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools_profiling/scaling_curve.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["METABULI_TPU_PLATFORM"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np

import metabuli_tpu  # noqa: F401
import jax

jax.config.update("jax_platforms", "cpu")

PER_DEV_READS = 512
READ_LEN = 150


def main():
    import pathlib
    import tempfile

    from metabuli_tpu.classify.device_taxonomer import DeviceTaxonomer
    from metabuli_tpu.classify.pipeline import (
        build_dev_index, classify_batch_indexed, matches_to_host)
    from metabuli_tpu.classify.taxonomer import TaxonomerParams
    from metabuli_tpu.db.taxonomy import Taxonomy
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded
    from metabuli_tpu.parallel.mesh import build_sharded_fused, \
        shard_index_aa_aligned
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        d = pathlib.Path(td)
        nodes = [(1, 1, "no rank"), (2, 1, "superkingdom")]
        names = {1: "root", 2: "Bacteria"}
        tid = 3
        species = []
        for g in range(4):
            gid = tid
            nodes.append((tid, 2, "genus")); names[tid] = f"G{g}"; tid += 1
            for s in range(2):
                nodes.append((tid, gid, "species"))
                names[tid] = f"S{g}{s}"; species.append(tid); tid += 1
        (d / "nodes.dmp").write_text(
            "".join(f"{t}\t|\t{p}\t|\t{r}\t|\n" for t, p, r in nodes))
        (d / "names.dmp").write_text("".join(
            f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n"
            for t, n in names.items()))
        (d / "merged.dmp").write_text("")
        tax = Taxonomy.from_dmp(str(d / "names.dmp"), str(d / "nodes.dmp"),
                                str(d / "merged.dmp"))
    genomes = [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 50_000))
        for _ in species
    ]

    from metabuli_tpu.ops import encode
    from metabuli_tpu.ops.genetic_code import encode_seqs_padded as esp

    gcodes, glens = esp(genomes)
    mm = encode.extract_metamers(gcodes, glens)
    vals = np.asarray(mm.value)
    ok = np.asarray(mm.valid)
    per = [np.unique(vals[i][ok[i]]) for i in range(len(genomes))]
    values = np.unique(np.concatenate(per))
    taxids = np.zeros(len(values), np.int32)
    for gi, pv in enumerate(per):
        taxids[np.searchsorted(values, pv)] = tax.to_internal(species[gi])
    t2s = tax.species_of.astype(np.int32)

    def reads_for(n):
        out = []
        for i in range(n):
            g = genomes[i % len(genomes)]
            st = (97 * i) % (len(g) - READ_LEN)
            out.append(g[st:st + READ_LEN])
        return out

    tp = TaxonomerParams()
    dtx = DeviceTaxonomer(tp, tax)
    read_len = 3 * ((READ_LEN - 2) // 3)

    # hints from a single-device warmup
    r0 = reads_for(PER_DEV_READS)
    codes0, lens0 = encode_seqs_padded(r0, 160)
    bm = classify_batch_indexed(
        build_dev_index(values, taxids), jax.device_put(t2s),
        codes0, lens0, np.zeros(len(r0), np.int32),
        np.arange(len(r0), dtype=np.int32), cap=4, max_matches=1 << 18)
    m = matches_to_host(bm, t2s)
    dtx.set_hints(m, tp.dna_shift)

    devices = jax.devices()
    results = []
    for n_data in (1, 2, 4, 8):
        mesh = Mesh(
            np.array(devices[:n_data]).reshape(n_data, 1), ("data", "db"))
        B = PER_DEV_READS * n_data
        reads = reads_for(B)
        codes, lens = encode_seqs_padded(reads, 160)
        offs = np.zeros(B, np.int32)
        qids_local = np.tile(
            np.arange(PER_DEV_READS, dtype=np.int32), n_data)
        rl = np.full(B, read_len, np.int32)
        db, n_pad, iters = shard_index_aa_aligned(values, taxids, 1)
        sizes = dtx.fused_sizes(PER_DEV_READS, 1 << 18, read_len)
        step = build_sharded_fused(
            mesh, n_pad=n_pad, search_iters=iters, cap=4,
            max_matches=1 << 18, sizes=sizes)
        out = step(db, t2s, dtx.dt, dtx.min_depth, rl, codes, lens, offs,
                   qids_local)
        jax.block_until_ready(out)
        t0 = time.time()
        iters_n = 5
        for _ in range(iters_n):
            out = step(db, t2s, dtx.dt, dtx.min_depth, rl, codes, lens,
                       offs, qids_local)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / iters_n
        results.append((n_data, B, dt))
        base = results[0][2]
        eff = base / dt
        print(f"data={n_data}: {B:5d} reads in {dt*1e3:8.1f} ms "
              f"({B/dt:9.0f} reads/s, weak-scaling efficiency "
              f"{eff:.2f})", flush=True)

    # Control: the N virtual devices SHARE one host's cores, so per-row
    # time cannot stay flat — the meaningful CPU-mesh measurement is
    # whether the 8-row mesh costs more than the SAME total work on one
    # device (mesh/collective overhead). On real chips each data row has
    # its own silicon, so reads/s scales with the chip count times the
    # efficiency printed here.
    n8, B8, dt8 = results[-1]
    mesh1 = Mesh(np.array(devices[:1]).reshape(1, 1), ("data", "db"))
    reads = reads_for(B8)
    codes, lens = encode_seqs_padded(reads, 160)
    offs = np.zeros(B8, np.int32)
    qids_local = np.arange(B8, dtype=np.int32)
    rl = np.full(B8, read_len, np.int32)
    db, n_pad, iters = shard_index_aa_aligned(values, taxids, 1)
    sizes = dtx.fused_sizes(B8, 1 << 18, read_len)
    step = build_sharded_fused(
        mesh1, n_pad=n_pad, search_iters=iters, cap=4,
        max_matches=1 << 18, sizes=sizes)
    out = step(db, t2s, dtx.dt, dtx.min_depth, rl, codes, lens, offs,
               qids_local)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = step(db, t2s, dtx.dt, dtx.min_depth, rl, codes, lens, offs,
                   qids_local)
        jax.block_until_ready(out)
    dt1 = (time.time() - t0) / 5
    print(f"control: same {B8} reads on ONE device row: {dt1*1e3:8.1f} ms"
          f" -> {n8}-row mesh overhead {dt8/dt1:.2f}x", flush=True)


if __name__ == "__main__":
    main()
