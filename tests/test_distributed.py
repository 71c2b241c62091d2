"""Distributed helpers (single-process degenerate mode on the CPU mesh)."""

import numpy as np
import jax

from metabuli_tpu.parallel import distributed as dist
from metabuli_tpu.parallel.mesh import build_sharded_classify, merge_shard_matches


def test_global_mesh_and_explicit_placement():
    dist.initialize()  # single-process no-op
    mesh = dist.global_mesh(n_db=2)
    assert mesh.shape["data"] == 4 and mesh.shape["db"] == 2

    rng = np.random.default_rng(0)
    n = 4096
    aa = np.sort(rng.choice(1 << 28, size=n, replace=False).astype(np.uint64))
    values = np.sort((aa << np.uint64(24)) | rng.integers(0, 1 << 24, n).astype(np.uint64))
    taxids = rng.integers(1, 64, n).astype(np.int32)
    t2s = (np.arange(64, dtype=np.int32) % 16) + 1

    db_arrays = dist.distribute_index(values, taxids, mesh)
    *db_global, n_pad, iters = db_arrays
    B = 8
    codes = rng.integers(0, 4, size=(B, 120)).astype(np.uint8)
    lens = np.full(B, 120, np.int32)
    reads = dist.distribute_reads(
        codes, lens, np.zeros(B, np.int32), np.arange(B, dtype=np.int32), mesh
    )
    step = build_sharded_classify(mesh, n_pad=n_pad, search_iters=iters,
                                  cap=8, max_matches=4096)
    out = step(*db_global, t2s, *reads)
    merged = merge_shard_matches(out, B, t2s)
    assert merged["n_matches"] >= 0  # executes end-to-end with explicit shardings


def test_two_process_distributed_run():
    """Real multi-process jax.distributed execution of the sharded classify
    step (2 processes x 2 CPU devices = 4-device global mesh)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "helpers", "dist_worker.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", f"localhost:{port}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i}: OK" in out
        assert "global=4" in out
