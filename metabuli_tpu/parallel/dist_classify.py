"""Multi-host / multi-device distributed classification workflow.

Drives the sharded classify step (`mesh.build_sharded_classify`) over a
global (data, db) mesh from the CLI: every process joins the
`jax.distributed` runtime, all processes iterate the SAME sequence of
global read batches (SPMD — every process participates in every step),
each process drains only its addressable output shards (its data rows),
taxonomizes those reads locally, and writes a part file; process 0 merges
parts into the standard classifications/report/Krona outputs.

This is the scale-out the reference lacks (`SURVEY.md` §2.8): the metamer
table is range-partitioned by amino-acid prefix across the db axis (each
shard answers its key range; AA-group-aligned cuts keep the min-hamming
rule shard-local), read batches ride the data axis, and the only
host-level communication is the shared filesystem holding the part files.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax

from ..classify.taxonomer import Taxonomer, TaxonomerParams
from ..db.index import MetamerIndex
from ..io import fasta
from ..io.report import Reporter
from ..params import ClassifyParams
from . import distributed as dist
from .mesh import build_sharded_classify, build_sharded_fused, \
    merge_shard_matches

_HINT_KEYS = ("nb", "k", "paths", "rows", "groups", "taxcnt", "ov",
              "hits", "sovf")


def _used_len(length: int) -> int:
    return max(0, 3 * ((length - 2) // 3))


def classify_distributed(
    db_dir: str,
    q1: str,
    q2: str | None,
    out_dir: str,
    job_id: str,
    par: ClassifyParams,
    coordinator: str | None,
    num_processes: int,
    process_id: int,
    n_db: int | None = None,
) -> dict:
    dist.initialize(coordinator, num_processes, process_id)
    pid = jax.process_index() if num_processes > 1 else 0
    mesh = dist.global_mesh(n_db=n_db)
    n_data = mesh.shape["data"]

    index = MetamerIndex.load(db_dir)
    dbp = index.params
    par.syncmer = dbp.syncmer
    par.smer_len = dbp.smer_len
    par.kmer_format = dbp.kmer_format
    par.reduced_aa = dbp.reduced_aa
    tax = index.taxonomy
    t2s = index.species_table().astype(np.int32)
    # reference quirk replicated for bit-identity (see Classifier.__init__):
    # the reference's merge-join can never surface the LAST k-mer of the
    # database as a candidate, so the searchable table excludes it
    db_arrays = dist.distribute_index(
        index.values[:-1], index.taxids[:-1].astype(np.int32), mesh,
        kmer_format=par.kmer_format,
    )
    *db_global, n_pad, iters = db_arrays
    cap = int(min(max(1, index.max_group), par.max_cap))

    # reads per data row; global batch = n_data * per_row
    per_row = max(1, par.batch_reads // n_data)
    g_batch = per_row * n_data

    # which data rows belong to this process (complete rows per process
    # because jax.devices() orders by process and the mesh reshape keeps
    # a process's devices contiguous)
    my_rows = [
        r for r in range(n_data)
        if mesh.devices[r, 0].process_index == pid
    ]

    tp = TaxonomerParams(
        min_score=par.min_score, min_sp_score=par.min_sp_score,
        min_cons_cnt=par.min_cons_cnt, min_cons_cnt_euk=par.min_cons_cnt_euk,
        tie_ratio=par.tie_ratio, syncmer=bool(par.syncmer),
        smer_len=par.smer_len, seq_mode=par.seq_mode,
        accession_level=par.accession_level, em=False,
        reduced_aa=bool(par.reduced_aa), kmer_format=par.kmer_format,
    )
    taxonomer = Taxonomer(tp, tax)
    try:
        from ..classify.native_taxonomer import NativeTaxonomer

        native = NativeTaxonomer(tp, tax, threads=par.threads)
    except (RuntimeError, OSError):
        native = None

    # fused sharded taxonomer: after the first (hint-seeding) batch the
    # chain DP/combine/quotient tail runs ON DEVICE per data row and only
    # the small packed tensors drain — the multi-device analogue of the
    # single-chip fused path. Hints are max-reduced across processes so
    # every process compiles the identical global program.
    use_fused = (
        not par.reduced_aa
        and os.environ.get("METABULI_TPU_DIST_FUSED", "1") != "0"
    )
    dtx = None
    if use_fused:
        from ..classify.device_taxonomer import DeviceTaxonomer

        dtx = DeviceTaxonomer(tp, tax)
    fused_step = None
    fused_sizes = None
    fused_budget = None

    os.makedirs(out_dir, exist_ok=True)
    part_path = os.path.join(out_dir, f".{job_id}_part{pid}.tsv")
    reporter = Reporter(tax, bool(par.print_lineage))

    # fixed padded read length (one compile): bucket by seq-mode typical
    from ..classify.classifier import _bucket_len
    from ..ops.genetic_code import encode_seqs_padded

    step = None
    L = None
    n_done = 0
    tax_counts_local: dict[int, int] = {}
    t_start = time.time()
    with open(part_path, "w") as part_fh:
        it1 = fasta.read_records(q1)
        it2 = fasta.read_records(q2) if q2 else None
        eof = False
        while not eof:
            names, seq_rows, lens_meta = [], [], []
            while len(names) < g_batch:
                rec1 = next(it1, None)
                if rec1 is None:
                    eof = True
                    break
                if it2 is not None:
                    rec2 = next(it2, None)
                    if rec2 is None:
                        raise ValueError("paired files differ in read count")
                    names.append(rec1.name)
                    seq_rows.append((rec1.seq, rec2.seq))
                    lens_meta.append(
                        _used_len(len(rec1.seq)) + _used_len(len(rec2.seq)))
                else:
                    names.append(rec1.name)
                    seq_rows.append((rec1.seq, None))
                    lens_meta.append(_used_len(len(rec1.seq)))
            n_real = len(names)
            if n_real == 0:
                break
            # pad the global batch to full shape with empty reads
            while len(names) < g_batch:
                names.append("")
                seq_rows.append((b"", None))
                lens_meta.append(0)

            rows = []
            for qid, (s1, s2) in enumerate(seq_rows):
                rows.append((s1, qid, 0))
                if s2 is not None:
                    rows.append((s2, qid, _used_len(len(s1)) + 3))
            max_len = max((len(r[0]) for r in rows), default=0)
            if L is None:
                L = _bucket_len(max(max_len, 1))
            while L < max_len:
                L *= 2
                step = None  # reshape -> recompile
            codes, lens = encode_seqs_padded([r[0] for r in rows], max_len=L)
            if par.mask_mode:
                from ..ops.mask import mask_codes

                for ri, row in enumerate(rows):
                    n = len(row[0])
                    codes[ri, :n] = mask_codes(codes[ri, :n], par.mask_prob)
            pos_off = np.array([r[2] for r in rows], np.int32)
            qid_off = np.array([r[1] for r in rows], np.int32)
            # data axis shards the row dimension: row count must divide
            n_rows = len(rows)
            pad_rows = (-n_rows) % n_data
            if pad_rows:
                codes = np.concatenate(
                    [codes, np.full((pad_rows, L), 7, np.uint8)])
                lens = np.concatenate([lens, np.zeros(pad_rows, np.int32)])
                pos_off = np.concatenate(
                    [pos_off, np.zeros(pad_rows, np.int32)])
                qid_off = np.concatenate(
                    [qid_off, np.full(pad_rows, g_batch - 1, np.int32)])

            rows_per_data = (len(rows) + pad_rows) // n_data
            if step is None:
                budget = max(
                    1024,
                    (len(rows) + pad_rows) // n_data * 6
                    * max(0, (L - 2) // 3 - 7) * par.match_per_kmer,
                )
                step = build_sharded_classify(
                    mesh, n_pad=n_pad, search_iters=iters, cap=cap,
                    max_matches=budget, reduced=bool(par.reduced_aa),
                    syncmer=bool(par.syncmer), smer_len=par.smer_len,
                    kmer_format=par.kmer_format,
                )
            read_lens = np.array(lens_meta, np.int32)

            # compile the fused sharded step once hints exist (seeded from
            # the first batch's plain pass, max-reduced across processes so
            # every process traces the identical global program)
            if dtx is not None and dtx.hints and fused_step is None:
                fused_budget = budget
                mrl = (2 * _used_len(L) + 3) if q2 else _used_len(L)
                fused_sizes = dtx.fused_sizes(per_row, fused_budget, mrl)
                # route="gather": the drain below picks ONE addressable
                # shard per data row, which requires db-invariant outputs;
                # under route="alltoall" each db rank holds only its read
                # subset's results and a multi-host process cannot address
                # the other ranks' blocks. The alltoall route is for
                # single-process meshes (bench / dryrun_multichip).
                fused_step = build_sharded_fused(
                    mesh, n_pad=n_pad, search_iters=iters, cap=cap,
                    max_matches=fused_budget, sizes=fused_sizes,
                    reduced=bool(par.reduced_aa), syncmer=bool(par.syncmer),
                    smer_len=par.smer_len, kmer_format=par.kmer_format,
                    route="gather",
                )

            out_rows = []
            fused_ok = False
            if fused_step is not None:
                # local qids per data row (the fused tail runs per row)
                qid_local = (
                    qid_off
                    - (np.arange(len(qid_off), dtype=np.int32)
                       // rows_per_data) * per_row
                ).astype(np.int32)
                from jax.sharding import NamedSharding, PartitionSpec as P

                data_sh = NamedSharding(mesh, P("data"))
                reads_g = dist.distribute_reads(
                    codes, lens, pos_off, qid_local, mesh)
                rl_g = jax.device_put(read_lens, data_sh)
                packed_g, ov_g, counts_g = fused_step(
                    *db_global, t2s, dtx.dt, dtx.min_depth, rl_g, *reads_g)
                jax.block_until_ready((packed_g, counts_g))
                my_row_set = set(my_rows)
                pk_rows: dict[int, np.ndarray] = {}
                ov_rows: dict[int, np.ndarray] = {}
                ct_rows: dict[int, np.ndarray] = {}
                for shard in packed_g.addressable_shards:
                    r = shard.index[0].start or 0
                    if r in my_row_set and r not in pk_rows:
                        pk_rows[r] = np.asarray(shard.data)[0]
                for shard in ov_g.addressable_shards:
                    r = shard.index[0].start or 0
                    if r in my_row_set and r not in ov_rows:
                        ov_rows[r] = shard.data[0]  # fetched lazily
                for shard in counts_g.addressable_shards:
                    r = shard.index[0].start or 0
                    if r in my_row_set and r not in ct_rows:
                        ct_rows[r] = np.asarray(shard.data)[0]
                row_res: dict[int, list] = {}
                ok = True
                for r in my_rows:
                    rl_row = read_lens[r * per_row:(r + 1) * per_row]
                    res, info = dtx.drain_fused(
                        (pk_rows[r], ov_rows[r], ct_rows[r], fused_sizes),
                        rl_row, per_row,
                    )
                    if res is None or info["n_matches"] > fused_budget:
                        ok = False
                        break
                    row_res[r] = res
                # SPMD: the plain fallback is a collective — every process
                # must agree before any takes it
                if num_processes > 1:
                    from jax.experimental import multihost_utils

                    oks = multihost_utils.process_allgather(
                        np.array([1 if ok else 0], np.int32))
                    ok = bool(np.min(oks))
                if ok:
                    fused_ok = True
                    for r in my_rows:
                        for li, rc in enumerate(row_res[r]):
                            qid = r * per_row + li
                            if qid >= n_real:
                                continue
                            out_rows.append((n_done + qid, names[qid], rc,
                                             int(read_lens[qid])))
                            t = rc.taxid if rc.is_classified else 0
                            tax_counts_local[t] = \
                                tax_counts_local.get(t, 0) + 1

            if not fused_ok:
                reads_g = dist.distribute_reads(
                    codes, lens, pos_off, qid_off, mesh)
                out = step(*db_global, t2s, *reads_g)
                jax.block_until_ready(out)

                # drain this process's data rows only. Matches are
                # replicated across the db axis (all_gather in the sharded
                # step), so every shard of an owned row is complete — fetch
                # ONE replica per row and skip rows owned by others.
                data_g, counts_g = out
                my_row_set = set(my_rows)
                seen_rows: set[int] = set()
                local_parts = []
                for shard in data_g.addressable_shards:
                    r = shard.index[0].start or 0
                    if r not in my_row_set or r in seen_rows:
                        continue
                    seen_rows.add(r)
                    local_parts.append(np.asarray(shard.data))
                if local_parts:
                    stacked = np.concatenate(local_parts, axis=0)
                    w = stacked.shape[2]
                    datas = stacked.transpose(2, 0, 1, 3).reshape(w, -1)
                else:
                    datas = np.zeros((5, 0), np.int32)
                m = _rows_to_matches(datas, t2s)

                # seed the fused grid-size hints from this batch's matches
                # (per data row, since the fused tail runs per row), then
                # max-reduce across processes for identical programs
                if dtx is not None and not dtx.hints:
                    for r in my_rows:
                        lo = np.searchsorted(m["qid"], r * per_row, "left")
                        hi = np.searchsorted(
                            m["qid"], (r + 1) * per_row - 1, "right")
                        if hi > lo:
                            sub = {k: m[k][lo:hi] for k in
                                   ("qid", "species", "frame", "pos")}
                            dtx.set_hints(sub, tp.dna_shift)
                    if num_processes > 1:
                        from jax.experimental import multihost_utils

                        vec = np.array(
                            [dtx.hints.get(k, 0) for k in _HINT_KEYS],
                            np.int64)
                        allv = multihost_utils.process_allgather(vec)
                        mx = np.max(np.atleast_2d(allv), axis=0)
                        for k, v in zip(_HINT_KEYS, mx):
                            if int(v) > 0:
                                dtx.hints[k] = int(v)

                starts = np.searchsorted(
                    m["qid"], np.arange(g_batch), side="left")
                ends = np.searchsorted(
                    m["qid"], np.arange(g_batch), side="right")
                # this process's qids: derived from its data rows
                my_qids = set()
                for r in my_rows:
                    for j in range(r * rows_per_data, (r + 1) * rows_per_data):
                        if j < len(rows):
                            my_qids.add(int(qid_off[j]))
                qlist = sorted(q for q in my_qids if q < n_real)
                if qlist:
                    rs = starts[qlist].astype(np.int64)
                    re_ = ends[qlist].astype(np.int64)
                    rl_q = read_lens[qlist]
                    if native is not None:
                        res, _ = native.assign_batch(m, rs, re_, rl_q)
                    else:
                        res = []
                        for i, qid in enumerate(qlist):
                            lo, hi = int(rs[i]), int(re_[i])
                            if lo == hi:
                                res.append(_empty_rc())
                                continue
                            sub = {k: m[k][lo:hi] for k in
                                   ("qid", "species", "frame", "pos",
                                    "hamming", "dna", "taxid", "h16")}
                            res.append(
                                taxonomer.choose_best_taxon(
                                    sub, int(rl_q[i])))
                    for i, qid in enumerate(qlist):
                        rc = res[i]
                        out_rows.append((n_done + qid, names[qid], rc,
                                         int(rl_q[i])))
                        t = rc.taxid if rc.is_classified else 0
                        tax_counts_local[t] = tax_counts_local.get(t, 0) + 1
            for gidx, name, rc, rl in out_rows:
                part_fh.write(
                    f"{gidx}\t" + reporter.classification_row(name, rc, rl))
            n_done += n_real

    # barrier, then process 0 merges part files (shared filesystem)
    if num_processes > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("metabuli_parts_written")
    summary = {"reads": n_done, "wall_s": time.time() - t_start}
    if pid == 0:
        rows = []
        for p in range(num_processes):
            pp = os.path.join(out_dir, f".{job_id}_part{p}.tsv")
            if not os.path.exists(pp):
                continue
            with open(pp) as fh:
                for line in fh:
                    gidx, rest = line.split("\t", 1)
                    rows.append((int(gidx), rest))
        rows.sort(key=lambda x: x[0])
        cls_path = os.path.join(out_dir, f"{job_id}_classifications.tsv")
        tax_counts: dict[int, int] = {}
        with open(cls_path, "w") as fh:
            fh.write(reporter.classification_header())
            for _, rest in rows:
                fh.write(rest)
                cols = rest.split("\t")
                t = tax.to_internal(int(cols[2])) if cols[0] == "1" else 0
                tax_counts[max(t, 0)] = tax_counts.get(max(t, 0), 0) + 1
        with open(os.path.join(out_dir, f"{job_id}_report.tsv"), "w") as fh:
            reporter.write_report(fh, tax_counts, len(rows))
        with open(os.path.join(out_dir, f"{job_id}_krona.html"), "w") as fh:
            reporter.write_krona(fh, tax_counts, len(rows))
        summary["classified"] = len(rows) - tax_counts.get(0, 0)
    if num_processes > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("metabuli_outputs_merged")
    return summary


def _empty_rc():
    from ..classify.taxonomer import ReadClassification

    return ReadClassification()


def _rows_to_matches(data: np.ndarray, species_table: np.ndarray) -> dict:
    """Transfer-packed rows [5, M] -> sorted match dict (see
    pipeline.matches_to_host; padding rows dropped, reference order)."""
    valid = data[0] != np.int32(2147483647)
    data = data[:, valid]
    packed = data[4]
    out = {
        "qid": data[0],
        "pos": data[1],
        "dna": data[2],
        "taxid": data[3],
        "frame": packed & 7,
        "hamming": (packed >> 3) & 0xFF,
        "h16": (packed >> 11) & 0xFFFF,
    }
    out["species"] = species_table[out["taxid"]].astype(np.int32)
    order = np.lexsort((
        out["dna"].view(np.uint32) if out["dna"].size else out["dna"],
        out["hamming"], out["pos"], out["frame"], out["species"], out["qid"],
    ))
    for k in ("qid", "species", "frame", "pos", "hamming", "dna", "taxid",
              "h16"):
        out[k] = np.ascontiguousarray(out[k][order])
    return out
