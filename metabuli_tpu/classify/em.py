"""EM abundance re-estimation and read re-assignment (--em).

Numpy-vectorized implementation of the reference's
`Classifier::em`/`reclassify` (`/root/reference/src/commons/Classifier.cpp:210-388`):

  * mappings: per read, up to 10 (species, score^2) pairs
    (`Reporter.h:78-91`, recorded by getBestSpeciesMatches);
  * species weight = score * prob(species) * 1/log(unique k-mers of species)
    (`Classifier.cpp:216-222`);
  * EM over species abundances, <= 1000 iterations, abs-delta < 1e-6; after
    iteration 10, probabilities < 1e-5 snap to 0 (`Classifier.cpp:253-311`);
  * each read reclassifies to the LCA of the most probable species covering
    >= 0.5 posterior (`Classifier.cpp:326-388`).
"""

from __future__ import annotations

import os

import numpy as np


def unique_kmers_per_species(index) -> np.ndarray:
    """Unique k-mer count per species from the info entries
    (`Classifier.cpp:390-440`); cached like sp2uniqKmerCnt."""
    species = index.species_table().astype(np.int64)[index.taxids.astype(np.int64)]
    return np.bincount(species, minlength=index.taxonomy.n_nodes() + 1)


def run_em(
    mappings: list[tuple[int, int, float]],
    sp_uniq_kmers: np.ndarray,
    total_queries: int,
    max_iters: int = 1000,
    tol: float = 1e-6,
):
    """Returns (tax_probs dict, per-read reclassification arrays).

    ``mappings``: (query_idx, species, score^2) triples, query-sorted.
    """
    if not mappings:
        return {}, np.zeros(0, np.int64), np.zeros(0)
    arr_q = np.array([m[0] for m in mappings], np.int64)
    arr_sp = np.array([m[1] for m in mappings], np.int64)
    arr_score = np.array([m[2] for m in mappings], np.float64)

    length_factor = np.zeros(len(sp_uniq_kmers))
    nz = sp_uniq_kmers > 0
    with np.errstate(divide="ignore"):
        length_factor[nz] = 1.0 / np.log(sp_uniq_kmers[nz])

    species_list = np.unique(arr_sp)
    probs = np.zeros(len(sp_uniq_kmers))
    probs[species_list] = 1.0 / len(species_list)

    w_base = arr_score * length_factor[arr_sp]
    # per-query segment ids (queries sorted)
    uq, seg = np.unique(arr_q, return_inverse=True)
    n_q = len(uq)

    query_count = 0
    for it in range(max_iters):
        w = w_base * probs[arr_sp]
        denom = np.bincount(seg, weights=w, minlength=n_q)
        ok = denom[seg] > 0
        contrib = np.where(ok, w / np.where(denom[seg] == 0, 1, denom[seg]), 0.0)
        query_count = int((denom > 0).sum())
        f_new = np.bincount(arr_sp, weights=contrib, minlength=len(probs))
        if query_count:
            f_new /= query_count
        delta = np.abs(f_new[species_list] - probs[species_list]).sum()
        if it > 10:
            f_new[f_new < 1e-5] = 0.0
        probs = f_new
        if delta < tol:
            break

    # ----- reclassify (`Classifier.cpp:326-388`)
    w = w_base * probs[arr_sp]
    denom = np.bincount(seg, weights=w, minlength=n_q)
    read_tax = np.zeros(n_q, np.int64)
    read_score = np.zeros(n_q)
    order = np.lexsort((-w, seg))
    sw, sseg, ssp = w[order], seg[order], arr_sp[order]
    starts = np.searchsorted(sseg, np.arange(n_q), side="left")
    ends = np.searchsorted(sseg, np.arange(n_q), side="right")
    tax_probs = {int(s): float(probs[s]) for s in species_list}
    return tax_probs, (uq, starts, ends, sw, ssp, denom), query_count


def run_em_reassignment(classifier, mappings, all_results, out_dir, job_id, total_reads):
    """Drive EM + reclassify and write the EM report files
    (`Reporter.cpp:115-160, 367-409`)."""
    from ..io.report import format_float

    tax = classifier.taxonomy
    sp_uniq = unique_kmers_per_species(classifier.index)
    tax_probs, reclassify_data, query_count = run_em(
        mappings, sp_uniq, total_reads
    )

    # EM abundance report
    em_counts: dict[int, int] = {}
    explained = 0
    for sp, p in tax_probs.items():
        cnt = int(p * query_count)
        if cnt > 0:
            em_counts[sp] = cnt
            explained += cnt
    em_counts[0] = total_reads - explained
    with open(os.path.join(out_dir, f"{job_id}_EM_report.tsv"), "w") as fh:
        classifier.reporter.write_report(fh, em_counts, total_reads)

    # per-read reclassification
    reclass_counts: dict[int, int] = {}
    rows = []
    name_len = {i: (all_results[i][0], all_results[i][2]) for i in range(len(all_results))}
    taxids = np.zeros(len(all_results), np.int64)
    scores = np.zeros(len(all_results))
    if reclassify_data is not None and len(reclassify_data[0]):
        uq, starts, ends, sw, ssp, denom = reclassify_data
        for qi in range(len(uq)):
            q = int(uq[qi])
            if denom[qi] == 0:
                continue
            lo, hi = int(starts[qi]), int(ends[qi])
            cum = 0.0
            cands = []
            for j in range(lo, hi):
                if cum >= 0.5:
                    break
                cum += sw[j] / denom[qi]
                cands.append(int(ssp[j]))
            taxids[q] = tax.lca(cands)
            scores[q] = cum
    for i, (name, rc, read_len) in enumerate(all_results):
        t = int(taxids[i])
        if t != 0:
            # the reference only counts reads that reclassified to a real
            # taxon (`Classifier.cpp:350-354` skips denom==0 reads before
            # the localTaxCounts increment, and mapping-less reads never
            # enter queryRanges), so its EM+reclassify report has no
            # unclassified row from this stage
            reclass_counts[t] = reclass_counts.get(t, 0) + 1
        rows.append((name, t, read_len, scores[i]))

    with open(os.path.join(out_dir, f"{job_id}_EM+reclassify_report.tsv"), "w") as fh:
        classifier.reporter.write_report(fh, reclass_counts, total_reads)
    with open(os.path.join(out_dir, f"{job_id}_EM+reclassify_results.tsv"), "w") as fh:
        fh.write("#is_classified\tname\ttaxID\tquery_length\tscore\trank")
        if classifier.reporter.print_lineage:
            fh.write("\tlineage")
        fh.write("\n")
        for name, t, read_len, sc in rows:
            if t != 0:
                fh.write(
                    f"1\t{name}\t{tax.to_original(t)}\t{read_len}\t"
                    f"{format_float(sc)}\t{tax.rank_of(t)}"
                )
                if classifier.reporter.print_lineage:
                    fh.write(f"\t{tax.lineage(t)}")
            else:
                fh.write(f"0\t{name}\t0\t{read_len}\t{format_float(sc)}\t-")
                if classifier.reporter.print_lineage:
                    fh.write("\t-")
            fh.write("\n")

    # raw mapping results (binary MappingRes stream, `Reporter.h:78-91`)
    arr = np.zeros(len(mappings), dtype=[("q", "<u4"), ("sp", "<i4"), ("score", "<f4")])
    for i, (q, sp, sc) in enumerate(mappings):
        arr[i] = (q, tax.to_original(sp), sc)
    arr.tofile(os.path.join(out_dir, f"{job_id}_mapping_results.txt"))
