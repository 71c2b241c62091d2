"""Build and run the compiled-reference oracle harnesses.

The harnesses under ``tests/ref_oracle/`` compile the reference's OWN
vendored sources (scanners, matcher, taxonomer, index creator) against thin
stubs of the absent MMseqs2 submodule headers, producing ground-truth
binaries the repo's implementations are differential-tested against. This
is the answer to "every byte-identity claim is self-referential": the
oracles here are reference code, not transliterations.
"""

from __future__ import annotations

import os
import subprocess
import threading

ORACLE_DIR = os.path.join(os.path.dirname(__file__), "..", "ref_oracle")
REF_COMMONS = "/root/reference/src/commons"
REF_PRODIGAL = "/root/reference/lib/prodigal"

_LOCK = threading.Lock()

# harness name -> (sources in ORACLE_DIR, reference sources, extra flags)
_HARNESSES = {
    "scan_oracle": (
        ["scan_oracle.cpp", "support.cpp"],
        ["common.cpp", "TaxonomyWrapper.cpp", "LocalUtil.cpp"],
        [],
    ),
}

_FULL_STACK_REF = [
    "common.cpp", "TaxonomyWrapper.cpp", "LocalUtil.cpp", "printBinary.cpp",
    "SeqIterator.cpp", "ProdigalWrapper.cpp", "KmerExtractor.cpp",
    "QueryIndexer.cpp", "KmerMatcher.cpp", "Taxonomer.cpp", "Reporter.cpp",
    "Classifier.cpp", "IndexCreator.cpp",
]
_FULL_STACK_EXTRA = [
    "-fopenmp", "-I", REF_PRODIGAL, "-I", "/root/reference/src/uniref",
    "-I", "/root/reference/lib/yxml",
    os.path.join(REF_PRODIGAL, "bitmap.cpp"),
    os.path.join(REF_PRODIGAL, "dprog.cpp"),
    os.path.join(REF_PRODIGAL, "gene.cpp"),
    os.path.join(REF_PRODIGAL, "metagenomic.cpp"),
    os.path.join(REF_PRODIGAL, "node.cpp"),
    os.path.join(REF_PRODIGAL, "prodigalsequence.cpp"),
    "/root/reference/src/uniref/UnirefTree.cpp",
    "/root/reference/lib/yxml/yxml.c",
]

_HARNESSES.update({
    "classify_oracle": (
        ["classify_oracle.cpp", "support.cpp",
         "stubs/prodigal_training_stub.cpp"],
        _FULL_STACK_REF,
        _FULL_STACK_EXTRA,
    ),
    "build_oracle": (
        ["build_oracle.cpp", "support.cpp",
         "stubs/prodigal_training_stub.cpp"],
        _FULL_STACK_REF,
        _FULL_STACK_EXTRA,
    ),
    "prodigal_oracle": (
        ["prodigal_oracle.cpp", "support.cpp",
         "stubs/prodigal_training_stub.cpp"],
        _FULL_STACK_REF,
        _FULL_STACK_EXTRA,
    ),
    "mask_oracle": (
        ["mask_oracle.cpp", "support.cpp",
         "stubs/prodigal_training_stub.cpp"],
        _FULL_STACK_REF,
        _FULL_STACK_EXTRA,
    ),
    "extract_oracle": (
        ["extract_oracle.cpp", "support.cpp",
         "stubs/prodigal_training_stub.cpp"],
        _FULL_STACK_REF,
        _FULL_STACK_EXTRA,
    ),
    "update_oracle": (
        ["update_oracle.cpp", "support.cpp",
         "stubs/prodigal_training_stub.cpp"],
        _FULL_STACK_REF,
        _FULL_STACK_EXTRA,
    ),
    "filter_oracle": (
        ["filter_oracle.cpp", "support.cpp",
         "stubs/prodigal_training_stub.cpp"],
        _FULL_STACK_REF + ["QueryFilter.cpp"],
        _FULL_STACK_EXTRA,
    ),
    "group_oracle": (
        ["group_oracle.cpp", "support.cpp",
         "stubs/prodigal_training_stub.cpp"],
        _FULL_STACK_REF + ["../read-group/GroupGenerator.cpp"],
        _FULL_STACK_EXTRA + ["-I", "/root/reference/src/read-group"],
    ),
    "newtaxa_oracle": (
        ["newtaxa_oracle.cpp", "support.cpp",
         "stubs/prodigal_training_stub.cpp"],
        _FULL_STACK_REF + ["../util/createnewtaxalist.cpp"],
        _FULL_STACK_EXTRA + ["-I", "/root/reference/src/util"],
    ),
})


def build(name: str) -> str:
    """Compile (once, cached by mtime) and return the harness binary path."""
    srcs_local, srcs_ref, extra = _HARNESSES[name]
    out = os.path.join(ORACLE_DIR, name)
    srcs = [os.path.join(ORACLE_DIR, s) for s in srcs_local] + [
        os.path.join(REF_COMMONS, s) for s in srcs_ref
    ]
    stub_dir = os.path.join(ORACLE_DIR, "stubs")
    deps = srcs + [
        os.path.join(stub_dir, f) for f in os.listdir(stub_dir)
    ]
    with _LOCK:
        if os.path.exists(out) and os.path.getmtime(out) >= max(
            os.path.getmtime(d) for d in deps
        ):
            return out
        cmd = (
            ["g++", "-O2", "-g", "-std=c++17",
             "-include", os.path.join(stub_dir, "oracle_prelude.h"),
             "-I", stub_dir, "-I", REF_COMMONS]
            + extra
            + srcs
            + ["-o", out + ".tmp", "-lz"]
        )
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
        os.replace(out + ".tmp", out)
    return out


def run(name: str, args: list[str], stdin: str, timeout: int = 300) -> str:
    binary = build(name)
    # OMP_NUM_THREADS must match the harnesses' par.threads=1: the
    # reference sizes per-thread arrays (e.g. KmerExtractor::kmerScanners)
    # from par.threads but lets OpenMP pick the team size — an unpinned run
    # indexes kmerScanners[omp_get_thread_num()] past the allocation
    # (KmerExtractor.cpp:367, confirmed with ASan). This was the source of
    # the intermittent rc=-11 oracle segfaults.
    env = dict(os.environ, OMP_NUM_THREADS="1")
    res = subprocess.run(
        [binary] + args, input=stdin, capture_output=True, text=True,
        timeout=timeout, env=env,
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"{name} failed rc={res.returncode}: {res.stderr[:2000]}"
        )
    return res.stdout
