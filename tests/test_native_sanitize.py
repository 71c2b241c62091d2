"""ASan/UBSan pass over the native C++ components.

The reference gates releases on an AddressSanitizer regression run
(`/root/reference/azure-pipelines.yml:32-36`); this is the counterpart for
the repo's native code. ASan's interceptors cannot coexist with jaxlib in
one process (its __cxa_throw CHECK trips inside the MLIR bindings), so the
pass is two-stage: a normal in-process classification dumps the exact
taxonomer_assign argument buffers, then a standalone sanitized executable
(native/sancheck.cpp, compiled with -fsanitize=address,undefined) replays
them and drives the masker/prodigal/genepred/fastx/sortkeys surfaces on
synthesized inputs.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

NATIVE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "metabuli_tpu", "native")


def _build_sancheck(out_path):
    srcs = [os.path.join(NATIVE_DIR, f) for f in (
        "sancheck.cpp", "taxonomer.cpp", "masker.cpp", "genepred.cpp",
        "prodigal.cpp", "fastx.cpp", "sortkeys.cpp")]
    cmd = ["g++", "-O1", "-g", "-std=c++17", "-fopenmp",
           "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
           "-fno-sanitize-recover=all", *srcs, "-o", out_path, "-lz"]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]


def _make_dump(tmp_path):
    """Tiny end-to-end world classified through the NATIVE host taxonomer
    with the dump hook armed."""
    from metabuli_tpu import cli

    root = tmp_path / "world"
    root.mkdir()
    rng = np.random.default_rng(7)
    (root / "taxonomy").mkdir()
    (root / "taxonomy" / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n"
        "4\t|\t2\t|\tspecies\t|\n8\t|\t2\t|\tspecies\t|\n")
    (root / "taxonomy" / "names.dmp").write_text("".join(
        f"{t}\t|\tName{t}\t|\t\t|\tscientific name\t|\n"
        for t in (1, 2, 4, 8)))
    (root / "taxonomy" / "merged.dmp").write_text("")
    g1 = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 9000))
    g2 = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 9000))
    (root / "a.fna").write_text(f">SAN_A.1\n{g1.decode()}\n")
    (root / "b.fna").write_text(f">SAN_B.1\n{g2.decode()}\n")
    (root / "lib.txt").write_text(f"{root}/a.fna\n{root}/b.fna\n")
    (root / "map.tsv").write_text("SAN_A.1\t4\nSAN_B.1\t8\n")
    reads = [g1[i * 250:i * 250 + 150] for i in range(30)] + \
            [g2[i * 250:i * 250 + 150] for i in range(30)]
    (root / "r.fq").write_text("".join(
        f"@r{i}\n{r.decode()}\n+\n{'I' * len(r)}\n"
        for i, r in enumerate(reads)))
    assert cli.main(["build", str(root / "db"), str(root / "lib.txt"),
                     str(root / "map.tsv"), "--taxonomy-path",
                     str(root / "taxonomy"), "--mask-mode", "1"]) == 0
    dump = tmp_path / "dump"
    os.environ["METABULI_TPU_DUMP_NATIVE"] = str(dump)
    try:
        assert cli.main(["classify", str(root / "r.fq"), str(root / "db"),
                         str(root / "out"), "san", "--seq-mode", "1",
                         "--batch-reads", "64", "--device-tax", "0"]) == 0
    finally:
        os.environ.pop("METABULI_TPU_DUMP_NATIVE", None)
    assert (dump / "manifest.txt").exists(), "dump hook did not fire"
    return dump


def test_native_suite_under_sanitizers(tmp_path):
    dump = _make_dump(tmp_path)
    exe = str(tmp_path / "sancheck")
    _build_sancheck(exe)
    env = dict(
        os.environ,
        ASAN_OPTIONS="detect_leaks=1:abort_on_error=1",
        UBSAN_OPTIONS="print_stacktrace=1:halt_on_error=1",
    )
    res = subprocess.run([exe, str(dump)], capture_output=True, text=True,
                         timeout=600, env=env)
    out = res.stdout + res.stderr
    assert res.returncode == 0, out[-4000:]
    assert "SANCHECK-OK" in out
    assert "AddressSanitizer" not in out, out[-4000:]
    assert "runtime error" not in out, out[-4000:]
    # the replay must have exercised real work
    import re

    mcls = re.search(r"(\d+) classified", out)
    assert mcls and int(mcls.group(1)) > 0, out[:500]
