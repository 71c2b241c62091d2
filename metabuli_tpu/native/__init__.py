"""Native (C++) host components, built on demand with g++.

The shared library is compiled once into this directory; set
METABULI_TPU_NO_NATIVE=1 to force the pure-Python fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRCS = [
    os.path.join(os.path.dirname(__file__), "taxonomer.cpp"),
    os.path.join(os.path.dirname(__file__), "masker.cpp"),
    os.path.join(os.path.dirname(__file__), "genepred.cpp"),
    os.path.join(os.path.dirname(__file__), "prodigal.cpp"),
    os.path.join(os.path.dirname(__file__), "fastx.cpp"),
    os.path.join(os.path.dirname(__file__), "sortkeys.cpp"),
]
_SO = os.path.join(os.path.dirname(__file__), "libmetabuli_native.so")


def _build() -> str | None:
    # METABULI_TPU_SANITIZE=address[,undefined] builds an ASan/UBSan
    # variant (separate .so; the test suite's sanitizer pass uses it —
    # run python under LD_PRELOAD=$(g++ -print-file-name=libasan.so))
    sanitize = os.environ.get("METABULI_TPU_SANITIZE", "")
    so = _SO + (".asan.so" if sanitize else "")
    newest = max(os.path.getmtime(src) for src in _SRCS)
    if os.path.exists(so) and os.path.getmtime(so) >= newest:
        return so
    # -ffp-contract=off: the Prodigal port's double arithmetic must not be
    # FMA-contracted — bit-exactness vs the (-O2, no -march) compiled
    # reference oracle depends on plain IEEE mul+add sequences
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off", "-fopenmp",
        "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", so + ".tmp", "-lz",
    ]
    if sanitize:
        cmd[1:1] = [f"-fsanitize={sanitize}", "-fno-omit-frame-pointer",
                    "-g"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(so + ".tmp", so)
        return so
    except (subprocess.CalledProcessError, OSError, subprocess.TimeoutExpired) as e:
        stderr = getattr(e, "stderr", b"")
        print(f"[metabuli_tpu] native build failed, using Python fallback: "
              f"{stderr[:500] if stderr else e}")
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if os.environ.get("METABULI_TPU_NO_NATIVE"):
        return None
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.taxonomer_assign.restype = ctypes.c_int64
        lib.taxonomer_finish.restype = ctypes.c_int64
        _LIB = lib
        return _LIB
