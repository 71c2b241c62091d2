"""metabuli_tpu — a TPU-native metagenomic taxonomic classification framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Metabuli
(steineggerlab/Metabuli): classification of DNA sequencing reads against
reference-genome databases via 64-bit *metamers* (joint amino-acid + codon
k-mers), with database construction, taxonomy handling, abundance estimation
and reporting.

Architecture (TPU-first, not a port):
  - All per-base / per-k-mer compute (6-frame metamer extraction, syncmer
    selection, sorted-table lookup, Hamming scoring, match chaining) runs as
    vectorized XLA programs over fixed shapes on device.
  - The reference's sequential delta-decode merge-join
    (`/root/reference/src/commons/KmerMatcher.cpp:123-481`) is replaced by
    binary search + capped gather over a device-resident sorted metamer table.
  - Multi-chip scaling shards the metamer table by amino-acid range over a
    `jax.sharding.Mesh` axis, and read batches over a data axis.
  - Host side (C++/Python) does IO, taxonomy, reporting and orchestration.

64-bit integer note: metamer values are 40-bit amino-acid part << 24 | 24-bit
codon part (`/root/reference/src/commons/Kmer.h:52-75`), so the package
requires jax_enable_x64, which is switched on at import.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Optional platform override (e.g. METABULI_TPU_PLATFORM=cpu to force the
# CLI onto host devices). Needed because a sitecustomize-registered PJRT
# plugin may overwrite jax_platforms AFTER the JAX_PLATFORMS env var is
# read; a config update before first backend use still wins.
_plat = _os.environ.get("METABULI_TPU_PLATFORM")
if _plat:
    _jax.config.update("jax_platforms", _plat)

# Persistent compilation cache: compiles of the fused classify program are
# expensive (especially via remote-compile TPU tunnels); cache them on disk.
# The directory is keyed by the backend fingerprint (platform env + XLA
# flags) so differently-tuned backends never round-trip through each
# other's entries (XLA warns about tuning-flag mismatches otherwise).
import hashlib as _hashlib

_flags = _os.environ.get("XLA_FLAGS", "")
_fp = "" if not _flags else (
    "_" + _hashlib.sha1(_flags.encode()).hexdigest()[:10]
)
_cache_dir = _os.environ.get(
    "METABULI_TPU_CACHE",
    _os.path.expanduser("~/.cache/metabuli_tpu_xla_")
    + (_plat or _os.environ.get("JAX_PLATFORMS", "default")).replace(",", "_")
    + _fp,
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

__version__ = "0.1.0"
