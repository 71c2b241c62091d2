"""Test configuration.

Tests run on a local virtual 8-device CPU mesh (no TPU needed). The harness
environment boots a remote-TPU PJRT plugin ("axon") from sitecustomize in
every python process; the env var JAX_PLATFORMS is ignored once that plugin
registers, but `jax.config.update("jax_platforms", ...)` before first backend
use still wins, so we force CPU here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The persistent compilation cache is tuned for the slow remote-TPU compile
# path; on CPU it can resurrect stale executables across code changes
# (buffer-count mismatches), so switch it off for tests.
jax.config.update("jax_enable_compilation_cache", False)
