"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Mirrors the SURVEY §4 recommendation: multi-device tests run against
`--xla_force_host_platform_device_count=8` on the CPU backend, the JAX
analogue of the reference's mocked-backend unit-test style.
"""

import os

# Force (not setdefault): the ambient environment pins JAX_PLATFORMS to the
# real TPU backend; tests must run hermetically on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: repeated test runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
# Wigner-table disk cache (sim/sht.py): the spherical-indexing fixtures
# rebuild O(10 s) host tables per run without it.
os.environ.setdefault("LATICE_TPU_SHT_CACHE", "/tmp/latice_test_sht_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup by design)

# The ambient sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon already read, so env edits here come too late — the
# config update is authoritative. jax_num_cpu_devices is the JAX>=0.5 knob
# (the XLA_FLAGS spelling is kept above for older versions).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# The same too-late trap silently disabled the persistent compilation
# cache for every suite run (the env vars above never reached the
# pre-imported jax; /tmp/jax_test_cache had literally never been
# created): config updates are authoritative here too. The suite is
# compile-bound on this 1-core box, so warm runs win minutes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
