"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is not assumed for tests; sharding logic is exercised on CPU
via XLA's host-platform device-count override (SURVEY.md §4 test plan).

Note: this environment's sitecustomize registers a remote 'axon' TPU
backend and force-sets ``jax_platforms=axon,cpu`` — the config update
below (after jax import, before any backend initialization) takes
precedence and pins tests to the local CPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: repeated test runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/photon_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
