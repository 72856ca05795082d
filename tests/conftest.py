"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per SURVEY.md §4 we stand in
a pod with XLA's host-platform device virtualization.

NOTE: this environment pre-imports jax from a sitecustomize hook that
registers the axon TPU backend, so JAX_PLATFORMS env tricks are too late —
the platform must be forced through jax.config *after* import (backends
initialize lazily, so this still wins as long as no array op ran yet).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# single-core box: persistent compile cache makes repeat test runs cheap
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8
