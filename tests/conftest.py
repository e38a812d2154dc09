"""Test configuration: force a virtual 8-device CPU platform so sharding and
mesh tests run without TPU hardware, per the build plan (SURVEY.md §7).

Note: the axon TPU plugin in this image registers itself regardless of the
``JAX_PLATFORMS`` env var, so we must also flip ``jax.config`` after import.
"""

import os

# Must be set before the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is dominated by XLA compiles of tiny
# models; caching makes re-runs several times faster
jax.config.update("jax_compilation_cache_dir", "/tmp/dae_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for tests"
