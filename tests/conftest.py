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
# NO persistent compile cache.  It made re-runs faster, but XLA:CPU loads
# serialized AOT executables compiled for a mismatched machine type with only
# a warning ("Target machine feature +prefer-no-scatter is not supported on
# the host machine ... could lead to execution errors such as SIGILL"), and
# such cache hits were observed to return silently WRONG numerics in this
# image: the same jitted CTC+CE loss returned 84.06 / 84.74 / 85.51 across
# cache-serving processes vs 84.476 from every fresh compile (and from torch).
# Correctness of the oracle suite outranks re-run speed — compile fresh.
#
# Even WITHOUT the cache, this image's XLA:CPU intermittently miscompiles
# large fused executables dispatched through the jit fast path: a single
# value_and_grad+SGD jit returned encoder bias grads off by >100% (loss
# bit-identical to the correct run), reproducibly within a process yet
# flipping with unrelated byte-level changes to the CALLING code (heap
# layout), across ISA caps (SSE4_2/AVX2), with oneDNN/XNNPACK disabled, and
# under both thunk and legacy runtimes.  Forcing the ``.lower().compile()``
# path, or eager (``jax.disable_jit``), always produced torch-matching
# values.  Tight-tolerance oracle tests therefore run their update fns under
# ``jax.disable_jit()`` (see tests/test_encdec_oracle.py).
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for tests"
