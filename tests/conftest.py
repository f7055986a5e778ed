"""Test configuration: force an 8-device virtual CPU platform so sharding and
collective paths are exercised without TPU hardware (SURVEY.md section 4).

Note: a sitecustomize on TPU hosts may pre-set ``jax_platforms`` to a TPU
backend at interpreter startup; `jax.config.update` after import (but before
backend initialization) overrides it reliably, where the JAX_PLATFORMS env
var would be ignored.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# NOTE: --xla_backend_optimization_level=0 was evaluated for the compile-
# bound tail (~2.3x faster compiles on test_integrators+test_models,
# 148 s -> 65 s) and REJECTED: unoptimized executables run the
# execution-bound end-to-end files ~3x slower (test_train.py 104 s ->
# 321 s), a net loss for the whole suite — and XLA flags are process-
# global, so the trade cannot be made per-file.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# NOTE on suite wall-time: a persistent XLA compilation cache
# (jax_compilation_cache_dir) was evaluated and rejected — XLA:CPU AOT
# deserialization logs machine-feature-mismatch errors (prefer-no-gather/
# scatter pseudo-features) with a SIGILL caveat on reload.  The suite is kept
# fast by sizing the test workloads instead.
