"""Persistent XLA compilation cache setup.

On remote/tunneled TPU backends, server-side compilation of the train step is
both slow (tens of seconds) and highly load-variable (the same 8-layer step
was measured compiling in 8 s and in 505 s within one hour on a busy
service).  JAX's persistent compilation cache removes the variance entirely
for repeat runs: the serialized executable is stored client-side keyed on the
HLO, and a cache hit loads in <1 s (measured 0.8 s for the train step that
cold-compiles in 34-505 s).  The reference rebuilds its graph from scratch on
every notebook run (~20 s+, SURVEY.md §6); with this cache a repeat CLI run
skips compilation entirely.

Enabled by default from the CLI, bench.py, and the driver entry — NOT the
test suite, which runs on XLA:CPU where the cache is rejected (AOT reload
unreliability — see tests/conftest.py).  Opt out with
``DEQRES_COMPILE_CACHE=0``; override the location with
``DEQRES_COMPILE_CACHE_DIR`` (default ``~/.cache/deqres/xla``).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory, or None if disabled via the environment.
    Must run before the first compilation to be effective (config updates
    after backend initialization still apply to subsequent compiles).
    """
    global _ENABLED
    if os.environ.get("DEQRES_COMPILE_CACHE", "1") in ("0", "false", "no"):
        return None
    import jax

    # Never cache on XLA:CPU: AOT executable reload can hit machine-feature
    # mismatches with a SIGILL caveat (see tests/conftest.py).  The config
    # string alone is not enough — on a CPU-only machine jax_platforms is
    # typically unset (None) and the default backend still resolves to cpu —
    # so resolve the actual backend.  This initializes the backend, which is
    # fine at the enabling sites (CLI/bench are about to use it anyway), and
    # cache-dir config updates still apply to all subsequent compiles.
    if (jax.config.jax_platforms or "").split(",")[0] == "cpu":
        return None
    if jax.default_backend() == "cpu":
        return None
    if cache_dir is None:
        cache_dir = os.environ.get(
            "DEQRES_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "deqres", "xla"),
        )
    if _ENABLED:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache anything that takes over a second to compile; the default (1 min)
    # would skip most of the executables that dominate CLI latency.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _ENABLED = True
    return cache_dir
