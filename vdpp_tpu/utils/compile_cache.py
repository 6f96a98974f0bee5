"""Persistent XLA compilation cache.

First compiles of the big SVD programs through this environment's
remote-compile tunnel take 2-6 minutes and can transiently fail; JAX's
persistent compilation cache stores the compiled executables on disk
keyed by HLO, so every re-run (bench.py re-measurements, profiling
sweeps, repeated CLI invocations) loads in milliseconds instead.
Verified working through the tunnel: a 2 s compile replays in 27 ms from
a cold process.

The reference has no analogue (its "first-sample kernel JIT" cost of
700-900 ms recurs every process, reference: EXPERIMENT_REPORT.md:228-237).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.environ.get("VDPP_CACHE_HOME", os.path.expanduser("~/.cache")),
    "vdpp_tpu_xla",
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Enable JAX's on-disk compilation cache (idempotent). Returns the
    cache directory. Set ``VDPP_COMPILE_CACHE=0`` to disable."""
    import jax

    if os.environ.get("VDPP_COMPILE_CACHE") == "0":
        return ""
    path = path or os.environ.get("VDPP_COMPILE_CACHE_DIR") or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
