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

The cache is TPU-only. XLA:CPU AOT executables embed instruction-set
features of the COMPILE target, which can exceed what the loader detects
on the execution host — deserializing such an entry segfaults (observed
2026-08-18, three suite runs dying in ``get_executable_and_time``, the
last on a SAME-HOST entry written minutes earlier by another process;
the loader itself warns "could lead to execution errors such as
SIGILL"). CPU compiles are seconds anyway; the cache exists for the
2-6 minute remote-tunnel TPU compiles, where it is kept. Directories are
additionally scoped by a host fingerprint so hosts never share entries.
``VDPP_COMPILE_CACHE=1`` forces the cache on for any backend.
"""

from __future__ import annotations

import hashlib
import os

DEFAULT_BASE = os.path.join(
    os.environ.get("VDPP_CACHE_HOME", os.path.expanduser("~/.cache")),
    "vdpp_tpu_xla",
)


def _host_fingerprint() -> str:
    """Short stable id of this host's execution target (CPU flags +
    platform): the bits that decide whether a cached CPU executable can
    legally run here."""
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    # sort: flag ORDER is boot-dependent, the SET is not
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


#: Platforms whose executables are safe to persist: the remote-tunnel TPU
#: backends, where a first compile costs minutes. Everything else —
#: including an UNSET platform, whose implicit default backend is the CPU
#: — recompiles in seconds and risks the (de)serialization segfault.
_CACHEABLE_PLATFORMS = frozenset({"tpu", "axon"})


def cache_allowed(platform: str, knob: str | None) -> bool:
    """Pure policy predicate: should the disk cache be enabled for this
    resolved platform string and ``VDPP_COMPILE_CACHE`` knob value?"""
    if knob == "0":
        return False
    if knob == "1":
        return True
    return platform.split(",")[0] in _CACHEABLE_PLATFORMS


def enable_persistent_cache(path: str | None = None) -> str:
    """Enable JAX's on-disk compilation cache (idempotent). Returns the
    cache directory. Set ``VDPP_COMPILE_CACHE=0`` to disable."""
    import jax

    knob = os.environ.get("VDPP_COMPILE_CACHE")
    platform = (
        jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS") or ""
    )
    if not cache_allowed(platform, knob):
        return ""
    path = path or os.environ.get("VDPP_COMPILE_CACHE_DIR")
    if not path:
        path = os.path.join(DEFAULT_BASE, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
