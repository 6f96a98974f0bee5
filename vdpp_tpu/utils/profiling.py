"""Tracing / profiling helpers.

The reference hand-rolls wall-clock timing with cuda.synchronize fences
(reference: src/modes/benchmark.py:192-197, pipeline.py:93-97) and had no
profiler framework. TPU-natively we get both:

* ``phase_timer`` — dispatch-fence-aware wall timing (block_until_ready
  at the boundary, the async-dispatch analogue of cuda.synchronize);
* ``device_trace`` — a jax.profiler trace context producing xprof/
  TensorBoard traces of the actual device timeline.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

LOGGER = logging.getLogger(__name__)


def force_sync(x):
    """Fence that remote relays cannot fake: fetch ONE element per leaf.

    ``block_until_ready`` on an array output can return optimistically
    through remote-device relays (CLAUDE.md round-3 timing caveat); a
    1-element device-to-host transfer cannot complete before the
    producing computation has, and costs ~ms even over a slow tunnel.
    Every leaf is fenced — distinct leaves may come from distinct
    dispatches. Returns ``x`` so it can wrap a timed expression's tail.
    """
    for arr in jax.tree_util.tree_leaves(x):
        jax.device_get(jax.numpy.ravel(arr)[:1])
    return x


@contextlib.contextmanager
def phase_timer(name: str, *fence_on):
    """Time a phase; fences async dispatch on the given arrays at exit
    (1-element readback per array — see force_sync)."""
    t0 = time.perf_counter()
    result: dict = {}
    try:
        yield result
    finally:
        for arr in fence_on:
            jax.block_until_ready(arr)
            force_sync(arr)
        result["seconds"] = time.perf_counter() - t0
        LOGGER.info("[phase %s] %.3f s", name, result["seconds"])


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/vdpp_trace"):
    """Capture a device profile (open with xprof / tensorboard).

    Falls back to a no-op if the backend does not support profiling
    (e.g. remote-tunneled devices).
    """
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # backend without profiling
        LOGGER.warning("profiler unavailable (%s); continuing without trace", e)
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                LOGGER.info("trace written to %s", log_dir)
            except Exception as e:
                LOGGER.warning("stop_trace failed: %s", e)
