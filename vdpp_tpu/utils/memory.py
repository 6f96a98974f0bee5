"""Per-device memory statistics.

The TPU analogue of the reference's
``torch.cuda.max_memory_allocated`` + all_gather collection
(reference: src/modes/benchmark.py:239-249): single-controller JAX can
read every device's allocator stats directly — no collective needed.
"""

from __future__ import annotations

import jax


def peak_memory_gb_per_device(devices=None) -> list[float]:
    """Peak bytes in use per device, in GB; 0.0 where the backend does not
    report (e.g. CPU)."""
    devices = list(devices) if devices is not None else jax.devices()
    out = []
    for d in devices:
        stats = None
        try:
            stats = d.memory_stats()
        except Exception:  # backend without stats
            stats = None
        if stats:
            peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
            out.append(peak / 1e9)
        else:
            out.append(0.0)
    return out
