"""Per-device memory statistics.

The TPU analogue of the reference's
``torch.cuda.max_memory_allocated`` + all_gather collection
(reference: src/modes/benchmark.py:239-249): single-controller JAX can
read every device's allocator stats directly — no collective needed.

Two sources, in preference order:

1. allocator stats (``device.memory_stats()``) — live peak, but empty on
   the CPU backend and through the remote-TPU tunnel used here;
2. compile-time program analysis (``compiled.memory_analysis()``) — XLA's
   per-device accounting of argument/output/temp bytes for one executable,
   available everywhere a program compiles. ``peak_gb`` =
   arguments + outputs + temps − aliased (donated buffers are aliased and
   therefore not double-counted).
"""

from __future__ import annotations

from typing import Any

import jax


def peak_memory_gb_per_device(devices=None) -> list[float]:
    """Peak bytes in use per device, in GB; 0.0 where the backend does not
    report (e.g. CPU, or a remote-TPU tunnel)."""
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


def compiled_memory_analysis(compiled) -> dict[str, float] | None:
    """Per-device memory accounting of one compiled XLA executable, in GB.

    Returns None when the backend provides no analysis. Keys:
    argument/output/temp/alias/peak (peak = arg + out + temp - alias).
    """
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return None
    if ma is None:
        return None

    def get(name: str) -> float:
        try:
            return float(getattr(ma, name, 0.0) or 0.0)
        except Exception:
            return 0.0

    out = {
        "argument_gb": get("argument_size_in_bytes") / 1e9,
        "output_gb": get("output_size_in_bytes") / 1e9,
        "temp_gb": get("temp_size_in_bytes") / 1e9,
        "alias_gb": get("alias_size_in_bytes") / 1e9,
    }
    out["peak_gb"] = (
        out["argument_gb"] + out["output_gb"] + out["temp_gb"] - out["alias_gb"]
    )
    return {k: round(v, 6) for k, v in out.items()}


def jitted_memory_analysis(jitted_fn, *args, **kwargs) -> dict[str, float] | None:
    """AOT-lower and compile ``jitted_fn`` for ``args`` and report its
    program memory analysis (may trigger a compile on a fresh signature)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
    except Exception:
        return None
    return compiled_memory_analysis(compiled)


def params_bytes_per_device(tree: Any) -> dict[str, int]:
    """Actual bytes resident per device for a (possibly sharded) pytree —
    the direct proof that FSDP sharding shrinks per-device parameter
    memory (the reference's FSDP memory table,
    reference: EXPERIMENT_RESULTS_JP.md:606-616)."""
    per_device: dict[str, int] = {}
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for shard in leaf.addressable_shards:
            key = str(shard.device)
            per_device[key] = per_device.get(key, 0) + int(shard.data.nbytes)
    return per_device
