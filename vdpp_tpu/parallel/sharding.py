"""Parameter-sharding (FSDP/ZeRO-3 equivalent) via PartitionSpecs.

The reference breaks the memory wall by wrapping the UNet in torch FSDP
FULL_SHARD with a 1M-parameter auto-wrap policy and fp16 mixed precision
(reference: src/modes/benchmark.py:111-135); every rank then executes every
step with layer-by-layer parameter all-gathers. On TPU this is not a
wrapper class but a sharding annotation: each large parameter leaf is
split along its largest divisible axis over a mesh axis, and XLA/GSPMD
inserts the all-gathers (and overlaps them with compute) automatically.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated (the analogue of the
# reference's size_based_auto_wrap_policy min_num_params=1M threshold,
# reference: src/modes/benchmark.py:121-126).
DEFAULT_MIN_SHARD_PARAMS = 2**20


def leaf_spec(shape: tuple[int, ...], axis_size: int, axis_name: str,
              min_params: int = DEFAULT_MIN_SHARD_PARAMS) -> P:
    """Spec that shards the largest axis divisible by ``axis_size``.

    Falls back to replication for small or non-divisible leaves.
    """
    if int(np.prod(shape)) < min_params:
        return P()
    # Prefer the largest dimension; ties break toward trailing dims
    # (channels-last: the output-channel dim usually both largest and
    # contraction-friendly).
    order = sorted(range(len(shape)), key=lambda i: (shape[i], i), reverse=True)
    for dim in order:
        if shape[dim] % axis_size == 0 and shape[dim] >= axis_size:
            spec = [None] * len(shape)
            spec[dim] = axis_name
            return P(*spec)
    return P()


def fsdp_specs(params: Any, mesh: Mesh, axis_name: str,
               min_params: int = DEFAULT_MIN_SHARD_PARAMS) -> Any:
    """PartitionSpec pytree mirroring ``params``."""
    axis_size = mesh.shape[axis_name]

    def f(leaf):
        return leaf_spec(np.shape(leaf), axis_size, axis_name, min_params)

    return jax.tree_util.tree_map(f, params)


def shard_params(params: Any, mesh: Mesh, specs: Any | None = None,
                 axis_name: str | None = None) -> Any:
    """Place ``params`` on ``mesh`` according to ``specs`` (or computed
    FSDP specs for ``axis_name``)."""
    if specs is None:
        if axis_name is None:
            raise ValueError("provide specs or axis_name")
        specs = fsdp_specs(params, mesh, axis_name)
    # tree_map is driven by the params treedef; each spec leaf is consumed
    # wholesale at the matching position.
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, sh), tree)


def sharded_size_bytes(params: Any, specs: Any, mesh: Mesh) -> int:
    """Max per-device parameter bytes under the given specs (for the
    peak-memory accounting the reference gathers via
    torch.cuda.max_memory_allocated + all_gather,
    reference: src/modes/benchmark.py:239-249)."""
    total = [0]

    def acc(leaf, spec):
        n = leaf.size * leaf.dtype.itemsize
        denom = 1
        for axis in spec:
            if axis is not None:
                denom *= mesh.shape[axis]
        total[0] += n // denom
        return leaf

    jax.tree_util.tree_map(acc, params, specs)
    return total[0]
