"""Per-device parameter-memory table for the memory-wall modes.

The reference proves FSDP's value with a per-GPU memory table
(reference: EXPERIMENT_RESULTS_JP.md:606-616: 7.09 -> 4.48 GB at 7 GPUs).
This produces the equivalent static accounting for the TPU build's two
composable levers — FSDP-style parameter sharding (parallel/sharding.py)
and int8 weight-only quantization (ops/quant.py) — from pure shape
arithmetic (jax.eval_shape; nothing is allocated, so the full svd-xt
model is analyzed instantly on any host).

Usage: python scripts/memory_table.py [--devices 8] [--model svd_xt]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--model", default="svd_xt", choices=["svd_xt", "dit_xl", "t5_xxl"])
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from vdpp_tpu.ops.quant import quantize_tree
    from vdpp_tpu.parallel.sharding import fsdp_specs, sharded_size_bytes

    if args.model == "svd_xt":
        from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig

        model = SVDUNet(SVDUNetConfig.svd_xt())
        init = model.init
    elif args.model == "dit_xl":
        from vdpp_tpu.models.dit import DiTVideo, DiTVideoConfig

        model = DiTVideo(DiTVideoConfig.latte_xl())
        init = model.init
    else:
        from vdpp_tpu.models.t5_encoder import T5EncoderConfig, T5TextEncoder

        model = T5TextEncoder(T5EncoderConfig.xxl())
        init = model.init

    shapes = jax.eval_shape(init, jax.random.key(0))
    q_shapes = jax.eval_shape(lambda p: quantize_tree(p), shapes)

    # A 1-axis abstract mesh stand-in: sharded_size_bytes only needs the
    # axis size, via mesh.shape lookups.
    class _Mesh:
        shape = {"data": args.devices}

    def total_bytes(tree):
        return sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(tree)
        )

    rows = []
    for label, tree in (("bf16", shapes), ("int8", q_shapes)):
        full = total_bytes(tree)
        specs = fsdp_specs(tree, _Mesh(), "data")
        shard = sharded_size_bytes(tree, specs, _Mesh())
        rows.append((label, full, shard))

    print(f"model={args.model}, devices={args.devices}")
    print(f"{'weights':8s} {'replicated/dev':>15s} {'fsdp/dev':>12s}")
    for label, full, shard in rows:
        print(f"{label:8s} {full/2**30:>12.2f} GB {shard/2**30:>9.2f} GB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
