"""Component-level profiling of the SVD UNet forward on real TPU.

Measures one jitted UNet forward at the bench shapes under different
attention implementations and structural ablations, to locate where the
per-step time goes. Writes findings to stderr; not part of the metric
contract.

Usage:
    python scripts/profile_unet.py [--frames 14] [--h 72] [--w 128]
        [--variants full_pallas,full_xla,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--h", type=int, default=72)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fused-gn", action="store_true",
                    help="route every GroupNorm->SiLU pair through the "
                         "fused Pallas kernel (ops/norm_kernel.py) for the "
                         "e2e forward A/B")
    ap.add_argument(
        "--variants",
        default="full_pallas,full_xla,full_naive",
        help="comma list: full_pallas, full_xla, full_naive",
    )
    ap.add_argument(
        "--quant", default=None, choices=["int8", "w8a8", "w8a8lin"],
        help="quantize params first: int8 (weight-only), w8a8 (+ dynamic "
             "activation quantization at big linear/conv sites), or "
             "w8a8lin (a8 linears only; convs stay weight-only)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig

    cfg = SVDUNetConfig.svd_xt()
    if args.fused_gn:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_groupnorm=True)
    unet = SVDUNet(cfg)
    log("initializing params...")
    t0 = time.time()
    params = jax.block_until_ready(jax.jit(unet.init)(jax.random.key(0)))
    log(f"init {time.time()-t0:.0f}s; device {jax.devices()[0]}")
    if args.quant:
        from vdpp_tpu.ops.quant import quantize_tree

        t0 = time.time()
        params = jax.block_until_ready(
            jax.jit(
                lambda p: quantize_tree(
                    p,
                    act_int8=args.quant in ("w8a8", "w8a8lin"),
                    a8_convs=args.quant != "w8a8lin",
                )
            )(params)
        )
        log(f"quantized ({args.quant}) in {time.time()-t0:.0f}s")

    b, f, h, w = 1, args.frames, args.h, args.w
    x = jax.random.normal(jax.random.key(1), (b, f, h, w, cfg.in_channels), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (b, 1, cfg.cross_attention_dim), jnp.float32)
    tids = jnp.zeros((b, 3), jnp.float32)

    results = {}
    for variant in args.variants.split(","):
        # variant grammar: attn=<impl>[+notemporal] or legacy full_<impl>
        os.environ.pop("VDPP_ABLATE_TEMPORAL", None)
        os.environ.pop("VDPP_ABLATE_TEMPORAL_ATTN", None)
        # Grammar: (attn=<impl>|full_<impl>)[+notemporal][+noteattn] in
        # any suffix order.
        parts = variant.split("+")
        v = parts[0]
        for suffix in parts[1:]:
            if suffix == "notemporal":
                os.environ["VDPP_ABLATE_TEMPORAL"] = "1"
            elif suffix == "noteattn":
                os.environ["VDPP_ABLATE_TEMPORAL_ATTN"] = "1"
            else:
                raise SystemExit(f"unknown variant suffix {suffix!r}")
        if v.startswith("attn="):
            impl = v[len("attn="):]
        elif v.startswith("full_"):
            impl = v[len("full_"):]
        else:
            impl = v
        known = {"pallas", "xla", "naive", "identity", "splash"}
        if impl not in known:
            # attention.py silently falls through to the pallas kernel for
            # unknown strings — a typo would mislabel the measurement.
            raise SystemExit(f"unknown attention impl {impl!r}; one of {sorted(known)}")
        os.environ["VDPP_ATTN_IMPL"] = impl

        # Tunnel-safe timing: params passed as an argument (not 3 GB of
        # captured constants), fresh input per rep, and a scalar reduction
        # inside jit whose host readback forces true completion.
        fwd = jax.jit(
            lambda p, xx: jnp.sum(
                unet.apply(p, xx, jnp.float32(1.0), ctx, tids).astype(jnp.float32)
            )
        )

        def fresh(seed):
            return jax.random.normal(
                jax.random.key(1000 + seed), (b, f, h, w, cfg.in_channels),
                jnp.float32,
            )

        t0 = time.time()
        float(fwd(params, x))
        compile_s = time.time() - t0
        times = []
        for r in range(args.reps):
            xi = jax.block_until_ready(fresh(r))
            t0 = time.time()
            float(fwd(params, xi))
            times.append(time.time() - t0)
        best = min(times)
        results[variant] = best
        log(f"{variant:16s}: {best*1e3:8.1f} ms/fwd (compile {compile_s:.0f}s)")
        fwd.clear_cache()

    log(str(results))


if __name__ == "__main__":
    main()
