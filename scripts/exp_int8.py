"""Experiment: does the v5e int8 MXU path (2x bf16 peak) show up through XLA?

The conv/GEMM slice of the UNet forward is capped at ~50-59% of the
**bf16** peak (docs/performance.md "conv formulations"), an intrinsic
narrow-N penalty. v5e's MXU doubles throughput for int8xint8->int32
(394 TOPS vs 197 TFLOP/s bf16); if XLA lowers
``lax.dot_general(int8, int8, preferred_element_type=int32)`` onto it
(the AQT-style quantized path), a W8A8 opt-in could nearly halve the
GEMM-bound part of the step. This script measures, on the real chip:

1. ``gemm``  — square (M, C) x (C, C) chained GEMM at the L0/L1 sites,
               bf16 vs int8 (requantized carry each iteration, so the
               elementwise cost class matches the bf16 chain's cast);
2. ``conv``  — ``lax.conv_general_dilated`` at the L0 3x3 site,
               bf16 vs int8 (if the backend supports int8 conv).

Timing discipline (CLAUDE.md remote-timing caveat): chain ITERS
data-dependent applications inside one jitted ``lax.scan``, fetch an
in-jit SCALAR reduction, fresh inputs per rep, min over reps.

Run: ``python scripts/exp_int8.py [--iters 200] [--reps 3] [--conv]``
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
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--conv", action="store_true",
                    help="also probe int8 lax.conv at the L0 site")
    ap.add_argument("--only", default=None,
                    help="substring filter on GEMM site labels")
    args = ap.parse_args()

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    # Cache enable must follow the backend choice: the policy is
    # per-platform (TPU-only, utils/compile_cache.py).
    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev}, platform: {dev.platform}")

    # SVD-XT level shapes at 14f, 72x128 latent: M = frames*H*W; square
    # (M, C) x (C, C) projections plus the im2col conv-as-GEMM shapes
    # (M, 9C) x (9C, C) — K widening that lifts bf16 conv to 117 TFLOP/s.
    sites = [
        ("L0 129024x320x320", 14 * 72 * 128, 320, 320),
        ("L1 32256x640x640", 14 * 36 * 64, 640, 640),
        ("L2 8064x1280x1280", 14 * 18 * 32, 1280, 1280),
        ("L0im2col 129024x2880x320", 14 * 72 * 128, 2880, 320),
        ("L1im2col 32256x5760x640", 14 * 36 * 64, 5760, 640),
    ]

    print(f"{'site':<26} {'dtype':<6} {'ms/gemm':>9} {'TFLOP/s':>9}",
          flush=True)
    for label, m, k, c in sites:
        if args.only and args.only not in label:
            continue
        flops = 2 * m * k * c
        for dname in ("bf16", "int8"):
            iters = args.iters

            if dname == "bf16":
                def chain(x, w, iters=iters):
                    def body(xc, _):
                        y = jax.lax.dot_general(
                            xc, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        # data dependence for rectangular shapes: write
                        # the (m, c) result back into the (m, k) carry
                        return jax.lax.dynamic_update_slice(
                            xc, y.astype(jnp.bfloat16), (0, 0)), None
                    out, _ = jax.lax.scan(body, x, None, length=iters)
                    return jnp.sum(out.astype(jnp.float32))

                def mk(seed, m=m, k=k, c=c):
                    ks = jax.random.split(jax.random.key(seed), 2)
                    return (
                        jax.random.normal(ks[0], (m, k), jnp.bfloat16),
                        jax.random.normal(ks[1], (k, c), jnp.bfloat16)
                        / k ** 0.5,
                    )
            else:
                def chain(x, w, iters=iters):
                    def body(xc, _):
                        y = jax.lax.dot_general(
                            xc, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        # requantize the carry (the VPU cost class a real
                        # W8A8 layer pays; mirrors the bf16 chain's cast)
                        return jax.lax.dynamic_update_slice(
                            xc, (y >> 7).astype(jnp.int8), (0, 0)), None
                    out, _ = jax.lax.scan(body, x, None, length=iters)
                    return jnp.sum(out.astype(jnp.float32))

                def mk(seed, m=m, k=k, c=c):
                    ks = jax.random.split(jax.random.key(seed), 2)
                    return (
                        jax.random.randint(ks[0], (m, k), -127, 128,
                                           jnp.int8),
                        jax.random.randint(ks[1], (k, c), -4, 5, jnp.int8),
                    )

            jfn = jax.jit(chain)
            try:
                t0 = time.perf_counter()
                float(jfn(*mk(0)))
                log(f"[{label} {dname}] compile+first: "
                    f"{time.perf_counter() - t0:.1f}s")
            except Exception as e:  # backend may reject int8 GEMM
                print(f"{label:<22} {dname:<6} UNSUPPORTED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            times = []
            for r in range(1, args.reps + 1):
                a = mk(r)
                t0 = time.perf_counter()
                float(jfn(*a))
                times.append(time.perf_counter() - t0)
            ms = min(times) / iters * 1e3
            tf = flops / (ms / 1e3) / 1e12
            print(f"{label:<26} {dname:<6} {ms:>9.3f} {tf:>9.1f}",
                  flush=True)

    if not args.conv:
        return

    # int8 3x3 conv probe at the L0 site (NHWC/HWIO).
    n, h, wd, c = 14, 72, 128, 320
    flops = 2 * n * h * wd * 9 * c * c
    print(f"{'conv site':<22} {'dtype':<6} {'ms/conv':>9} {'TFLOP/s':>9}",
          flush=True)
    for dname in ("bf16", "int8"):
        if dname == "bf16":
            def cchain(x, w, iters=args.iters):
                def body(xc, _):
                    y = jax.lax.conv_general_dilated(
                        xc, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32)
                    return y.astype(jnp.bfloat16), None
                out, _ = jax.lax.scan(body, x, None, length=iters)
                return jnp.sum(out.astype(jnp.float32))

            def mkc(seed):
                ks = jax.random.split(jax.random.key(seed), 2)
                return (
                    jax.random.normal(ks[0], (n, h, wd, c), jnp.bfloat16),
                    (jax.random.normal(ks[1], (3, 3, c, c), jnp.float32)
                     / (3 * c) ** 0.5).astype(jnp.bfloat16),
                )
        else:
            def cchain(x, w, iters=args.iters):
                def body(xc, _):
                    y = jax.lax.conv_general_dilated(
                        xc, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32)
                    return (y >> 7).astype(jnp.int8), None
                out, _ = jax.lax.scan(body, x, None, length=iters)
                return jnp.sum(out.astype(jnp.float32))

            def mkc(seed):
                ks = jax.random.split(jax.random.key(seed), 2)
                return (
                    jax.random.randint(ks[0], (n, h, wd, c), -127, 128,
                                       jnp.int8),
                    jax.random.randint(ks[1], (3, 3, c, c), -4, 5,
                                       jnp.int8),
                )

        jfn = jax.jit(cchain)
        try:
            t0 = time.perf_counter()
            float(jfn(*mkc(0)))
            log(f"[conv L0 {dname}] compile+first: "
                f"{time.perf_counter() - t0:.1f}s")
        except Exception as e:
            print(f"{'L0 72x128 C320':<22} {dname:<6} UNSUPPORTED: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        times = []
        for r in range(1, args.reps + 1):
            a = mkc(r)
            t0 = time.perf_counter()
            float(jfn(*a))
            times.append(time.perf_counter() - t0)
        ms = min(times) / args.iters * 1e3
        tf = flops / (ms / 1e3) / 1e12
        print(f"{'L0 72x128 C320':<22} {dname:<6} {ms:>9.3f} {tf:>9.1f}",
              flush=True)


if __name__ == "__main__":
    main()
