"""Experiment: implicit-GEMM formulations of the spatial 3x3 conv.

Round-2 finding (docs/performance.md): ~200 ms of the 529 ms UNet forward
is the spatial conv/projection path at ~53% MFU with no anomalous
component — the next gain must come from a better mapping of the 3x3
convs onto the MXU. This script measures, on the real chip, three
formulations at every SVD-XT level shape (14f, 72x128 latent):

1. ``lax``    — ``lax.conv_general_dilated`` NHWC/HWIO (current default);
2. ``shift9`` — 9 shifted (N*H*W, C) x (C, O) GEMMs accumulated in fp32
                (the implicit-GEMM decomposition; every tap is a full MXU
                matmul with no im2col materialization);
3. ``im2col`` — materialized (N*H*W, 9C) patches -> one GEMM.

Timing discipline (CLAUDE.md remote-timing caveat): per-dispatch timings
through the tunnel are untrustworthy for small programs, so each
measurement chains ITERS data-dependent conv applications inside one
jitted ``lax.scan`` (output feeds the next input; C==O at every site),
with fresh inputs per repetition; min over reps reported.

Run: ``python scripts/exp_conv.py [--iters 50] [--reps 3]``
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
    ap.add_argument("--iters", type=int, default=50,
                    help="conv applications chained per program")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--gemm-control", action="store_true",
                    help="measure pure-GEMM ceilings at the conv shapes")
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

    def conv_lax(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return (y + b.astype(jnp.float32)).astype(x.dtype)

    def conv_shift9(x, w, b):
        n, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = b.astype(jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.slice(
                    xp, (0, dy, dx, 0), (n, dy + h, dx + wd, c))
                acc = acc + jax.lax.dot_general(
                    xs, w[dy, dx],
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        return acc.astype(x.dtype)

    def conv_im2col(x, w, b):
        n, h, wd, c = x.shape
        o = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patches = jnp.concatenate(
            [xp[:, dy:dy + h, dx:dx + wd, :]
             for dy in range(3) for dx in range(3)], axis=-1)
        y = jax.lax.dot_general(
            patches, w.reshape(9 * c, o),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + b.astype(jnp.float32)).astype(x.dtype)

    variants = {"lax": conv_lax, "shift9": conv_shift9, "im2col": conv_im2col}

    # Equivalence gate: all formulations must agree with lax on a small
    # shape before any timing is trusted.
    kx, kw = jax.random.split(jax.random.key(9))
    xs = jax.random.normal(kx, (2, 8, 8, 16), jnp.bfloat16)
    ws = (jax.random.normal(kw, (3, 3, 16, 16), jnp.float32) / 12).astype(
        jnp.bfloat16)
    bs = jnp.linspace(-1, 1, 16, dtype=jnp.bfloat16)
    ref = conv_lax(xs, ws, bs).astype(jnp.float32)
    for vname, vfn in variants.items():
        got = vfn(xs, ws, bs).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err <= 0.05, f"{vname} disagrees with lax: max|diff|={err}"
    log("equivalence gate passed (all variants agree with lax)")

    # SVD-XT level shapes at 14f, 72x128 latent (block_out_channels
    # 320/640/1280/1280; N = frames since spatial convs run per-frame).
    sites = [
        ("L0 72x128 C320", 14, 72, 128, 320),
        ("L1 36x64 C640", 14, 36, 64, 640),
        ("L2 18x32 C1280", 14, 18, 32, 1280),
        ("L3 9x16 C1280", 14, 9, 16, 1280),
    ]

    if args.gemm_control:
        # Ceiling control: a pure (M, 9C) x (9C, C) GEMM with exactly the
        # im2col FLOPs/shapes — how fast CAN the MXU go at this (M, K, N)?
        # Plus an N=K square GEMM to isolate the narrow-N penalty.
        print(f"{'control GEMM':<24} {'ms':>9} {'TFLOP/s':>9}")
        for label, n, h, wd, c in [
            ("L0 72x128 C320", 14, 72, 128, 320),
            ("L1 36x64 C640", 14, 36, 64, 640),
        ]:
            m = n * h * wd
            for gname, kk, nn in [
                (f"im2col-shape {m}x{9 * c}x{c}", 9 * c, c),
                (f"square {m}x{c}x{c} (x9 chained)", c, c),
            ]:
                iters = args.iters if kk == 9 * c else args.iters * 9

                def gchain(x, w, iters=iters):
                    def body(xc, _):
                        y = jax.lax.dot_general(
                            xc, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(xc.dtype)
                        # data-dependent closure: write y back into x
                        # (cheap (m, nn) store; keeps (m, kk) carry shape)
                        return jax.lax.dynamic_update_slice(
                            xc, y, (0, 0)), None
                    out, _ = jax.lax.scan(body, x, None, length=iters)
                    # in-jit scalar reduction: the remote relay returns
                    # optimistically for array outputs even under
                    # block_until_ready; fetching a scalar forces real
                    # execution (profile_unet.py methodology)
                    return jnp.sum(out.astype(jnp.float32))

                jg = jax.jit(gchain)

                def mkg(seed, kk=kk, nn=nn):
                    ks = jax.random.split(jax.random.key(seed), 2)
                    return (
                        jax.random.normal(ks[0], (m, kk), jnp.bfloat16),
                        jax.random.normal(ks[1], (kk, nn), jnp.bfloat16)
                        / kk ** 0.5,
                    )

                float(jg(*mkg(0)))
                times = []
                for r in range(1, args.reps + 1):
                    a = mkg(r)
                    t0 = time.perf_counter()
                    float(jg(*a))
                    times.append(time.perf_counter() - t0)
                ms = min(times) / iters * 1e3
                tf = 2 * m * kk * nn / (ms / 1e3) / 1e12
                print(f"{label + ' ' + gname:<44} {ms:>9.3f} {tf:>9.1f}",
                      flush=True)
        return

    print(f"{'site':<18} {'variant':<8} {'ms/conv':>9} {'TFLOP/s':>9}")
    for label, n, h, wd, c in sites:
        flops = 2 * n * h * wd * 9 * c * c
        for vname, vfn in variants.items():
            iters = args.iters

            def chained(x, w, b, vfn=vfn, iters=iters):
                def body(xc, _):
                    return vfn(xc, w, b), None
                out, _ = jax.lax.scan(body, x, None, length=iters)
                # scalar readback forces real execution (see gchain note)
                return jnp.sum(out.astype(jnp.float32))

            jfn = jax.jit(chained)

            def mk(seed):
                ks = jax.random.split(jax.random.key(seed), 3)
                x = jax.random.normal(ks[0], (n, h, wd, c), jnp.bfloat16)
                w = (jax.random.normal(ks[1], (3, 3, c, c), jnp.float32)
                     / (3 * c) ** 0.5).astype(jnp.bfloat16)
                b = jnp.zeros((c,), jnp.bfloat16)
                return x, w, b

            t0 = time.perf_counter()
            float(jfn(*mk(0)))
            log(f"[{label} {vname}] compile+first: "
                f"{time.perf_counter() - t0:.1f}s")
            times = []
            for r in range(1, args.reps + 1):
                a = mk(r)
                t0 = time.perf_counter()
                float(jfn(*a))
                times.append(time.perf_counter() - t0)
            ms = min(times) / iters * 1e3
            tflops = flops / (ms / 1e3) / 1e12
            print(f"{label:<18} {vname:<8} {ms:>9.3f} {tflops:>9.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
