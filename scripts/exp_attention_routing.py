"""Experiment: per-site attention routing + kernel micro-benchmarks.

Round-1 finding: the UNet forward spends 62% in spatial self-attention;
the Pallas flash kernel ties the official JAX kernel at the L=9216 site,
but mid/low-res sites (L=2304, 576) were never separately tuned — their
score matrices fit VMEM, so the XLA paths may win there. This script
measures, on the real chip:

1. kernel-level flash vs XLA-sdpa vs jax.nn.dot_product_attention at each
   spatial site shape (L=9216/2304/576) and block-size variants;
2. whole-forward time under different VDPP_FLASH_MIN_L routings.

Timing discipline (CLAUDE.md remote-timing caveat): fresh inputs per
timed repetition; min over reps reported.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_call(fn, make_args, reps=3):
    """Times ``fn`` by fetching an in-jit SCALAR reduction of its output:
    ``block_until_ready`` on an array output returns optimistically
    through the remote relay (CLAUDE.md round-3 timing caveat)."""
    import jax
    import jax.numpy as jnp

    scalar = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(scalar(*make_args(0)))  # compile
    times = []
    for i in range(1, reps + 1):
        args = make_args(i)
        t0 = time.perf_counter()
        float(scalar(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def kernel_sweep(args):
    import functools

    import jax
    import jax.numpy as jnp

    from vdpp_tpu.ops.attention import _sdpa_xla
    from vdpp_tpu.ops.flash_attention import flash_attention

    # Remote-timing discipline: per-dispatch timings through the tunnel are
    # untrustworthy (optimistic block_until_ready). Chain ITERS kernel
    # calls inside ONE jitted lax.scan with a data dependence (the output
    # feeds the next query), so the whole measurement is one large program.
    ITERS = 20

    def chained(fn, q, k, v):
        def body(qc, _):
            out = fn(qc, k, v)
            return out.astype(qc.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return out

    # (site, B*F, heads) at 14f 72x128: level0 9216/5h C320, level1
    # 2304/10h C640, level2 576/20h C1280 (+ mid).
    sites = [(9216, 14, 5), (2304, 14, 10), (576, 14, 20)]
    d = 64
    for l, b, h in sites:
        flops = 4 * b * h * l * l * d

        def mk(seed, l=l, b=b, h=h):
            ks = jax.random.split(jax.random.key(seed), 3)
            return tuple(
                jax.random.normal(k, (b, l, h, d), jnp.bfloat16) for k in ks
            )

        variants = {
            "flash(default)": lambda q, k, v: flash_attention(q, k, v),
            "flash(512/512/512)": lambda q, k, v: flash_attention(
                q, k, v, block_q=512, block_k_major=512, block_k=512
            ),
        }
        if l <= 3000:
            variants["xla_sdpa"] = lambda q, k, v: _sdpa_xla(q, k, v)
            variants["jnn_dpa"] = lambda q, k, v: jax.nn.dot_product_attention(
                q, k, v, implementation="xla"
            )
        if l <= 1024:
            variants["flash(256/256/256)"] = lambda q, k, v: flash_attention(
                q, k, v, block_q=256, block_k_major=256, block_k=256
            )
        for name, fn in variants.items():
            jfn = jax.jit(functools.partial(chained, fn))
            try:
                t = bench_call(jfn, mk, args.reps) / ITERS
                log(
                    f"L={l:5d} h={h:2d} {name:20s}: {t*1e3:8.2f} ms "
                    f"({flops/t/1e12:6.1f} TFLOP/s)"
                )
            except Exception as e:
                log(f"L={l:5d} h={h:2d} {name:20s}: FAILED {type(e).__name__}: {e}")


def forward_sweep(args):
    import jax
    import jax.numpy as jnp

    from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig

    cfg = SVDUNetConfig.svd_xt()
    unet = SVDUNet(cfg)
    log("init params...")
    params = jax.block_until_ready(jax.jit(unet.init)(jax.random.key(0)))

    b, f, h, w = 1, args.frames, args.h, args.w
    ctx = jax.random.normal(jax.random.key(2), (b, 1, cfg.cross_attention_dim))
    tids = jnp.zeros((b, 3), jnp.float32)

    def mk(seed):
        return (
            jax.random.normal(
                jax.random.key(100 + seed), (b, f, h, w, cfg.in_channels)
            ),
        )

    for min_l in args.routings:
        os.environ["VDPP_FLASH_MIN_L"] = str(min_l)
        fwd = jax.jit(
            lambda p, x: unet.apply(p, x, jnp.float32(1.0), ctx, tids)
        )

        def mk_with_params(seed):
            return (params, *mk(seed))

        try:
            t = bench_call(fwd, mk_with_params, args.reps)
            log(f"forward VDPP_FLASH_MIN_L={min_l:6d}: {t*1e3:8.1f} ms")
        except Exception as e:
            log(f"forward VDPP_FLASH_MIN_L={min_l:6d}: FAILED {type(e).__name__}: {e}")
        fwd.clear_cache()
    os.environ.pop("VDPP_FLASH_MIN_L", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--h", type=int, default=72)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-kernels", action="store_true")
    ap.add_argument("--skip-forward", action="store_true")
    ap.add_argument(
        "--routings", type=int, nargs="+", default=[512, 1000, 3000]
    )
    args = ap.parse_args()
    import jax

    log(f"device: {jax.devices()[0]}")
    if not args.skip_kernels:
        kernel_sweep(args)
    if not args.skip_forward:
        forward_sweep(args)


if __name__ == "__main__":
    main()
