"""Experiment: fused GroupNorm(+SiLU) Pallas kernel vs the XLA path.

The last unpulled lever from docs/performance.md "Levers not yet pulled":
XLA lowers ``silu(group_norm(x))`` as three HBM passes (two reduction
roots + the normalize/affine/SiLU consumer); the Pallas kernel
(ops/norm_kernel.py) keeps a batch row in VMEM and does one read + one
write. Measured norm-stats cost in the round-3 ablation was only ~7 ms of
the 514-519 ms forward, so the expected ceiling is small — this script
exists to close the lever with a number either way.

Shapes: the SVD-XT GroupNorm sites at the 14f/72x128 flagship config,
channels-last (B*F, H*W, C):
    L0 (14, 9216, 320), L1 (14, 2304, 640), L2/L3 (14, 576, 1280).

Timing discipline (CLAUDE.md remote-timing caveat): chain ITERS
applications inside one jitted ``lax.scan`` (each output feeds the next
input, so the relay cannot dedupe or return optimistically), return an
in-jit scalar reduction, fresh inputs per rep, min over reps.

Run: ``python scripts/exp_groupnorm.py [--iters 100] [--reps 3]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


SHAPES = [
    ("L0", (14, 9216, 320)),
    ("L1", (14, 2304, 640)),
    ("L2", (14, 576, 1280)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100,
                    help="GN+SiLU applications chained per program")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--no-silu", action="store_true",
                    help="measure bare GroupNorm instead of GN+SiLU")
    args = ap.parse_args()
    if args.reps < 2:
        ap.error("--reps must be >= 2 (rep 0 is consumed as compile+first)")

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    # Enable the cache only AFTER the backend choice is final: the cache
    # policy is per-platform (TPU-only — utils/compile_cache.py), and an
    # import-time enable would evaluate it against the sitecustomize's
    # pinned platform rather than --backend.
    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from vdpp_tpu.ops.norm_kernel import group_norm_silu_fused
    from vdpp_tpu.ops.normalization import group_norm, init_group_norm

    dev = jax.devices()[0]
    log(f"device: {dev}, platform: {dev.platform}")
    silu = not args.no_silu

    def xla_fn(x, p):
        h = group_norm(x, p, 32, 1e-6)
        if silu:
            h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
        return h

    def pallas_fn(x, p):
        return group_norm_silu_fused(x, p, 32, 1e-6, silu=silu)

    results = {}
    for name, shape in SHAPES:
        b, s, c = shape
        p = init_group_norm(c)
        p = {"scale": p["scale"] + 0.05, "bias": p["bias"]}

        for variant, fn in (("xla", xla_fn), ("pallas", pallas_fn)):
            # Chained scan: out feeds the next input; divide by ITERS.
            # The affine keeps values bounded (GN output is ~N(0, 1.05)),
            # so the chain cannot blow up.
            def chained(x, p, fn=fn):
                def body(h, _):
                    return fn(h, p), None

                out, _ = jax.lax.scan(body, x, None, length=args.iters)
                return jnp.sum(out.astype(jnp.float32))

            jitted = jax.jit(chained)
            best = None
            for rep in range(args.reps):
                x = (
                    jax.random.normal(jax.random.key(rep), shape, jnp.float32)
                    * 2.0
                ).astype(jnp.bfloat16)
                t0 = time.perf_counter()
                val = float(jitted(x, p))  # scalar fetch: honest timing
                dt = time.perf_counter() - t0
                if rep == 0:
                    log(f"[{name}/{variant}] compile+first: {dt:.2f}s "
                        f"(sum={val:.1f})")
                    continue
                per_iter_ms = dt / args.iters * 1e3
                best = per_iter_ms if best is None else min(best, per_iter_ms)
                log(f"[{name}/{variant}] rep{rep}: {per_iter_ms:.3f} ms/apply")
            results[(name, variant)] = best

    log("")
    log(f"{'shape':6} {'xla ms':>9} {'pallas ms':>10} {'speedup':>8}")
    for name, shape in SHAPES:
        a = results[(name, "xla")]
        b_ = results[(name, "pallas")]
        log(f"{name:6} {a:9.3f} {b_:10.3f} {a / b_:8.2f}x")


if __name__ == "__main__":
    main()
