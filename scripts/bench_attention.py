"""Flash-attention block-size tuning on real TPU.

Times the Pallas kernel at SVD's level-0 attention shape
(B=frames=14, L=72*128=9216, heads=5, D=64) across block configs, plus
the XLA fused attention at a frame-chunked batch as a reference point.

``--chained N`` uses the HONEST harness (round-3 finding: the remote
relay returns optimistically for array outputs and adds ~25 ms of
per-dispatch overhead): N data-dependent kernel calls inside one
``lax.scan`` with an in-jit scalar readback, time divided by N. Use it
for any sub-50 ms program; the default per-dispatch mode is only
meaningful on locally attached TPUs.

Usage: python scripts/bench_attention.py --chained 20 [--l 2304 --heads 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=14)
    ap.add_argument("--l", type=int, default=9216)
    ap.add_argument("--heads", type=int, default=5)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sections", default="pallas,official,splash,xla",
                    help="comma list of kernel families to run")
    ap.add_argument("--chained", type=int, default=0,
                    help="chain N calls in one scan + scalar readback "
                         "(the honest remote-relay harness); 0 = off")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vdpp_tpu.ops.flash_attention import flash_attention
    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    b, l, h, d = args.b, args.l, args.heads, args.d
    dt = jnp.bfloat16

    def fresh_qkv(seed: int):
        ks = jax.random.split(jax.random.key(seed), 3)
        return tuple(jax.random.normal(kk, (b, l, h, d), dt) for kk in ks)

    q, k, v = fresh_qkv(0)

    flops = 4 * b * h * l * l * d  # qk + pv, mult-add

    def bench(name, fn):
        iters = max(1, args.chained)
        if args.chained:
            inner = fn

            def chained_fn(q, k, v):
                def body(qc, _):
                    return inner(qc, k, v).astype(qc.dtype), None

                out, _ = jax.lax.scan(body, q, None, length=iters)
                return jnp.sum(out.astype(jnp.float32))

            run = jax.jit(chained_fn)

            def timed(qi, ki, vi):
                return float(run(qi, ki, vi))
        else:
            def timed(qi, ki, vi):
                return jax.block_until_ready(fn(qi, ki, vi))
        try:
            t0 = time.time()
            timed(q, k, v)
            compile_s = time.time() - t0
            times = []
            for r in range(args.reps):
                # Fresh inputs per rep: repeated byte-identical dispatches
                # can be deduplicated by the remote relay (~0 ms readings;
                # CLAUDE.md remote-timing caveat).
                qi, ki, vi = fresh_qkv(100 + r)
                t0 = time.time()
                timed(qi, ki, vi)
                times.append(time.time() - t0)
            best = min(times) / iters
            print(
                f"{name:24s}: {best*1e3:8.2f} ms  "
                f"({flops/best/1e12:6.1f} TFLOP/s)  compile {compile_s:.0f}s",
                flush=True,
            )
            return best
        except Exception as e:
            print(f"{name:24s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            return None

    print(f"shape: B={b} L={l} H={h} D={d}, attention core {flops/1e9:.0f} GFLOPs",
          flush=True)

    sections = set(args.sections.split(","))
    for bq, bkm, bk in ([(1536, 1536, 1536), (1024, 1536, 1536),
                        (512, 1536, 1536), (512, 1536, 512),
                        (1024, 1536, 512), (512, 512, 512),
                        (1024, 4608, 1536)]
                       if "pallas" in sections else []):
        f = jax.jit(lambda q, k, v, bq=bq, bkm=bkm, bk=bk: flash_attention(
            q, k, v, block_q=bq, block_k_major=bkm, block_k=bk))
        bench(f"pallas {bq}/{bkm}/{bk}", f)

    # Official JAX pallas flash kernel (batch, heads, seq, d) layout.
    try:
        if "official" not in sections:
            raise ImportError("skipped by --sections")
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash, BlockSizes)

        for bq, bkm, bk in [(512, 1536, 512), (512, 512, 512)]:
            bs = BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk, block_b=1)
            f = jax.jit(lambda q, k, v, bs=bs: jax_flash(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                block_sizes=bs, sm_scale=1.0 / (args.d ** 0.5)))
            bench(f"jax-official {bq}/{bkm}/{bk}", f)
    except ImportError as e:
        print("official kernel unavailable:", e)

    # Splash attention (the newer official TPU kernel family; MaxText's
    # production choice). Per-example layout is (H, L, D); vmap over B.
    # The kernel applies no sm_scale — fold it into q.
    try:
        if "splash" not in sections:
            raise ImportError("skipped by --sections")
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        mask = sm.MultiHeadMask(
            [sm.FullMask((l, l)) for _ in range(h)]
        )
        for bq, bkv, bkvc in [(512, 1536, 512), (512, 512, 512),
                              (1024, 1536, 512), (512, 1536, 1536),
                              (1024, 3072, 1024), (2048, 2048, 512)]:
            bs = sk.BlockSizes(block_q=bq, block_kv=bkv, block_kv_compute=bkvc)
            kern = sk.make_splash_mha(
                mask=mask, block_sizes=bs, head_shards=1, q_seq_shards=1
            )
            f = jax.jit(lambda q, k, v, kern=kern: jax.vmap(kern)(
                q.transpose(0, 2, 1, 3) * (1.0 / (args.d ** 0.5)),
                k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)))
            bench(f"splash {bq}/{bkv}/{bkvc}", f)
    except Exception as e:  # pragma: no cover - availability probe
        print("splash kernel unavailable:", type(e).__name__, str(e)[:120])

    # XLA fused attention reference (scores materialized per call) —
    # chunk the batch to keep the score tensor in memory.
    def xla_chunked(chunk):
        def run(q, k, v):
            outs = []
            for i in range(0, b, chunk):
                outs.append(
                    jax.nn.dot_product_attention(
                        q[i:i+chunk], k[i:i+chunk], v[i:i+chunk],
                        implementation="xla",
                    )
                )
            return jnp.concatenate(outs, 0)
        return jax.jit(run)

    if "xla" in sections:
        bench("xla chunk=2", xla_chunked(2))
        bench("xla chunk=7", xla_chunked(7))


if __name__ == "__main__":
    main()
