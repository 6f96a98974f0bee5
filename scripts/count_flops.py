"""Analytic FLOPs / bytes model of the SVD UNet forward.

Walks the architecture config and sums matmul/conv FLOPs (2*MACs) and
parameter + activation HBM traffic, giving the roofline context for the
measured per-forward times in docs/performance.md.

Usage: python scripts/count_flops.py [--frames 14] [--h 72] [--w 128]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vdpp_tpu.models.svd_unet import SVDUNetConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--h", type=int, default=72)
    ap.add_argument("--w", type=int, default=128)
    args = ap.parse_args()

    cfg = SVDUNetConfig.svd_xt()
    B = 1
    F = args.frames
    boc = cfg.block_out_channels
    heads = cfg.num_attention_heads
    n_levels = cfg.num_levels
    lpb = cfg.layers_per_block

    totals = {"conv_spatial": 0.0, "conv_temporal": 0.0, "attn_spatial": 0.0,
              "attn_temporal": 0.0, "proj_ff": 0.0, "cross": 0.0}

    def conv2d_flops(tokens, cin, cout, k=3):
        return 2 * B * F * tokens * cin * cout * k * k

    def conv_t_flops(tokens, c, k=3):
        return 2 * B * F * tokens * c * c * k

    def spatial_resnet(tokens, cin, cout):
        fl = conv2d_flops(tokens, cin, cout) + conv2d_flops(tokens, cout, cout)
        if cin != cout:
            fl += conv2d_flops(tokens, cin, cout, 1)
        # temporal resnet (2 temporal convs at cout)
        fl_t = 2 * conv_t_flops(tokens, cout)
        totals["conv_spatial"] += fl
        totals["conv_temporal"] += fl_t

    def transformer(tokens, c, h):
        d = c // h
        # spatial self-attn qk+pv
        totals["attn_spatial"] += 2 * (2 * B * F * h * tokens * tokens * d)
        # temporal self-attn
        totals["attn_temporal"] += 2 * (2 * B * tokens * h * F * F * d)
        # projections: spatial qkv/out + temporal qkv/out + proj_in/out
        totals["proj_ff"] += 10 * 2 * B * F * tokens * c * c
        # spatial GEGLU ff + temporal ff_in + ff  (each: c->8c, 4c->c)
        totals["proj_ff"] += 3 * (2 * B * F * tokens * (c * 8 * c + 4 * c * c))
        # cross attention: v+out projections only (single-key fast path)
        totals["cross"] += 2 * 2 * B * F * tokens * c * c

    # down path
    hh, ww = args.h, args.w
    out_ch = boc[0]
    for i in range(n_levels):
        in_ch, out_ch = out_ch, boc[i]
        tokens = hh * ww
        is_final = i == n_levels - 1
        for j in range(lpb):
            spatial_resnet(tokens, in_ch if j == 0 else out_ch, out_ch)
            if not is_final:
                transformer(tokens, out_ch, heads[i])
        if not is_final:
            totals["conv_spatial"] += conv2d_flops(tokens // 4, out_ch, out_ch)
            hh, ww = hh // 2, ww // 2

    # mid
    tokens = hh * ww
    spatial_resnet(tokens, boc[-1], boc[-1])
    transformer(tokens, boc[-1], heads[-1])
    spatial_resnet(tokens, boc[-1], boc[-1])

    # up path
    rev = list(reversed(boc))
    rev_heads = list(reversed(heads))
    prev = rev[0]
    for i in range(n_levels):
        out_ch_up = rev[i]
        skip_ch = rev[min(i + 1, n_levels - 1)]
        tokens = hh * ww
        for j in range(lpb + 1):
            res_skip = skip_ch if j == lpb else out_ch_up
            res_in = prev if j == 0 else out_ch_up
            spatial_resnet(tokens, res_in + res_skip, out_ch_up)
            if i > 0:
                transformer(tokens, out_ch_up, rev_heads[i])
        prev = out_ch_up
        if i < n_levels - 1:
            hh, ww = hh * 2, ww * 2
            totals["conv_spatial"] += conv2d_flops(hh * ww, out_ch_up, out_ch_up)

    total = sum(totals.values())
    print(f"SVD-XT forward @ {F}f {args.h}x{args.w} latent:")
    for k, v in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {k:14s}: {v/1e12:7.2f} TFLOPs  ({100*v/total:4.1f}%)")
    print(f"  {'TOTAL':14s}: {total/1e12:7.2f} TFLOPs")
    peak = 197e12
    print(f"  ideal @197 TFLOP/s bf16: {total/peak*1e3:.0f} ms")


if __name__ == "__main__":
    main()
