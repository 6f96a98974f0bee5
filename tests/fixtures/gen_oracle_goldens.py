"""Generate tests/fixtures/oracle_goldens.npz.

Freezes NUMERIC oracle outputs (not just naming): the torch-oracle block
tests regenerate both sides at test time, so a refactor that changed the
oracle AND the JAX blocks in the same wrong way would pass unnoticed.
This fixture stores the exact state dicts, inputs, and oracle outputs at
fixed seeds; tests/test_oracle_goldens.py then checks BOTH the torch
oracle and the JAX converter+blocks against the stored arrays.

Regenerate (only when a case is intentionally added/changed):
    python tests/fixtures/gen_oracle_goldens.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch_svd_oracle as oracle  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "oracle_goldens.npz")

B, F_, H, W = 2, 3, 6, 6


def main():
    arrs: dict = {}

    # case 1: UNet spatio-temporal resblock (unswitched blend)
    in_ch, out_ch, temb_dim, groups = 16, 32, 24, 8
    gen = torch.Generator().manual_seed(1)
    sd = {}
    oracle.sd_st_resblock(sd, "res", in_ch, out_ch, gen, temb_dim)
    x = torch.randn(B * F_, in_ch, H, W, generator=gen)
    temb = torch.randn(B * F_, temb_dim, generator=gen)
    want = oracle.st_resblock(
        sd, "res", x, temb, F_, groups, eps=1e-6, teps=1e-6, switch=False
    )
    for k, v in sd.items():
        arrs[f"resblock/sd/{k}"] = v.numpy()
    arrs["resblock/x"] = x.numpy()
    arrs["resblock/temb"] = temb.numpy()
    arrs["resblock/out"] = want.numpy()

    # case 2: UNet spatio-temporal transformer block
    c, cross, heads, groups2 = 32, 24, 2, 8
    gen = torch.Generator().manual_seed(2)
    sd = {}
    oracle.sd_st_transformer(sd, "attn", c, cross, gen)
    x = torch.randn(B * F_, c, H, W, generator=gen)
    ctx = torch.randn(B * F_, 1, cross, generator=gen)
    want = oracle.st_transformer(sd, "attn", x, ctx, F_, heads, groups2)
    for k, v in sd.items():
        arrs[f"transformer/sd/{k}"] = v.numpy()
    arrs["transformer/x"] = x.numpy()
    arrs["transformer/ctx"] = ctx.numpy()
    arrs["transformer/out"] = want.numpy()

    # case 3: full tiny UNet forward through the real converter path
    ocfg = oracle.OracleUNetConfig.tiny()
    sd = oracle.make_unet_state_dict(ocfg, seed=5)
    gen = torch.Generator().manual_seed(6)
    sample = torch.randn(B, F_, 8, H, W, generator=gen)
    timestep = torch.tensor(1.37)
    ctx = torch.randn(B, 1, ocfg.cross_attention_dim, generator=gen)
    tids = torch.tensor([[5.0, 127.0, 0.02]]).repeat(B, 1)
    want = oracle.unet_forward(sd, ocfg, sample, timestep, ctx, tids)
    for k, v in sd.items():
        arrs[f"unet/sd/{k}"] = v.numpy()
    arrs["unet/sample"] = sample.numpy()
    arrs["unet/timestep"] = timestep.numpy()
    arrs["unet/ctx"] = ctx.numpy()
    arrs["unet/tids"] = tids.numpy()
    arrs["unet/out"] = want.numpy()

    np.savez_compressed(OUT, **arrs)
    size = os.path.getsize(OUT) / 1e6
    print(f"wrote {OUT}: {len(arrs)} arrays, {size:.2f} MB")


if __name__ == "__main__":
    main()
