"""Generate tests/fixtures/xt_dim_goldens.npz — torch goldens at TRUE
svd-xt dimensions.

Every other golden in the repo runs at tiny config; these four cases pin
one instance of each block class at the REAL svd-xt channel / group /
head / context / frame dimensions — the axes where architecture-detail
bugs live (320ch L0 with 32 norm groups, 5 and 20 heads at head_dim 64,
cross_attention_dim 1024, 25-frame temporal attention, 512ch VAE mid
attention). Spatial extent is a single tile of the 72x128 latent grid
(the one axis that only scales size, not math), keeping the fixture
small enough to commit — the trade the parity plan allows when full-dim
tensors are too big for the repo.

Weights and inputs are REGENERATED at test time from the same
torch.Generator seeds (storing them at these dims would cost hundreds of
MB); only the oracle OUTPUTS plus float64 input/weight fingerprints are
frozen. If a torch upgrade ever changes randn or kernel numerics, the
fingerprint check fails first with a clear message.

This is the closest in-environment approximation of the parity
instrument the reference actually runs against real checkpoints
(reference: scripts/compare_with_official.py:101-171 — step-0 diff at
full svd-xt dimensions).

Regenerate (only when a case is intentionally added/changed):
    python tests/fixtures/gen_xt_goldens.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch_svd_oracle as oracle  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "xt_dim_goldens.npz")

# Real svd-xt dims (vdpp_tpu/models/svd_unet.py SVDUNetConfig.svd_xt):
# block_out_channels (320, 640, 1280, 1280), heads (5, 10, 20, 20),
# head_dim 64, cross 1024, temb 1280, 32 norm groups, 25 frames.
B, FRAMES = 1, 25
L0_CH, TEMB, GROUPS, L0_HEADS, CROSS = 320, 1280, 32, 5, 1024
MID_CH, MID_HEADS = 1280, 20
VAE_CH = 512
TILE_H, TILE_W = 8, 12  # single tile of the 72x128 latent grid


def fingerprint(sd, *tensors) -> np.ndarray:
    vals = [t.double().sum().item() for t in tensors]
    vals.append(sum(v.double().sum().item() for v in sd.values()))
    return np.asarray(vals, np.float64)


def rescale_weights(sd, factor: float) -> None:
    """Scale the matmul/conv weights down to fan-in-stable magnitude.

    The shared sd builders draw every weight at std 0.2 — fine at tiny
    dims, but at the real widths (fan-in 2560-2880) each layer would
    multiply activation magnitude ~10x, blowing the residual stream to
    O(1000) and with it the fp32 reassociation noise floor. Real
    checkpoints keep activations O(1-30); scaling the >=2-D weights makes
    the parity tolerance meaningfully tight."""
    for k, v in sd.items():
        if k.endswith(".weight") and v.ndim >= 2:
            sd[k] = v * factor


def case_resblock(arrs):
    gen = torch.Generator().manual_seed(101)
    sd = {}
    oracle.sd_st_resblock(sd, "res", L0_CH, L0_CH, gen, TEMB)
    rescale_weights(sd, 1 / 8)
    x = torch.randn(B * FRAMES, L0_CH, TILE_H, TILE_W, generator=gen)
    temb = torch.randn(B * FRAMES, TEMB, generator=gen)
    out = oracle.st_resblock(
        sd, "res", x, temb, FRAMES, GROUPS, eps=1e-6, teps=1e-6, switch=False
    )
    arrs["resblock_xt/out"] = out.numpy()
    arrs["resblock_xt/fp"] = fingerprint(sd, x, temb)


def case_transformer(arrs):
    gen = torch.Generator().manual_seed(102)
    sd = {}
    oracle.sd_st_transformer(sd, "attn", L0_CH, CROSS, gen)
    rescale_weights(sd, 1 / 16)
    x = torch.randn(B * FRAMES, L0_CH, TILE_H, TILE_W, generator=gen)
    ctx = torch.randn(B * FRAMES, 1, CROSS, generator=gen)
    out = oracle.st_transformer(sd, "attn", x, ctx, FRAMES, L0_HEADS, GROUPS)
    arrs["transformer_xt/out"] = out.numpy()
    arrs["transformer_xt/fp"] = fingerprint(sd, x, ctx)


def case_temporal_attn(arrs):
    """Mid-block temporal transformer block alone: attention tokens are
    the 25 frames at 1280 channels / 20 heads."""
    gen = torch.Generator().manual_seed(103)
    sd = {}
    oracle.sd_temporal_tblock(sd, "tb", MID_CH, CROSS, gen)
    rescale_weights(sd, 1 / 16)
    l_tokens = 12
    h = torch.randn(B * FRAMES, l_tokens, MID_CH, generator=gen)
    time_ctx_b = torch.randn(B, 1, CROSS, generator=gen)
    time_ctx = (
        time_ctx_b[:, None]
        .expand(B, l_tokens, 1, CROSS)
        .reshape(B * l_tokens, 1, CROSS)
    )
    out = oracle.temporal_tblock(sd, "tb", h, time_ctx, MID_HEADS, FRAMES)
    arrs["temporal_attn_xt/out"] = out.numpy()
    arrs["temporal_attn_xt/fp"] = fingerprint(sd, h, time_ctx_b)


def case_vae_attn(arrs):
    gen = torch.Generator().manual_seed(104)
    sd = {}
    oracle.sd_vae_attention(sd, "mid_block.attentions.0", VAE_CH, gen)
    rescale_weights(sd, 1 / 8)
    x = torch.randn(3, VAE_CH, 12, 16, generator=gen)
    out = oracle.vae_attention(sd, "mid_block.attentions.0", x, GROUPS)
    arrs["vae_attn_xt/out"] = out.numpy()
    arrs["vae_attn_xt/fp"] = fingerprint(sd, x)


def main():
    arrs: dict = {}
    case_resblock(arrs)
    case_transformer(arrs)
    case_temporal_attn(arrs)
    case_vae_attn(arrs)
    np.savez_compressed(OUT, **arrs)
    size = os.path.getsize(OUT) / 1e6
    print(f"wrote {OUT}: {len(arrs)} arrays, {size:.2f} MB")


if __name__ == "__main__":
    main()
