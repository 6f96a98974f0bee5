"""Generate tests/fixtures/xt_unet_golden.npz — ONE full-UNet forward at
TRUE svd-xt dimensions (round-5 parity capstone).

The round-4 xt-dim goldens (gen_xt_goldens.py) pin one instance of each
BLOCK class at the real channel/group/head/context/frame dimensions;
this fixture composes them: a single seeded forward through the COMPLETE
svd-xt UNet topology — all four levels at (320, 640, 1280, 1280)
channels, heads (5, 10, 20, 20), layers_per_block 2, cross 1024,
25 frames — on a 24x24 spatial tile of the 72x128 latent grid (spatial
extent is the one axis that only scales size, not math). This is the
last in-environment step toward the parity instrument the reference
runs against the real checkpoint (reference:
scripts/compare_with_official.py:101-171 — the step-0 full-UNet diff);
only the checkpoint itself is unavailable here (no network), so the
weights are a seeded diffusers-named random state dict.

Same freeze policy as gen_xt_goldens.py: weights/inputs are REGENERATED
at test time from the torch.Generator seed (the state dict is ~6 GB —
orders of magnitude beyond what a fixture can commit); only the oracle
OUTPUT (1, 25, 4, 24, 24 — ~230 KB) and float64 fingerprints are frozen.
A torch randn/kernels change fails the fingerprint check first, with a
clear message.

The consuming test is OPT-IN (pytest -m xtgolden): generation + the two
forwards take minutes on this 1-CPU host.

Regenerate (only when intentionally changed):
    python tests/fixtures/gen_xt_unet_golden.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch_svd_oracle as oracle  # noqa: E402

try:  # imported as a package module by the test vs run as a script
    from tests.fixtures.gen_xt_goldens import fingerprint, rescale_weights
except ImportError:  # pragma: no cover - script path
    from gen_xt_goldens import fingerprint, rescale_weights  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "xt_unet_golden.npz")

B, FRAMES = 1, 25
TILE = 24  # 24x24 tile of the 72x128 latent; divisible by 2^(levels-1)=8
SEED_SD, SEED_IN = 7, 8
# GroupNorm re-normalizes every block entry, so any consistent weight
# scale is numerically fine; 1/16 keeps the fan-in-2880 matmul outputs
# O(1) (same reasoning as gen_xt_goldens.rescale_weights).
W_SCALE = 1 / 16


def build():
    """(sd, sample, timestep, ctx, tids) — deterministic from the seeds;
    shared by the generator and the test's regeneration step."""
    ocfg = oracle.OracleUNetConfig()  # defaults ARE the svd-xt dims
    sd = oracle.make_unet_state_dict(ocfg, seed=SEED_SD)
    rescale_weights(sd, W_SCALE)
    gen = torch.Generator().manual_seed(SEED_IN)
    sample = torch.randn(B, FRAMES, ocfg.in_channels, TILE, TILE,
                         generator=gen)
    timestep = torch.tensor(1.37)
    ctx = torch.randn(B, 1, ocfg.cross_attention_dim, generator=gen)
    tids = torch.tensor([[5.0, 127.0, 0.02]]).repeat(B, 1)
    return ocfg, sd, sample, timestep, ctx, tids


def main():
    ocfg, sd, sample, timestep, ctx, tids = build()
    with torch.no_grad():
        out = oracle.unet_forward(sd, ocfg, sample, timestep, ctx, tids)
    arrs = {
        "unet_xt/out": out.numpy(),
        "unet_xt/fp": fingerprint(sd, sample, ctx, tids),
    }
    np.savez_compressed(OUT, **arrs)
    size = os.path.getsize(OUT) / 1e6
    print(f"wrote {OUT}: out shape {tuple(out.shape)}, |out| mean "
          f"{out.abs().mean():.4f} max {out.abs().max():.4f}, {size:.2f} MB")


if __name__ == "__main__":
    main()
