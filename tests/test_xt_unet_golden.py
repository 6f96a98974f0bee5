"""FULL-UNet single-step golden at TRUE svd-xt dimensions (round 5).

Composes the round-4 per-block xt-dim goldens into the real thing: one
seeded forward through the COMPLETE svd-xt UNet topology — 4 levels at
(320, 640, 1280, 1280) channels, heads (5, 10, 20, 20), 2 layers/block,
cross 1024, 25 frames — on a 24x24 tile, through the torch oracle vs the
JAX UNet + the real checkpoint converter. The last in-environment step
toward the reference's parity instrument (reference:
scripts/compare_with_official.py:101-171, step-0 full-UNet diff); only
the actual checkpoint download is impossible here.

OPT-IN: ``pytest -m xtgolden`` (excluded by the default addopts) — the
~6 GB seeded state dict plus two full forwards take minutes on a 1-CPU
host. Same three-part contract as tests/test_xt_dim_goldens.py:
fingerprint match, bit-exact oracle reproduction, converter+model
parity at an fp32-reassociation tolerance.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_svd_oracle as oracle
from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig
from vdpp_tpu.utils.weights import convert_unet_state_dict
from tests.fixtures.gen_xt_goldens import fingerprint
from tests.fixtures.gen_xt_unet_golden import build

pytestmark = pytest.mark.xtgolden

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "xt_unet_golden.npz"
)

# Full-forward fp32 tolerance: ~60 GroupNorm-renormalized blocks of
# torch-vs-XLA reassociation noise compound on the per-block 6e-4 bound
# of test_xt_dim_goldens.py; the relative-error assertion below is the
# scale-free check.
ATOL = 2e-3

_FP_MSG = (
    "regenerated weights/inputs no longer match the fixture fingerprint - "
    "torch randn or kernel numerics changed; regenerate "
    "tests/fixtures/gen_xt_unet_golden.py and review the diffs"
)


def test_full_unet_xt_golden():
    goldens = np.load(FIXTURE)
    ocfg, sd, sample, timestep, ctx, tids = build()
    np.testing.assert_allclose(
        fingerprint(sd, sample, ctx, tids), goldens["unet_xt/fp"],
        rtol=1e-12, err_msg=_FP_MSG,
    )
    want = goldens["unet_xt/out"]

    with torch.no_grad():
        got_torch = oracle.unet_forward(sd, ocfg, sample, timestep, ctx, tids)
    np.testing.assert_array_equal(got_torch.numpy(), want)
    del got_torch

    jcfg = SVDUNetConfig(dtype=jnp.float32)  # defaults ARE svd-xt dims
    params = convert_unet_state_dict(
        {k: v.numpy() for k, v in sd.items()},
        num_levels=jcfg.num_levels,
        layers_per_block=jcfg.layers_per_block,
        transformer_layers=jcfg.transformer_layers_per_block,
        dtype=jnp.float32,
    )
    del sd
    unet = SVDUNet(jcfg)
    got = unet.apply(
        params,
        jnp.asarray(sample.numpy().transpose(0, 1, 3, 4, 2)),  # (B,F,H,W,C)
        jnp.float32(float(timestep)),
        jnp.asarray(ctx.numpy()),
        jnp.asarray(tids.numpy()),
    )
    got = np.asarray(got).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(got, want, atol=ATOL)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-3, f"relative error {rel:.2e}"
