"""Torch goldens at TRUE svd-xt dimensions (round-4 parity deepening).

Every other golden runs at tiny config; these cases pin one instance of
each block class at the real svd-xt channel/group/head/context/frame
dimensions — see tests/fixtures/gen_xt_goldens.py for the case table and
the size trade (single spatial tile, weights/inputs regenerated from
seed, only oracle outputs frozen). The closest in-env approximation of
the parity instrument the reference runs against real checkpoints
(reference: scripts/compare_with_official.py:101-171).

Each case asserts three things:

1. the regenerated weights/inputs still fingerprint-match the fixture
   (catches torch randn drift with a clear message);
2. the torch oracle reproduces its stored output bit-for-bit;
3. the JAX converter + block matches the stored output at fp32 tolerance
   scaled for the real dims (fan-in 2880 convs, 25-frame softmaxes).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_svd_oracle as oracle
from vdpp_tpu.models import vae as vae_mod
from vdpp_tpu.models.svd_unet import (
    SVDUNetConfig,
    _st_resblock,
    _st_transformer,
    _temporal_tblock,
)
from vdpp_tpu.utils.weights import (
    _SD,
    _conv_st_resblock,
    _conv_st_transformer,
    _conv_temporal_tblock,
    _conv_vae_attention,
)
from tests.fixtures.gen_xt_goldens import (
    B,
    CROSS,
    FRAMES,
    GROUPS,
    L0_CH,
    L0_HEADS,
    MID_CH,
    MID_HEADS,
    TEMB,
    TILE_H,
    TILE_W,
    VAE_CH,
    fingerprint,
    rescale_weights,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "xt_dim_goldens.npz"
)

# fp32 tolerance at real dims: conv fan-in 2880 and 96/25-token softmax
# reductions reassociate differently between torch's and XLA's kernels;
# with fan-in-stable weights (rescale_weights) activations stay O(1-10)
# and the measured disagreement sits well under this bound.
ATOL = 6e-4

_FP_MSG = (
    "regenerated weights/inputs no longer match the fixture fingerprint - "
    "torch randn or kernel numerics changed; regenerate "
    "tests/fixtures/gen_xt_goldens.py and review the diffs"
)


@pytest.fixture(scope="module")
def goldens():
    return np.load(FIXTURE)


def _np_sd(sd):
    return {k: v.numpy() for k, v in sd.items()}


def test_resblock_xt(goldens):
    gen = torch.Generator().manual_seed(101)
    sd = {}
    oracle.sd_st_resblock(sd, "res", L0_CH, L0_CH, gen, TEMB)
    rescale_weights(sd, 1 / 8)
    x = torch.randn(B * FRAMES, L0_CH, TILE_H, TILE_W, generator=gen)
    temb = torch.randn(B * FRAMES, TEMB, generator=gen)
    np.testing.assert_allclose(
        fingerprint(sd, x, temb), goldens["resblock_xt/fp"],
        rtol=1e-12, err_msg=_FP_MSG,
    )
    want = goldens["resblock_xt/out"]
    got_torch = oracle.st_resblock(
        sd, "res", x, temb, FRAMES, GROUPS, eps=1e-6, teps=1e-6, switch=False
    )
    np.testing.assert_array_equal(got_torch.numpy(), want)

    cfg = SVDUNetConfig(dtype=jnp.float32)  # real svd-xt dims, fp32
    params = _conv_st_resblock(_SD(_np_sd(sd), jnp.float32), "res")
    got = _st_resblock(
        params,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(temb.numpy()),
        cfg, B, FRAMES,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=ATOL
    )


def test_transformer_xt(goldens):
    gen = torch.Generator().manual_seed(102)
    sd = {}
    oracle.sd_st_transformer(sd, "attn", L0_CH, CROSS, gen)
    rescale_weights(sd, 1 / 16)
    x = torch.randn(B * FRAMES, L0_CH, TILE_H, TILE_W, generator=gen)
    ctx = torch.randn(B * FRAMES, 1, CROSS, generator=gen)
    np.testing.assert_allclose(
        fingerprint(sd, x, ctx), goldens["transformer_xt/fp"],
        rtol=1e-12, err_msg=_FP_MSG,
    )
    want = goldens["transformer_xt/out"]
    got_torch = oracle.st_transformer(
        sd, "attn", x, ctx, FRAMES, L0_HEADS, GROUPS
    )
    np.testing.assert_array_equal(got_torch.numpy(), want)

    cfg = SVDUNetConfig(dtype=jnp.float32)
    params = _conv_st_transformer(_SD(_np_sd(sd), jnp.float32), "attn", 1)
    got = _st_transformer(
        params,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ctx.numpy()),
        cfg, L0_HEADS, B, FRAMES,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=ATOL
    )


def test_temporal_attn_xt(goldens):
    l_tokens = 12
    gen = torch.Generator().manual_seed(103)
    sd = {}
    oracle.sd_temporal_tblock(sd, "tb", MID_CH, CROSS, gen)
    rescale_weights(sd, 1 / 16)
    h = torch.randn(B * FRAMES, l_tokens, MID_CH, generator=gen)
    time_ctx_b = torch.randn(B, 1, CROSS, generator=gen)
    np.testing.assert_allclose(
        fingerprint(sd, h, time_ctx_b), goldens["temporal_attn_xt/fp"],
        rtol=1e-12, err_msg=_FP_MSG,
    )
    want = goldens["temporal_attn_xt/out"]
    time_ctx = (
        time_ctx_b[:, None]
        .expand(B, l_tokens, 1, CROSS)
        .reshape(B * l_tokens, 1, CROSS)
    )
    got_torch = oracle.temporal_tblock(sd, "tb", h, time_ctx, MID_HEADS, FRAMES)
    np.testing.assert_array_equal(got_torch.numpy(), want)

    params = _conv_temporal_tblock(_SD(_np_sd(sd), jnp.float32), "tb")
    got = _temporal_tblock(
        params,
        jnp.asarray(h.numpy()),
        jnp.asarray(time_ctx_b.numpy()),
        MID_HEADS, B, FRAMES,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_vae_attn_xt(goldens):
    gen = torch.Generator().manual_seed(104)
    sd = {}
    oracle.sd_vae_attention(sd, "mid_block.attentions.0", VAE_CH, gen)
    rescale_weights(sd, 1 / 8)
    x = torch.randn(3, VAE_CH, 12, 16, generator=gen)
    np.testing.assert_allclose(
        fingerprint(sd, x), goldens["vae_attn_xt/fp"],
        rtol=1e-12, err_msg=_FP_MSG,
    )
    want = goldens["vae_attn_xt/out"]
    got_torch = oracle.vae_attention(sd, "mid_block.attentions.0", x, GROUPS)
    np.testing.assert_array_equal(got_torch.numpy(), want)

    cfg = vae_mod.VAEConfig.svd()
    params = _conv_vae_attention(
        _SD(_np_sd(sd), jnp.float32), "mid_block.attentions.0"
    )
    got = vae_mod._vae_attention(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=ATOL
    )
