"""Block- and model-level golden tests against handwritten torch oracles.

diffusers is not installed here, so the diffusers modules the reference
drives (reference: src/models/svd_unet.py loads
``UNetSpatioTemporalConditionModel``; scripts/compare_with_official.py is
the parity instrument) are re-derived in plain ``torch.nn.functional`` in
tests/torch_svd_oracle.py, operating directly on a state dict with the
*exact diffusers key names*. The same state dict is then fed through this
repo's checkpoint converter (vdpp_tpu.utils.weights) and run through the
JAX blocks — so one test pins (a) the converter's name/layout mapping
against real checkpoint naming and (b) the block math, including the
AlphaBlender blend direction.

AlphaBlender convention (the round-1 open question):

* ``alpha = sigmoid(mix_factor)`` always weights the SPATIAL path unless
  ``switch_spatial_to_temporal_mix=True`` flips it. Functional anchor: with
  ``merge_strategy="learned_with_images"``, image-only samples force
  ``alpha=1``, which must select the pure spatial path (temporal layers are
  meaningless for single images) — so alpha multiplies x_spatial.
* The UNet's SpatioTemporalResBlock and TransformerSpatioTemporalModel use
  the UNSWITCHED blend (sigmoid -> spatial), ``merge_factor=0.5``.
* The VAE TemporalDecoder blocks use ``merge_strategy="learned"``,
  ``merge_factor=0.0`` and ``switch_spatial_to_temporal_mix=True``
  (sigmoid -> temporal) — mirroring the original sgm
  ``temporal_ae.VideoResBlock`` whose blend is ``alpha*x_temporal +
  (1-alpha)*x_spatial``.
"""

import jax.numpy as jnp
import numpy as np
import torch

import torch_svd_oracle as oracle
from vdpp_tpu.models import vae as vae_mod
from vdpp_tpu.models.svd_unet import (
    SVDUNet,
    SVDUNetConfig,
    _st_resblock,
    _st_transformer,
)
from vdpp_tpu.utils.weights import (
    _SD,
    _conv_st_resblock,
    _conv_st_transformer,
    convert_unet_state_dict,
)

B, F_, H, W = 2, 3, 6, 6


def _np_sd(sd):
    return {k: v.numpy() for k, v in sd.items()}


def test_unet_st_resblock_matches_torch_oracle():
    in_ch, out_ch, temb_dim, groups = 16, 32, 24, 8
    gen = torch.Generator().manual_seed(1)
    sd = {}
    oracle.sd_st_resblock(sd, "res", in_ch, out_ch, gen, temb_dim)

    x = torch.randn(B * F_, in_ch, H, W, generator=gen)
    temb = torch.randn(B * F_, temb_dim, generator=gen)
    want = oracle.st_resblock(
        sd, "res", x, temb, F_, groups, eps=1e-6, teps=1e-6, switch=False
    )

    cfg = SVDUNetConfig(norm_num_groups=groups)
    params = _conv_st_resblock(_SD(_np_sd(sd), jnp.float32), "res")
    got = _st_resblock(
        params,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(temb.numpy()),
        cfg, B, F_,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), atol=5e-5
    )


def test_unet_st_transformer_matches_torch_oracle():
    c, cross, heads, groups = 32, 24, 2, 8
    gen = torch.Generator().manual_seed(2)
    sd = {}
    oracle.sd_st_transformer(sd, "attn", c, cross, gen)

    x = torch.randn(B * F_, c, H, W, generator=gen)
    ctx = torch.randn(B * F_, 1, cross, generator=gen)
    want = oracle.st_transformer(sd, "attn", x, ctx, F_, heads, groups)

    cfg = SVDUNetConfig(norm_num_groups=groups, cross_attention_dim=cross)
    params = _conv_st_transformer(_SD(_np_sd(sd), jnp.float32), "attn", 1)
    got = _st_transformer(
        params,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ctx.numpy()),
        cfg, heads, B, F_,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), atol=5e-5
    )


def test_vae_st_resblock_matches_torch_oracle_switched():
    """TemporalDecoder blocks: merge_strategy='learned', merge_factor=0.0,
    switch_spatial_to_temporal_mix=True, no time embedding,
    temporal_eps=1e-5."""
    ch, groups = 16, 8
    gen = torch.Generator().manual_seed(3)
    sd = {}
    oracle.sd_st_resblock(sd, "res", ch, ch, gen, temb_dim=None)

    x = torch.randn(B * F_, ch, H, W, generator=gen)
    want = oracle.st_resblock(
        sd, "res", x, None, F_, groups, eps=1e-6, teps=1e-5, switch=True
    )

    cfg = vae_mod.VAEConfig(norm_num_groups=groups)
    params = _conv_st_resblock(_SD(_np_sd(sd), jnp.float32), "res")
    got = vae_mod._st_resblock(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg, B, F_
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), atol=5e-5
    )


def test_blend_direction_is_detectable():
    """Guard: with a non-trivial mix_factor the two blend directions must
    differ — i.e. these tests would actually catch an inverted blend."""
    gen = torch.Generator().manual_seed(4)
    sd = {}
    oracle.sd_st_resblock(sd, "res", 16, 16, gen, 24)
    sd["res.time_mixer.mix_factor"] = torch.tensor([1.5])

    x = torch.randn(B * F_, 16, H, W, generator=gen)
    temb = torch.randn(B * F_, 24, generator=gen)
    a = oracle.st_resblock(sd, "res", x, temb, F_, 8, 1e-6, 1e-6, switch=False)
    b = oracle.st_resblock(sd, "res", x, temb, F_, 8, 1e-6, 1e-6, switch=True)
    assert not torch.allclose(a, b, atol=1e-3)


def test_full_unet_matches_torch_oracle():
    """Model-level golden test: the full tiny UNet (same code path as
    svd_xt) against the torch oracle on a diffusers-named checkpoint,
    through the real converter. The JAX analogue of the reference's
    step-0 comparison (reference: scripts/compare_with_official.py:101-171)."""
    ocfg = oracle.OracleUNetConfig.tiny()
    jcfg = SVDUNetConfig.tiny()
    sd = oracle.make_unet_state_dict(ocfg, seed=5)

    gen = torch.Generator().manual_seed(6)
    sample = torch.randn(B, F_, jcfg.in_channels, H, W, generator=gen)
    timestep = torch.tensor(1.37)
    ctx = torch.randn(B, 1, jcfg.cross_attention_dim, generator=gen)
    tids = torch.tensor([[5.0, 127.0, 0.02]]).repeat(B, 1)

    want = oracle.unet_forward(sd, ocfg, sample, timestep, ctx, tids)

    params = convert_unet_state_dict(
        _np_sd(sd),
        num_levels=jcfg.num_levels,
        layers_per_block=jcfg.layers_per_block,
        transformer_layers=jcfg.transformer_layers_per_block,
        dtype=jnp.float32,
    )
    unet = SVDUNet(jcfg)
    got = unet.apply(
        params,
        jnp.asarray(sample.numpy().transpose(0, 1, 3, 4, 2)),  # (B,F,H,W,C)
        jnp.float32(float(timestep)),
        jnp.asarray(ctx.numpy()),
        jnp.asarray(tids.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 1, 4, 2, 3), want.numpy(),
        atol=3e-4, rtol=1e-4,
    )


def test_scheduler_oracle_matches_repo_schedule():
    from vdpp_tpu.diffusion.scheduler import EulerKarrasSchedule

    n = 7
    sch = oracle.EulerDiscreteSchedulerOracle()
    sch.set_timesteps(n)
    repo = EulerKarrasSchedule.create(n)
    np.testing.assert_allclose(sch.sigmas.numpy(), repo.sigmas, rtol=1e-6)
    np.testing.assert_allclose(sch.timesteps.numpy(), repo.timesteps, rtol=1e-5)
    assert abs(sch.init_noise_sigma - repo.init_noise_sigma) < 1e-3

    gen = torch.Generator().manual_seed(7)
    x = torch.randn(1, 4, 3, 8, 8, generator=gen)
    e = torch.randn(1, 4, 3, 8, 8, generator=gen)
    got = sch.step(e, sch.timesteps[2], x).prev_sample
    from vdpp_tpu.diffusion.scheduler import euler_step_v_prediction

    want = euler_step_v_prediction(
        jnp.asarray(x.numpy()), jnp.asarray(e.numpy()),
        repo.sigmas[2], repo.sigmas[3],
    )
    np.testing.assert_allclose(got.numpy(), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_vae_encoder_downsample_padding():
    """diffusers' KL-encoder Downsample2D pads (0,1,0,1) — right/bottom
    only (downsample_padding=0 + explicit F.pad) — NOT symmetric padding=1.
    Pin the repo's encoder downsample to that convention with a plain
    torch oracle sharing the same weights."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from vdpp_tpu.ops.conv import conv2d, init_conv2d

    p = init_conv2d(jax.random.key(0), 8, 8, 3)
    x = jax.random.normal(jax.random.key(1), (1, 9, 9, 8), jnp.float32)

    got = conv2d(x, p, stride=2, padding=((0, 1), (0, 1)))

    # torch NCHW oracle: F.pad right/bottom then stride-2 valid conv.
    xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    wt = torch.from_numpy(np.asarray(p["w"])).permute(3, 2, 0, 1)  # HWIO->OIHW
    bt = torch.from_numpy(np.asarray(p["b"]))
    ref = torch.nn.functional.conv2d(
        F.pad(xt, (0, 1, 0, 1)), wt, bt, stride=2
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4
    )
