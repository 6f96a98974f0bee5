"""Block-level golden tests against handwritten torch oracles.

diffusers is not installed here, so the diffusers modules the reference
drives (reference: src/models/svd_unet.py loads
``UNetSpatioTemporalConditionModel``; scripts/compare_with_official.py is
the parity instrument) are re-derived in plain ``torch.nn.functional``
below, operating directly on a state dict with the *exact diffusers key
names*. The same state dict is then fed through this repo's checkpoint
converter (vdpp_tpu.utils.weights) and run through the JAX blocks — so one
test pins (a) the converter's name/layout mapping against real checkpoint
naming and (b) the block math, including the AlphaBlender blend direction.

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

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from vdpp_tpu.models import vae as vae_mod
from vdpp_tpu.models.svd_unet import (
    SVDUNetConfig,
    _st_resblock,
    _st_transformer,
)
from vdpp_tpu.utils.weights import _SD, _conv_st_resblock, _conv_st_transformer

torch.manual_seed(0)


# ------------------------------------------------------------------ #
# torch oracle primitives over a diffusers-named state dict
# ------------------------------------------------------------------ #
def _lin(sd, p, x):
    return tF.linear(x, sd[p + ".weight"], sd.get(p + ".bias"))


def _gn(sd, p, x, groups, eps):
    return tF.group_norm(x, groups, sd[p + ".weight"], sd[p + ".bias"], eps)


def _ln(sd, p, x):
    return tF.layer_norm(x, (x.shape[-1],), sd[p + ".weight"], sd[p + ".bias"], 1e-5)


def _geglu(sd, p, x):
    h = _lin(sd, p + ".net.0.proj", x)
    val, gate = h.chunk(2, dim=-1)
    return _lin(sd, p + ".net.2", val * tF.gelu(gate))


def _attn(sd, p, x, ctx, heads):
    """diffusers Attention: qkv (no bias in the UNet), to_out.0 with bias."""
    ctx = x if ctx is None else ctx
    b, l, c = x.shape
    m = ctx.shape[1]
    d = c // heads
    q = _lin(sd, p + ".to_q", x).view(b, l, heads, d).transpose(1, 2)
    k = _lin(sd, p + ".to_k", ctx).view(b, m, heads, d).transpose(1, 2)
    v = _lin(sd, p + ".to_v", ctx).view(b, m, heads, d).transpose(1, 2)
    o = tF.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, l, c)
    return _lin(sd, p + ".to_out.0", o)


def _spatial_resnet(sd, p, x, temb, groups, eps):
    """diffusers ResnetBlock2D (x: (BF, C, H, W), temb: (BF, T) or None)."""
    h = _gn(sd, p + ".norm1", x, groups, eps)
    h = tF.silu(h)
    h = tF.conv2d(h, sd[p + ".conv1.weight"], sd[p + ".conv1.bias"], padding=1)
    if temb is not None:
        t = _lin(sd, p + ".time_emb_proj", tF.silu(temb))
        h = h + t[:, :, None, None]
    h = _gn(sd, p + ".norm2", h, groups, eps)
    h = tF.silu(h)
    h = tF.conv2d(h, sd[p + ".conv2.weight"], sd[p + ".conv2.bias"], padding=1)
    if p + ".conv_shortcut.weight" in sd:
        x = tF.conv2d(x, sd[p + ".conv_shortcut.weight"], sd[p + ".conv_shortcut.bias"])
    return x + h


def _temporal_resnet(sd, p, x, temb, groups, eps):
    """diffusers TemporalResnetBlock (x: (B, C, F, H, W), temb: (B, F, T))."""
    h = _gn(sd, p + ".norm1", x, groups, eps)
    h = tF.silu(h)
    h = tF.conv3d(h, sd[p + ".conv1.weight"], sd[p + ".conv1.bias"], padding=(1, 0, 0))
    if temb is not None:
        t = _lin(sd, p + ".time_emb_proj", tF.silu(temb))  # (B, F, C)
        h = h + t[:, :, :, None, None].permute(0, 2, 1, 3, 4)  # (B, C, F, 1, 1)
    h = _gn(sd, p + ".norm2", h, groups, eps)
    h = tF.silu(h)
    h = tF.conv3d(h, sd[p + ".conv2.weight"], sd[p + ".conv2.bias"], padding=(1, 0, 0))
    return x + h


def _st_resblock_torch(sd, p, x, temb, frames, groups, eps, teps, switch):
    """diffusers SpatioTemporalResBlock for all-video batches."""
    h = _spatial_resnet(sd, p + ".spatial_res_block", x, temb, groups, eps)
    bf, c, hh, ww = h.shape
    b = bf // frames
    h5 = h.reshape(b, frames, c, hh, ww).permute(0, 2, 1, 3, 4)
    temb5 = None if temb is None else temb.reshape(b, frames, -1)
    ht = _temporal_resnet(sd, p + ".temporal_res_block", h5, temb5, groups, teps)
    alpha = torch.sigmoid(sd[p + ".time_mixer.mix_factor"])
    if switch:
        alpha = 1.0 - alpha
    out = alpha * h5 + (1.0 - alpha) * ht
    return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


def _sinusoidal(t, dim):
    """diffusers Timesteps(dim, flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _basic_tblock(sd, p, h, ctx, heads):
    h = h + _attn(sd, p + ".attn1", _ln(sd, p + ".norm1", h), None, heads)
    h = h + _attn(sd, p + ".attn2", _ln(sd, p + ".norm2", h), ctx, heads)
    h = h + _geglu(sd, p + ".ff", _ln(sd, p + ".norm3", h))
    return h


def _temporal_tblock_torch(sd, p, h, time_ctx, heads, frames):
    """diffusers TemporalBasicTransformerBlock (tokens = frames)."""
    bf, l, c = h.shape
    b = bf // frames
    h = h.reshape(b, frames, l, c).permute(0, 2, 1, 3).reshape(b * l, frames, c)
    residual = h
    h = _geglu(sd, p + ".ff_in", _ln(sd, p + ".norm_in", h)) + residual
    h = h + _attn(sd, p + ".attn1", _ln(sd, p + ".norm1", h), None, heads)
    h = h + _attn(sd, p + ".attn2", _ln(sd, p + ".norm2", h), time_ctx, heads)
    h = h + _geglu(sd, p + ".ff", _ln(sd, p + ".norm3", h))
    return h.reshape(b, l, frames, c).permute(0, 2, 1, 3).reshape(bf, l, c)


def _st_transformer_torch(sd, p, x, ctx, frames, heads, groups):
    """diffusers TransformerSpatioTemporalModel (1 layer, all-video)."""
    bf, c, hh, ww = x.shape
    b = bf // frames
    residual = x
    h = _gn(sd, p + ".norm", x, groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
    h = _lin(sd, p + ".proj_in", h)

    frame_idx = torch.arange(frames, dtype=torch.float32).repeat(b)
    emb = _sinusoidal(frame_idx, c)
    emb = _lin(sd, p + ".time_pos_embed.linear_2",
               tF.silu(_lin(sd, p + ".time_pos_embed.linear_1", emb)))[:, None, :]

    time_ctx = ctx.reshape(b, frames, 1, -1)[:, 0]  # (B, 1, D): first frame
    time_ctx = time_ctx[:, None].expand(b, hh * ww, 1, ctx.shape[-1])
    time_ctx = time_ctx.reshape(b * hh * ww, 1, ctx.shape[-1])

    h = _basic_tblock(sd, p + ".transformer_blocks.0", h, ctx, heads)
    h_mix = h + emb
    h_mix = _temporal_tblock_torch(
        sd, p + ".temporal_transformer_blocks.0", h_mix, time_ctx, heads, frames
    )
    # learned_with_images, all-video, NO switch: sigmoid weights SPATIAL.
    alpha = torch.sigmoid(sd[p + ".time_mixer.mix_factor"])
    h = alpha * h + (1.0 - alpha) * h_mix

    h = _lin(sd, p + ".proj_out", h)
    return h.reshape(bf, hh, ww, c).permute(0, 3, 1, 2) + residual


# ------------------------------------------------------------------ #
# diffusers-named random state dicts
# ------------------------------------------------------------------ #
def _rand(*shape):
    return torch.randn(*shape) * 0.2


def _sd_norm(sd, p, c):
    sd[p + ".weight"] = _rand(c) + 1.0
    sd[p + ".bias"] = _rand(c)


def _sd_linear(sd, p, i, o, bias=True):
    sd[p + ".weight"] = _rand(o, i)
    if bias:
        sd[p + ".bias"] = _rand(o)


def _sd_conv2d(sd, p, i, o, k=3):
    sd[p + ".weight"] = _rand(o, i, k, k)
    sd[p + ".bias"] = _rand(o)


def _sd_conv3d(sd, p, i, o):
    sd[p + ".weight"] = _rand(o, i, 3, 1, 1)
    sd[p + ".bias"] = _rand(o)


def _sd_attention(sd, p, c, cross=None, qkv_bias=False):
    kv = cross or c
    _sd_linear(sd, p + ".to_q", c, c, bias=qkv_bias)
    _sd_linear(sd, p + ".to_k", kv, c, bias=qkv_bias)
    _sd_linear(sd, p + ".to_v", kv, c, bias=qkv_bias)
    _sd_linear(sd, p + ".to_out.0", c, c)


def _sd_ff(sd, p, c):
    _sd_linear(sd, p + ".net.0.proj", c, 8 * c)
    _sd_linear(sd, p + ".net.2", 4 * c, c)


def _sd_st_resblock(sd, p, in_ch, out_ch, temb_dim=None):
    sp = p + ".spatial_res_block"
    _sd_norm(sd, sp + ".norm1", in_ch)
    _sd_conv2d(sd, sp + ".conv1", in_ch, out_ch)
    if temb_dim:
        _sd_linear(sd, sp + ".time_emb_proj", temb_dim, out_ch)
    _sd_norm(sd, sp + ".norm2", out_ch)
    _sd_conv2d(sd, sp + ".conv2", out_ch, out_ch)
    if in_ch != out_ch:
        _sd_conv2d(sd, sp + ".conv_shortcut", in_ch, out_ch, k=1)
    tp = p + ".temporal_res_block"
    _sd_norm(sd, tp + ".norm1", out_ch)
    _sd_conv3d(sd, tp + ".conv1", out_ch, out_ch)
    if temb_dim:
        _sd_linear(sd, tp + ".time_emb_proj", temb_dim, out_ch)
    _sd_norm(sd, tp + ".norm2", out_ch)
    _sd_conv3d(sd, tp + ".conv2", out_ch, out_ch)
    sd[p + ".time_mixer.mix_factor"] = _rand(1)


def _sd_st_transformer(sd, p, c, cross):
    _sd_norm(sd, p + ".norm", c)
    _sd_linear(sd, p + ".proj_in", c, c)
    _sd_linear(sd, p + ".time_pos_embed.linear_1", c, 4 * c)
    _sd_linear(sd, p + ".time_pos_embed.linear_2", 4 * c, c)
    bp = p + ".transformer_blocks.0"
    _sd_norm(sd, bp + ".norm1", c)
    _sd_attention(sd, bp + ".attn1", c)
    _sd_norm(sd, bp + ".norm2", c)
    _sd_attention(sd, bp + ".attn2", c, cross=cross)
    _sd_norm(sd, bp + ".norm3", c)
    _sd_ff(sd, bp + ".ff", c)
    tp = p + ".temporal_transformer_blocks.0"
    _sd_norm(sd, tp + ".norm_in", c)
    _sd_ff(sd, tp + ".ff_in", c)
    _sd_norm(sd, tp + ".norm1", c)
    _sd_attention(sd, tp + ".attn1", c)
    _sd_norm(sd, tp + ".norm2", c)
    _sd_attention(sd, tp + ".attn2", c, cross=cross)
    _sd_norm(sd, tp + ".norm3", c)
    _sd_ff(sd, tp + ".ff", c)
    sd[p + ".time_mixer.mix_factor"] = _rand(1)
    _sd_linear(sd, p + ".proj_out", c, c)


def _to_numpy_sd(sd):
    return {k: v.numpy() for k, v in sd.items()}


# ------------------------------------------------------------------ #
# tests
# ------------------------------------------------------------------ #
B, F_, H, W = 2, 3, 6, 6


def test_unet_st_resblock_matches_torch_oracle():
    in_ch, out_ch, temb_dim, groups = 16, 32, 24, 8
    sd = {}
    _sd_st_resblock(sd, "res", in_ch, out_ch, temb_dim)

    x = torch.randn(B * F_, in_ch, H, W)
    temb = torch.randn(B * F_, temb_dim)
    want = _st_resblock_torch(
        sd, "res", x, temb, F_, groups, eps=1e-6, teps=1e-6, switch=False
    )

    cfg = SVDUNetConfig(norm_num_groups=groups)
    params = _conv_st_resblock(_SD(_to_numpy_sd(sd), jnp.float32), "res")
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
    sd = {}
    _sd_st_transformer(sd, "attn", c, cross)

    x = torch.randn(B * F_, c, H, W)
    ctx = torch.randn(B * F_, 1, cross)
    want = _st_transformer_torch(sd, "attn", x, ctx, F_, heads, groups)

    cfg = SVDUNetConfig(norm_num_groups=groups, cross_attention_dim=cross)
    params = _conv_st_transformer(_SD(_to_numpy_sd(sd), jnp.float32), "attn", 1)
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
    sd = {}
    _sd_st_resblock(sd, "res", ch, ch, temb_dim=None)

    x = torch.randn(B * F_, ch, H, W)
    want = _st_resblock_torch(
        sd, "res", x, None, F_, groups, eps=1e-6, teps=1e-5, switch=True
    )

    cfg = vae_mod.VAEConfig(norm_num_groups=groups)
    params = _conv_st_resblock(_SD(_to_numpy_sd(sd), jnp.float32), "res")
    got = vae_mod._st_resblock(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg, B, F_
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), atol=5e-5
    )


def test_blend_direction_is_detectable():
    """Guard: with a non-trivial mix_factor the two blend directions must
    differ — i.e. these tests would actually catch an inverted blend."""
    in_ch, out_ch, temb_dim, groups = 16, 16, 24, 8
    sd = {}
    _sd_st_resblock(sd, "res", in_ch, out_ch, temb_dim)
    sd["res.time_mixer.mix_factor"] = torch.tensor([1.5])

    x = torch.randn(B * F_, in_ch, H, W)
    temb = torch.randn(B * F_, temb_dim)
    a = _st_resblock_torch(sd, "res", x, temb, F_, groups, 1e-6, 1e-6, switch=False)
    b = _st_resblock_torch(sd, "res", x, temb, F_, groups, 1e-6, 1e-6, switch=True)
    assert not torch.allclose(a, b, atol=1e-3)
