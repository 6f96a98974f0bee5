"""Handwritten torch oracle of the diffusers SVD UNet + Euler scheduler.

Used by tests only. diffusers is not installed in this environment, so the
modules the reference drives (``UNetSpatioTemporalConditionModel``,
``EulerDiscreteScheduler`` with the SVD configuration — reference:
src/models/svd_unet.py:77-164) are re-derived here in plain
``torch.nn.functional``, operating directly on state dicts that use the
*exact diffusers key names*. This gives the repo an executable model-level
golden reference:

* ``unet_forward(sd, cfg, ...)`` — the full spatio-temporal UNet forward
  (channels-first, (B, F, C, H, W) sample like diffusers);
* ``make_unet_state_dict(cfg)`` — a random diffusers-named checkpoint for
  any topology (tests use the tiny config);
* ``EulerDiscreteSchedulerOracle`` — the Karras/EDM v-prediction scheduler
  in its SVD configuration (continuous timesteps 0.25*ln(sigma),
  init_noise_sigma = sqrt(sigma0^2+1), Euler step);
* ``install_mock_diffusers()`` — registers a fake ``diffusers`` module in
  ``sys.modules`` exposing the two classes above, so the gated parity
  harness ``scripts/compare_with_torch.py`` executes end-to-end.

AlphaBlender conventions (see tests/test_torch_block_parity.py docstring
for the derivation): UNet blocks blend ``sigmoid(mix_factor) * spatial +
(1-sigmoid) * temporal``; the VAE TemporalDecoder blocks are switched.
"""

from __future__ import annotations

import math
import sys
import types
from dataclasses import dataclass

import torch
import torch.nn.functional as tF


# ------------------------------------------------------------------ #
# primitives over a diffusers-named state dict
# ------------------------------------------------------------------ #
def lin(sd, p, x):
    return tF.linear(x, sd[p + ".weight"], sd.get(p + ".bias"))


def gn(sd, p, x, groups, eps):
    return tF.group_norm(x, groups, sd[p + ".weight"], sd[p + ".bias"], eps)


def ln(sd, p, x):
    return tF.layer_norm(x, (x.shape[-1],), sd[p + ".weight"], sd[p + ".bias"], 1e-5)


def geglu(sd, p, x):
    h = lin(sd, p + ".net.0.proj", x)
    val, gate = h.chunk(2, dim=-1)
    return lin(sd, p + ".net.2", val * tF.gelu(gate))


def attn(sd, p, x, ctx, heads):
    """diffusers Attention: qkv (no bias in the UNet), to_out.0 with bias."""
    ctx = x if ctx is None else ctx
    b, l, c = x.shape
    m = ctx.shape[1]
    d = c // heads
    q = lin(sd, p + ".to_q", x).view(b, l, heads, d).transpose(1, 2)
    k = lin(sd, p + ".to_k", ctx).view(b, m, heads, d).transpose(1, 2)
    v = lin(sd, p + ".to_v", ctx).view(b, m, heads, d).transpose(1, 2)
    o = tF.scaled_dot_product_attention(q, k, v)
    return lin(sd, p + ".to_out.0", o.transpose(1, 2).reshape(b, l, c))


def spatial_resnet(sd, p, x, temb, groups, eps):
    """diffusers ResnetBlock2D (x: (BF, C, H, W), temb: (BF, T) or None)."""
    h = gn(sd, p + ".norm1", x, groups, eps)
    h = tF.silu(h)
    h = tF.conv2d(h, sd[p + ".conv1.weight"], sd[p + ".conv1.bias"], padding=1)
    if temb is not None:
        t = lin(sd, p + ".time_emb_proj", tF.silu(temb))
        h = h + t[:, :, None, None]
    h = gn(sd, p + ".norm2", h, groups, eps)
    h = tF.silu(h)
    h = tF.conv2d(h, sd[p + ".conv2.weight"], sd[p + ".conv2.bias"], padding=1)
    if p + ".conv_shortcut.weight" in sd:
        x = tF.conv2d(x, sd[p + ".conv_shortcut.weight"], sd[p + ".conv_shortcut.bias"])
    return x + h


def temporal_resnet(sd, p, x, temb, groups, eps):
    """diffusers TemporalResnetBlock (x: (B, C, F, H, W), temb: (B, F, T))."""
    h = gn(sd, p + ".norm1", x, groups, eps)
    h = tF.silu(h)
    h = tF.conv3d(h, sd[p + ".conv1.weight"], sd[p + ".conv1.bias"], padding=(1, 0, 0))
    if temb is not None:
        t = lin(sd, p + ".time_emb_proj", tF.silu(temb))  # (B, F, C)
        h = h + t[:, :, :, None, None].permute(0, 2, 1, 3, 4)
    h = gn(sd, p + ".norm2", h, groups, eps)
    h = tF.silu(h)
    h = tF.conv3d(h, sd[p + ".conv2.weight"], sd[p + ".conv2.bias"], padding=(1, 0, 0))
    return x + h


def st_resblock(sd, p, x, temb, frames, groups, eps, teps, switch):
    """diffusers SpatioTemporalResBlock for all-video batches."""
    h = spatial_resnet(sd, p + ".spatial_res_block", x, temb, groups, eps)
    bf, c, hh, ww = h.shape
    b = bf // frames
    h5 = h.reshape(b, frames, c, hh, ww).permute(0, 2, 1, 3, 4)
    temb5 = None if temb is None else temb.reshape(b, frames, -1)
    ht = temporal_resnet(sd, p + ".temporal_res_block", h5, temb5, groups, teps)
    alpha = torch.sigmoid(sd[p + ".time_mixer.mix_factor"])
    if switch:
        alpha = 1.0 - alpha
    out = alpha * h5 + (1.0 - alpha) * ht
    return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


def sinusoidal(t, dim):
    """diffusers Timesteps(dim, flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def basic_tblock(sd, p, h, ctx, heads):
    h = h + attn(sd, p + ".attn1", ln(sd, p + ".norm1", h), None, heads)
    h = h + attn(sd, p + ".attn2", ln(sd, p + ".norm2", h), ctx, heads)
    h = h + geglu(sd, p + ".ff", ln(sd, p + ".norm3", h))
    return h


def temporal_tblock(sd, p, h, time_ctx, heads, frames):
    """diffusers TemporalBasicTransformerBlock (tokens = frames)."""
    bf, l, c = h.shape
    b = bf // frames
    h = h.reshape(b, frames, l, c).permute(0, 2, 1, 3).reshape(b * l, frames, c)
    residual = h
    h = geglu(sd, p + ".ff_in", ln(sd, p + ".norm_in", h)) + residual
    h = h + attn(sd, p + ".attn1", ln(sd, p + ".norm1", h), None, heads)
    h = h + attn(sd, p + ".attn2", ln(sd, p + ".norm2", h), time_ctx, heads)
    h = h + geglu(sd, p + ".ff", ln(sd, p + ".norm3", h))
    return h.reshape(b, l, frames, c).permute(0, 2, 1, 3).reshape(bf, l, c)


def st_transformer(sd, p, x, ctx, frames, heads, groups):
    """diffusers TransformerSpatioTemporalModel (1 layer, all-video)."""
    bf, c, hh, ww = x.shape
    b = bf // frames
    residual = x
    h = gn(sd, p + ".norm", x, groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
    h = lin(sd, p + ".proj_in", h)

    frame_idx = torch.arange(frames, dtype=torch.float32).repeat(b)
    emb = sinusoidal(frame_idx, c)
    emb = lin(sd, p + ".time_pos_embed.linear_2",
              tF.silu(lin(sd, p + ".time_pos_embed.linear_1", emb)))[:, None, :]

    time_ctx = ctx.reshape(b, frames, 1, -1)[:, 0]  # first-frame context
    time_ctx = time_ctx[:, None].expand(b, hh * ww, 1, ctx.shape[-1])
    time_ctx = time_ctx.reshape(b * hh * ww, 1, ctx.shape[-1])

    h = basic_tblock(sd, p + ".transformer_blocks.0", h, ctx, heads)
    h_mix = h + emb
    h_mix = temporal_tblock(
        sd, p + ".temporal_transformer_blocks.0", h_mix, time_ctx, heads, frames
    )
    # learned_with_images, all-video, NO switch: sigmoid weights SPATIAL.
    alpha = torch.sigmoid(sd[p + ".time_mixer.mix_factor"])
    h = alpha * h + (1.0 - alpha) * h_mix

    h = lin(sd, p + ".proj_out", h)
    return h.reshape(bf, hh, ww, c).permute(0, 3, 1, 2) + residual


# ------------------------------------------------------------------ #
# full UNet
# ------------------------------------------------------------------ #
@dataclass(frozen=True)
class OracleUNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: tuple = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    norm_num_groups: int = 32

    @property
    def num_levels(self):
        return len(self.block_out_channels)

    @property
    def time_embed_dim(self):
        return self.block_out_channels[0] * 4

    @classmethod
    def tiny(cls):
        """Mirror of vdpp_tpu SVDUNetConfig.tiny()."""
        return cls(
            block_out_channels=(32, 64),
            num_attention_heads=(2, 4),
            layers_per_block=1,
            cross_attention_dim=48,
            addition_time_embed_dim=8,
            norm_num_groups=8,
        )


def unet_forward(sd, cfg: OracleUNetConfig, sample, timestep, encoder_hidden_states,
                 added_time_ids):
    """diffusers UNetSpatioTemporalConditionModel.forward.

    sample: (B, F, C_in, H, W); timestep: scalar tensor (continuous);
    encoder_hidden_states: (B, 1, D); added_time_ids: (B, 3).
    Returns (B, F, C_out, H, W).
    """
    b, f = sample.shape[:2]
    g, eps = cfg.norm_num_groups, 1e-6
    n = cfg.num_levels

    t = timestep.expand(b) if timestep.ndim == 0 else timestep
    emb = sinusoidal(t, cfg.block_out_channels[0])
    emb = lin(sd, "time_embedding.linear_2",
              tF.silu(lin(sd, "time_embedding.linear_1", emb)))
    aug = sinusoidal(added_time_ids.flatten(), cfg.addition_time_embed_dim)
    aug = aug.reshape(b, -1)
    aug = lin(sd, "add_embedding.linear_2",
              tF.silu(lin(sd, "add_embedding.linear_1", aug)))
    emb = emb + aug

    x = sample.flatten(0, 1)  # (B*F, C, H, W)
    emb = emb.repeat_interleave(f, dim=0)
    ctx = encoder_hidden_states.repeat_interleave(f, dim=0)

    x = tF.conv2d(x, sd["conv_in.weight"], sd["conv_in.bias"], padding=1)
    stack = [x]
    for i in range(n):
        base = f"down_blocks.{i}"
        has_attn = i < n - 1
        for j in range(cfg.layers_per_block):
            x = st_resblock(sd, f"{base}.resnets.{j}", x, emb, f, g, eps, eps, False)
            if has_attn:
                x = st_transformer(sd, f"{base}.attentions.{j}", x, ctx, f,
                                   cfg.num_attention_heads[i], g)
            stack.append(x)
        if f"{base}.downsamplers.0.conv.weight" in sd:
            x = tF.conv2d(x, sd[f"{base}.downsamplers.0.conv.weight"],
                          sd[f"{base}.downsamplers.0.conv.bias"], stride=2, padding=1)
            stack.append(x)

    x = st_resblock(sd, "mid_block.resnets.0", x, emb, f, g, eps, eps, False)
    x = st_transformer(sd, "mid_block.attentions.0", x, ctx, f,
                       cfg.num_attention_heads[-1], g)
    x = st_resblock(sd, "mid_block.resnets.1", x, emb, f, g, eps, eps, False)

    rev_heads = list(reversed(cfg.num_attention_heads))
    for i in range(n):
        base = f"up_blocks.{i}"
        has_attn = i > 0
        for j in range(cfg.layers_per_block + 1):
            skip = stack.pop()
            x = torch.cat([x, skip], dim=1)
            x = st_resblock(sd, f"{base}.resnets.{j}", x, emb, f, g, eps, eps, False)
            if has_attn:
                x = st_transformer(sd, f"{base}.attentions.{j}", x, ctx, f,
                                   rev_heads[i], g)
        if f"{base}.upsamplers.0.conv.weight" in sd:
            x = tF.interpolate(x, scale_factor=2, mode="nearest")
            x = tF.conv2d(x, sd[f"{base}.upsamplers.0.conv.weight"],
                          sd[f"{base}.upsamplers.0.conv.bias"], padding=1)

    x = gn(sd, "conv_norm_out", x, g, 1e-5)
    x = tF.silu(x)
    x = tF.conv2d(x, sd["conv_out.weight"], sd["conv_out.bias"], padding=1)
    return x.reshape(b, f, cfg.out_channels, *x.shape[2:])


# ------------------------------------------------------------------ #
# diffusers-named random checkpoints
# ------------------------------------------------------------------ #
def _rand(gen, *shape):
    return torch.randn(*shape, generator=gen) * 0.2


def sd_norm(sd, p, c, gen):
    sd[p + ".weight"] = _rand(gen, c) + 1.0
    sd[p + ".bias"] = _rand(gen, c)


def sd_linear(sd, p, i, o, gen, bias=True):
    sd[p + ".weight"] = _rand(gen, o, i)
    if bias:
        sd[p + ".bias"] = _rand(gen, o)


def sd_conv2d(sd, p, i, o, gen, k=3):
    sd[p + ".weight"] = _rand(gen, o, i, k, k)
    sd[p + ".bias"] = _rand(gen, o)


def sd_conv3d(sd, p, i, o, gen):
    sd[p + ".weight"] = _rand(gen, o, i, 3, 1, 1)
    sd[p + ".bias"] = _rand(gen, o)


def sd_attention(sd, p, c, gen, cross=None, qkv_bias=False):
    kv = cross or c
    sd_linear(sd, p + ".to_q", c, c, gen, bias=qkv_bias)
    sd_linear(sd, p + ".to_k", kv, c, gen, bias=qkv_bias)
    sd_linear(sd, p + ".to_v", kv, c, gen, bias=qkv_bias)
    sd_linear(sd, p + ".to_out.0", c, c, gen)


def sd_ff(sd, p, c, gen):
    sd_linear(sd, p + ".net.0.proj", c, 8 * c, gen)
    sd_linear(sd, p + ".net.2", 4 * c, c, gen)


def sd_st_resblock(sd, p, in_ch, out_ch, gen, temb_dim=None):
    sp = p + ".spatial_res_block"
    sd_norm(sd, sp + ".norm1", in_ch, gen)
    sd_conv2d(sd, sp + ".conv1", in_ch, out_ch, gen)
    if temb_dim:
        sd_linear(sd, sp + ".time_emb_proj", temb_dim, out_ch, gen)
    sd_norm(sd, sp + ".norm2", out_ch, gen)
    sd_conv2d(sd, sp + ".conv2", out_ch, out_ch, gen)
    if in_ch != out_ch:
        sd_conv2d(sd, sp + ".conv_shortcut", in_ch, out_ch, gen, k=1)
    tp = p + ".temporal_res_block"
    sd_norm(sd, tp + ".norm1", out_ch, gen)
    sd_conv3d(sd, tp + ".conv1", out_ch, out_ch, gen)
    if temb_dim:
        sd_linear(sd, tp + ".time_emb_proj", temb_dim, out_ch, gen)
    sd_norm(sd, tp + ".norm2", out_ch, gen)
    sd_conv3d(sd, tp + ".conv2", out_ch, out_ch, gen)
    sd[p + ".time_mixer.mix_factor"] = _rand(gen, 1)


def sd_st_transformer(sd, p, c, cross, gen):
    sd_norm(sd, p + ".norm", c, gen)
    sd_linear(sd, p + ".proj_in", c, c, gen)
    sd_linear(sd, p + ".time_pos_embed.linear_1", c, 4 * c, gen)
    sd_linear(sd, p + ".time_pos_embed.linear_2", 4 * c, c, gen)
    bp = p + ".transformer_blocks.0"
    sd_norm(sd, bp + ".norm1", c, gen)
    sd_attention(sd, bp + ".attn1", c, gen)
    sd_norm(sd, bp + ".norm2", c, gen)
    sd_attention(sd, bp + ".attn2", c, gen, cross=cross)
    sd_norm(sd, bp + ".norm3", c, gen)
    sd_ff(sd, bp + ".ff", c, gen)
    tp = p + ".temporal_transformer_blocks.0"
    sd_norm(sd, tp + ".norm_in", c, gen)
    sd_ff(sd, tp + ".ff_in", c, gen)
    sd_norm(sd, tp + ".norm1", c, gen)
    sd_attention(sd, tp + ".attn1", c, gen)
    sd_norm(sd, tp + ".norm2", c, gen)
    sd_attention(sd, tp + ".attn2", c, gen, cross=cross)
    sd_norm(sd, tp + ".norm3", c, gen)
    sd_ff(sd, tp + ".ff", c, gen)
    sd[p + ".time_mixer.mix_factor"] = _rand(gen, 1)
    sd_linear(sd, p + ".proj_out", c, c, gen)


def make_unet_key_template(cfg: OracleUNetConfig) -> dict:
    """Key inventory of a diffusers UNet checkpoint for ``cfg``.

    Tensors are dummy all-ones-sized (ndim preserved) — cheap even at
    svd_xt scale. For key-coverage tests only, never for math.
    """
    import unittest.mock as mock

    def dummy(gen, *shape):
        return torch.zeros(*([1] * len(shape)))

    with mock.patch.object(sys.modules[__name__], "_rand", dummy):
        return make_unet_state_dict(cfg, seed=0)


def make_unet_state_dict(cfg: OracleUNetConfig, seed: int = 0) -> dict:
    """Random diffusers-named UNet checkpoint for ``cfg``."""
    gen = torch.Generator().manual_seed(seed)
    boc = cfg.block_out_channels
    n = cfg.num_levels
    te = cfg.time_embed_dim
    sd: dict = {}
    sd_conv2d(sd, "conv_in", cfg.in_channels, boc[0], gen)
    sd_linear(sd, "time_embedding.linear_1", boc[0], te, gen)
    sd_linear(sd, "time_embedding.linear_2", te, te, gen)
    sd_linear(sd, "add_embedding.linear_1", 3 * cfg.addition_time_embed_dim, te, gen)
    sd_linear(sd, "add_embedding.linear_2", te, te, gen)

    out_ch = boc[0]
    for i in range(n):
        in_ch, out_ch = out_ch, boc[i]
        base = f"down_blocks.{i}"
        is_final = i == n - 1
        for j in range(cfg.layers_per_block):
            sd_st_resblock(sd, f"{base}.resnets.{j}",
                           in_ch if j == 0 else out_ch, out_ch, gen, te)
            if not is_final:
                sd_st_transformer(sd, f"{base}.attentions.{j}", out_ch,
                                  cfg.cross_attention_dim, gen)
        if not is_final:
            sd_conv2d(sd, f"{base}.downsamplers.0.conv", out_ch, out_ch, gen)

    mid = boc[-1]
    sd_st_resblock(sd, "mid_block.resnets.0", mid, mid, gen, te)
    sd_st_resblock(sd, "mid_block.resnets.1", mid, mid, gen, te)
    sd_st_transformer(sd, "mid_block.attentions.0", mid, cfg.cross_attention_dim, gen)

    rev = list(reversed(boc))
    prev_out = rev[0]
    for i in range(n):
        base = f"up_blocks.{i}"
        out_up = rev[i]
        skip_ch = rev[min(i + 1, n - 1)]
        for j in range(cfg.layers_per_block + 1):
            res_skip = skip_ch if j == cfg.layers_per_block else out_up
            res_in = prev_out if j == 0 else out_up
            sd_st_resblock(sd, f"{base}.resnets.{j}", res_in + res_skip, out_up,
                           gen, te)
            if i > 0:
                sd_st_transformer(sd, f"{base}.attentions.{j}", out_up,
                                  cfg.cross_attention_dim, gen)
        if i != n - 1:
            sd_conv2d(sd, f"{base}.upsamplers.0.conv", out_up, out_up, gen)
        prev_out = out_up

    sd_norm(sd, "conv_norm_out", boc[0], gen)
    sd_conv2d(sd, "conv_out", boc[0], cfg.out_channels, gen)
    return sd


# ------------------------------------------------------------------ #
# mock-diffusers surface (for scripts/compare_with_torch.py)
# ------------------------------------------------------------------ #
class EulerDiscreteSchedulerOracle:
    """diffusers EulerDiscreteScheduler in its SVD configuration:
    v_prediction + Karras sigmas + continuous timesteps + leading spacing
    (reference: src/models/svd_unet.py:77-102)."""

    def __init__(self, sigma_min=0.002, sigma_max=700.0, **_ignored):
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.sigmas = None
        self.timesteps = None

    def set_timesteps(self, n: int):
        import numpy as np

        rho = 7.0
        ramp = np.zeros(1) if n == 1 else np.linspace(0.0, 1.0, n)
        mn, mx = self.sigma_min ** (1 / rho), self.sigma_max ** (1 / rho)
        sig = (mx + ramp * (mn - mx)) ** rho
        self.sigmas = torch.from_numpy(
            np.concatenate([sig, [0.0]]).astype(np.float32)
        )
        self.timesteps = 0.25 * torch.log(self.sigmas[:-1])

    @property
    def init_noise_sigma(self):
        return float((self.sigmas[0] ** 2 + 1.0).sqrt())

    def _index(self, timestep):
        return int(torch.argmin(torch.abs(self.timesteps - timestep)))

    def scale_model_input(self, sample, timestep):
        sigma = self.sigmas[self._index(timestep)]
        return sample / ((sigma ** 2 + 1.0) ** 0.5)

    def step(self, model_output, timestep, sample):
        i = self._index(timestep)
        s, s_next = self.sigmas[i], self.sigmas[i + 1]
        pred_original = model_output * (-s / (s ** 2 + 1.0) ** 0.5) + sample / (
            s ** 2 + 1.0
        )
        derivative = (sample - pred_original) / s
        prev = sample + derivative * (s_next - s)
        return types.SimpleNamespace(prev_sample=prev)


class UNetOracleModule:
    """Callable mimicking ``UNetSpatioTemporalConditionModel``."""

    def __init__(self, cfg: OracleUNetConfig, sd: dict):
        self.cfg = cfg
        self._sd = sd

    @classmethod
    def from_pretrained(cls, model_dir, subfolder=None, torch_dtype=None, **_ignored):
        cfg = OracleUNetConfig.tiny()
        return cls(cfg, make_unet_state_dict(cfg, seed=0))

    def eval(self):
        return self

    def state_dict(self):
        return dict(self._sd)

    def __call__(self, sample, timestep, encoder_hidden_states=None,
                 added_time_ids=None, return_dict=True):
        if not torch.is_tensor(timestep):
            timestep = torch.tensor(float(timestep))
        out = unet_forward(self._sd, self.cfg, sample, timestep,
                           encoder_hidden_states, added_time_ids)
        return (out,) if not return_dict else types.SimpleNamespace(sample=out)


def install_mock_diffusers():
    """Register a fake ``diffusers`` module exposing the oracle classes."""
    mod = types.ModuleType("diffusers")
    mod.UNetSpatioTemporalConditionModel = UNetOracleModule
    mod.EulerDiscreteScheduler = EulerDiscreteSchedulerOracle
    sys.modules["diffusers"] = mod
    return mod


# ------------------------------------------------------------------ #
# VAE mid-block attention (diffusers Attention inside the KL VAE /
# TemporalDecoder mid block: single head, qkv WITH bias, residual add)
# ------------------------------------------------------------------ #
def sd_vae_attention(sd, p, c, gen):
    sd_norm(sd, p + ".group_norm", c, gen)
    sd_attention(sd, p, c, gen, qkv_bias=True)


def vae_attention(sd, p, x, groups, eps=1e-6):
    """x: (N, C, H, W) -> same; spatial self-attention over H*W tokens."""
    n, c, hh, ww = x.shape
    h = gn(sd, p + ".group_norm", x, groups, eps)
    h = h.permute(0, 2, 3, 1).reshape(n, hh * ww, c)
    h = attn(sd, p, h, None, 1)
    return x + h.reshape(n, hh, ww, c).permute(0, 3, 1, 2)


def sd_temporal_tblock(sd, p, c, cross, gen):
    """Standalone TemporalBasicTransformerBlock state dict (the same key
    layout sd_st_transformer emits for its temporal half)."""
    sd_norm(sd, p + ".norm_in", c, gen)
    sd_ff(sd, p + ".ff_in", c, gen)
    sd_norm(sd, p + ".norm1", c, gen)
    sd_attention(sd, p + ".attn1", c, gen)
    sd_norm(sd, p + ".norm2", c, gen)
    sd_attention(sd, p + ".attn2", c, gen, cross=cross)
    sd_norm(sd, p + ".norm3", c, gen)
    sd_ff(sd, p + ".ff", c, gen)
