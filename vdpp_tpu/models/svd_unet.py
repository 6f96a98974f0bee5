"""Spatio-temporal conditioned video UNet (SVD architecture), functional JAX.

First-party re-implementation of the architecture the reference drives
through diffusers' ``UNetSpatioTemporalConditionModel``
(reference: src/models/svd_unet.py:104-164 loads it; the reference repo
contains no model code of its own). Architecture family:

* 8-channel input (4 noisy latent + 4 conditioning-image latent),
  4-channel v-prediction output;
* 4 resolution levels (320/640/1280/1280), 2 layers per block;
* every layer is a SpatioTemporalResBlock (spatial ResNet + temporal
  (3,1,1)-conv ResNet, blended by a learned sigmoid mix factor) and — on
  cross-attention levels — a spatio-temporal transformer (spatial
  self-attention over H*W tokens, CLIP-image cross-attention with a single
  key, temporal self-attention over frames, learned spatial/temporal blend);
* continuous-timestep embedding plus fps/motion/noise-aug "added time ids"
  embedding (256-dim sinusoids -> 768 -> 1280).

TPU-first design choices (vs the torch original):
* channels-last everywhere (NHWC spatial convs, NDHWC temporal convs) —
  the layout XLA tiles onto the MXU;
* bf16 params/activations, fp32 norm statistics and matmul accumulation;
* single-key cross-attention computed without softmax (exact — see
  vdpp_tpu.ops.attention), Pallas flash attention for long spatial
  sequences;
* a fully configurable topology so tests run a tiny 2-level variant with
  the identical code path.

Parameter tree layout mirrors the architecture so the HF-checkpoint
converter (vdpp_tpu.utils.weights) is a mechanical name mapping.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vdpp_tpu.ops.attention import attention, init_attention, temporal_self_attention
from vdpp_tpu.ops.conv import (
    conv2d,
    conv2d_halo,
    conv_temporal,
    conv_temporal_halo,
    init_conv2d,
    init_conv_temporal,
    upsample_nearest_2x,
)
from vdpp_tpu.ops.embeddings import init_timestep_mlp, sinusoidal_embedding, timestep_mlp
from vdpp_tpu.ops.linear import geglu_ff, init_geglu_ff, init_linear, linear
from vdpp_tpu.ops.normalization import (
    group_norm,
    group_norm_silu,
    init_group_norm,
    init_layer_norm,
    layer_norm,
)


@dataclass(frozen=True)
class SVDUNetConfig:
    """Architecture hyper-parameters.

    ``svd_xt()`` reproduces the stable-video-diffusion-img2vid(-xt) UNet
    topology; ``tiny()`` is a structurally identical 2-level model for
    tests and the multi-chip dry run.
    """

    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: int = 1
    num_attention_heads: tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    norm_num_groups: int = 32
    resnet_eps: float = 1e-6
    transformer_eps: float = 1e-6
    out_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    # Route GroupNorm->SiLU pairs through the fused Pallas kernel
    # (ops/norm_kernel.py) where it applies (unsharded statistics only;
    # sharded/odd-shaped sites silently keep the XLA composition).
    # Construction-time flag, NOT an env read inside the traced body
    # (CLAUDE.md trace-time-binding discipline).
    fused_groupnorm: bool = False

    @property
    def num_levels(self) -> int:
        return len(self.block_out_channels)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def seq_min_divisor(self, shards: int) -> int:
        """Under W-halo sequence parallelism the latent width must divide
        by ``shards * 2^(levels-1)`` so every level's LOCAL width stays
        even for the stride-2 downsample grid — the ONE place the formula
        lives (apply() and every CLI validate through it)."""
        return shards * 2 ** (self.num_levels - 1)

    @classmethod
    def svd_xt(cls, dtype=jnp.bfloat16) -> "SVDUNetConfig":
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "SVDUNetConfig":
        return cls(
            block_out_channels=(32, 64),
            num_attention_heads=(2, 4),
            layers_per_block=1,
            cross_attention_dim=48,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=24,
            norm_num_groups=8,
            dtype=dtype,
        )


from vdpp_tpu.models._common import FreshKeys as _Keys  # noqa: E402


# --------------------------------------------------------------------- #
# Spatio-temporal ResNet block
# --------------------------------------------------------------------- #
def _init_spatial_resnet(kg: _Keys, cfg: SVDUNetConfig, in_ch: int, out_ch: int) -> dict:
    p = {
        "norm1": init_group_norm(in_ch, cfg.dtype),
        "conv1": init_conv2d(kg(), in_ch, out_ch, 3, cfg.dtype),
        "time_emb_proj": init_linear(kg(), cfg.time_embed_dim, out_ch, cfg.dtype),
        "norm2": init_group_norm(out_ch, cfg.dtype),
        "conv2": init_conv2d(kg(), out_ch, out_ch, 3, cfg.dtype),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv2d(kg(), in_ch, out_ch, 1, cfg.dtype)
    return p


def _spatial_resnet(
    p: dict, x: jax.Array, emb: jax.Array, cfg: SVDUNetConfig,
    seq_axis: str | None = None, amax_axes: tuple[str, ...] = (),
) -> jax.Array:
    """x: (BF, H, W, C), emb: (BF, time_embed_dim).

    ``seq_axis``: W is sharded over this mesh axis (sequence parallelism):
    3x3 convs exchange halos, GroupNorm statistics psum across shards;
    the 1x1 shortcut stays local. ``amax_axes``: every mesh axis sharding
    x's elements (seq AND frame), so W8A8 activation scales stay
    mesh-global (ops/conv.py docstrings).
    """
    c3 = (
        (lambda h, pp: conv2d_halo(h, pp, seq_axis, amax_axes=amax_axes))
        if seq_axis else
        (lambda h, pp: conv2d(h, pp, amax_axes=amax_axes))
    )
    h = group_norm_silu(x, p["norm1"], cfg.norm_num_groups, cfg.resnet_eps,
                        psum_axis=seq_axis, fused=cfg.fused_groupnorm)
    h = c3(h, p["conv1"])
    temb = linear(jax.nn.silu(emb.astype(jnp.float32)).astype(emb.dtype), p["time_emb_proj"])
    h = h + temb[:, None, None, :]
    h = group_norm_silu(h, p["norm2"], cfg.norm_num_groups, cfg.resnet_eps,
                        psum_axis=seq_axis, fused=cfg.fused_groupnorm)
    h = c3(h, p["conv2"])
    shortcut = (
        conv2d(x, p["conv_shortcut"], amax_axes=amax_axes)
        if "conv_shortcut" in p else x
    )
    return shortcut + h


def _init_temporal_resnet(kg: _Keys, cfg: SVDUNetConfig, ch: int) -> dict:
    return {
        "norm1": init_group_norm(ch, cfg.dtype),
        "conv1": init_conv_temporal(kg(), ch, ch, 3, cfg.dtype),
        "time_emb_proj": init_linear(kg(), cfg.time_embed_dim, ch, cfg.dtype),
        "norm2": init_group_norm(ch, cfg.dtype),
        "conv2": init_conv_temporal(kg(), ch, ch, 3, cfg.dtype),
    }


def _temporal_resnet(
    p: dict, x: jax.Array, emb_bf: jax.Array, cfg: SVDUNetConfig,
    seq_axis: str | None = None, frame_axis: str | None = None,
) -> jax.Array:
    """x: (B, F, H, W, C), emb_bf: (B, F, time_embed_dim). The (k,1,1)
    temporal convs touch no spatial neighborhood, so under W-sharding only
    the GroupNorm statistics need the cross-shard psum; under
    frame-sharding (``frame_axis``) the temporal convs additionally
    halo-exchange one edge frame per neighbor, and the GroupNorm
    statistics — which span the frame axis — pmean over it."""
    axes = tuple(a for a in (seq_axis, frame_axis) if a is not None)
    psum = axes if axes else None
    ct = (
        (lambda h, pp: conv_temporal_halo(h, pp, frame_axis))
        if frame_axis is not None else conv_temporal
    )
    h = group_norm_silu(x, p["norm1"], cfg.norm_num_groups, cfg.resnet_eps,
                        psum_axis=psum, fused=cfg.fused_groupnorm)
    h = ct(h, p["conv1"])
    temb = linear(
        jax.nn.silu(emb_bf.astype(jnp.float32)).astype(emb_bf.dtype), p["time_emb_proj"]
    )
    h = h + temb[:, :, None, None, :]
    h = group_norm_silu(h, p["norm2"], cfg.norm_num_groups, cfg.resnet_eps,
                        psum_axis=psum, fused=cfg.fused_groupnorm)
    h = ct(h, p["conv2"])
    return x + h


def _init_st_resblock(kg: _Keys, cfg: SVDUNetConfig, in_ch: int, out_ch: int) -> dict:
    return {
        "spatial": _init_spatial_resnet(kg, cfg, in_ch, out_ch),
        "temporal": _init_temporal_resnet(kg, cfg, out_ch),
        # Learned spatial/temporal blend, alpha = sigmoid(mix_factor)
        # weighting the SPATIAL path (AlphaBlender "learned_with_images",
        # switch_spatial_to_temporal_mix=False — the UNet convention; the
        # VAE TemporalDecoder is the switched one). Init 0.5 pre-sigmoid
        # matches the family convention. Golden-tested against a torch
        # oracle in tests/test_torch_block_parity.py.
        "mix_factor": jnp.asarray(0.5, cfg.dtype),
    }


def _st_resblock(
    p: dict, x: jax.Array, emb: jax.Array, cfg: SVDUNetConfig, batch: int,
    frames: int, seq_axis: str | None = None, frame_axis: str | None = None,
) -> jax.Array:
    """x: (B*F, H, W, C) -> same; blends spatial and temporal residual
    paths. ``frames`` is the LOCAL frame count under ``frame_axis``."""
    import os as _os

    bf, hh, ww, _ = x.shape
    amax_axes = tuple(a for a in (seq_axis, frame_axis) if a is not None)
    h_spatial = _spatial_resnet(p["spatial"], x, emb, cfg, seq_axis=seq_axis,
                                amax_axes=amax_axes)
    if _os.environ.get("VDPP_ABLATE_TEMPORAL_RESNET") == "1":  # profiling only
        return h_spatial
    c = h_spatial.shape[-1]
    hs = h_spatial.reshape(batch, frames, hh, ww, c)
    emb_bf = emb.reshape(batch, frames, -1)
    ht = _temporal_resnet(p["temporal"], hs, emb_bf, cfg, seq_axis=seq_axis,
                          frame_axis=frame_axis)
    alpha = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32)).astype(x.dtype)
    out = alpha * hs + (1.0 - alpha) * ht
    return out.reshape(bf, hh, ww, c)


# --------------------------------------------------------------------- #
# Spatio-temporal transformer
# --------------------------------------------------------------------- #
def _init_spatial_tblock(kg: _Keys, cfg: SVDUNetConfig, dim: int) -> dict:
    return {
        "norm1": init_layer_norm(dim, cfg.dtype),
        "attn1": init_attention(kg(), dim, 1, dtype=cfg.dtype),  # heads passed at call
        "norm2": init_layer_norm(dim, cfg.dtype),
        "attn2": init_attention(kg(), dim, 1, cross_dim=cfg.cross_attention_dim, dtype=cfg.dtype),
        "norm3": init_layer_norm(dim, cfg.dtype),
        "ff": init_geglu_ff(kg(), dim, dtype=cfg.dtype),
    }


def _spatial_tblock(
    p: dict, h: jax.Array, ctx: jax.Array, heads: int,
    seq_axis: str | None = None,
) -> jax.Array:
    """BasicTransformerBlock: self-attn + single-key cross-attn + GEGLU FF.

    h: (BF, L, C), ctx: (BF, 1, cross_dim). Under sequence parallelism L
    is the local token shard: self-attention all_gathers K/V over
    ``seq_axis`` (exact — softmax is invariant to key order), the
    single-key cross-attention and FF are token-local.
    """
    h = h + attention(layer_norm(h, p["norm1"]), p["attn1"], heads,
                      seq_axis=seq_axis)
    h = h + attention(layer_norm(h, p["norm2"]), p["attn2"], heads, context=ctx)
    h = h + geglu_ff(layer_norm(h, p["norm3"]), p["ff"])
    return h


def _init_temporal_tblock(kg: _Keys, cfg: SVDUNetConfig, dim: int) -> dict:
    return {
        "norm_in": init_layer_norm(dim, cfg.dtype),
        "ff_in": init_geglu_ff(kg(), dim, dtype=cfg.dtype),
        "norm1": init_layer_norm(dim, cfg.dtype),
        "attn1": init_attention(kg(), dim, 1, dtype=cfg.dtype),
        "norm2": init_layer_norm(dim, cfg.dtype),
        "attn2": init_attention(kg(), dim, 1, cross_dim=cfg.cross_attention_dim, dtype=cfg.dtype),
        "norm3": init_layer_norm(dim, cfg.dtype),
        "ff": init_geglu_ff(kg(), dim, dtype=cfg.dtype),
    }


def _temporal_tblock(
    p: dict,
    h: jax.Array,
    time_ctx_b: jax.Array,
    heads: int,
    batch: int,
    frames: int,
    frame_axis: str | None = None,
) -> jax.Array:
    """Temporal transformer block: attention tokens are frames.

    h: (B*F, L, C) — kept in this layout throughout; norms/FFs are
    positionwise (they commute with the frame/location transpose the
    torch original performs), self-attention contracts the frame axis in
    place, and the single-key cross-attention is a broadcast.
    time_ctx_b: (B, 1, cross_dim). ``frames`` is the LOCAL frame count
    under ``frame_axis`` (the attention all_gathers K/V over the axis).
    """
    bf, l, c = h.shape
    residual = h
    h = geglu_ff(layer_norm(h, p["norm_in"]), p["ff_in"]) + residual
    h = h + temporal_self_attention(p["attn1"], layer_norm(h, p["norm1"]),
                                    heads, batch, frames,
                                    frame_axis=frame_axis)
    # Single-key cross-attention == broadcast of to_out(to_v(ctx)) plus
    # residual (softmax over one key is 1, and the output is independent
    # of the queries — norm2 is mathematically dead here; its parameters
    # are kept for checkpoint compatibility).
    v = linear(time_ctx_b, p["attn2"]["to_v"])  # (B, 1, C)
    cross = linear(v, p["attn2"]["to_out"])
    h = h + jnp.repeat(cross, frames, axis=0)  # (B*F, 1, C) broadcast over L
    h = h + geglu_ff(layer_norm(h, p["norm3"]), p["ff"])
    return h


def _init_st_transformer(kg: _Keys, cfg: SVDUNetConfig, dim: int) -> dict:
    n = cfg.transformer_layers_per_block
    return {
        "norm": init_group_norm(dim, cfg.dtype),
        "proj_in": init_linear(kg(), dim, dim, cfg.dtype),
        "time_pos_embed": init_timestep_mlp(kg(), dim, dim * 4, dim, cfg.dtype),
        "blocks": [_init_spatial_tblock(kg, cfg, dim) for _ in range(n)],
        "temporal_blocks": [_init_temporal_tblock(kg, cfg, dim) for _ in range(n)],
        "mix_factor": jnp.asarray(0.5, cfg.dtype),
        "proj_out": init_linear(kg(), dim, dim, cfg.dtype),
    }


def _st_transformer(
    p: dict,
    x: jax.Array,
    ctx: jax.Array,
    cfg: SVDUNetConfig,
    heads: int,
    batch: int,
    frames: int,
    seq_axis: str | None = None,
    frame_axis: str | None = None,
    frame_offset: jax.Array | int = 0,
) -> jax.Array:
    """x: (B*F, H, W, C); ctx: (B*F, 1, cross_dim). Under ``frame_axis``
    sharding, ``frames`` is local and ``frame_offset`` is the shard's
    global first-frame index (the position embedding must be global)."""
    bf, hh, ww, c = x.shape
    residual = x
    # GroupNorm statistics here are per-(batch, frame) row — frame-local —
    # so only the W-shard axis (if any) needs the cross-shard reduction.
    h = group_norm(x, p["norm"], cfg.norm_num_groups, cfg.transformer_eps,
                   psum_axis=seq_axis)
    h = h.reshape(bf, hh * ww, c)
    h = linear(h, p["proj_in"])

    # Frame-position embedding added before the temporal block.
    frame_idx = jnp.tile(jnp.arange(frames, dtype=jnp.float32), batch) + frame_offset
    f_emb = sinusoidal_embedding(frame_idx, c).astype(x.dtype)
    f_emb = timestep_mlp(f_emb, p["time_pos_embed"])[:, None, :]  # (BF, 1, C)

    # Temporal cross-attention context: first-frame CLIP embedding per
    # batch element, shared by every spatial location (passed per batch;
    # the single-key attention broadcast happens inside the block).
    time_ctx = ctx.reshape(batch, frames, *ctx.shape[1:])[:, 0]  # (B, 1, D)

    import os as _os

    ablate_temporal = _os.environ.get("VDPP_ABLATE_TEMPORAL") == "1"  # profiling only
    alpha = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32)).astype(x.dtype)
    for sp, tp in zip(p["blocks"], p["temporal_blocks"]):
        h = _spatial_tblock(sp, h, ctx, heads, seq_axis=seq_axis)
        if not ablate_temporal:
            h_mix = h + f_emb
            h_mix = _temporal_tblock(tp, h_mix, time_ctx, heads, batch, frames,
                                     frame_axis=frame_axis)
            # AlphaBlender(merge_strategy="learned_with_images", NO switch):
            # alpha = sigmoid(mix_factor) weights the SPATIAL path. Anchor:
            # "learned_with_images" forces alpha=1 for image-only samples,
            # which must select the pure spatial path — so alpha multiplies
            # spatial. The switched direction belongs to the VAE
            # TemporalDecoder blocks only (see models/vae.py). Golden-tested
            # against a torch oracle in tests/test_torch_block_parity.py.
            h = alpha * h + (1.0 - alpha) * h_mix

    h = linear(h, p["proj_out"])
    return h.reshape(bf, hh, ww, c) + residual


# --------------------------------------------------------------------- #
# UNet
# --------------------------------------------------------------------- #
class SVDUNet:
    """init/apply wrapper around the functional blocks."""

    def __init__(self, config: SVDUNetConfig):
        self.config = config

    # ---------------------------- init ------------------------------- #
    def init(self, key: jax.Array) -> dict:
        cfg = self.config
        kg = _Keys(key)
        boc = cfg.block_out_channels
        n_levels = cfg.num_levels
        params: dict = {
            "conv_in": init_conv2d(kg(), cfg.in_channels, boc[0], 3, cfg.dtype),
            "time_embedding": init_timestep_mlp(
                kg(), boc[0], cfg.time_embed_dim, dtype=cfg.dtype
            ),
            "add_embedding": init_timestep_mlp(
                kg(),
                cfg.projection_class_embeddings_input_dim,
                cfg.time_embed_dim,
                dtype=cfg.dtype,
            ),
        }

        down_blocks = []
        out_ch = boc[0]
        for i in range(n_levels):
            in_ch, out_ch = out_ch, boc[i]
            is_final = i == n_levels - 1
            block: dict = {"resnets": [], "attentions": []}
            for j in range(cfg.layers_per_block):
                block["resnets"].append(
                    _init_st_resblock(kg, cfg, in_ch if j == 0 else out_ch, out_ch)
                )
                if not is_final:
                    block["attentions"].append(
                        _init_st_transformer(kg, cfg, out_ch)
                    )
            if not is_final:
                block["downsample"] = init_conv2d(kg(), out_ch, out_ch, 3, cfg.dtype)
            down_blocks.append(block)
        params["down_blocks"] = down_blocks

        mid_ch = boc[-1]
        params["mid_block"] = {
            "resnets": [
                _init_st_resblock(kg, cfg, mid_ch, mid_ch),
                _init_st_resblock(kg, cfg, mid_ch, mid_ch),
            ],
            "attentions": [_init_st_transformer(kg, cfg, mid_ch)],
        }

        up_blocks = []
        rev = list(reversed(boc))
        prev_out = rev[0]
        for i in range(n_levels):
            out_ch_up = rev[i]
            skip_ch = rev[min(i + 1, n_levels - 1)]
            is_first = i == 0
            is_final = i == n_levels - 1
            block = {"resnets": [], "attentions": []}
            for j in range(cfg.layers_per_block + 1):
                res_skip = skip_ch if j == cfg.layers_per_block else out_ch_up
                res_in = prev_out if j == 0 else out_ch_up
                block["resnets"].append(
                    _init_st_resblock(kg, cfg, res_in + res_skip, out_ch_up)
                )
                if not is_first:
                    block["attentions"].append(
                        _init_st_transformer(kg, cfg, out_ch_up)
                    )
            if not is_final:
                block["upsample"] = init_conv2d(kg(), out_ch_up, out_ch_up, 3, cfg.dtype)
            up_blocks.append(block)
            prev_out = out_ch_up
        params["up_blocks"] = up_blocks

        params["conv_norm_out"] = init_group_norm(boc[0], cfg.dtype)
        params["conv_out"] = init_conv2d(kg(), boc[0], cfg.out_channels, 3, cfg.dtype)
        return params

    # ------------- shared forward-pass building blocks --------------- #
    # ``apply`` (the general sharded path) and ``apply_cached`` (the
    # lax.cond deepcache path) must stay op-for-op identical wherever
    # they overlap. These helpers ARE the overlap: the deepcache full
    # branch is built from the same bodies as ``apply``, so a future
    # change to the forward pass cannot silently desync the two.
    def _time_embeddings(self, params, timestep, added_time_ids, b):
        """fp32 sinusoids -> model-dtype MLPs -> summed (B, TE) embedding."""
        cfg = self.config
        t = jnp.broadcast_to(
            jnp.atleast_1d(jnp.asarray(timestep, jnp.float32)), (b,)
        )
        t_emb = sinusoidal_embedding(t, cfg.block_out_channels[0]).astype(cfg.dtype)
        emb = timestep_mlp(t_emb, params["time_embedding"])  # (B, TE)
        add_flat = added_time_ids.astype(jnp.float32).reshape(-1)
        add_emb = sinusoidal_embedding(add_flat, cfg.addition_time_embed_dim)
        add_emb = add_emb.reshape(b, -1).astype(cfg.dtype)
        return emb + timestep_mlp(add_emb, params["add_embedding"])

    def _down_path(self, params, x, emb_f, ctx_f, b, f, *, n_levels_to_run=None,
                   run_last_downsample=True, seq_axis=None, frame_axis=None,
                   frame_offset=0, c3=conv2d):
        """Down levels ``0..n-1`` on a post-``conv_in`` tensor.

        ``run_last_downsample=False`` skips level ``n-1``'s downsample
        conv (deepcache shallow path: its output skip would feed an up
        block the shallow path never reaches). Returns ``(x, res_stack)``
        with the entry tensor as the stack's first element.
        """
        cfg = self.config
        heads = cfg.num_attention_heads
        n_levels = cfg.num_levels
        n = n_levels if n_levels_to_run is None else n_levels_to_run
        res_stack = [x]
        for i in range(n):
            block = params["down_blocks"][i]
            has_attn = i < n_levels - 1
            for j, res_p in enumerate(block["resnets"]):
                x = _st_resblock(res_p, x, emb_f, cfg, b, f, seq_axis=seq_axis,
                                 frame_axis=frame_axis)
                if has_attn:
                    x = _st_transformer(
                        block["attentions"][j], x, ctx_f, cfg, heads[i], b, f,
                        seq_axis=seq_axis, frame_axis=frame_axis,
                        frame_offset=frame_offset,
                    )
                res_stack.append(x)
            if "downsample" in block and (i < n - 1 or run_last_downsample):
                x = c3(x, block["downsample"], stride=2, padding=((1, 1), (1, 1)))
                res_stack.append(x)
        return x, res_stack

    def _mid(self, params, x, emb_f, ctx_f, b, f, *, seq_axis=None,
             frame_axis=None, frame_offset=0):
        cfg = self.config
        mid = params["mid_block"]
        x = _st_resblock(mid["resnets"][0], x, emb_f, cfg, b, f,
                         seq_axis=seq_axis, frame_axis=frame_axis)
        x = _st_transformer(mid["attentions"][0], x, ctx_f, cfg,
                            cfg.num_attention_heads[-1], b, f,
                            seq_axis=seq_axis, frame_axis=frame_axis,
                            frame_offset=frame_offset)
        return _st_resblock(mid["resnets"][1], x, emb_f, cfg, b, f,
                            seq_axis=seq_axis, frame_axis=frame_axis)

    def _up_path(self, params, x, res_stack, emb_f, ctx_f, b, f, *, start=0,
                 stop=None, seq_axis=None, frame_axis=None, frame_offset=0,
                 c3=conv2d):
        """Up blocks ``start..stop-1``, popping skips from ``res_stack``
        (mutates the list, so a split caller can continue where the deep
        half stopped)."""
        cfg = self.config
        rev_heads = list(reversed(cfg.num_attention_heads))
        stop = cfg.num_levels if stop is None else stop
        for i in range(start, stop):
            block = params["up_blocks"][i]
            has_attn = i > 0
            for j, res_p in enumerate(block["resnets"]):
                skip = res_stack.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = _st_resblock(res_p, x, emb_f, cfg, b, f, seq_axis=seq_axis,
                                 frame_axis=frame_axis)
                if has_attn:
                    x = _st_transformer(
                        block["attentions"][j], x, ctx_f, cfg, rev_heads[i],
                        b, f, seq_axis=seq_axis, frame_axis=frame_axis,
                        frame_offset=frame_offset,
                    )
            if "upsample" in block:
                x = upsample_nearest_2x(x)
                x = c3(x, block["upsample"])
        return x

    def _head(self, params, x, *, seq_axis=None, c3=conv2d):
        cfg = self.config
        x = group_norm_silu(x, params["conv_norm_out"], cfg.norm_num_groups,
                            cfg.out_norm_eps, psum_axis=seq_axis,
                            fused=cfg.fused_groupnorm)
        return c3(x, params["conv_out"])

    # ---------------------------- apply ------------------------------ #
    def apply(
        self,
        params: dict,
        sample: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        added_time_ids: jax.Array,
        seq_axis: str | None = None,
        seq_shards: int = 1,
        frame_axis: str | None = None,
        frame_shards: int = 1,
    ) -> jax.Array:
        """Denoise one step.

        Args:
            sample: (B, F, H, W, C_in) channels-last latent (+image-latent concat).
            timestep: scalar or (B,) continuous timestep (0.25*ln(sigma)).
            encoder_hidden_states: (B, 1, cross_attention_dim) CLIP image embedding.
            added_time_ids: (B, 3) [fps-1, motion_bucket_id, noise_aug_strength].
            seq_axis/seq_shards: halo-exchange sequence parallelism — must
                run inside a ``shard_map`` carrying mesh axis ``seq_axis``
                of size ``seq_shards``. The latent enters replicated; the
                W axis is sharded right after entry, every 3x3 conv
                exchanges a 1-column halo (``conv2d_halo``), GroupNorm
                statistics psum across shards, spatial self-attention
                all_gathers K/V, and the finished shard is gathered once
                at the end. Elementwise-equal to the unsharded forward —
                this extends single-sample latency scaling to the model
                family the reference's design explicitly cannot split
                intra-frame (reference: docs/context.md:20-26).
            frame_axis/frame_shards: frame parallelism — the FRAME axis
                sharded over mesh axis ``frame_axis`` (inside the same
                ``shard_map``). Spatial convs/attention/norms are
                frame-local (zero communication); temporal convs
                halo-exchange one edge frame, temporal attention
                all_gathers K/V over frames, temporal-norm statistics
                pmean. Composes with ``seq_axis`` (and the stage/cfg
                axes): the two intra-sample axes the reference's
                step-only design cannot express.

        Returns:
            (B, F, H, W, C_out) v-prediction (replicated under
            seq_axis/frame_axis).
        """
        cfg = self.config
        b, f, hh, ww, _ = sample.shape
        if seq_axis is not None:
            # every level's LOCAL width must stay even for the stride-2
            # downsample grid to align across shards
            min_div = cfg.seq_min_divisor(seq_shards)
            if ww % min_div != 0:
                raise ValueError(
                    f"latent width {ww} not divisible by seq_shards x "
                    f"2^(levels-1) = {min_div}"
                )
        if frame_axis is not None and f % frame_shards != 0:
            raise ValueError(
                f"frame count {f} not divisible by frame_shards {frame_shards}"
            )
        if cfg.fused_groupnorm and (seq_axis is not None or frame_axis is not None):
            # Sharded-statistics sites fall back to the two-pass psum
            # composition while the unsharded program takes the Welford
            # kernel, so the two programs would no longer be elementwise
            # equal (the design invariant every seq/frame test asserts).
            # Reject loudly instead of diverging silently — same policy as
            # w8a8 x sharding before mesh-global amax landed (ADVICE r3).
            raise ValueError(
                "fused_groupnorm is incompatible with seq/frame sharding: "
                "construct the UNet with fused_groupnorm=False (or unset "
                "VDPP_GN_FUSED) for intra-sample-parallel runs"
            )
        amax_axes = tuple(a for a in (seq_axis, frame_axis) if a is not None)
        c3 = (
            # halo form supplies its own W handling; `padding` (always the
            # 3x3-SAME shape at these sites) is subsumed by the halo
            (lambda h, pp, stride=1, **_: conv2d_halo(
                h, pp, seq_axis, stride=stride, amax_axes=amax_axes))
            if seq_axis is not None else
            (lambda h, pp, **kw: conv2d(h, pp, amax_axes=amax_axes, **kw))
        )

        emb = self._time_embeddings(params, timestep, added_time_ids, b)

        xs = sample.astype(cfg.dtype)
        frame_offset: jax.Array | int = 0
        if frame_axis is not None:
            # shard contiguous frame blocks; f becomes the LOCAL count for
            # the whole body (temporal ops handle the cross-shard edges)
            f = f // frame_shards
            fidx = jax.lax.axis_index(frame_axis)
            frame_offset = fidx * f
            xs = jax.lax.dynamic_slice_in_dim(xs, frame_offset, f, axis=1)

        emb_f = jnp.repeat(emb, f, axis=0)  # (B*F, TE)
        ctx_f = jnp.repeat(
            encoder_hidden_states.astype(cfg.dtype), f, axis=0
        )  # (B*F, 1, D)

        x = xs.reshape(b * f, hh, ww, sample.shape[-1])
        if seq_axis is not None:
            wl = ww // seq_shards
            idx = jax.lax.axis_index(seq_axis)
            x = jax.lax.dynamic_slice_in_dim(x, idx * wl, wl, axis=2)
        x = c3(x, params["conv_in"])

        sharding = dict(seq_axis=seq_axis, frame_axis=frame_axis,
                        frame_offset=frame_offset)
        x, res_stack = self._down_path(params, x, emb_f, ctx_f, b, f,
                                       c3=c3, **sharding)
        x = self._mid(params, x, emb_f, ctx_f, b, f, **sharding)
        x = self._up_path(params, x, res_stack, emb_f, ctx_f, b, f,
                          c3=c3, **sharding)
        x = self._head(params, x, seq_axis=seq_axis, c3=c3)
        if seq_axis is not None:
            x = jax.lax.all_gather(x, seq_axis, axis=2, tiled=True)
        x = x.reshape(b, f, hh, ww, cfg.out_channels)  # f = local frames
        if frame_axis is not None:
            x = jax.lax.all_gather(x, frame_axis, axis=1, tiled=True)
        return x

    # ------------------- cached (DeepCache-style) apply ---------------- #
    def cache_feature_shape(
        self, batch: int, frames: int, height: int, width: int, split: int
    ) -> tuple[int, ...]:
        """Natural shape of the deep-feature cache for ``split`` shallow
        levels: the tensor entering up block ``n_levels - split`` — i.e.
        the output of the up path's deep half, at resolution
        ``H/2^(split-1)`` with ``block_out_channels[split]`` channels."""
        cfg = self.config
        if not 1 <= split <= cfg.num_levels - 1:
            raise ValueError(
                f"deepcache split must be in [1, {cfg.num_levels - 1}], "
                f"got {split}"
            )
        r = 2 ** (split - 1)
        return (batch, frames, height // r, width // r,
                cfg.block_out_channels[split])

    def apply_cached(
        self,
        params: dict,
        sample: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        added_time_ids: jax.Array,
        cache: jax.Array,
        use_full: jax.Array,
        split: int = 1,
        seq_axis: str | None = None,
        seq_shards: int = 1,
        frame_axis: str | None = None,
        frame_shards: int = 1,
    ) -> tuple[jax.Array, jax.Array]:
        """Denoise one step with a deep-feature cache (DeepCache-style
        cached inference: Ma et al. 2023, "DeepCache: Accelerating
        Diffusion Models for Free").

        Exploits the temporal redundancy of the denoising trajectory: the
        UNet's DEEP features change slowly across adjacent steps while the
        shallow (high-resolution) features carry the step-to-step detail.
        On a *full* step (``use_full`` true) the complete UNet runs and the
        tensor entering up block ``n_levels - split`` is captured as the
        cache; on a *cache* step only the shallow ``split`` down levels and
        the last ``split`` up blocks run, splicing the cached deep feature
        in — skipping the deep down levels, the mid block, and the deep up
        blocks entirely.

        TPU-native shape: ``use_full`` is a TRACED bool and the two
        variants are the branches of one ``jax.lax.cond`` — both compile
        once inside the pipeline's ``lax.scan`` step body and the runtime
        executes only the selected branch, so cache steps really do save
        the deep compute (no masked-out dead work). Cross-step state
        threads through the pipeline payload exactly like dpmpp2m's
        multistep state (svd_wrapper pack/unpack).

        ``seq_axis``/``frame_axis`` compose the cache step with the
        intra-sample parallel axes exactly like :meth:`apply`: the sample
        AND the cache enter replicated over the axis, each shard slices
        its local W (seq) / frame block — the cache's spatial grid shards
        like the latent's, at ``W/2^(split-1)`` granularity, which the
        ``seq_min_divisor`` width check already guarantees is shard-exact
        — and both the v-prediction and the refreshed cache are
        all_gathered back to replicated at the end. The gathers sit
        OUTSIDE the ``lax.cond`` so the full/shallow branch choice never
        wraps a collective the other branch lacks at the same point.
        CFG parallelism is handled one level up (the wrapper exchanges
        per-branch caches with the blended eps in one ppermute pair).
        The ``use_full`` branch is elementwise-identical to :meth:`apply`
        (pinned in tests/test_deepcache.py, incl. the sharded variants).

        Args:
            cache: ``cache_feature_shape(...)``-shaped deep feature from
                the most recent full step (don't-care on full steps).
            use_full: traced scalar bool — run the full UNet and refresh
                the cache, vs reuse it on the shallow path.
            split: number of shallow down levels (and up blocks) the cache
                step still computes; 1 = cheapest (only the top level).

        Returns:
            ``(v_prediction (B,F,H,W,C_out), new_cache)`` — both
            replicated under ``seq_axis``/``frame_axis``.
        """
        cfg = self.config
        n_levels = cfg.num_levels
        b, f, hh, ww, _ = sample.shape
        want = self.cache_feature_shape(b, f, hh, ww, split)
        if tuple(cache.shape) != want:
            raise ValueError(f"cache shape {cache.shape} != expected {want}")
        u_start = n_levels - split  # first up block the shallow path runs
        r = 2 ** (split - 1)

        # Same sharding preconditions as apply().
        if seq_axis is not None:
            min_div = cfg.seq_min_divisor(seq_shards)
            if ww % min_div != 0:
                raise ValueError(
                    f"latent width {ww} not divisible by seq_shards x "
                    f"2^(levels-1) = {min_div}"
                )
        if frame_axis is not None and f % frame_shards != 0:
            raise ValueError(
                f"frame count {f} not divisible by frame_shards {frame_shards}"
            )
        if cfg.fused_groupnorm and (seq_axis is not None or frame_axis is not None):
            raise ValueError(
                "fused_groupnorm is incompatible with seq/frame sharding: "
                "construct the UNet with fused_groupnorm=False (or unset "
                "VDPP_GN_FUSED) for intra-sample-parallel runs"
            )
        amax_axes = tuple(a for a in (seq_axis, frame_axis) if a is not None)
        c3 = (
            (lambda h, pp, stride=1, **_: conv2d_halo(
                h, pp, seq_axis, stride=stride, amax_axes=amax_axes))
            if seq_axis is not None else
            (lambda h, pp, **kw: conv2d(h, pp, amax_axes=amax_axes, **kw))
        )

        emb = self._time_embeddings(params, timestep, added_time_ids, b)

        xs = sample.astype(cfg.dtype)
        cache_l = cache.astype(cfg.dtype)
        frame_offset: jax.Array | int = 0
        if frame_axis is not None:
            f = f // frame_shards
            fidx = jax.lax.axis_index(frame_axis)
            frame_offset = fidx * f
            xs = jax.lax.dynamic_slice_in_dim(xs, frame_offset, f, axis=1)
            cache_l = jax.lax.dynamic_slice_in_dim(cache_l, frame_offset, f, axis=1)

        emb_f = jnp.repeat(emb, f, axis=0)
        ctx_f = jnp.repeat(encoder_hidden_states.astype(cfg.dtype), f, axis=0)

        x_in = xs.reshape(b * f, hh, ww, xs.shape[-1])
        ww_loc = ww
        if seq_axis is not None:
            ww_loc = ww // seq_shards
            sidx = jax.lax.axis_index(seq_axis)
            x_in = jax.lax.dynamic_slice_in_dim(x_in, sidx * ww_loc, ww_loc, axis=2)
            cache_l = jax.lax.dynamic_slice_in_dim(
                cache_l, sidx * (ww_loc // r), ww_loc // r, axis=3
            )
        want_local = (b, f, hh // r, ww_loc // r, cfg.block_out_channels[split])

        sharding = dict(seq_axis=seq_axis, frame_axis=frame_axis,
                        frame_offset=frame_offset)

        # Both branches are assembled from the SAME _down_path/_mid/
        # _up_path/_head bodies apply() runs, so the full branch tracks
        # apply() by construction (sharded or not).
        def head(x):
            x = self._head(params, x, seq_axis=seq_axis, c3=c3)
            return x.reshape(b, f, hh, ww_loc, cfg.out_channels)

        def full_branch(operand):
            x, _unused_cache = operand
            x = c3(x, params["conv_in"])
            x, res_stack = self._down_path(params, x, emb_f, ctx_f, b, f,
                                           c3=c3, **sharding)
            x = self._mid(params, x, emb_f, ctx_f, b, f, **sharding)
            x = self._up_path(params, x, res_stack, emb_f, ctx_f, b, f,
                              start=0, stop=u_start, c3=c3, **sharding)
            new_cache = x.reshape(want_local).astype(cfg.dtype)
            x = self._up_path(params, x, res_stack, emb_f, ctx_f, b, f,
                              start=u_start, stop=n_levels, c3=c3, **sharding)
            return head(x), new_cache

        def shallow_branch(operand):
            x, cached = operand
            # The shallow down output feeds only the skip stack; the last
            # level's downsample is skipped (its skip would feed an up
            # block the shallow path never reaches).
            x = c3(x, params["conv_in"])
            _, res_stack = self._down_path(
                params, x, emb_f, ctx_f, b, f,
                n_levels_to_run=split, run_last_downsample=False,
                c3=c3, **sharding,
            )
            deep = cached.reshape(b * f, *want_local[2:])
            x = self._up_path(params, deep, res_stack, emb_f, ctx_f, b, f,
                              start=u_start, stop=n_levels, c3=c3, **sharding)
            return head(x), cached

        out, new_cache = jax.lax.cond(
            use_full, full_branch, shallow_branch, (x_in, cache_l)
        )
        # Back to replicated: the payload lanes (like the latent) ride the
        # pipeline replicated over the intra-sample axes.
        if seq_axis is not None:
            out = jax.lax.all_gather(out, seq_axis, axis=3, tiled=True)
            new_cache = jax.lax.all_gather(new_cache, seq_axis, axis=3, tiled=True)
        if frame_axis is not None:
            out = jax.lax.all_gather(out, frame_axis, axis=1, tiled=True)
            new_cache = jax.lax.all_gather(new_cache, frame_axis, axis=1, tiled=True)
        return out, new_cache
