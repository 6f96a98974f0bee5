"""Latte/CogVideoX-style video Diffusion Transformer (DiT), functional JAX.

The driver baseline lists "DiT-based video diffusion (CogVideoX/
Latte-style) under the same step-pipeline scheduler" as a target config —
the pipeline layer is model-agnostic (the reference enforces this with
its ``forward(latent, step)`` contract, reference: src/pipeline/
pipeline.py:95), and this model family proves it.

Architecture (Latte variant-1 style, TPU-first):
* 2x2 spatial patchify of the (B, F, H, W, C) latent -> per-frame tokens;
* factorized attention: blocks alternate SPATIAL (tokens within a frame)
  and TEMPORAL (same patch across frames) self-attention — the factorized
  form keeps sequence lengths MXU-friendly vs full 3-D attention;
* OR ``attention_mode="joint3d"`` (CogVideoX-style): every block attends
  over the full F*N spatio-temporal token set jointly — quadratic in
  frames*patches, served by the Pallas flash kernel at long L;
* adaLN-Zero timestep conditioning (shift/scale/gate per block, zero-init
  gates) + optional cross-attention on conditioning tokens (CLIP image /
  text embeddings);
* sinusoidal spatial + temporal position embeddings;
* final adaLN + linear head, unpatchify back to the latent.

Exposes the same ``step_fn(params_bundle, latent, step)`` contract as the
SVD wrapper, so StepPipeline / DataParallelRunner / FSDPRunner run it
unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vdpp_tpu.diffusion.scheduler import (
    EulerKarrasSchedule,
    FlowMatchSchedule,
    dpmpp2m_step_v_prediction,
    euler_ancestral_step_v_prediction,
    euler_step_v_prediction,
    flowmatch_step,
    heun_step_v_prediction,
)
from vdpp_tpu.ops.attention import attention, init_attention, temporal_self_attention
from vdpp_tpu.ops.embeddings import init_timestep_mlp, sinusoidal_embedding, timestep_mlp
from vdpp_tpu.ops.linear import init_linear, linear
from vdpp_tpu.ops.normalization import init_layer_norm, layer_norm


@dataclass(frozen=True)
class DiTVideoConfig:
    in_channels: int = 4
    out_channels: int = 4
    patch_size: int = 2
    hidden_size: int = 1152
    depth: int = 28               # alternating spatial/temporal blocks
    num_heads: int = 16
    mlp_ratio: float = 4.0
    cross_attention_dim: int | None = 1024
    attention_mode: str = "factorized"  # "factorized" | "joint3d"
    num_experts: int = 0          # >0: MoE feed-forward (ops/moe.py)
    moe_every: int = 2            # MoE in every moe_every-th eligible block
    dtype: jnp.dtype = jnp.bfloat16

    def __post_init__(self):
        if self.attention_mode not in ("factorized", "joint3d"):
            raise ValueError(f"unknown attention_mode {self.attention_mode!r}")
        if self.num_experts < 0 or (self.num_experts and self.moe_every < 1):
            raise ValueError("num_experts must be >= 0, moe_every >= 1")

    @classmethod
    def latte_xl(cls, dtype=jnp.bfloat16) -> "DiTVideoConfig":
        return cls(dtype=dtype)

    @classmethod
    def joint3d_xl(cls, dtype=jnp.bfloat16) -> "DiTVideoConfig":
        """CogVideoX-style joint spatio-temporal attention at DiT-XL width."""
        return cls(attention_mode="joint3d", dtype=dtype)

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "DiTVideoConfig":
        return cls(hidden_size=32, depth=4, num_heads=2, cross_attention_dim=16,
                   dtype=dtype)

    @classmethod
    def joint3d_tiny(cls, dtype=jnp.float32) -> "DiTVideoConfig":
        return cls(hidden_size=32, depth=4, num_heads=2, cross_attention_dim=16,
                   attention_mode="joint3d", dtype=dtype)

    @classmethod
    def moe_tiny(cls, num_experts=4, dtype=jnp.float32) -> "DiTVideoConfig":
        """Tiny MoE joint-3D variant for the expert-parallelism tests."""
        return cls(hidden_size=32, depth=4, num_heads=2, cross_attention_dim=16,
                   attention_mode="joint3d", num_experts=num_experts,
                   dtype=dtype)


from vdpp_tpu.models._common import FreshKeys as _Keys  # noqa: E402


def _init_block(kg, cfg: DiTVideoConfig, cross: bool, moe: bool = False) -> dict:
    d = cfg.hidden_size
    mlp = int(d * cfg.mlp_ratio)
    if moe:
        from vdpp_tpu.ops.moe import init_moe_ff

        ff: dict = {
            "moe": init_moe_ff(kg(), d, cfg.num_experts, inner_dim=mlp,
                               dtype=cfg.dtype)
        }
    else:
        ff = {
            "mlp_in": init_linear(kg(), d, mlp, cfg.dtype),
            "mlp_out": init_linear(kg(), mlp, d, cfg.dtype),
        }
    p = {
        "norm1": init_layer_norm(d, cfg.dtype),
        "attn": init_attention(kg(), d, cfg.num_heads, dtype=cfg.dtype, qkv_bias=True),
        "norm2": init_layer_norm(d, cfg.dtype),
        **ff,
        # adaLN(-Zero at train time): 6*(shift, scale, gate). True DiT
        # zero-init makes an *untrained* model the identity; for this
        # inference framework random init uses a small scale instead so
        # the forward is non-trivial (converted checkpoints overwrite it).
        "ada": {
            "w": jax.random.normal(kg(), (d, 6 * d), jnp.float32).astype(cfg.dtype)
            * 0.02,
            "b": jnp.zeros((6 * d,), cfg.dtype),
        },
    }
    if cross and cfg.cross_attention_dim:
        p["norm_cross"] = init_layer_norm(d, cfg.dtype)
        p["cross_attn"] = init_attention(
            kg(), d, cfg.num_heads, cross_dim=cfg.cross_attention_dim,
            dtype=cfg.dtype, qkv_bias=True,
        )
    return p


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _block(p: dict, x: jax.Array, c_emb: jax.Array, ctx: jax.Array | None,
           heads: int, seq_axis: str | None = None,
           expert_axis: str | None = None, moe_dispatch: str = "dense",
           moe_capacity: float = 2.0) -> jax.Array:
    """x: (B', L, D); c_emb: (B', D) conditioning embedding."""
    ada = linear(jax.nn.silu(c_emb.astype(jnp.float32)).astype(c_emb.dtype), p["ada"])
    sh1, sc1, g1, sh2, sc2, g2 = jnp.split(ada, 6, axis=-1)
    h = _modulate(layer_norm(x, p["norm1"]), sh1, sc1)
    x = x + g1[:, None, :] * attention(h, p["attn"], heads=heads, seq_axis=seq_axis)
    if "cross_attn" in p and ctx is not None:
        h = layer_norm(x, p["norm_cross"])
        x = x + attention(h, p["cross_attn"], heads=heads, context=ctx)
    h = _modulate(layer_norm(x, p["norm2"]), sh2, sc2)
    if "moe" in p:
        from vdpp_tpu.ops.moe import moe_ff, moe_ff_gather

        from vdpp_tpu.ops.quant import _qtensor

        gw = p["moe"]["gate"]["w"]
        num_experts = (_qtensor(gw) if isinstance(gw, dict) else gw).shape[-1]
        if moe_dispatch == "gather":
            # Capacity-based token-gather (E-fold less compute; drops
            # over-capacity tokens — see ops/moe.py docstring).
            ff = moe_ff_gather(
                p["moe"], h, num_experts, expert_axis=expert_axis,
                capacity_factor=moe_capacity,
            )
        else:
            ff = moe_ff(p["moe"], h, num_experts, expert_axis=expert_axis)
        x = x + g2[:, None, :] * ff
    else:
        h = linear(h, p["mlp_in"])
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
        x = x + g2[:, None, :] * linear(h, p["mlp_out"])
    return x


def _temporal_block(p: dict, x: jax.Array, c_emb: jax.Array, heads: int,
                    batch: int, frames: int) -> jax.Array:
    """Temporal DiT block in the resident (B*F, N, D) layout.

    Equivalent to transposing to (B*N, F, D) and running ``_block`` (the
    adaLN modulation is per batch element, so it commutes with the
    location/frame transpose); frame mixing happens inside
    ``temporal_self_attention`` without the physical transpose.
    """
    ada = linear(jax.nn.silu(c_emb.astype(jnp.float32)).astype(c_emb.dtype), p["ada"])
    sh1, sc1, g1, sh2, sc2, g2 = (
        jnp.repeat(t, frames, axis=0) for t in jnp.split(ada, 6, axis=-1)
    )  # (B, D) -> (B*F, D)
    h = _modulate(layer_norm(x, p["norm1"]), sh1, sc1)
    x = x + g1[:, None, :] * temporal_self_attention(p["attn"], h, heads, batch, frames)
    h = _modulate(layer_norm(x, p["norm2"]), sh2, sc2)
    h = linear(h, p["mlp_in"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    x = x + g2[:, None, :] * linear(h, p["mlp_out"])
    return x


class DiTVideo:
    """init/apply for the factorized video DiT."""

    def __init__(self, config: DiTVideoConfig):
        self.config = config

    def init(self, key: jax.Array) -> dict:
        cfg = self.config
        kg = _Keys(key)
        d = cfg.hidden_size
        pin = cfg.in_channels * cfg.patch_size**2
        pout = cfg.out_channels * cfg.patch_size**2
        params: dict = {
            "patch_embed": init_linear(kg(), pin, d, cfg.dtype),
            "t_embed": init_timestep_mlp(kg(), 256, d, dtype=cfg.dtype),
            "blocks": [],
            "final_norm": init_layer_norm(d, cfg.dtype),
            "final_ada": {
                "w": jnp.zeros((d, 2 * d), cfg.dtype),
                "b": jnp.zeros((2 * d,), cfg.dtype),
            },
            "final_proj": init_linear(kg(), d, pout, cfg.dtype),
        }
        eligible_idx = 0
        for i in range(cfg.depth):
            # joint3d: every block is a full spatio-temporal block with
            # cross-attention; factorized: alternate spatial/temporal.
            cross = True if cfg.attention_mode == "joint3d" else i % 2 == 0
            # MoE feed-forward in every moe_every-th ELIGIBLE block
            # (spatial blocks only in factorized mode — _temporal_block
            # keeps its dense FF). The phase counts eligible blocks, not
            # global depth: with the global index, factorized mode's
            # even-indexed eligible blocks could never hit an odd phase
            # and MoE would silently never activate.
            eligible = cfg.attention_mode == "joint3d" or i % 2 == 0
            moe = False
            if cfg.num_experts > 0 and eligible:
                moe = eligible_idx % cfg.moe_every == cfg.moe_every - 1
                eligible_idx += 1
            params["blocks"].append(_init_block(kg, cfg, cross=cross, moe=moe))
        return params

    def apply(
        self,
        params: dict,
        latent: jax.Array,
        timestep: jax.Array,
        context: jax.Array | None = None,
        seq_axis: str | None = None,
        seq_shards: int = 1,
        expert_axis: str | None = None,
        moe_dispatch: str = "dense",
        moe_capacity: float = 2.0,
    ) -> jax.Array:
        """latent (B, F, H, W, C) -> (B, F, H, W, C_out).

        context: optional (B, M, cross_dim) conditioning tokens.

        seq_axis/seq_shards: sequence parallelism (must be called inside a
        ``shard_map`` with mesh axis ``seq_axis`` of size ``seq_shards``).
        The token axis is sharded across the axis after the (cheap,
        device-replicated) patch embedding; attention gathers K/V over ICI
        (ops/attention.py); everything else is token-local; the finished
        tokens are all-gathered before unpatchify. Output is replicated —
        bit-comparable to the unsharded forward. Factorized mode shards
        the within-frame token axis (temporal attention stays local);
        joint3d shards the full F*N token set.
        """
        cfg = self.config
        b, f, hh, ww, cch = latent.shape
        p = cfg.patch_size
        gh, gw = hh // p, ww // p
        n = gh * gw
        d = cfg.hidden_size

        x = latent.astype(cfg.dtype)
        x = x.reshape(b * f, gh, p, gw, p, cch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * f, n, p * p * cch)
        x = linear(x, params["patch_embed"])

        # position embeddings (fp32 sinusoids, fixed — Latte convention)
        pos_s = sinusoidal_embedding(jnp.arange(n, dtype=jnp.float32), d)
        pos_t = sinusoidal_embedding(jnp.arange(f, dtype=jnp.float32), d)
        x = x + pos_s[None].astype(x.dtype)

        t = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(timestep, jnp.float32)), (b,))
        t_emb = sinusoidal_embedding(t, 256).astype(cfg.dtype)
        c_emb = timestep_mlp(t_emb, params["t_embed"])  # (B, D)
        c_f = jnp.repeat(c_emb, f, axis=0)              # (B*F, D)

        ctx_f = None
        if context is not None:
            ctx_f = jnp.repeat(context.astype(cfg.dtype), f, axis=0)  # (B*F, M, Dc)

        def final_head(x_rows: jax.Array, cemb_rows: jax.Array) -> jax.Array:
            # Positionwise: adaLN modulate + linear; valid in any (rows,
            # tokens, D) layout as long as ``cemb_rows`` matches ``rows``.
            ada = linear(
                jax.nn.silu(cemb_rows.astype(jnp.float32)).astype(cemb_rows.dtype),
                params["final_ada"],
            )
            shift, scale = jnp.split(ada, 2, axis=-1)
            h = _modulate(layer_norm(x_rows, params["final_norm"]), shift, scale)
            return linear(h, params["final_proj"])

        def shard_tokens(tokens: jax.Array) -> jax.Array:
            # Contiguous token slice for this device (order matches the
            # tiled all_gather that reassembles the output).
            ln = tokens.shape[1]
            if ln % seq_shards != 0:
                raise ValueError(
                    f"token axis {ln} not divisible by seq_shards {seq_shards}"
                )
            loc = ln // seq_shards
            idx = jax.lax.axis_index(seq_axis)
            return jax.lax.dynamic_slice_in_dim(tokens, idx * loc, loc, axis=1)

        if cfg.attention_mode == "joint3d":
            # CogVideoX-style: one token set of F*N spatio-temporal tokens,
            # every block attends over all of them jointly (flash kernel
            # carries the long sequence). Temporal position added up front.
            x = (
                x.reshape(b, f, n, d) + pos_t[None, :, None, :].astype(x.dtype)
            ).reshape(b, f * n, d)
            if seq_axis is not None:
                x = shard_tokens(x)
            ctx_b = context.astype(cfg.dtype) if context is not None else None
            for blk in params["blocks"]:
                x = _block(blk, x, c_emb, ctx_b, cfg.num_heads,
                           seq_axis=seq_axis, expert_axis=expert_axis,
                           moe_dispatch=moe_dispatch, moe_capacity=moe_capacity)
            # Head in the (B, L, D) layout (identical math to (B*F, N, D) —
            # the modulation is per batch element), then reassemble tokens.
            x = final_head(x, c_emb)
            if seq_axis is not None:
                x = jax.lax.all_gather(x, seq_axis, axis=1, tiled=True)
            x = x.reshape(b * f, n, -1)
        else:
            if seq_axis is not None:
                x = shard_tokens(x)  # shard the within-frame token axis
            first_temporal = True
            for i, blk in enumerate(params["blocks"]):
                if i % 2 == 0:
                    # spatial: tokens within a frame
                    x = _block(blk, x, c_f, ctx_f, cfg.num_heads,
                               seq_axis=seq_axis, expert_axis=expert_axis,
                               moe_dispatch=moe_dispatch, moe_capacity=moe_capacity)
                else:
                    # temporal: frame mixing in the resident layout (no
                    # physical (B*N, F, D) transpose — see _temporal_block).
                    # Token-local under sequence parallelism.
                    if first_temporal:
                        nn = x.shape[1]
                        x = (
                            x.reshape(b, f, nn, d)
                            + pos_t[None, :, None, :].astype(x.dtype)
                        ).reshape(b * f, nn, d)
                        first_temporal = False
                    x = _temporal_block(blk, x, c_emb, cfg.num_heads, b, f)
            x = final_head(x, c_f)  # (B*F, N_loc, p*p*C_out)
            if seq_axis is not None:
                x = jax.lax.all_gather(x, seq_axis, axis=1, tiled=True)

        x = x.reshape(b * f, gh, gw, p, p, cfg.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, f, hh, ww, cfg.out_channels)
        return x


class DiTVideoWrapper:
    """Scheduler + CFG wrapper exposing the pipeline step contract.

    Same per-step math as the SVD wrapper (Karras sigmas, v-prediction
    Euler, per-frame guidance ramp) with token conditioning instead of
    image-latent concat.
    """

    def __init__(
        self,
        config: DiTVideoConfig | None = None,
        num_steps: int = 25,
        sigma_min: float = 0.002,
        sigma_max: float = 700.0,
        solver: str = "euler",
        flow_shift: float = 3.0,
        sampler_seed: int = 0,
    ):
        import os

        if solver not in ("euler", "euler_a", "heun", "dpmpp2m", "flowmatch"):
            raise ValueError(
                "solver must be 'euler', 'euler_a', 'heun', 'dpmpp2m' or "
                "'flowmatch'"
            )
        self.solver = solver
        # euler_a per-step noise seed: fold_in(sampler_seed, step) inside
        # the traced step — pure in (seed, step), so pipelined == oracle
        # (see svd_wrapper._ancestral_noise for the full story).
        self.sampler_seed = int(sampler_seed)
        self.config = config or DiTVideoConfig.latte_xl()
        self.model = DiTVideo(self.config)
        # flowmatch is a different PARAMETERIZATION (rectified flow:
        # x_t = (1-t)x0 + t*n, model predicts velocity), not just another
        # ODE solver over the EDM schedule — it swaps the sigma table,
        # the init-noise scale (1.0) and the timestep convention
        # (sigma*1000) together. SVD's published weights are v-prediction
        # EDM, so StableVideoUNet intentionally does NOT offer it.
        if solver == "flowmatch":
            self.schedule: EulerKarrasSchedule | FlowMatchSchedule = (
                FlowMatchSchedule.create(num_steps, shift=flow_shift)
            )
        else:
            self.schedule = EulerKarrasSchedule.create(
                num_steps, sigma_min, sigma_max
            )
        # MoE dispatch knobs resolve ONCE here, not at trace time: read
        # inside the jitted body, a cached program would silently keep the
        # first call's value (the VDPP_FLASH_EXP bug class). Construct a
        # new wrapper to change them.
        self.moe_dispatch = os.environ.get("VDPP_MOE_DISPATCH", "dense")
        self.moe_capacity = float(os.environ.get("VDPP_MOE_CAPACITY", "2.0"))

    @property
    def init_noise_sigma(self) -> float:
        return self.schedule.init_noise_sigma

    # ---- multistep-state payload packing (no-op for one-step solvers) ---- #
    @property
    def latent_channel_multiplier(self) -> int:
        """Channel slots the pipeline payload carries (2 for dpmpp2m:
        [x ‖ previous x0_hat] — see svd_wrapper for the packing story)."""
        return 2 if self.solver == "dpmpp2m" else 1

    def pack_initial(self, latent: jax.Array) -> jax.Array:
        if self.latent_channel_multiplier == 1:
            return latent
        return jnp.concatenate([latent, jnp.zeros_like(latent)], axis=-1)

    def unpack_final(self, latent: jax.Array) -> jax.Array:
        if self.latent_channel_multiplier == 1:
            return latent
        return latent[..., : latent.shape[-1] // 2]

    def init(self, key: jax.Array) -> dict:
        return self.model.init(key)

    def step(self, params, latent, step_idx, context=None, guidance=None,
             seq_axis=None, seq_shards=1, cfg_axis=None, expert_axis=None):
        sigmas = jnp.asarray(self.schedule.sigmas)
        step_idx = jnp.asarray(step_idx)
        sigma = sigmas[step_idx]
        sigma_next = sigmas[step_idx + 1]

        # Negative-prompt support: ``context`` may be a 2-tuple
        # ``(neg_ctx, pos_ctx)`` — the uncond CFG branch then conditions
        # on the negative prompt's encoding instead of zeros (the
        # standard negative-prompt semantics). A plain array keeps the
        # zeros-uncond behavior bit-for-bit (a zero neg_ctx is identical).
        # Tuples ride the bundle pytree unchanged through the pipeline.
        neg_context = None
        if isinstance(context, tuple):
            neg_context, context = context

        def eps_at(scaled, timestep):
            """Full (CFG-blended) noise prediction at one (x, sigma) point —
            the solver-facing model call (Heun evaluates it twice)."""

            def fwd(ctx):
                return self.model.apply(
                    params, scaled, timestep, ctx,
                    seq_axis=seq_axis, seq_shards=seq_shards,
                    expert_axis=expert_axis,
                    moe_dispatch=self.moe_dispatch,
                    moe_capacity=self.moe_capacity,
                )

            if guidance is not None and context is not None:
                if cfg_axis is not None:
                    # CFG parallelism: device 0 of the size-2 axis runs the
                    # uncond branch, device 1 the cond branch; one ppermute
                    # swaps the results (output replicated over the axis).
                    # Both branches must trace ONE model call, so the
                    # per-device context is selected by value — which
                    # needs equal token counts for a negative prompt (the
                    # CLIs pad ids to a common length).
                    is_cond = jax.lax.axis_index(cfg_axis) == 1
                    if neg_context is not None:
                        if neg_context.shape != context.shape:
                            raise ValueError(
                                "cfg-axis CFG needs neg/pos contexts of "
                                f"equal shape, got {neg_context.shape} vs "
                                f"{context.shape} (pad token ids to a "
                                "common length)"
                            )
                        ctx_local = jnp.where(
                            is_cond, context, neg_context.astype(context.dtype)
                        )
                    else:
                        ctx_local = context * is_cond.astype(context.dtype)
                    local = fwd(ctx_local)
                    other = jax.lax.ppermute(local, cfg_axis, [(0, 1), (1, 0)])
                    uncond = jnp.where(is_cond, other, local)
                    cond = jnp.where(is_cond, local, other)
                else:
                    uncond = fwd(
                        jnp.zeros_like(context) if neg_context is None
                        else neg_context
                    )
                    cond = fwd(context)
                g = guidance.astype(jnp.float32)
                return uncond.astype(jnp.float32) + g * (
                    cond.astype(jnp.float32) - uncond.astype(jnp.float32)
                )
            return fwd(context)

        lat32 = latent.astype(jnp.float32)
        if self.solver == "flowmatch":
            # Rectified flow: no EDM input scaling (x_t is already the
            # model's input convention), timestep = sigma * 1000 (the
            # public flow-matching discretization), model output is the
            # velocity and dx/dt = v.
            v = eps_at(lat32, sigma * 1000.0)
            return flowmatch_step(lat32, v, sigma, sigma_next, latent.dtype)
        if self.solver == "heun":
            return heun_step_v_prediction(
                lat32, eps_at, sigma, sigma_next, latent.dtype
            )
        if self.solver == "dpmpp2m":
            # Payload is [x ‖ old x0_hat] along channels (pack_initial);
            # only x feeds the DiT. See svd_wrapper for the packing story.
            x32, old_den = jnp.split(lat32, 2, axis=-1)
            sigma_prev = sigmas[jnp.maximum(step_idx - 1, 0)]
            timestep = 0.25 * jnp.log(sigma)
            eps = eps_at(x32 * jax.lax.rsqrt(sigma * sigma + 1.0), timestep)
            x_next, denoised = dpmpp2m_step_v_prediction(
                x32, eps, old_den, sigma_prev, sigma, sigma_next, latent.dtype
            )
            return jnp.concatenate([x_next, denoised], axis=-1)
        timestep = 0.25 * jnp.log(sigma)
        scaled = lat32 * jax.lax.rsqrt(sigma * sigma + 1.0)
        eps = eps_at(scaled, timestep)
        if self.solver == "euler_a":
            key = jax.random.fold_in(
                jax.random.key(self.sampler_seed), step_idx
            )
            z = jax.random.normal(key, lat32.shape, jnp.float32)
            return euler_ancestral_step_v_prediction(
                lat32, eps, z, sigma, sigma_next, latent.dtype
            )
        return euler_step_v_prediction(lat32, eps, sigma, sigma_next, latent.dtype)

    def pipeline_step_fn(self, seq_axis: str | None = None, seq_shards: int = 1,
                         cfg_axis: str | None = None,
                         expert_axis: str | None = None):
        """bundle = (params, context|None, guidance|None); ``context``
        may be a ``(neg_ctx, pos_ctx)`` tuple for negative-prompt CFG
        (see :meth:`step`).

        ``seq_axis``/``seq_shards`` build a sequence-parallel step_fn;
        ``cfg_axis`` a CFG-parallel one; ``expert_axis`` an
        expert-parallel one (MoE configs: expert weights sharded over the
        axis, combined with one psum — pair with
        ``StepPipeline(param_spec=expert_param_spec(...))``). All compose
        inside one shard_map mesh, e.g. a (stage, seq, cfg) or
        (stage, expert) mesh runs in one jitted program."""

        def step_fn(bundle, latent, step_idx):
            params, context, guidance = bundle
            return self.step(params, latent, step_idx, context, guidance,
                             seq_axis=seq_axis, seq_shards=seq_shards,
                             cfg_axis=cfg_axis, expert_axis=expert_axis)

        return step_fn
