"""Stable Video Diffusion denoise-step wrapper.

Functional analogue of the reference's ``StableVideoUNet`` wrapper
(reference: src/models/svd_unet.py:15-439): owns the embedded
Euler/Karras schedule, the conditioning state (CLIP image embedding,
frame-repeated VAE image latents, added_time_ids), classifier-free
guidance with a per-frame guidance ramp, and the per-step math

    scale -> UNet (uncond/cond) -> per-frame guidance blend -> fp32 Euler.

Differences from the reference (TPU-first):
* conditioning is an explicit immutable pytree (``SVDConditioning``)
  passed to a pure ``step`` function — no module-held buffers — so the
  whole multi-step pipeline jits and shards;
* latents are channels-last ``(B, F, H, W, C)`` (layout helpers convert
  from the reference's ``(B, C, F, H, W)``);
* CFG can run *batched* (cond/uncond stacked on the batch axis, one UNet
  call — better MXU utilization) or *sequential* (two calls — the
  reference's memory-saving choice, src/models/svd_unet.py:384-411).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from vdpp_tpu.diffusion.scheduler import (
    EulerKarrasSchedule,
    dpmpp2m_step_v_prediction,
    euler_ancestral_step_v_prediction,
    euler_step_v_prediction,
    heun_step_v_prediction,
)
from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SVDConditioning:
    """Immutable conditioning pytree for one generation request.

    Attributes:
        image_embeddings: (B, 1, cross_dim) CLIP image embedding.
        image_latents: (B, F, H, W, 4) VAE-encoded conditioning image,
            repeated per frame (channel-concatenated to the noisy latent).
        added_time_ids: (B, 3) [fps-1, motion_bucket_id, noise_aug_strength].
        guidance: (1, F, 1, 1, 1) per-frame CFG scale, or None for no CFG.
    """

    image_embeddings: jax.Array
    image_latents: jax.Array
    added_time_ids: jax.Array
    guidance: jax.Array | None


def make_added_time_ids(
    batch_size: int,
    fps: int = 6,
    motion_bucket_id: int = 127,
    noise_aug_strength: float = 0.02,
    dtype=jnp.float32,
) -> jax.Array:
    """[fps-1, motion_bucket_id, noise_aug_strength] per batch element
    (reference: src/models/svd_unet.py:250-256)."""
    row = jnp.asarray([fps - 1, motion_bucket_id, noise_aug_strength], dtype)
    return jnp.tile(row[None, :], (batch_size, 1))


def make_guidance_ramp(
    guidance_scale: float | None, num_frames: int, dtype=jnp.float32
) -> jax.Array | None:
    """Linear per-frame guidance 1.0 -> guidance_scale over F frames
    (reference: src/models/svd_unet.py:270-274); None disables CFG."""
    if guidance_scale is None or guidance_scale <= 1.0:
        return None
    ramp = jnp.linspace(1.0, guidance_scale, num_frames, dtype=dtype)
    return ramp.reshape(1, num_frames, 1, 1, 1)


def make_conditioning(
    image_embeddings: jax.Array,
    image_latents: jax.Array,
    num_frames: int,
    fps: int = 6,
    motion_bucket_id: int = 127,
    noise_aug_strength: float = 0.02,
    guidance_scale: float | None = None,
    dtype=jnp.float32,
) -> SVDConditioning:
    """Build conditioning (reference set_conditioning semantics,
    src/models/svd_unet.py:219-279)."""
    if image_embeddings.ndim == 2:
        image_embeddings = image_embeddings[:, None, :]
    b = image_embeddings.shape[0]
    return SVDConditioning(
        image_embeddings=image_embeddings.astype(dtype),
        image_latents=image_latents.astype(dtype),
        added_time_ids=make_added_time_ids(
            b, fps, motion_bucket_id, noise_aug_strength, dtype
        ),
        guidance=make_guidance_ramp(guidance_scale, num_frames, dtype),
    )


def make_dummy_conditioning(
    key: jax.Array,
    batch_size: int,
    num_frames: int,
    height: int,
    width: int,
    cross_dim: int = 1024,
    guidance_scale: float | None = None,
    dtype=jnp.float32,
    **kwargs,
) -> SVDConditioning:
    """Random conditioning for benchmarks — no CLIP/VAE needed
    (reference: src/models/svd_unet.py:281-338)."""
    k1, k2 = jax.random.split(key)
    return make_conditioning(
        image_embeddings=jax.random.normal(k1, (batch_size, 1, cross_dim), dtype),
        image_latents=jax.random.normal(
            k2, (batch_size, num_frames, height, width, 4), dtype
        ),
        num_frames=num_frames,
        guidance_scale=guidance_scale,
        dtype=dtype,
        **kwargs,
    )


# Layout bridges to/from the reference's (B, C, F, H, W) convention.
def latent_from_reference_layout(x: jax.Array) -> jax.Array:
    """(B, C, F, H, W) -> (B, F, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def latent_to_reference_layout(x: jax.Array) -> jax.Array:
    """(B, F, H, W, C) -> (B, C, F, H, W)."""
    return jnp.transpose(x, (0, 4, 1, 2, 3))


class StableVideoUNet:
    """SVD denoiser with embedded schedule; exposes the pipeline's
    ``step_fn(params, latent, step)`` contract.

    Latent layout: (B, F, H, W, 4) channels-last.
    """

    def __init__(
        self,
        config: SVDUNetConfig | None = None,
        num_steps: int = 25,
        sigma_min: float = 0.002,
        sigma_max: float = 700.0,
        cfg_mode: str = "sequential",
        pad_steps_to: int | None = None,
        solver: str = "euler",
        deepcache_interval: int = 0,
        deepcache_split: int = 1,
        sampler_seed: int = 0,
        denoise_from: int = 0,
    ):
        if cfg_mode not in ("sequential", "batched"):
            raise ValueError("cfg_mode must be 'sequential' or 'batched'")
        if solver not in ("euler", "euler_a", "heun", "dpmpp2m"):
            raise ValueError(
                "solver must be 'euler', 'euler_a', 'heun' or 'dpmpp2m'"
            )
        if deepcache_interval < 0:
            raise ValueError("deepcache_interval must be >= 0 (0 = off)")
        if deepcache_interval and solver == "heun":
            # The cache refresh cadence is defined per MODEL EVAL and
            # heun takes two evals per step (corrector at sigma_next) —
            # a shallow corrector eval is a different approximation than
            # the one DeepCache measures. euler and dpmpp2m (one eval per
            # step each) compose cleanly; heun stays rejected.
            raise ValueError("deepcache composes with solver euler/dpmpp2m "
                             "only (heun runs two evals per step)")
        self.config = config or SVDUNetConfig.svd_xt()
        # VDPP_GN_FUSED=1 routes GroupNorm->SiLU pairs through the fused
        # Pallas kernel. Read at CONSTRUCTION (same discipline as
        # VDPP_MOE_DISPATCH, CLAUDE.md): flipping the env after the wrapper
        # exists would be silently pinned by the jit cache otherwise.
        import os as _os

        if _os.environ.get("VDPP_GN_FUSED") == "1":
            import dataclasses as _dc

            self.config = _dc.replace(self.config, fused_groupnorm=True)
        self.unet = SVDUNet(self.config)
        # pad_steps_to: run a non-divisible schedule on S stages by
        # prepending exact-identity steps (see EulerKarrasSchedule.create).
        # denoise_from=k: SDEdit/vid2vid truncation — run only the last
        # (num_steps - k) steps of the num_steps-step schedule; callers
        # start from x0 + sigma_start * noise (NOT noise *
        # init_noise_sigma, which is the pure-noise init scale).
        self.schedule = EulerKarrasSchedule.create(
            num_steps, sigma_min, sigma_max, pad_to_multiple_of=pad_steps_to,
            denoise_from=denoise_from,
        )
        num_steps -= denoise_from
        self.cfg_mode = cfg_mode
        # "euler" = the reference's first-order EulerDiscrete semantics;
        # "heun" = 2nd-order EDM (2 model evals/step, ~half the steps for
        # the same ODE error — scheduler.heun_step_v_prediction);
        # "dpmpp2m" = 2nd-order MULTISTEP DPM-Solver++ (ONE eval/step; the
        # previous step's x0_hat rides the pipeline payload packed along
        # the channel axis — scheduler.dpmpp2m_step_v_prediction).
        self.solver = solver
        # euler_a's per-step noise: fold_in(sampler_seed, step) — a pure
        # function of (seed, step), so the pipelined run and the single-
        # device oracle draw IDENTICAL noise (elementwise equality
        # survives a stochastic sampler). Construction-time, like every
        # output-changing knob (CLAUDE.md env discipline). Note: samples
        # in one run share the per-step noise pattern (step_fn sees no
        # sample id); vary sampler_seed across runs for decorrelated
        # injected noise.
        self.sampler_seed = int(sampler_seed)
        # DeepCache-style cached inference (SVDUNet.apply_cached): every
        # `interval`-th REAL step runs the full UNet and refreshes the deep
        # feature cache; the rest run only the shallow `split` levels. The
        # cadence counts from the first real (non-identity-padded) step so
        # padded and unpadded schedules stay elementwise-identical.
        self.deepcache_interval = int(deepcache_interval)
        self.deepcache_split = int(deepcache_split)
        if deepcache_interval:
            # Validate split against the architecture up front.
            self.unet.cache_feature_shape(1, 1, 2 ** self.config.num_levels,
                                          2 ** self.config.num_levels,
                                          deepcache_split)
        self._n_pad = self.schedule.num_steps - num_steps

    # ---- cross-step-state payload packing (identity when stateless) ---- #
    @property
    def latent_channel_multiplier(self) -> int:
        """How many latent-sized channel slots the pipeline payload carries
        (2 for dpmpp2m: [x ‖ previous x0_hat])."""
        return 2 if self.solver == "dpmpp2m" else 1

    def _deepcache_packed_channels(self) -> int:
        """fp32 payload channels ONE CFG branch's cache packs into.

        The cache tensor (B, F, H/r, W/r, C') rides the pipeline payload
        reshaped onto the latent's (H, W) grid — C'/r^2 values per latent
        pixel — and, when the model dtype is bf16, bit-packed two-per-fp32
        (``lax.bitcast_convert_type``: pure bit movement, exact roundtrip)
        so the fp32 payload doesn't double its footprint. Independent of
        H/W: r^2 always divides C' for the supported architectures."""
        r = 2 ** (self.deepcache_split - 1)
        c = self.config.block_out_channels[self.deepcache_split]
        per_pixel, rem = divmod(c, r * r)
        pack = 2 if self.config.dtype == jnp.bfloat16 else 1
        kf, rem2 = divmod(per_pixel, pack)
        if rem or rem2:
            raise ValueError(
                f"deepcache split {self.deepcache_split}: cache channels "
                f"{c} not packable onto the latent grid (r={r})"
            )
        return kf

    @property
    def payload_extra_channels(self) -> int:
        """Channels the pipeline payload carries BEYOND the latent's own
        (0 when stateless). Serving uses this to size the traced stream
        payload; dpmpp2m is handled via latent_channel_multiplier."""
        if self.deepcache_interval:
            return 2 * self._deepcache_packed_channels()  # uncond ‖ cond
        return 0

    def pack_initial(self, latent: jax.Array) -> jax.Array:
        """Attach cross-step solver/cache state to a fresh latent before
        the pipeline runs.

        dpmpp2m: old-x0_hat slot starts at zero; the first step's
        ``sigma_prev == sigma`` (h_last == 0) forces the first-order
        branch, so the zeros are never read. deepcache: both branch cache
        slots start at zero; the first real step is always a FULL step
        (real_idx 0), so the zeros are never read either. The two compose
        (payload = [x ‖ old x0_hat ‖ cache lanes])."""
        parts = [latent]
        if self.latent_channel_multiplier > 1:
            parts.append(jnp.zeros_like(latent))
        extra = self.payload_extra_channels
        if extra:
            if latent.dtype != jnp.float32:
                # The bit-packed cache lanes assume fp32 payload words.
                raise ValueError("deepcache requires an fp32 latent payload")
            parts.append(jnp.zeros((*latent.shape[:-1], extra), latent.dtype))
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else latent

    def unpack_final(self, latent: jax.Array) -> jax.Array:
        """Strip cross-step state from the pipeline's final payload."""
        extra = self.payload_extra_channels
        if extra:
            latent = latent[..., :-extra]
        if self.latent_channel_multiplier > 1:
            latent = latent[..., : latent.shape[-1] // 2]
        return latent

    # ---- deepcache cache <-> payload lane conversion ---- #
    def _pack_cache(self, cache: jax.Array, h: int, w: int) -> jax.Array:
        """(B, F, H/r, W/r, C') model-dtype -> (B, F, H, W, Kf) fp32."""
        b, f = cache.shape[:2]
        kf = self._deepcache_packed_channels()
        if cache.dtype == jnp.bfloat16:
            pairs = cache.reshape(b, f, h, w, kf, 2)
            return jax.lax.bitcast_convert_type(pairs, jnp.float32)
        return cache.reshape(b, f, h, w, kf).astype(jnp.float32)

    def _unpack_cache(self, packed: jax.Array, h: int, w: int) -> jax.Array:
        """(B, F, H, W, Kf) fp32 -> (B, F, H/r, W/r, C') model-dtype."""
        b, f = packed.shape[:2]
        shape = self.unet.cache_feature_shape(b, f, h, w, self.deepcache_split)
        if self.config.dtype == jnp.bfloat16:
            pairs = jax.lax.bitcast_convert_type(packed, jnp.bfloat16)
            return pairs.reshape(shape)
        return packed.reshape(shape).astype(self.config.dtype)

    @property
    def num_steps(self) -> int:
        """Total schedule length including any identity padding."""
        return self.schedule.num_steps

    @property
    def init_noise_sigma(self) -> float:
        return self.schedule.init_noise_sigma

    @property
    def sigma_start(self) -> float:
        """First ACTIVE sigma — with ``denoise_from`` this is the noise
        level a partially-noised clean latent enters at
        (``x0 + sigma_start * noise``, the SDEdit init)."""
        return float(self.schedule.sigmas[0])

    def init(self, key: jax.Array) -> dict:
        return self.unet.init(key)

    # -------------------------------------------------------------- #
    def noise_pred(
        self,
        params: dict,
        latent_scaled: jax.Array,
        timestep: jax.Array,
        cond: SVDConditioning,
        cfg_axis: str | None = None,
        seq_axis: str | None = None,
        seq_shards: int = 1,
        frame_axis: str | None = None,
        frame_shards: int = 1,
    ) -> jax.Array:
        """UNet eval(s) incl. CFG; input is the pre-scaled latent.

        ``cfg_axis``: name of a size-2 shard_map mesh axis across which the
        uncond/cond branches run CONCURRENTLY (one UNet forward per device
        instead of two in sequence), exchanged with a single latent-sized
        ``ppermute`` — CFG parallelism, halving per-step latency at 2x
        devices. Overrides ``cfg_mode`` when set and guidance is active.

        ``seq_axis``/``seq_shards``: halo-exchange sequence parallelism —
        the UNet's W axis shards over the mesh axis (SVDUNet.apply);
        composes with ``cfg_axis`` and the stage pipeline.

        ``frame_axis``/``frame_shards``: frame parallelism — the latent's
        FRAME axis shards over the mesh axis (SVDUNet.apply); composes
        with every other axis.
        """
        model_dtype = self.config.dtype

        def unet_call(lat_scaled, image_latents, ctx, added_time_ids=None):
            if added_time_ids is None:
                added_time_ids = cond.added_time_ids
            x = jnp.concatenate(
                [lat_scaled.astype(model_dtype), image_latents.astype(model_dtype)],
                axis=-1,
            )
            return self.unet.apply(params, x, timestep, ctx, added_time_ids,
                                   seq_axis=seq_axis, seq_shards=seq_shards,
                                   frame_axis=frame_axis,
                                   frame_shards=frame_shards)

        if cond.guidance is None:
            return unet_call(latent_scaled, cond.image_latents, cond.image_embeddings)

        zeros_lat = jnp.zeros_like(cond.image_latents)
        zeros_ctx = jnp.zeros_like(cond.image_embeddings)
        if cfg_axis is not None:
            # Device 0 computes the uncond branch (zeroed conditioning),
            # device 1 the cond branch; one ppermute swaps the results so
            # both hold (uncond, cond) and blend identically (the output
            # stays replicated over the axis).
            is_cond = jax.lax.axis_index(cfg_axis) == 1
            flag = is_cond.astype(model_dtype)
            local = unet_call(
                latent_scaled,
                cond.image_latents * flag,
                cond.image_embeddings * flag,
            )
            other = jax.lax.ppermute(local, cfg_axis, [(0, 1), (1, 0)])
            uncond = jnp.where(is_cond, other, local)
            cond_p = jnp.where(is_cond, local, other)
        elif self.cfg_mode == "sequential":
            # Two passes — halves activation memory
            # (reference: src/models/svd_unet.py:384-407).
            uncond = unet_call(latent_scaled, zeros_lat, zeros_ctx)
            cond_p = unet_call(latent_scaled, cond.image_latents, cond.image_embeddings)
        else:
            # One batched pass — doubles the matmul batch for the MXU.
            both = unet_call(
                jnp.concatenate([latent_scaled, latent_scaled], axis=0),
                jnp.concatenate([zeros_lat, cond.image_latents], axis=0),
                jnp.concatenate([zeros_ctx, cond.image_embeddings], axis=0),
                jnp.concatenate([cond.added_time_ids, cond.added_time_ids], axis=0),
            )
            uncond, cond_p = jnp.split(both, 2, axis=0)
        g = cond.guidance.astype(jnp.float32)
        blended = uncond.astype(jnp.float32) + g * (
            cond_p.astype(jnp.float32) - uncond.astype(jnp.float32)
        )
        return blended

    def _noise_pred_cached(
        self,
        params: dict,
        latent_scaled: jax.Array,
        timestep: jax.Array,
        cond: SVDConditioning,
        cache_u: jax.Array,
        cache_c: jax.Array,
        use_full: jax.Array,
        cfg_axis: str | None = None,
        seq_axis: str | None = None,
        seq_shards: int = 1,
        frame_axis: str | None = None,
        frame_shards: int = 1,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """noise_pred with a deep-feature cache per CFG branch
        (SVDUNet.apply_cached). Returns (eps, cache_u', cache_c');
        without guidance only the cond cache is live.

        ``seq_axis``/``frame_axis`` pass straight through to
        ``apply_cached`` (cache enters/leaves replicated). ``cfg_axis``
        mirrors :meth:`noise_pred`'s CFG parallelism: each device runs ITS
        branch with ITS branch's cache, then ONE ppermute pair exchanges
        both the eps and the refreshed cache so payload lanes stay
        replicated over the axis."""
        md = self.config.dtype
        split = self.deepcache_split

        def call(lat, img_lat, ctx, cache, atids=None):
            if atids is None:
                atids = cond.added_time_ids
            x = jnp.concatenate(
                [lat.astype(md), img_lat.astype(md)], axis=-1
            )
            return self.unet.apply_cached(
                params, x, timestep, ctx, atids, cache, use_full, split=split,
                seq_axis=seq_axis, seq_shards=seq_shards,
                frame_axis=frame_axis, frame_shards=frame_shards,
            )

        if cond.guidance is None:
            eps, cache_c = call(
                latent_scaled, cond.image_latents, cond.image_embeddings, cache_c
            )
            return eps.astype(jnp.float32), cache_u, cache_c

        zeros_lat = jnp.zeros_like(cond.image_latents)
        zeros_ctx = jnp.zeros_like(cond.image_embeddings)
        if cfg_axis is not None:
            # Device 0 computes the uncond branch with cache_u, device 1
            # the cond branch with cache_c (same flag trick as
            # noise_pred); the refreshed cache rides the same exchange as
            # the eps so BOTH branch caches stay replicated across the
            # axis — on cache steps the exchanged tensors are the
            # untouched inputs, so replication is preserved there too.
            is_cond = jax.lax.axis_index(cfg_axis) == 1
            flag = is_cond.astype(md)
            cache_in = jnp.where(is_cond, cache_c, cache_u)
            local, cache_new = call(
                latent_scaled,
                cond.image_latents * flag,
                cond.image_embeddings * flag,
                cache_in,
            )
            perm = [(0, 1), (1, 0)]
            other = jax.lax.ppermute(local, cfg_axis, perm)
            # The two exchanges are data-independent; a concurrent thunk
            # executor may issue them in either order per device, and
            # devices disagreeing on the order deadlock the collective
            # rendezvous (observed on XLA:CPU, round 5). The barrier
            # threads the first permute's result into the second's
            # operand so every device issues them in the same order.
            other, cache_dep = jax.lax.optimization_barrier(
                (other, cache_new)
            )
            other_cache = jax.lax.ppermute(cache_dep, cfg_axis, perm)
            uncond = jnp.where(is_cond, other, local)
            cond_p = jnp.where(is_cond, local, other)
            cache_u = jnp.where(is_cond, other_cache, cache_new)
            cache_c = jnp.where(is_cond, cache_new, other_cache)
        elif self.cfg_mode == "sequential":
            uncond, cache_u = call(latent_scaled, zeros_lat, zeros_ctx, cache_u)
            cond_p, cache_c = call(
                latent_scaled, cond.image_latents, cond.image_embeddings, cache_c
            )
        else:  # batched: CFG pair on the batch axis, caches likewise
            both, cache_b = call(
                jnp.concatenate([latent_scaled, latent_scaled], axis=0),
                jnp.concatenate([zeros_lat, cond.image_latents], axis=0),
                jnp.concatenate([zeros_ctx, cond.image_embeddings], axis=0),
                jnp.concatenate([cache_u, cache_c], axis=0),
                jnp.concatenate(
                    [cond.added_time_ids, cond.added_time_ids], axis=0
                ),
            )
            uncond, cond_p = jnp.split(both, 2, axis=0)
            cache_u, cache_c = jnp.split(cache_b, 2, axis=0)
        g = cond.guidance.astype(jnp.float32)
        blended = uncond.astype(jnp.float32) + g * (
            cond_p.astype(jnp.float32) - uncond.astype(jnp.float32)
        )
        return blended, cache_u, cache_c

    def step(
        self,
        params: dict,
        latent: jax.Array,
        step_idx: jax.Array,
        cond: SVDConditioning,
        cfg_axis: str | None = None,
        seq_axis: str | None = None,
        seq_shards: int = 1,
        frame_axis: str | None = None,
        frame_shards: int = 1,
    ) -> jax.Array:
        """One full denoising step: scale, UNet(+CFG), fp32 Euler update
        (reference forward(), src/models/svd_unet.py:351-439)."""
        sigmas = jnp.asarray(self.schedule.sigmas)
        step_idx = jnp.asarray(step_idx)
        sigma = sigmas[step_idx]
        sigma_next = sigmas[step_idx + 1]

        lat32 = latent.astype(jnp.float32)
        if self.deepcache_interval:
            co = self.config.out_channels
            b, f, h, w = latent.shape[:4]
            kf = self._deepcache_packed_channels()
            # Payload layout: [x ‖ (dpmpp2m old x0_hat) ‖ cache_u ‖ cache_c]
            n_solver = co * (self.latent_channel_multiplier - 1)
            x32 = lat32[..., :co]
            s0 = co + n_solver
            cache_u = self._unpack_cache(latent[..., s0:s0 + kf], h, w)
            cache_c = self._unpack_cache(latent[..., s0 + kf:], h, w)
            # Cache cadence counts REAL steps: identity-padded leading
            # steps clamp to real index 0 (a full step), so the first real
            # step always refreshes the cache and padded == unpadded.
            real = jnp.maximum(step_idx - self._n_pad, 0)
            use_full = (real % self.deepcache_interval) == 0
            timestep = 0.25 * jnp.log(sigma)
            scaled = x32 * jax.lax.rsqrt(sigma * sigma + 1.0)
            eps, cache_u, cache_c = self._noise_pred_cached(
                params, scaled, timestep, cond, cache_u, cache_c, use_full,
                cfg_axis=cfg_axis, seq_axis=seq_axis, seq_shards=seq_shards,
                frame_axis=frame_axis, frame_shards=frame_shards,
            )
            if self.solver == "dpmpp2m":
                old_den = lat32[..., co:s0]
                sigma_prev = sigmas[jnp.maximum(step_idx - 1, 0)]
                x_next, denoised = dpmpp2m_step_v_prediction(
                    x32, eps, old_den, sigma_prev, sigma, sigma_next,
                    latent.dtype,
                )
                head = jnp.concatenate([x_next, denoised], axis=-1)
            elif self.solver == "euler_a":
                head = euler_ancestral_step_v_prediction(
                    x32, eps, self._ancestral_noise(step_idx, x32.shape),
                    sigma, sigma_next, latent.dtype,
                )
            else:
                head = euler_step_v_prediction(
                    x32, eps, sigma, sigma_next, latent.dtype
                )
            return jnp.concatenate(
                [
                    head,
                    self._pack_cache(cache_u, h, w),
                    self._pack_cache(cache_c, h, w),
                ],
                axis=-1,
            )
        if self.solver == "heun":
            def eps_fn(scaled, timestep):
                return self.noise_pred(
                    params, scaled, timestep, cond, cfg_axis=cfg_axis,
                    seq_axis=seq_axis, seq_shards=seq_shards,
                    frame_axis=frame_axis, frame_shards=frame_shards,
                )

            return heun_step_v_prediction(
                lat32, eps_fn, sigma, sigma_next, latent.dtype
            )
        if self.solver == "dpmpp2m":
            # Payload is [x ‖ old x0_hat] along channels (pack_initial);
            # only x feeds the UNet. h_last comes from the sigma table —
            # clamped at step 0 so sigma_prev == sigma selects first order.
            x32, old_den = jnp.split(lat32, 2, axis=-1)
            sigma_prev = sigmas[jnp.maximum(step_idx - 1, 0)]
            timestep = 0.25 * jnp.log(sigma)
            scaled = x32 * jax.lax.rsqrt(sigma * sigma + 1.0)
            eps = self.noise_pred(
                params, scaled, timestep, cond, cfg_axis=cfg_axis,
                seq_axis=seq_axis, seq_shards=seq_shards,
                frame_axis=frame_axis, frame_shards=frame_shards,
            )
            x_next, denoised = dpmpp2m_step_v_prediction(
                x32, eps, old_den, sigma_prev, sigma, sigma_next, latent.dtype
            )
            return jnp.concatenate([x_next, denoised], axis=-1)
        timestep = 0.25 * jnp.log(sigma)
        scaled = lat32 * jax.lax.rsqrt(sigma * sigma + 1.0)
        eps = self.noise_pred(params, scaled, timestep, cond, cfg_axis=cfg_axis,
                              seq_axis=seq_axis, seq_shards=seq_shards,
                              frame_axis=frame_axis, frame_shards=frame_shards)
        if self.solver == "euler_a":
            return euler_ancestral_step_v_prediction(
                lat32, eps, self._ancestral_noise(step_idx, lat32.shape),
                sigma, sigma_next, latent.dtype,
            )
        return euler_step_v_prediction(lat32, eps, sigma, sigma_next, latent.dtype)

    def _ancestral_noise(self, step_idx: jax.Array, shape) -> jax.Array:
        """euler_a's per-step standard normal: a pure function of
        (sampler_seed, step) — identical on every device and in the
        single-device oracle, replicated over every mesh axis.

        Folds on the REAL step index (identity-padded leading steps clamp
        to 0, same as the deepcache cadence): a padded schedule must draw
        the SAME noise sequence as the unpadded one or the padding
        contract (EulerKarrasSchedule.create: bit-identical output) — and
        with it stage-count invariance under auto-padding — breaks. The
        padded steps themselves ignore the noise (sigma_next == sigma is
        a guarded bitwise no-op in euler_ancestral_step_v_prediction)."""
        real = jnp.maximum(step_idx - self._n_pad, 0)
        key = jax.random.fold_in(jax.random.key(self.sampler_seed), real)
        return jax.random.normal(key, shape, jnp.float32)

    def bind(self, cond: SVDConditioning):
        """Close over conditioning -> ``step_fn(params, latent, step)``.
        Convenient for small tests; for jitted pipelines prefer
        ``pipeline_step_fn`` (conditioning passed as data, not baked into
        the program as constants)."""

        def step_fn(params: Any, latent: jax.Array, step_idx: jax.Array) -> jax.Array:
            return self.step(params, latent, step_idx, cond)

        return step_fn

    def pipeline_step_fn(self, cfg_axis: str | None = None,
                         seq_axis: str | None = None, seq_shards: int = 1,
                         frame_axis: str | None = None,
                         frame_shards: int = 1):
        """``step_fn(bundle, latent, step)`` where ``bundle = (unet_params,
        SVDConditioning)`` — both travel through the pipeline engine as one
        replicated pytree argument.

        ``cfg_axis``: build a CFG-parallel step_fn for a mesh carrying that
        size-2 axis (e.g. a (stage, cfg) mesh — each pipeline stage is a
        2-device uncond/cond group).

        ``seq_axis``/``seq_shards``: halo-exchange sequence parallelism
        for a mesh carrying a seq axis (e.g. (stage, seq) or
        (stage, seq, cfg)).

        ``frame_axis``/``frame_shards``: frame parallelism for a mesh
        carrying a frame axis (e.g. (stage, frame) or
        (stage, seq, frame))."""

        def step_fn(bundle, latent: jax.Array, step_idx: jax.Array) -> jax.Array:
            params, cond = bundle
            return self.step(params, latent, step_idx, cond, cfg_axis=cfg_axis,
                             seq_axis=seq_axis, seq_shards=seq_shards,
                             frame_axis=frame_axis, frame_shards=frame_shards)

        if self.deepcache_interval and (
            seq_axis is not None or frame_axis is not None
        ):
            # With an intra-sample axis the apply_cached branch bodies
            # contain collectives (temporal-halo ppermutes, K/V gathers,
            # GN-stat psums) and the full branch has MORE of them than
            # the shallow branch. A pipeline runs different stages at
            # different step indices in the same tick, so the cached/full
            # branch choice must evaluate to the SAME value on every
            # device at every tick or devices park in DIFFERENT
            # collectives and the program deadlocks (observed on the
            # 8-device XLA:CPU mesh, round 5; on TPU the hang is the
            # same). StepPipeline enforces this via the attributes below:
            # steps_per_stage % interval == 0 and no identity padding.
            step_fn.collective_uniform_interval = self.deepcache_interval
            step_fn.collective_uniform_pad = self._n_pad

        return step_fn
