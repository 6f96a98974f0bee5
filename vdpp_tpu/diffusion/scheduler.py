"""Pure-JAX EulerDiscrete/Karras v-prediction noise schedule for SVD.

The reference embeds a diffusers ``EulerDiscreteScheduler`` configured with
``prediction_type="v_prediction"``, ``use_karras_sigmas=True``,
``sigma_min=0.002``, ``sigma_max=700.0``, ``timestep_type="continuous"``,
``timestep_spacing="leading"``, ``steps_offset=1``
(reference: src/models/svd_unet.py:77-102).

For that exact configuration the entire scheduler collapses to closed-form
math, which we implement directly (no beta tables needed at inference time):

* sigma table: the Karras et al. (2022) rho=7 ramp from ``sigma_max`` down to
  ``sigma_min`` with a trailing 0:
      sigma_i = (smax^(1/rho) + i/(n-1) * (smin^(1/rho) - smax^(1/rho)))^rho
* the timestep fed to the UNet is the EDM "c_noise": ``0.25 * ln(sigma)``
  (diffusers sets timesteps = 0.25*log(sigmas) when timestep_type is
  "continuous" and prediction is v_prediction);
* ``init_noise_sigma = sqrt(sigma_0^2 + 1)`` for "leading" spacing;
* model-input scaling ``x / sqrt(sigma^2 + 1)``
  (reference: src/models/svd_unet.py:381-382);
* the per-step Euler update in fp32
  (reference: src/models/svd_unet.py:427-439):
      x0_hat = eps * (-sigma / sqrt(sigma^2+1)) + x / (sigma^2 + 1)
      x     <- x + (x - x0_hat) / sigma * (sigma_next - sigma)

Everything here is jittable; ``sigma``/``sigma_next`` may be traced scalars
gathered from the precomputed table with a dynamic index, which is what the
pipeline engine does inside its scan.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def karras_sigmas(
    num_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 700.0,
    rho: float = 7.0,
) -> np.ndarray:
    """Karras rho-ramp sigma table, descending, with the trailing 0.

    Returns:
        float32 array of shape ``(num_steps + 1,)``; ``sigmas[0] == sigma_max``,
        ``sigmas[-1] == 0``, and for ``num_steps >= 2``
        ``sigmas[-2] == sigma_min`` (a single-step schedule has only
        ``[sigma_max, 0]`` — the one active sigma is sigma_max).
    """
    if num_steps < 1:
        raise ValueError("num_steps must be >= 1")
    if num_steps == 1:
        ramp = np.zeros(1, dtype=np.float64)
    else:
        ramp = np.linspace(0.0, 1.0, num_steps, dtype=np.float64)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    sig = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def continuous_timesteps(sigmas: np.ndarray) -> np.ndarray:
    """EDM c_noise timesteps ``0.25 * ln(sigma)`` for the active steps."""
    return (0.25 * np.log(sigmas[:-1])).astype(np.float32)


def default_timestep_schedule(num_steps: int, num_train_timesteps: int = 1000) -> list[int]:
    """Discrete descending 'leading'-style schedule.

    API-parity helper mirroring reference src/models/svd_unet.py:201-217
    (used by the simulator/dummy paths where steps are plain ints).
    """
    step_ratio = num_train_timesteps // num_steps
    return list(range(num_train_timesteps - 1, -1, -step_ratio))[:num_steps]


def scale_model_input(sample: jax.Array, sigma: jax.Array) -> jax.Array:
    """``x / sqrt(sigma^2 + 1)`` (reference: src/models/svd_unet.py:381-382)."""
    sigma = jnp.asarray(sigma, dtype=jnp.float32)
    return (sample.astype(jnp.float32) * jax.lax.rsqrt(sigma * sigma + 1.0)).astype(
        sample.dtype
    )


def euler_step_v_prediction(
    latent: jax.Array,
    noise_pred: jax.Array,
    sigma: jax.Array,
    sigma_next: jax.Array,
    out_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """fp32 v-prediction Euler update (reference: src/models/svd_unet.py:427-439)."""
    out_dtype = out_dtype or latent.dtype
    x = latent.astype(jnp.float32)
    eps = noise_pred.astype(jnp.float32)
    s = jnp.asarray(sigma, dtype=jnp.float32)
    s_next = jnp.asarray(sigma_next, dtype=jnp.float32)
    denom = s * s + 1.0
    pred_original = eps * (-s * jax.lax.rsqrt(denom)) + x / denom
    derivative = (x - pred_original) / s
    prev = x + derivative * (s_next - s)
    return prev.astype(out_dtype)


def _pred_original(x: jax.Array, eps: jax.Array, s: jax.Array) -> jax.Array:
    """v-prediction x0_hat (the EulerDiscrete denoiser output form)."""
    denom = s * s + 1.0
    return eps * (-s * jax.lax.rsqrt(denom)) + x / denom


def heun_step_v_prediction(
    latent: jax.Array,
    eps_fn,
    sigma: jax.Array,
    sigma_next: jax.Array,
    out_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """One Heun (2nd-order EDM, Karras et al. 2022 Alg. 1 deterministic)
    update in fp32, in the same v-prediction parameterization as
    :func:`euler_step_v_prediction`.

    ``eps_fn(scaled_latent, c_noise_timestep) -> noise prediction`` is the
    full model call (CFG included) — Heun evaluates it TWICE per step
    (predictor at ``sigma``, corrector at ``sigma_next``), buying
    O(h^2) local accuracy so schedules need roughly half the steps of
    Euler for the same ODE-solve error (tests/test_scheduler.py pins the
    convergence orders on an analytic Gaussian-score oracle).

    Two exactness properties the pipeline relies on survive:
    * identity padding (``sigma_next == sigma``): dt == 0 makes both the
      predictor and the correction exact no-ops;
    * the final step (``sigma_next == 0``): the corrector's ``1/sigma_next``
      is undefined there, so the step falls back to plain Euler — the same
      special case diffusers' HeunDiscreteScheduler encodes.

    Beyond the reference (which inherits diffusers' first-order
    EulerDiscrete, reference: src/models/svd_unet.py:77-102).
    """
    out_dtype = out_dtype or latent.dtype
    x = latent.astype(jnp.float32)
    s = jnp.asarray(sigma, dtype=jnp.float32)
    s_next = jnp.asarray(sigma_next, dtype=jnp.float32)
    dt = s_next - s

    eps1 = eps_fn(x * jax.lax.rsqrt(s * s + 1.0), 0.25 * jnp.log(s)).astype(
        jnp.float32
    )
    d1 = (x - _pred_original(x, eps1, s)) / s
    x_euler = x + d1 * dt

    # Corrector at sigma_next; guarded against the trailing 0 (the eval
    # still runs — traced cond would re-trace the UNet — but its result is
    # discarded on the final step).
    s2 = jnp.where(s_next > 0.0, s_next, 1.0)
    eps2 = eps_fn(
        x_euler * jax.lax.rsqrt(s2 * s2 + 1.0), 0.25 * jnp.log(s2)
    ).astype(jnp.float32)
    d2 = (x_euler - _pred_original(x_euler, eps2, s2)) / s2
    x_heun = x + 0.5 * (d1 + d2) * dt

    return jnp.where(s_next > 0.0, x_heun, x_euler).astype(out_dtype)


def dpmpp2m_step_v_prediction(
    latent: jax.Array,
    noise_pred: jax.Array,
    old_denoised: jax.Array,
    sigma_prev: jax.Array,
    sigma: jax.Array,
    sigma_next: jax.Array,
    out_dtype: jnp.dtype | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One DPM-Solver++ (2M) update in fp32 — second-order MULTISTEP: one
    model eval per step (like Euler), with the second-order correction
    coming from the PREVIOUS step's denoised estimate instead of a second
    eval (unlike Heun). In exp-integrator form over t = -ln(sigma):

        h      = t_next - t,   h_last = t - t_prev
        x_next = (sigma_next/sigma) * x  -  expm1(-h) * D
        D      = x0_hat                                   (first order)
        D      = (1 + 1/2r) x0_hat - (1/2r) old_x0_hat,   r = h_last / h

    the variance-exploding x-space recursion of Lu et al. 2022
    (DPM-Solver++, Eq. 4.5/Algorithm 2) in the same v-prediction
    parameterization as :func:`euler_step_v_prediction`.

    Cross-step state: callers thread ``old_denoised`` (this step returns
    the pair ``(x_next, x0_hat)``); the pipeline wrappers pack it along
    the latent CHANNEL axis so it rides the stage hand-off unchanged —
    channels are unsharded on every mesh axis (seq shards W, frame shards
    F), so the packed payload is sharding-neutral.

    The step degrades to first order exactly when the second-order term
    is undefined or meaningless:
    * ``h_last == 0`` — the first step (callers pass
      ``sigma_prev == sigma`` there) and any step that follows identity
      padding (leading duplicate sigmas, EulerKarrasSchedule.create):
      both schedules therefore produce IDENTICAL latents, preserving the
      padding-exactness invariant;
    * ``sigma_next == 0`` — the final step, where h = inf collapses the
      update to ``x_next = x0_hat`` (the same special case diffusers'
      DPMSolverMultistepScheduler encodes);
    * ``h == 0`` — an identity-padded step itself: ratio 1 and
      expm1(0) = 0 make the update a bitwise no-op (given finite
      ``noise_pred``).

    Beyond the reference (which inherits diffusers' first-order
    EulerDiscrete, reference: src/models/svd_unet.py:77-102).
    """
    out_dtype = out_dtype or latent.dtype
    x = latent.astype(jnp.float32)
    eps = noise_pred.astype(jnp.float32)
    old_den = old_denoised.astype(jnp.float32)
    s_prev = jnp.asarray(sigma_prev, dtype=jnp.float32)
    s = jnp.asarray(sigma, dtype=jnp.float32)
    s_next = jnp.asarray(sigma_next, dtype=jnp.float32)

    denoised = _pred_original(x, eps, s)

    # t = -ln(sigma); the trailing 0 maps to t = +inf (handled below).
    h = jnp.log(s) - jnp.log(s_next)  # t_next - t, > 0 on real steps
    h_last = jnp.log(s_prev) - jnp.log(s)
    ratio = s_next / s  # e^{-h}, exactly 1.0 on identity-padded steps

    first_order = (h_last == 0.0) | (s_next <= 0.0) | (h == 0.0)
    # Guarded divisions: the guarded values only feed the SECOND-order
    # expression, which jnp.where discards wherever first_order holds.
    r = h_last / jnp.where(h > 0.0, h, 1.0)
    inv_2r = 0.5 / jnp.where(r > 0.0, r, 1.0)
    denoised_d = (1.0 + inv_2r) * denoised - inv_2r * old_den
    d_used = jnp.where(first_order, denoised, denoised_d)

    # expm1(-inf) = -1 and ratio = 0 on the final step: x_next = x0_hat.
    x_next = ratio * x - jnp.expm1(-h) * d_used
    return x_next.astype(out_dtype), denoised.astype(out_dtype)


def euler_ancestral_step_v_prediction(
    latent: jax.Array,
    noise_pred: jax.Array,
    noise: jax.Array,
    sigma: jax.Array,
    sigma_next: jax.Array,
    out_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """One fp32 ancestral (stochastic) Euler update in the same
    v-prediction parameterization as :func:`euler_step_v_prediction`.

    The ancestral split of the step-to-``sigma_next`` transition
    (k-diffusion / diffusers EulerAncestralDiscreteScheduler semantics):

        sigma_up^2   = sigma_next^2 (sigma^2 - sigma_next^2) / sigma^2
        sigma_down^2 = sigma_next^2 - sigma_up^2
        x <- x + d(x, sigma) (sigma_down - sigma) + sigma_up * noise

    so a deterministic Euler step to ``sigma_down`` plus fresh Gaussian
    noise at scale ``sigma_up`` lands exactly at marginal level
    ``sigma_next`` (``sigma_up^2 + sigma_down^2 == sigma_next^2``).

    ``noise`` is caller-provided standard normal — the function stays
    pure; the wrappers derive it as ``fold_in(sampler_seed, step)`` so
    the pipelined run and the single-device oracle draw identical noise
    and the elementwise-equality invariant survives a stochastic
    sampler.

    Exactness properties the pipeline relies on:
    * identity padding (``sigma_next == sigma``): sigma_up == 0 and
      sigma_down == sigma make the update a bitwise no-op (given finite
      ``noise``);
    * the final step (``sigma_next == 0``): sigma_up == 0 — the last
      step is deterministic, same as diffusers.

    Beyond the reference (deterministic EulerDiscrete only,
    reference: src/models/svd_unet.py:77-102).
    """
    out_dtype = out_dtype or latent.dtype
    x = latent.astype(jnp.float32)
    eps = noise_pred.astype(jnp.float32)
    z = noise.astype(jnp.float32)
    s = jnp.asarray(sigma, dtype=jnp.float32)
    s_next = jnp.asarray(sigma_next, dtype=jnp.float32)

    up2 = s_next * s_next * (s * s - s_next * s_next) / (s * s)
    up = jnp.sqrt(jnp.maximum(up2, 0.0))
    down = jnp.sqrt(jnp.maximum(s_next * s_next - up2, 0.0))
    # sqrt(s_next^2 - 0) can land 1 ulp off s on identity-padded steps;
    # force the exact no-op there (the padding-bitwise invariant).
    same = s_next == s
    up = jnp.where(same, 0.0, up)
    dt = jnp.where(same, 0.0, down - s)

    d = (x - _pred_original(x, eps, s)) / s
    prev = x + d * dt + up * z
    return prev.astype(out_dtype)


def flowmatch_sigmas(num_steps: int, shift: float = 3.0) -> np.ndarray:
    """Shifted-linear flow-matching sigma table, descending, trailing 0.

    Rectified-flow / flow-matching models (SD3, CogVideoX, HunyuanVideo
    class — the dominant parameterization for current text-to-video DiTs)
    define ``x_t = (1 - t) x0 + t * noise`` with the model predicting the
    velocity ``v = noise - x0``. The inference schedule is the linear time
    grid ``t_i = 1, (N-1)/N, ..., 1/N`` warped by the resolution shift

        sigma = shift * t / (1 + (shift - 1) * t)

    (the SD3 "shifted" discretization; ``shift=1`` recovers the plain
    linear grid). ``sigmas[0] == 1`` exactly for every shift, and the
    trailing 0 terminates the ODE at the data point.

    Beyond the reference (whose only schedule family is diffusers'
    EulerDiscrete/Karras, reference: src/models/svd_unet.py:77-102).
    """
    if num_steps < 1:
        raise ValueError("num_steps must be >= 1")
    if shift <= 0.0:
        raise ValueError("shift must be > 0")
    t = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    sig = shift * t / (1.0 + (shift - 1.0) * t)
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def flowmatch_step(
    latent: jax.Array,
    velocity_pred: jax.Array,
    sigma: jax.Array,
    sigma_next: jax.Array,
    out_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """One fp32 flow-matching Euler update: ``x += (sigma_next - sigma) v``.

    With ``x_t = (1 - t) x0 + t n`` the probability-flow ODE is simply
    ``dx/dt = v``, so the Euler update is exact in ``v``'s linear regime.
    Identity padding (``sigma_next == sigma``) is a bitwise no-op, the
    same exactness property :func:`euler_step_v_prediction` gives the
    pipeline's padded schedules.
    """
    out_dtype = out_dtype or latent.dtype
    x = latent.astype(jnp.float32)
    v = velocity_pred.astype(jnp.float32)
    s = jnp.asarray(sigma, dtype=jnp.float32)
    s_next = jnp.asarray(sigma_next, dtype=jnp.float32)
    return (x + (s_next - s) * v).astype(out_dtype)


@dataclass(frozen=True)
class EulerKarrasSchedule:
    """Precomputed schedule: sigma table + continuous timesteps.

    Attributes:
        sigmas: ``(T+1,)`` fp32, descending with trailing 0.
        timesteps: ``(T,)`` fp32 continuous c_noise values fed to the UNet.
        init_noise_sigma: initial-noise scale ``sqrt(sigmas[0]^2 + 1)``.
    """

    sigmas: np.ndarray
    timesteps: np.ndarray
    init_noise_sigma: float
    num_steps: int = field(default=0)

    @classmethod
    def create(
        cls,
        num_steps: int,
        sigma_min: float = 0.002,
        sigma_max: float = 700.0,
        rho: float = 7.0,
        pad_to_multiple_of: int | None = None,
        denoise_from: int = 0,
    ) -> "EulerKarrasSchedule":
        """Build the schedule; optionally pad to a stage-count multiple.

        The reference hard-fails when total_steps is not divisible by the
        stage count (reference: src/pipeline/step_assignment.py:60-63).
        The SPMD pipeline needs uniform per-stage work, so instead of
        rejecting e.g. 30 steps on 8 chips, ``pad_to_multiple_of=8``
        prepends duplicate leading sigmas: a step with sigma_next == sigma
        has dt == 0, making the Euler update an EXACT identity — the
        padded schedule produces bit-identical output to the unpadded one
        at the cost of (pad/total) wasted UNet evaluations.

        ``denoise_from=k`` SLICES the ``num_steps`` table to its last
        ``num_steps - k`` entries — the SDEdit/img2img truncation: the
        caller starts from ``x0 + sigmas[0] * noise`` (a partially-noised
        clean latent at the table's first sigma) instead of pure noise,
        and the remaining schedule is bit-identical to the tail of the
        full one. Slicing happens BEFORE padding, so the two compose.
        """
        if not 0 <= denoise_from < num_steps:
            raise ValueError(
                f"denoise_from must be in [0, num_steps), got "
                f"{denoise_from} of {num_steps}"
            )
        sig = karras_sigmas(num_steps, sigma_min, sigma_max, rho)
        if denoise_from:
            sig = sig[denoise_from:]
            num_steps -= denoise_from
        if pad_to_multiple_of:
            pad = (-num_steps) % pad_to_multiple_of
            if pad:
                sig = np.concatenate([np.full(pad, sig[0], np.float32), sig])
                num_steps += pad
        ts = continuous_timesteps(sig)
        return cls(
            sigmas=sig,
            timesteps=ts,
            init_noise_sigma=float(math.sqrt(float(sig[0]) ** 2 + 1.0)),
            num_steps=num_steps,
        )

    def sigma_at(self, step: jax.Array | int) -> jax.Array:
        """Dynamic (traceable) sigma lookup."""
        return jnp.asarray(self.sigmas)[step]

    def timestep_at(self, step: jax.Array | int) -> jax.Array:
        """Dynamic (traceable) continuous-timestep lookup."""
        return jnp.asarray(self.timesteps)[step]

    def step(
        self,
        latent: jax.Array,
        noise_pred: jax.Array,
        step_idx: jax.Array | int,
    ) -> jax.Array:
        """One Euler update using table sigmas at ``step_idx``/``step_idx+1``."""
        sig = jnp.asarray(self.sigmas)
        s = sig[step_idx]
        s_next = sig[jnp.asarray(step_idx) + 1]
        return euler_step_v_prediction(latent, noise_pred, s, s_next)


@dataclass(frozen=True)
class FlowMatchSchedule:
    """Precomputed flow-matching schedule (:func:`flowmatch_sigmas`).

    Mirrors :class:`EulerKarrasSchedule`'s surface so the DiT wrapper can
    swap schedule families behind one attribute:

    * ``timesteps``: ``sigma * 1000`` — the discretization public
      flow-matching checkpoints (SD3/CogVideoX class) feed their timestep
      embedding, so a converted checkpoint sees its training convention;
    * ``init_noise_sigma == 1.0``: ``x_1`` is pure noise (vs the
      variance-exploding ``sqrt(sigma_0^2 + 1)``);
    * identity padding via duplicate leading sigmas — ``dt == 0`` makes
      :func:`flowmatch_step` a bitwise no-op, so padded and unpadded
      schedules produce identical latents (the pipeline's divisibility
      escape hatch, same contract as EulerKarrasSchedule.create).
    """

    sigmas: np.ndarray
    timesteps: np.ndarray
    init_noise_sigma: float
    num_steps: int = field(default=0)

    @classmethod
    def create(
        cls,
        num_steps: int,
        shift: float = 3.0,
        pad_to_multiple_of: int | None = None,
    ) -> "FlowMatchSchedule":
        sig = flowmatch_sigmas(num_steps, shift)
        if pad_to_multiple_of:
            pad = (-num_steps) % pad_to_multiple_of
            if pad:
                sig = np.concatenate([np.full(pad, sig[0], np.float32), sig])
                num_steps += pad
        return cls(
            sigmas=sig,
            timesteps=(sig[:-1] * 1000.0).astype(np.float32),
            init_noise_sigma=1.0,
            num_steps=num_steps,
        )

    def sigma_at(self, step: jax.Array | int) -> jax.Array:
        """Dynamic (traceable) sigma lookup."""
        return jnp.asarray(self.sigmas)[step]

    def timestep_at(self, step: jax.Array | int) -> jax.Array:
        """Dynamic (traceable) model-timestep lookup (``sigma * 1000``)."""
        return jnp.asarray(self.timesteps)[step]

    def step(
        self,
        latent: jax.Array,
        velocity_pred: jax.Array,
        step_idx: jax.Array | int,
    ) -> jax.Array:
        """One flow-match Euler update using table sigmas at ``step_idx``."""
        sig = jnp.asarray(self.sigmas)
        s = sig[step_idx]
        s_next = sig[jnp.asarray(step_idx) + 1]
        return flowmatch_step(latent, velocity_pred, s, s_next)
