"""Flow-matching (rectified flow) schedule + solver tests.

The reference's only schedule family is diffusers' EulerDiscrete/Karras
(reference: src/models/svd_unet.py:77-102); flow matching is the
beyond-reference parameterization used by the SD3/CogVideoX class of
text-to-video DiTs: ``x_t = (1 - t) x0 + t n``, model predicts the
velocity ``v = n - x0``, and the probability-flow ODE is ``dx/dt = v``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.diffusion.scheduler import (
    FlowMatchSchedule,
    flowmatch_sigmas,
    flowmatch_step,
)
from vdpp_tpu.models.dit import DiTVideoConfig, DiTVideoWrapper
from vdpp_tpu.models.svd_wrapper import make_guidance_ramp
from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)

# ----------------------------- schedule math ----------------------------- #


@pytest.mark.fast
def test_sigma_table_endpoints_and_shape():
    for shift in (1.0, 3.0, 7.0):
        sig = flowmatch_sigmas(8, shift=shift)
        assert sig.shape == (9,)
        # sigma(t=1) == 1 exactly for every shift.
        assert sig[0] == pytest.approx(1.0, abs=1e-7)
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig) < 0), "must be strictly descending"


@pytest.mark.fast
def test_shift_one_is_plain_linear():
    sig = flowmatch_sigmas(5, shift=1.0)
    np.testing.assert_allclose(
        sig[:-1], np.linspace(1.0, 0.2, 5), rtol=0, atol=1e-7
    )


@pytest.mark.fast
def test_sigma_table_matches_independent_formula():
    shift, n = 3.0, 6
    t = np.linspace(1.0, 1.0 / n, n)
    want = shift * t / (1.0 + (shift - 1.0) * t)
    np.testing.assert_allclose(flowmatch_sigmas(n, shift)[:-1], want, rtol=1e-6)


@pytest.mark.fast
def test_sigma_table_rejects_bad_args():
    with pytest.raises(ValueError):
        flowmatch_sigmas(0)
    with pytest.raises(ValueError):
        flowmatch_sigmas(4, shift=0.0)


@pytest.mark.fast
def test_schedule_conventions():
    sch = FlowMatchSchedule.create(7, shift=3.0)
    assert sch.init_noise_sigma == 1.0
    np.testing.assert_allclose(sch.timesteps, sch.sigmas[:-1] * 1000.0,
                               rtol=1e-6)
    assert sch.num_steps == 7


@pytest.mark.fast
def test_constant_velocity_telescopes_to_minus_v():
    """Sum of dt over the whole schedule is sigma_T - sigma_0 = -1 for any
    shift, so a constant velocity field integrates to x0 - v exactly."""
    sch = FlowMatchSchedule.create(9, shift=3.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3)).astype(np.float32))
    v = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3)).astype(np.float32))
    y = x
    for s in range(sch.num_steps):
        y = sch.step(y, v, s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x - v),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_identity_padding_is_bitexact():
    """Duplicate leading sigmas give dt == 0 no-op steps: the padded
    schedule's trajectory equals the unpadded one bitwise (the pipeline's
    steps-divisibility escape hatch, same contract as EulerKarras)."""
    base = FlowMatchSchedule.create(5, shift=3.0)
    padded = FlowMatchSchedule.create(5, shift=3.0, pad_to_multiple_of=4)
    assert padded.num_steps == 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))

    def vel(x):  # deterministic stand-in for the model
        return jnp.sin(x) * 0.5

    xb = x
    for s in range(base.num_steps):
        xb = base.step(xb, vel(xb), s)
    xp = x
    for s in range(padded.num_steps):
        xp = padded.step(xp, vel(xp), s)
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(xp))


@pytest.mark.fast
def test_exact_recovery_of_delta_data_point():
    """For a delta data distribution at x0 the marginal velocity field is
    v(x, t) = (x - x0) / t; the true trajectory is linear in t, so flow
    Euler is EXACT: integrating from ANY noise draw lands on x0, for any
    shift and step count. The flow-match analogue of the Gaussian-score
    oracle the EDM solvers are pinned against (test_scheduler.py)."""
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
    for n, shift in ((4, 1.0), (9, 3.0)):
        sch = FlowMatchSchedule.create(n, shift=shift)
        x = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))  # = x_1
        for s in range(sch.num_steps):
            sig = jnp.float32(sch.sigmas[s])
            v = (x - x0) / sig
            x = flowmatch_step(x, v, sig, jnp.float32(sch.sigmas[s + 1]))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.fast
def test_flowmatch_step_preserves_dtype():
    x = jnp.ones((2, 2), jnp.bfloat16)
    out = flowmatch_step(x, x, jnp.float32(0.5), jnp.float32(0.25))
    assert out.dtype == jnp.bfloat16


@pytest.mark.fast
def test_svd_wrapper_rejects_flowmatch():
    """SVD's published weights are v-prediction EDM — a different
    parameterization; the wrapper must refuse rather than mis-sample."""
    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import StableVideoUNet

    with pytest.raises(ValueError):
        StableVideoUNet(SVDUNetConfig.tiny(), num_steps=4, solver="flowmatch")


# --------------------------- DiT integration ----------------------------- #

B, F, H, W = 1, 4, 8, 8
STEPS = 4


def test_dit_flowmatch_pipeline_stage_invariance():
    """solver='flowmatch' rides the same step_fn contract: pipelined
    output equals the single-device oracle elementwise (design invariant,
    CLAUDE.md), with the flow-match timestep/scaling conventions inside
    the step."""
    cfg = DiTVideoConfig.tiny()
    wrapper = DiTVideoWrapper(cfg, num_steps=STEPS, solver="flowmatch")
    assert wrapper.init_noise_sigma == 1.0
    assert wrapper.latent_channel_multiplier == 1  # one-step solver
    params = wrapper.init(jax.random.key(0))
    ctx = jax.random.normal(jax.random.key(6), (B, 2, cfg.cross_attention_dim))
    guidance = make_guidance_ramp(3.0, F)
    bundle = (params, ctx, guidance)
    step_fn = wrapper.pipeline_step_fn()
    inputs = (
        jax.random.normal(jax.random.key(8), (2, B, F, H, W, cfg.in_channels))
        * wrapper.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, STEPS)
    pipe = StepPipeline(make_pipeline_mesh(2), step_fn, PipelineConfig(STEPS, 2))
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_flowmatch_differs_from_euler_schedule():
    """The two parameterizations must actually sample differently (guards
    against the flowmatch branch silently falling through to EDM)."""
    cfg = DiTVideoConfig.tiny()
    w_fm = DiTVideoWrapper(cfg, num_steps=STEPS, solver="flowmatch")
    w_eu = DiTVideoWrapper(cfg, num_steps=STEPS, solver="euler")
    params = w_fm.init(jax.random.key(0))
    lat = jax.random.normal(jax.random.key(1), (B, F, H, W, cfg.in_channels))
    x_fm, x_eu = lat, lat
    for s in range(STEPS):
        x_fm = w_fm.step(params, x_fm, s)
        x_eu = w_eu.step(params, x_eu, s)
    assert float(jnp.max(jnp.abs(x_fm - x_eu))) > 1e-3
