"""DiT video model tests: shapes, conditioning, and pipeline integration —
the model-agnosticism proof for the step-pipeline layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.dit import DiTVideo, DiTVideoConfig, DiTVideoWrapper
from vdpp_tpu.models.svd_wrapper import make_guidance_ramp
from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)

B, F, H, W = 1, 4, 8, 8
STEPS = 4


@pytest.fixture(scope="module")
def dit():
    cfg = DiTVideoConfig.tiny()
    m = DiTVideo(cfg)
    return cfg, m, m.init(jax.random.key(0))


def test_output_shape(dit):
    cfg, m, params = dit
    x = jax.random.normal(jax.random.key(1), (B, F, H, W, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(2), (B, 2, cfg.cross_attention_dim))
    y = m.apply(params, x, jnp.float32(0.5), ctx)
    assert y.shape == (B, F, H, W, cfg.out_channels)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_context_sensitivity(dit):
    cfg, m, params = dit
    x = jax.random.normal(jax.random.key(3), (B, F, H, W, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(4), (B, 2, cfg.cross_attention_dim))
    a = m.apply(params, x, jnp.float32(0.5), ctx)
    bb = m.apply(params, x, jnp.float32(0.5), jnp.zeros_like(ctx))
    assert not np.allclose(np.asarray(a), np.asarray(bb))


def test_temporal_mixing(dit):
    # Changing frame 0 must affect frame 1 (temporal attention).
    cfg, m, params = dit
    x = jax.random.normal(jax.random.key(5), (B, F, H, W, cfg.in_channels))
    x2 = x.at[:, 0].add(1.0)
    a = m.apply(params, x, jnp.float32(0.5), None)
    bb = m.apply(params, x2, jnp.float32(0.5), None)
    assert not np.allclose(np.asarray(a[:, 1]), np.asarray(bb[:, 1]))


def test_latte_xl_param_budget():
    cfg = DiTVideoConfig.latte_xl()
    m = DiTVideo(cfg)
    shapes = jax.eval_shape(lambda k: m.init(k), jax.random.key(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    # Latte-XL class: ~700M-1B params with factorized blocks + cross-attn.
    assert 5e8 < n < 1.3e9, f"{n/1e6:.0f}M"


def test_dit_under_pipeline_stage_invariance(dit):
    cfg, _, params = dit
    wrapper = DiTVideoWrapper(cfg, num_steps=STEPS)
    ctx = jax.random.normal(jax.random.key(6), (B, 2, cfg.cross_attention_dim))
    guidance = make_guidance_ramp(3.0, F)
    bundle = (params, ctx, guidance)
    step_fn = wrapper.pipeline_step_fn()
    inputs = (
        jax.random.normal(jax.random.key(7), (2, B, F, H, W, cfg.in_channels))
        * wrapper.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(4), step_fn, PipelineConfig(STEPS, 4)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_dit_heun_pipeline_stage_invariance(dit):
    """solver='heun' rides the same step_fn contract on the DiT family:
    pipelined output equals the single-device oracle (the two model evals
    live inside one step)."""
    cfg, _, params = dit
    wrapper = DiTVideoWrapper(cfg, num_steps=STEPS, solver="heun")
    ctx = jax.random.normal(jax.random.key(6), (B, 2, cfg.cross_attention_dim))
    guidance = make_guidance_ramp(3.0, F)
    bundle = (params, ctx, guidance)
    step_fn = wrapper.pipeline_step_fn()
    inputs = (
        jax.random.normal(jax.random.key(8), (2, B, F, H, W, cfg.in_channels))
        * wrapper.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2), step_fn, PipelineConfig(STEPS, 2)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_dit_dpmpp2m_pipeline_stage_invariance(dit):
    """solver='dpmpp2m' threads the previous x0_hat through the pipeline
    packed along channels; pipelined output equals the single-device
    oracle, and unpack_final recovers the latent shape."""
    cfg, _, params = dit
    wrapper = DiTVideoWrapper(cfg, num_steps=STEPS, solver="dpmpp2m")
    ctx = jax.random.normal(jax.random.key(6), (B, 2, cfg.cross_attention_dim))
    guidance = make_guidance_ramp(3.0, F)
    bundle = (params, ctx, guidance)
    step_fn = wrapper.pipeline_step_fn()
    noise = (
        jax.random.normal(jax.random.key(9), (2, B, F, H, W, cfg.in_channels))
        * wrapper.init_noise_sigma
    )
    inputs = wrapper.pack_initial(noise)
    ref = run_reference_single_device(step_fn, bundle, inputs, STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2), step_fn, PipelineConfig(STEPS, 2)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    assert wrapper.unpack_final(out).shape == noise.shape


def test_wrapper_full_schedule_contracts(dit):
    cfg, _, params = dit
    wrapper = DiTVideoWrapper(cfg, num_steps=STEPS)
    lat = (
        jax.random.normal(jax.random.key(8), (B, F, H, W, cfg.in_channels))
        * wrapper.init_noise_sigma
    )
    x = lat
    for s in range(STEPS):
        x = wrapper.step(params, x, s)
    assert float(jnp.max(jnp.abs(x))) < float(jnp.max(jnp.abs(lat))) / 10.0


# ------------------------- joint3d (CogVideoX-style) ----------------- #
@pytest.fixture(scope="module")
def dit3d():
    cfg = DiTVideoConfig.joint3d_tiny()
    m = DiTVideo(cfg)
    return cfg, m, m.init(jax.random.key(5))


def test_joint3d_output_shape_and_finite(dit3d):
    cfg, m, params = dit3d
    x = jax.random.normal(jax.random.key(6), (B, F, H, W, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(7), (B, 2, cfg.cross_attention_dim))
    out = m.apply(params, x, jnp.float32(1.0), ctx)
    assert out.shape == (B, F, H, W, cfg.out_channels)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_joint3d_temporal_mixing(dit3d):
    """Joint attention must mix information ACROSS frames: perturbing one
    frame changes other frames' outputs."""
    cfg, m, params = dit3d
    x = jax.random.normal(jax.random.key(8), (B, F, H, W, cfg.in_channels))
    ctx = jnp.zeros((B, 2, cfg.cross_attention_dim))
    a = m.apply(params, x, jnp.float32(1.0), ctx)
    x2 = x.at[:, 0].add(1.0)
    b2 = m.apply(params, x2, jnp.float32(1.0), ctx)
    # frames other than the perturbed one must change too
    assert not np.allclose(np.asarray(a[:, 1:]), np.asarray(b2[:, 1:]))


def test_joint3d_under_pipeline_stage_invariance(dit3d):
    cfg, m, params = dit3d
    wrapper = DiTVideoWrapper(cfg, num_steps=STEPS)
    ctx = jax.random.normal(jax.random.key(9), (B, 2, cfg.cross_attention_dim))
    bundle = (params, ctx, None)
    step_fn = wrapper.pipeline_step_fn()
    inputs = (
        jax.random.normal(jax.random.key(10), (2, B, F, H, W, cfg.in_channels))
        * wrapper.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2), step_fn, PipelineConfig(total_steps=STEPS, num_stages=2)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_dit_euler_a_pipeline_stage_invariance(dit):
    """solver='euler_a': the injected noise is a pure function of
    (sampler_seed, step), so the pipelined run and the single-device
    oracle draw IDENTICAL noise — elementwise equality survives a
    stochastic sampler. Also pins determinism and seed sensitivity."""
    cfg, _, params = dit
    wrapper = DiTVideoWrapper(cfg, num_steps=STEPS, solver="euler_a",
                              sampler_seed=7)
    ctx = jax.random.normal(jax.random.key(6), (B, 2, cfg.cross_attention_dim))
    guidance = make_guidance_ramp(3.0, F)
    bundle = (params, ctx, guidance)
    step_fn = wrapper.pipeline_step_fn()
    inputs = (
        jax.random.normal(jax.random.key(8), (2, B, F, H, W, cfg.in_channels))
        * wrapper.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2), step_fn, PipelineConfig(STEPS, 2)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # Deterministic given (sampler_seed, inputs)...
    out2 = pipe.run(bundle, inputs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # ...and a different sampler_seed injects different noise.
    w2 = DiTVideoWrapper(cfg, num_steps=STEPS, solver="euler_a",
                         sampler_seed=8)
    ref2 = run_reference_single_device(
        w2.pipeline_step_fn(), bundle, inputs, STEPS
    )
    assert float(jnp.max(jnp.abs(jnp.asarray(ref) - jnp.asarray(ref2)))) > 1e-4
    # The stochastic path differs from deterministic euler.
    w_eu = DiTVideoWrapper(cfg, num_steps=STEPS, solver="euler")
    ref_eu = run_reference_single_device(
        w_eu.pipeline_step_fn(), bundle, inputs, STEPS
    )
    assert float(jnp.max(jnp.abs(jnp.asarray(ref) - jnp.asarray(ref_eu)))) > 1e-4
