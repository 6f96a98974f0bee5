"""CFG (branch-axis) parallelism: elementwise equality vs the
sequential-CFG single-device oracle, for the SVD UNet and the DiT, alone
and composed with the step pipeline and sequence parallelism — up to the
full PP x SP x CFG 3-axis mesh in one jitted program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.dit import DiTVideoConfig, DiTVideoWrapper
from vdpp_tpu.models.svd_unet import SVDUNetConfig
from vdpp_tpu.models.svd_wrapper import (
    StableVideoUNet,
    make_dummy_conditioning,
    make_guidance_ramp,
)
from vdpp_tpu.parallel.cfg_parallel import CFGParallelRunner
from vdpp_tpu.parallel.mesh import make_axes_mesh, make_cfg_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)

B, F, H, W = 1, 3, 8, 8
STEPS = 4


@pytest.fixture(scope="module")
def svd():
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=STEPS, cfg_mode="sequential")
    params = model.init(jax.random.key(0))
    cond = make_dummy_conditioning(
        jax.random.key(1), B, F, H, W,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    latent = (
        jax.random.normal(jax.random.key(2), (B, F, H, W, 4), jnp.float32)
        * model.init_noise_sigma
    )
    return model, params, cond, latent


def test_svd_cfg_parallel_matches_sequential(svd):
    model, params, cond, latent = svd
    bundle = (params, cond)
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, latent[None], STEPS
    )[0]
    runner = CFGParallelRunner(
        make_cfg_mesh(), model.pipeline_step_fn(cfg_axis="cfg"), STEPS
    )
    out = runner.run(bundle, latent)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_svd_pipeline_x_cfg(svd):
    """(stage, cfg) mesh: 2-stage step pipeline where each stage is an
    uncond/cond device pair."""
    model, params, cond, latent = svd
    bundle = (params, cond)
    inputs = jnp.stack([latent, latent * 0.7])
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, inputs, STEPS
    )
    mesh = make_axes_mesh(stage=2, cfg=2)
    pipe = StepPipeline(
        mesh, model.pipeline_step_fn(cfg_axis="cfg"), PipelineConfig(STEPS, 2)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def _dit_setup(mode):
    cfg = (
        DiTVideoConfig.tiny() if mode == "factorized"
        else DiTVideoConfig.joint3d_tiny()
    )
    wrapper = DiTVideoWrapper(cfg, num_steps=STEPS)
    params = wrapper.init(jax.random.key(3))
    ctx = jax.random.normal(jax.random.key(4), (B, 2, cfg.cross_attention_dim))
    guidance = make_guidance_ramp(5.0, 4)
    latent = (
        jax.random.normal(jax.random.key(5), (B, 4, H, W, cfg.in_channels))
        * wrapper.init_noise_sigma
    )
    return wrapper, (params, ctx, guidance), latent


def test_dit_cfg_parallel_matches_sequential():
    wrapper, bundle, latent = _dit_setup("joint3d")
    ref = run_reference_single_device(
        wrapper.pipeline_step_fn(), bundle, latent[None], STEPS
    )[0]
    runner = CFGParallelRunner(
        make_cfg_mesh(), wrapper.pipeline_step_fn(cfg_axis="cfg"), STEPS
    )
    out = runner.run(bundle, latent)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["factorized", "joint3d"])
def test_dit_pp_x_sp_x_cfg(mode):
    """The 3-axis flagship: (stage=2, seq=2, cfg=2) mesh — step pipeline,
    token sharding, and CFG branch split in ONE jitted SPMD program."""
    wrapper, bundle, latent = _dit_setup(mode)
    inputs = jnp.stack([latent, latent * 0.5])
    ref = run_reference_single_device(
        wrapper.pipeline_step_fn(), bundle, inputs, STEPS
    )
    mesh = make_axes_mesh(stage=2, seq=2, cfg=2)
    step_fn = wrapper.pipeline_step_fn(
        seq_axis="seq", seq_shards=2, cfg_axis="cfg"
    )
    pipe = StepPipeline(mesh, step_fn, PipelineConfig(STEPS, 2))
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_cfg_runner_rejects_bad_mesh():
    from vdpp_tpu.parallel.mesh import make_pipeline_mesh

    wrapper, _, _ = _dit_setup("joint3d")
    with pytest.raises(ValueError, match="cfg"):
        CFGParallelRunner(make_pipeline_mesh(2), wrapper.pipeline_step_fn(), STEPS)


# --------------------- negative-prompt conditioning -------------------- #

def test_negative_prompt_zero_context_matches_zeros_uncond():
    """A (zeros, ctx) tuple context must be BITWISE identical to the plain
    array context (whose uncond branch conditions on zeros) — the legacy
    path is the zero-negative special case."""
    wrapper, (params, ctx, guidance), latent = _dit_setup("joint3d")
    x_plain, x_tuple = latent, latent
    for s in range(STEPS):
        x_plain = wrapper.step(params, x_plain, s, ctx, guidance)
        x_tuple = wrapper.step(
            params, x_tuple, s, (jnp.zeros_like(ctx), ctx), guidance
        )
    np.testing.assert_array_equal(np.asarray(x_plain), np.asarray(x_tuple))


def test_negative_prompt_changes_the_uncond_branch():
    wrapper, (params, ctx, guidance), latent = _dit_setup("joint3d")
    neg = jax.random.normal(jax.random.key(11), ctx.shape)
    x_plain, x_neg = latent, latent
    for s in range(STEPS):
        x_plain = wrapper.step(params, x_plain, s, ctx, guidance)
        x_neg = wrapper.step(params, x_neg, s, (neg, ctx), guidance)
    assert float(jnp.max(jnp.abs(x_plain - x_neg))) > 1e-4


def test_negative_prompt_rides_the_cfg_axis():
    """With a tuple context the cfg-parallel devices condition on their
    OWN branch's encoding (device 0: negative, device 1: positive);
    output equals the sequential-CFG single-device oracle elementwise."""
    wrapper, (params, ctx, guidance), latent = _dit_setup("joint3d")
    neg = jax.random.normal(jax.random.key(12), ctx.shape)
    bundle = (params, (neg, ctx), guidance)
    ref = run_reference_single_device(
        wrapper.pipeline_step_fn(), bundle, latent[None], STEPS
    )[0]
    runner = CFGParallelRunner(
        make_cfg_mesh(), wrapper.pipeline_step_fn(cfg_axis="cfg"), STEPS
    )
    out = runner.run(bundle, latent)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_negative_prompt_cfg_axis_rejects_shape_mismatch():
    wrapper, (params, ctx, guidance), latent = _dit_setup("joint3d")
    neg = jnp.zeros((B, ctx.shape[1] + 1, ctx.shape[2]), ctx.dtype)
    runner = CFGParallelRunner(
        make_cfg_mesh(), wrapper.pipeline_step_fn(cfg_axis="cfg"), STEPS
    )
    with pytest.raises(ValueError, match="equal shape"):
        runner.run((params, (neg, ctx), guidance), latent)
