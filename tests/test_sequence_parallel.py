"""Sequence (token-axis) parallelism: elementwise equality vs the
single-device all-steps oracle — the framework-wide design invariant —
for both DiT attention modes, plus the 2-D (stage x seq) composition.

Beyond-reference capability: the reference parallelizes only the
diffusion-step axis (reference: docs/context.md constraints), so one
sample's per-step latency never improves with more ranks. Token sharding
is the orthogonal axis (PipeDiT/STADI-style, PAPERS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.dit import DiTVideoConfig, DiTVideoWrapper
from vdpp_tpu.models.svd_wrapper import make_guidance_ramp
from vdpp_tpu.parallel.mesh import make_seq_mesh, make_stage_seq_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)
from vdpp_tpu.parallel.sequence_parallel import SequenceParallelRunner

B, F, H, W = 1, 4, 8, 8
STEPS = 4


def _setup(mode):
    cfg = (
        DiTVideoConfig.tiny()
        if mode == "factorized"
        else DiTVideoConfig.joint3d_tiny()
    )
    wrapper = DiTVideoWrapper(cfg, num_steps=STEPS)
    params = wrapper.init(jax.random.key(0))
    ctx = jax.random.normal(jax.random.key(1), (B, 2, cfg.cross_attention_dim))
    guidance = make_guidance_ramp(3.0, F)
    latent = (
        jax.random.normal(jax.random.key(2), (B, F, H, W, cfg.in_channels))
        * wrapper.init_noise_sigma
    )
    return cfg, wrapper, params, ctx, guidance, latent


def _oracle(wrapper, params, ctx, guidance, latent):
    step_fn = wrapper.pipeline_step_fn()
    return run_reference_single_device(
        step_fn, (params, ctx, guidance), latent[None], STEPS
    )[0]


@pytest.mark.parametrize("mode", ["factorized", "joint3d"])
@pytest.mark.parametrize("shards", [2, 4])
def test_seq_parallel_matches_oracle(mode, shards):
    cfg, wrapper, params, ctx, guidance, latent = _setup(mode)
    ref = _oracle(wrapper, params, ctx, guidance, latent)
    runner = SequenceParallelRunner(make_seq_mesh(shards), wrapper)
    out = runner.run(params, latent, ctx, guidance)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_seq_parallel_unconditioned():
    _, wrapper, params, _, _, latent = _setup("joint3d")
    ref = _oracle(wrapper, params, None, None, latent)
    runner = SequenceParallelRunner(make_seq_mesh(2), wrapper)
    out = runner.run(params, latent)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("mode", ["factorized", "joint3d"])
def test_pipeline_x_seq_parallel(mode):
    """(stage, seq) mesh: the step pipeline where each stage is itself a
    token-sharded 2-device group — PP x SP in ONE jitted program."""
    cfg, wrapper, params, ctx, guidance, latent = _setup(mode)
    bundle = (params, ctx, guidance)
    inputs = jnp.stack([latent, latent * 0.5 + 0.1])

    ref = run_reference_single_device(
        wrapper.pipeline_step_fn(), bundle, inputs, STEPS
    )

    mesh = make_stage_seq_mesh(4, 2)
    sp_step = wrapper.pipeline_step_fn(seq_axis="seq", seq_shards=2)
    pipe = StepPipeline(mesh, sp_step, PipelineConfig(STEPS, 4))
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_seq_parallel_rejects_bad_mesh():
    from vdpp_tpu.parallel.mesh import make_pipeline_mesh

    wrapper = DiTVideoWrapper(DiTVideoConfig.tiny(), num_steps=STEPS)
    with pytest.raises(ValueError, match="seq"):
        SequenceParallelRunner(make_pipeline_mesh(2), wrapper)


def test_seq_parallel_rejects_indivisible_tokens():
    cfg, wrapper, params, ctx, guidance, _ = _setup("factorized")
    # 6x8 latent -> 3x4=12 within-frame tokens, not divisible by 8 shards.
    latent = jax.random.normal(jax.random.key(3), (B, F, 6, 8, cfg.in_channels))
    runner = SequenceParallelRunner(make_seq_mesh(8), wrapper)
    with pytest.raises(ValueError, match="divisible"):
        runner.run(params, latent, ctx, guidance)
