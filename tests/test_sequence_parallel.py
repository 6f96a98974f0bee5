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


# --------------------------------------------------------------------- #
# SVD UNet: halo-exchange sequence parallelism (round 3)
# --------------------------------------------------------------------- #
def _svd_setup():
    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import (
        StableVideoUNet,
        make_dummy_conditioning,
    )

    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=STEPS, cfg_mode="sequential")
    params = model.init(jax.random.key(0))
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 3, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    latent = (
        jax.random.normal(jax.random.key(2), (1, 3, 16, 16, 4), jnp.float32)
        * model.init_noise_sigma
    )
    return model, params, cond, latent


@pytest.mark.parametrize("shards", [2, 4])
def test_svd_halo_seq_parallel_matches_oracle(shards):
    """The flagship (conv) model under W-axis sequence parallelism: 3x3
    convs halo-exchange one edge column per neighbor, GroupNorm psums its
    statistics, spatial attention all_gathers K/V. Full schedule must be
    elementwise-equal to the single-device oracle — the axis the
    reference's design cannot split (reference: docs/context.md:20-26
    forbids intra-frame partitioning)."""
    from jax.sharding import PartitionSpec as P

    model, params, cond, latent = _svd_setup()
    bundle = (params, cond)
    step = model.pipeline_step_fn()
    ref = run_reference_single_device(step, bundle, latent[None], STEPS)[0]

    mesh = make_seq_mesh(shards)
    sp_step = model.pipeline_step_fn(seq_axis="seq", seq_shards=shards)

    def body(bundle, lat):
        def one(x, k):
            return sp_step(bundle, x, k), None

        x, _ = jax.lax.scan(one, lat, jnp.arange(STEPS, dtype=jnp.int32))
        return x

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False
    ))
    out = fn(bundle, latent)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_pipeline_x_halo_seq_parallel():
    """(stage, seq) mesh for the SVD UNet: step pipeline where every stage
    is itself a 2-device W-sharded group, in ONE jitted program."""
    model, params, cond, latent = _svd_setup()
    bundle = (params, cond)
    inputs = jnp.stack([latent, latent * 0.5 + 0.1])

    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, inputs, STEPS
    )

    mesh = make_stage_seq_mesh(4, 2)
    sp_step = model.pipeline_step_fn(seq_axis="seq", seq_shards=2)
    pipe = StepPipeline(mesh, sp_step, PipelineConfig(STEPS, 4))
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_pipeline_x_halo_seq_x_cfg():
    """3-axis (stage, seq, cfg) mesh for the SVD UNet: step pipeline x
    halo-exchange W sharding x CFG branch parallelism in ONE program —
    all three of the framework's latency axes composed on the flagship
    model family."""
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    model, params, cond, latent = _svd_setup()
    bundle = (params, cond)
    inputs = jnp.stack([latent, latent * 0.5 + 0.1])

    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, inputs, STEPS
    )

    mesh = make_axes_mesh(stage=2, seq=2, cfg=2)
    step = model.pipeline_step_fn(seq_axis="seq", seq_shards=2,
                                  cfg_axis="cfg")
    pipe = StepPipeline(mesh, step, PipelineConfig(STEPS, 2))
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_halo_seq_rejects_indivisible_width():
    from jax.sharding import PartitionSpec as P

    from vdpp_tpu.models.svd_wrapper import make_dummy_conditioning

    model, params, _, _ = _svd_setup()
    # W=24: 24 % (8 shards * 2^(levels-1)=16) != 0
    latent = jax.random.normal(jax.random.key(3), (1, 3, 16, 24, 4))
    cond24 = make_dummy_conditioning(
        jax.random.key(4), 1, 3, 16, 24,
        cross_dim=model.config.cross_attention_dim, guidance_scale=3.0,
    )
    mesh = make_seq_mesh(8)
    sp_step = model.pipeline_step_fn(seq_axis="seq", seq_shards=8)
    fn = jax.shard_map(
        lambda b, l: sp_step(b, l, jnp.int32(0)),
        mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False,
    )
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(fn)((params, cond24), latent)


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
