"""Frame parallelism for the SVD UNet: elementwise equality vs the
single-device all-steps oracle, the framework-wide design invariant.

The frame axis is the SECOND intra-sample axis (after the W-halo
sequence parallelism of test_sequence_parallel.py): spatial convs,
spatial attention, and per-frame GroupNorms are frame-local (zero
communication); temporal convs halo-exchange one edge frame per
neighbor (ops/conv.py conv_temporal_halo), temporal attention
all_gathers K/V over frames, and the temporal-resnet GroupNorm
statistics — which span frames — pmean across shards.

Beyond-reference capability: the reference parallelizes only the
diffusion-step axis (reference: docs/context.md:20-26 explicitly forbids
intra-sample splits, fearing temporal-consistency breakage); both of
this framework's intra-sample axes are mathematically exact, so there is
nothing to break."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.svd_unet import SVDUNetConfig
from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_dummy_conditioning
from vdpp_tpu.parallel.mesh import make_axes_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)

STEPS = 4
FRAMES = 4


# --------------------------------------------------------------------- #
# op-level: temporal conv halo
# --------------------------------------------------------------------- #
@pytest.mark.parametrize("shards", [2, 4])
def test_conv_temporal_halo_matches_unsharded(shards):
    from jax.sharding import PartitionSpec as P

    from vdpp_tpu.ops.conv import conv_temporal, conv_temporal_halo, init_conv_temporal

    x = jax.random.normal(jax.random.key(0), (2, 8, 4, 6, 16), jnp.float32)
    p = init_conv_temporal(jax.random.key(1), 16, 16, 3)
    ref = conv_temporal(x, p)

    mesh = make_axes_mesh(frame=shards)
    fn = jax.jit(jax.shard_map(
        lambda pp, xx: conv_temporal_halo(xx, pp, "frame"),
        mesh=mesh,
        in_specs=(P(), P(None, "frame")),
        out_specs=P(None, "frame"),
        check_vma=False,
    ))
    np.testing.assert_allclose(
        np.asarray(fn(p, x)), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_conv_temporal_halo_rejects_even_kernel():
    from jax.sharding import PartitionSpec as P

    from vdpp_tpu.ops.conv import conv_temporal_halo, init_conv_temporal

    # even k: conv_temporal's symmetric SAME pad shrinks the output
    # globally — the per-shard halo form cannot reproduce it
    x = jax.random.normal(jax.random.key(0), (1, 8, 2, 2, 8), jnp.float32)
    p = init_conv_temporal(jax.random.key(1), 8, 8, 4)
    mesh = make_axes_mesh(frame=2)
    with pytest.raises(ValueError, match="odd kernel"):
        jax.shard_map(
            lambda pp, xx: conv_temporal_halo(xx, pp, "frame"),
            mesh=mesh,
            in_specs=(P(), P(None, "frame")),
            out_specs=P(None, "frame"),
            check_vma=False,
        )(p, x)


def test_conv_temporal_halo_rejects_tiny_shard():
    from jax.sharding import PartitionSpec as P

    from vdpp_tpu.ops.conv import conv_temporal_halo, init_conv_temporal

    # kernel 5 -> halo 2 > local shard 1: one-hop ppermute cannot reach
    x = jax.random.normal(jax.random.key(0), (1, 4, 2, 2, 8), jnp.float32)
    p = init_conv_temporal(jax.random.key(1), 8, 8, 5)
    mesh = make_axes_mesh(frame=4)
    with pytest.raises(ValueError, match="halo"):
        jax.shard_map(
            lambda pp, xx: conv_temporal_halo(xx, pp, "frame"),
            mesh=mesh,
            in_specs=(P(), P(None, "frame")),
            out_specs=P(None, "frame"),
            check_vma=False,
        )(p, x)


# --------------------------------------------------------------------- #
# model-level: full schedule equality
# --------------------------------------------------------------------- #
def _svd_setup(frames=FRAMES):
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=STEPS, cfg_mode="sequential")
    params = model.init(jax.random.key(0))
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, frames, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    latent = (
        jax.random.normal(jax.random.key(2), (1, frames, 16, 16, 4), jnp.float32)
        * model.init_noise_sigma
    )
    return model, params, cond, latent


def _scan_fn(step, mesh, in_specs):
    from jax.sharding import PartitionSpec as P

    def body(bundle, lat):
        def one(x, k):
            return step(bundle, x, k), None

        x, _ = jax.lax.scan(one, lat, jnp.arange(STEPS, dtype=jnp.int32))
        return x

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    ))


@pytest.mark.parametrize("shards", [2, 4])
def test_svd_frame_parallel_matches_oracle(shards):
    """Full schedule under frame sharding == single-device oracle,
    elementwise (fp32 tiny model: tight tolerance)."""
    from jax.sharding import PartitionSpec as P

    model, params, cond, latent = _svd_setup()
    bundle = (params, cond)
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, latent[None], STEPS
    )[0]

    mesh = make_axes_mesh(frame=shards)
    fp_step = model.pipeline_step_fn(frame_axis="frame", frame_shards=shards)
    fn = _scan_fn(fp_step, mesh, (P(), P()))
    np.testing.assert_allclose(
        np.asarray(fn(bundle, latent)), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_pipeline_x_frame_parallel():
    """(stage, frame) mesh: step pipeline where every stage is itself a
    2-device frame-sharded group, in ONE jitted program."""
    model, params, cond, latent = _svd_setup()
    bundle = (params, cond)
    inputs = jnp.stack([latent, latent * 0.5 + 0.1])

    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, inputs, STEPS
    )

    mesh = make_axes_mesh(stage=4, frame=2)
    fp_step = model.pipeline_step_fn(frame_axis="frame", frame_shards=2)
    pipe = StepPipeline(mesh, fp_step, PipelineConfig(STEPS, 4))
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_halo_seq_x_frame_parallel():
    """BOTH intra-sample axes in one program: W-halo sequence parallelism
    x frame parallelism on a (seq, frame) mesh — GroupNorm statistics
    that span frames pmean over the two axes jointly."""
    from jax.sharding import PartitionSpec as P

    model, params, cond, latent = _svd_setup()
    bundle = (params, cond)
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, latent[None], STEPS
    )[0]

    mesh = make_axes_mesh(seq=2, frame=2)
    step = model.pipeline_step_fn(
        seq_axis="seq", seq_shards=2, frame_axis="frame", frame_shards=2
    )
    fn = _scan_fn(step, mesh, (P(), P()))
    np.testing.assert_allclose(
        np.asarray(fn(bundle, latent)), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_frame_x_cfg_parallel():
    """(frame, cfg) mesh: frame sharding inside each CFG branch — the
    wrapper-level cfg ppermute exchanges the full-F output (already
    gathered/replicated over the frame axis by apply)."""
    from jax.sharding import PartitionSpec as P

    model, params, cond, latent = _svd_setup()
    bundle = (params, cond)
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, latent[None], STEPS
    )[0]

    mesh = make_axes_mesh(frame=2, cfg=2)
    step = model.pipeline_step_fn(
        cfg_axis="cfg", frame_axis="frame", frame_shards=2
    )
    fn = _scan_fn(step, mesh, (P(), P()))
    np.testing.assert_allclose(
        np.asarray(fn(bundle, latent)), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_frame_parallel_composes_with_int8():
    """Weight-only int8 params under frame sharding: conv_temporal_halo
    and the rest of the dispatch path must accept the quantized dicts;
    sharded-int8 output == unsharded-int8 oracle elementwise."""
    from jax.sharding import PartitionSpec as P

    from vdpp_tpu.ops.quant import quantize_tree

    model, params, cond, latent = _svd_setup()
    qbundle = (quantize_tree(params, min_size=0), cond)
    ref = run_reference_single_device(
        model.pipeline_step_fn(), qbundle, latent[None], STEPS
    )[0]

    mesh = make_axes_mesh(frame=2)
    fp_step = model.pipeline_step_fn(frame_axis="frame", frame_shards=2)
    fn = _scan_fn(fp_step, mesh, (P(), P()))
    np.testing.assert_allclose(
        np.asarray(fn(qbundle, latent)), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_frame_parallel_with_batched_cfg():
    """cfg_mode='batched' stacks cond/uncond on the BATCH axis before the
    UNet; the frame slicing inside apply is batch-oblivious, so the
    combination must stay oracle-equal."""
    from jax.sharding import PartitionSpec as P

    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=STEPS, cfg_mode="batched")
    params = model.init(jax.random.key(0))
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, FRAMES, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    latent = (
        jax.random.normal(jax.random.key(2), (1, FRAMES, 16, 16, 4), jnp.float32)
        * model.init_noise_sigma
    )
    bundle = (params, cond)
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, latent[None], STEPS
    )[0]

    mesh = make_axes_mesh(frame=2)
    fp_step = model.pipeline_step_fn(frame_axis="frame", frame_shards=2)
    fn = _scan_fn(fp_step, mesh, (P(), P()))
    np.testing.assert_allclose(
        np.asarray(fn(bundle, latent)), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_seq_x_frame_x_cfg_parallel():
    """3-axis INTRA-SAMPLE program on all 8 devices: W-halo sharding x
    frame sharding x CFG branch split — one sample's single step spread
    over 8 devices, a topology three generations beyond the reference's
    step-only axis."""
    from jax.sharding import PartitionSpec as P

    model, params, cond, latent = _svd_setup()
    bundle = (params, cond)
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, latent[None], STEPS
    )[0]

    mesh = make_axes_mesh(seq=2, frame=2, cfg=2)
    step = model.pipeline_step_fn(
        cfg_axis="cfg", seq_axis="seq", seq_shards=2,
        frame_axis="frame", frame_shards=2,
    )
    fn = _scan_fn(step, mesh, (P(), P()))
    np.testing.assert_allclose(
        np.asarray(fn(bundle, latent)), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_svd_frame_rejects_indivisible_frames():
    """F=3 cannot shard 2-way; the guard must fire at trace time."""
    from jax.sharding import PartitionSpec as P

    model, params, cond, latent = _svd_setup(frames=3)
    bundle = (params, cond)
    mesh = make_axes_mesh(frame=2)
    fp_step = model.pipeline_step_fn(frame_axis="frame", frame_shards=2)
    with pytest.raises(ValueError, match="not divisible"):
        jax.shard_map(
            lambda bb, ll: fp_step(bb, ll, jnp.int32(0)),
            mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False,
        )(bundle, latent)


def test_mesh_builder_rejects_oversized_per_stage_group():
    """Auto-sized stage count must raise, not silently return a stage=0
    mesh, when seq*frame exceeds the device count (code-review finding)."""
    from vdpp_tpu.parallel.mesh import make_pipeline_and_decode_meshes

    with pytest.raises(ValueError, match="exceeds"):
        make_pipeline_and_decode_meshes(None, 0, frame=16)
