"""SVD UNet + wrapper tests (tiny config, identical code path to svd_xt).

The reference validates its wrapper by numerical comparison against
diffusers (reference: scripts/compare_with_official.py) — diffusers is not
installed here, so these tests pin architecture contracts: shapes,
determinism, CFG semantics (batched == sequential; guidance ramp math),
scheduler integration, traced-step equivalence, and pipeline integration
with stage-count invariance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig
from vdpp_tpu.models.svd_wrapper import (
    StableVideoUNet,
    latent_from_reference_layout,
    latent_to_reference_layout,
    make_dummy_conditioning,
    make_guidance_ramp,
)
from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)

B, F, H, W = 1, 3, 16, 16
NUM_STEPS = 4


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = SVDUNetConfig.tiny()
    unet = SVDUNet(cfg)
    params = unet.init(jax.random.key(0))
    return cfg, unet, params


@pytest.fixture(scope="module")
def wrapper_and_cond():
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=NUM_STEPS)
    params = model.init(jax.random.key(0))
    cond = make_dummy_conditioning(
        jax.random.key(1), B, F, H, W, cross_dim=cfg.cross_attention_dim,
        guidance_scale=3.0,
    )
    return model, params, cond


def test_unet_output_shape(tiny_unet):
    cfg, unet, params = tiny_unet
    x = jax.random.normal(jax.random.key(2), (B, F, H, W, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(3), (B, 1, cfg.cross_attention_dim))
    tids = jnp.zeros((B, 3))
    out = unet.apply(params, x, jnp.float32(1.0), ctx, tids)
    assert out.shape == (B, F, H, W, cfg.out_channels)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_deterministic(tiny_unet):
    cfg, unet, params = tiny_unet
    x = jax.random.normal(jax.random.key(4), (B, F, H, W, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(5), (B, 1, cfg.cross_attention_dim))
    tids = jnp.zeros((B, 3))
    a = unet.apply(params, x, jnp.float32(0.5), ctx, tids)
    b = unet.apply(params, x, jnp.float32(0.5), ctx, tids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_timestep_sensitivity(tiny_unet):
    cfg, unet, params = tiny_unet
    x = jax.random.normal(jax.random.key(6), (B, F, H, W, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(7), (B, 1, cfg.cross_attention_dim))
    tids = jnp.zeros((B, 3))
    a = unet.apply(params, x, jnp.float32(0.0), ctx, tids)
    b = unet.apply(params, x, jnp.float32(1.5), ctx, tids)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_unet_context_sensitivity(tiny_unet):
    cfg, unet, params = tiny_unet
    x = jax.random.normal(jax.random.key(8), (B, F, H, W, cfg.in_channels))
    tids = jnp.zeros((B, 3))
    ctx1 = jax.random.normal(jax.random.key(9), (B, 1, cfg.cross_attention_dim))
    a = unet.apply(params, x, jnp.float32(1.0), ctx1, tids)
    b = unet.apply(params, x, jnp.float32(1.0), jnp.zeros_like(ctx1), tids)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_unet_odd_spatial_dims(tiny_unet):
    # H/W only need divisibility by 2**(levels-1); tiny has 2 levels.
    cfg, unet, params = tiny_unet
    x = jax.random.normal(jax.random.key(10), (B, F, 10, 6, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(11), (B, 1, cfg.cross_attention_dim))
    out = unet.apply(params, x, jnp.float32(1.0), ctx, jnp.zeros((B, 3)))
    assert out.shape == (B, F, 10, 6, cfg.out_channels)


def test_svd_xt_config_paramcount():
    # The full architecture should land at ~1.5B params like the real
    # SVD-XT UNet; build shapes without materializing weights via eval_shape.
    cfg = SVDUNetConfig.svd_xt()
    unet = SVDUNet(cfg)
    shapes = jax.eval_shape(lambda k: unet.init(k), jax.random.key(0))
    n = sum(
        int(np.prod(leaf.shape)) for leaf in jax.tree_util.tree_leaves(shapes)
    )
    assert 1.3e9 < n < 1.7e9, f"param count {n/1e9:.2f}B out of expected range"


def test_guidance_ramp():
    g = make_guidance_ramp(3.0, 5)
    assert g.shape == (1, 5, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(g).ravel(), np.linspace(1.0, 3.0, 5), rtol=1e-6)
    assert make_guidance_ramp(None, 5) is None
    assert make_guidance_ramp(1.0, 5) is None


def test_layout_roundtrip():
    x = jax.random.normal(jax.random.key(12), (2, 4, 3, 8, 6))  # (B,C,F,H,W)
    y = latent_from_reference_layout(x)
    assert y.shape == (2, 3, 8, 6, 4)
    np.testing.assert_array_equal(
        np.asarray(latent_to_reference_layout(y)), np.asarray(x)
    )


def test_cfg_batched_equals_sequential(wrapper_and_cond):
    model, params, cond = wrapper_and_cond
    model_b = StableVideoUNet(model.config, num_steps=NUM_STEPS, cfg_mode="batched")
    lat = jax.random.normal(jax.random.key(13), (B, F, H, W, 4))
    a = model.step(params, lat, 1, cond)
    b = model_b.step(params, lat, 1, cond)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_no_cfg_path(wrapper_and_cond):
    model, params, _ = wrapper_and_cond
    cond = make_dummy_conditioning(
        jax.random.key(14), B, F, H, W,
        cross_dim=model.config.cross_attention_dim, guidance_scale=None,
    )
    lat = jax.random.normal(jax.random.key(15), (B, F, H, W, 4))
    out = model.step(params, lat, 0, cond)
    assert out.shape == lat.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_step_traced_equals_python(wrapper_and_cond):
    model, params, cond = wrapper_and_cond
    lat = jax.random.normal(jax.random.key(16), (B, F, H, W, 4))

    @jax.jit
    def f(i):
        return model.step(params, lat, i, cond)

    np.testing.assert_allclose(
        np.asarray(f(jnp.int32(2))),
        np.asarray(model.step(params, lat, 2, cond)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_full_schedule_reduces_noise_scale(wrapper_and_cond):
    # After the final step (sigma_next == 0) the latent magnitude must be
    # O(data scale), not O(init_noise_sigma) — the schedule contracted.
    model, params, cond = wrapper_and_cond
    lat = (
        jax.random.normal(jax.random.key(17), (B, F, H, W, 4))
        * model.init_noise_sigma
    )
    x = lat
    for s in range(NUM_STEPS):
        x = model.step(params, x, s, cond)
    assert float(jnp.max(jnp.abs(x))) < float(jnp.max(jnp.abs(lat))) / 10.0


def test_svd_pipeline_stage_invariance(wrapper_and_cond):
    """End-to-end: the SVD denoiser under the SPMD pipeline equals the
    single-device oracle for multiple stage counts."""
    model, params, cond = wrapper_and_cond
    step_fn = model.pipeline_step_fn()
    bundle = (params, cond)
    inputs = (
        jax.random.normal(jax.random.key(18), (2, B, F, H, W, 4))
        * model.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, NUM_STEPS)
    for stages in (2, 4):
        pipe = StepPipeline(
            make_pipeline_mesh(stages),
            step_fn,
            PipelineConfig(total_steps=NUM_STEPS, num_stages=stages),
        )
        out = pipe.run(bundle, inputs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_svd_pipeline_stage_invariance_fused_gn(wrapper_and_cond):
    """The design invariant must survive the fused-GN knob: the STAGE axis
    never shards intra-sample statistics, so a fused-GN wrapper under the
    pipeline equals the fused-GN single-device oracle exactly as the
    unfused one does (the seq/frame combination is rejected instead —
    tests/test_norm_kernel.py)."""
    import dataclasses

    _, params, cond = wrapper_and_cond
    cfg = dataclasses.replace(SVDUNetConfig.tiny(), fused_groupnorm=True)
    model = StableVideoUNet(cfg, num_steps=NUM_STEPS)
    step_fn = model.pipeline_step_fn()
    bundle = (params, cond)
    inputs = (
        jax.random.normal(jax.random.key(18), (2, B, F, H, W, 4))
        * model.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, NUM_STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2),
        step_fn,
        PipelineConfig(total_steps=NUM_STEPS, num_stages=2),
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_svd_pipeline_stage_invariance_heun(wrapper_and_cond):
    """The 2nd-order Heun solver rides the same step_fn contract (its two
    model evals are internal to one step), so pipelined output must equal
    the single-device oracle unchanged."""
    _, params, cond = wrapper_and_cond
    model = StableVideoUNet(SVDUNetConfig.tiny(), num_steps=NUM_STEPS,
                            solver="heun")
    step_fn = model.pipeline_step_fn()
    bundle = (params, cond)
    inputs = (
        jax.random.normal(jax.random.key(19), (2, B, F, H, W, 4))
        * model.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, NUM_STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2),
        step_fn,
        PipelineConfig(total_steps=NUM_STEPS, num_stages=2),
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    # And the solver actually denoises: the full heun schedule must shrink
    # the latent scale like the euler one does.
    assert float(jnp.std(out)) < float(jnp.std(inputs))


def test_svd_pipeline_stage_invariance_dpmpp2m(wrapper_and_cond):
    """DPM-Solver++ (2M) carries CROSS-step state (the previous x0_hat)
    through the pipeline, packed along the latent channel axis
    (pack_initial/unpack_final). The packed payload must hand off between
    stages like any latent: pipelined == single-device oracle."""
    _, params, cond = wrapper_and_cond
    model = StableVideoUNet(SVDUNetConfig.tiny(), num_steps=NUM_STEPS,
                            solver="dpmpp2m")
    step_fn = model.pipeline_step_fn()
    bundle = (params, cond)
    noise = (
        jax.random.normal(jax.random.key(20), (2, B, F, H, W, 4))
        * model.init_noise_sigma
    )
    inputs = model.pack_initial(noise)
    assert inputs.shape[-1] == 8  # [x ‖ old x0_hat]
    ref = run_reference_single_device(step_fn, bundle, inputs, NUM_STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2),
        step_fn,
        PipelineConfig(total_steps=NUM_STEPS, num_stages=2),
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    final = model.unpack_final(out)
    assert final.shape == noise.shape
    assert float(jnp.std(final)) < float(jnp.std(noise))


def test_svd_dpmpp2m_padded_schedule_matches_unpadded(wrapper_and_cond):
    """Identity-step padding must stay EXACT under the multistep solver:
    the padded steps leave x bitwise unchanged and force the first real
    step back to first order (h_last == 0), so a 6-step schedule padded
    to 8 produces the same final latent as the unpadded 6-step one."""
    _, params, cond = wrapper_and_cond
    base = StableVideoUNet(SVDUNetConfig.tiny(), num_steps=6,
                           solver="dpmpp2m")
    padded = StableVideoUNet(SVDUNetConfig.tiny(), num_steps=6,
                             pad_steps_to=4, solver="dpmpp2m")
    assert padded.num_steps == 8
    noise = (
        jax.random.normal(jax.random.key(21), (B, F, H, W, 4))
        * base.init_noise_sigma
    )

    def run(model):
        x = model.pack_initial(noise)
        for s in range(model.num_steps):
            x = model.step(params, x, s, cond)
        return np.asarray(model.unpack_final(x))

    np.testing.assert_allclose(run(padded), run(base), rtol=1e-5, atol=1e-6)


def test_svd_euler_a_padded_schedule_matches_unpadded(wrapper_and_cond):
    """The ancestral sampler must draw the SAME per-step noise sequence
    under identity padding: _ancestral_noise folds on the REAL step index
    (pad-adjusted), so a 6-step schedule padded to 8 produces the same
    final latent as the unpadded 6-step one. Regression: folding on the
    raw step index made output depend on the stage count whenever
    auto-padding kicked in (restyle/production --pad-schedule)."""
    _, params, cond = wrapper_and_cond
    base = StableVideoUNet(SVDUNetConfig.tiny(), num_steps=6,
                           solver="euler_a", sampler_seed=7)
    padded = StableVideoUNet(SVDUNetConfig.tiny(), num_steps=6,
                             pad_steps_to=4, solver="euler_a",
                             sampler_seed=7)
    assert padded.num_steps == 8
    noise = (
        jax.random.normal(jax.random.key(22), (B, F, H, W, 4))
        * base.init_noise_sigma
    )

    def run(model):
        x = model.pack_initial(noise)
        for s in range(model.num_steps):
            x = model.step(params, x, s, cond)
        return np.asarray(model.unpack_final(x))

    np.testing.assert_array_equal(run(padded), run(base))


def test_temporal_tblock_matches_transpose_formulation():
    """The layout-preserving temporal block must equal the original
    (B*L, F, C)-transposed formulation elementwise."""
    from vdpp_tpu.models.svd_unet import (
        _Keys,
        _init_temporal_tblock,
        _temporal_tblock,
    )
    from vdpp_tpu.ops.attention import attention
    from vdpp_tpu.ops.linear import geglu_ff
    from vdpp_tpu.ops.normalization import layer_norm

    cfg = SVDUNetConfig.tiny()
    kg = _Keys(jax.random.key(0))
    dim, heads, batch, frames, l = 32, 2, 2, 3, 10
    p = _init_temporal_tblock(kg, cfg, dim)
    # widen cross weights to a chosen context dim for this test
    x = jax.random.normal(jax.random.key(1), (batch * frames, l, dim))
    ctx_b = jax.random.normal(jax.random.key(2), (batch, 1, cfg.cross_attention_dim))

    got = _temporal_tblock(p, x, ctx_b, heads, batch, frames)

    # original formulation: transpose to (B*L, F, C), run plain blocks
    h = x.reshape(batch, frames, l, dim).transpose(0, 2, 1, 3).reshape(
        batch * l, frames, dim
    )
    time_ctx = jnp.broadcast_to(
        ctx_b[:, None], (batch, l, 1, cfg.cross_attention_dim)
    ).reshape(batch * l, 1, cfg.cross_attention_dim)
    residual = h
    h = geglu_ff(layer_norm(h, p["norm_in"]), p["ff_in"]) + residual
    h = h + attention(layer_norm(h, p["norm1"]), p["attn1"], heads)
    h = h + attention(layer_norm(h, p["norm2"]), p["attn2"], heads, context=time_ctx)
    h = h + geglu_ff(layer_norm(h, p["norm3"]), p["ff"])
    expected = h.reshape(batch, l, frames, dim).transpose(0, 2, 1, 3).reshape(
        batch * frames, l, dim
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


def test_denoise_from_matches_full_schedule_tail(wrapper_and_cond):
    """SDEdit truncation (denoise_from=k): running the sliced wrapper is
    BITWISE the tail of the full wrapper's trajectory — slice the full
    run at step k and finish it with the truncated schedule."""
    model, params, cond = wrapper_and_cond
    k = 2
    part = StableVideoUNet(model.config, num_steps=NUM_STEPS, denoise_from=k)
    assert part.num_steps == NUM_STEPS - k
    assert part.sigma_start == float(model.schedule.sigmas[k])
    lat0 = (
        jax.random.normal(jax.random.key(30), (B, F, H, W, 4), jnp.float32)
        * model.init_noise_sigma
    )
    # Full trajectory to step k, then onward with the FULL wrapper...
    x = lat0
    for s in range(NUM_STEPS):
        x = model.step(params, x, s, cond)
        if s == k - 1:
            mid = x
    # ...vs resuming the mid-state through the TRUNCATED wrapper.
    y = mid
    for s in range(part.num_steps):
        y = part.step(params, y, s, cond)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_denoise_from_pipeline_stage_invariance(wrapper_and_cond):
    """The truncated schedule rides the pipeline unchanged: pipelined ==
    single-device oracle (the restyle app's configuration)."""
    model, params, cond = wrapper_and_cond
    part = StableVideoUNet(model.config, num_steps=NUM_STEPS, denoise_from=2)
    step_fn = part.pipeline_step_fn()
    bundle = (params, cond)
    x0 = jax.random.normal(jax.random.key(31), (1, B, F, H, W, 4), jnp.float32)
    noise = jax.random.normal(jax.random.key(32), x0.shape, jnp.float32)
    inputs = x0 + part.sigma_start * noise  # the SDEdit init
    ref = run_reference_single_device(step_fn, bundle, inputs, part.num_steps)
    pipe = StepPipeline(
        make_pipeline_mesh(2), step_fn, PipelineConfig(part.num_steps, 2)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
