"""DeepCache-style cached inference (SVDUNet.apply_cached + wrapper).

The technique (Ma et al. 2023) is BEYOND the reference — an opt-in
speed/quality trade like --solver. What these tests pin:

* the ``use_full`` branch of apply_cached is the plain forward (parity
  with ``apply``);
* a shallow step fed the cache captured at the SAME input reproduces the
  full forward (the deep path is deterministic, so splicing its own
  output back in must be an identity up to roundoff);
* interval=1 (always full) equals the baseline euler run;
* identity-step schedule padding stays EXACT (the cache cadence counts
  real steps, so padded and unpadded schedules agree elementwise);
* the cache rides the pipeline payload: pipelined == single-device
  oracle (the repo's core design invariant) with the cache lanes packed
  along channels;
* the bf16 bitcast lane packing roundtrips exactly;
* invalid compositions are rejected loudly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig
from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_dummy_conditioning
from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)

B, F, H, W = 1, 3, 16, 16
STEPS = 4


@pytest.fixture(scope="module")
def tiny():
    cfg = SVDUNetConfig.tiny()
    unet = SVDUNet(cfg)
    params = unet.init(jax.random.key(0))
    return cfg, unet, params


@pytest.fixture(scope="module")
def cond():
    cfg = SVDUNetConfig.tiny()
    return make_dummy_conditioning(
        jax.random.key(1), B, F, H, W,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )


def _run_schedule(model, params, cond_, noise):
    x = model.pack_initial(noise)
    for s in range(model.num_steps):
        x = model.step(params, x, s, cond_)
    return np.asarray(model.unpack_final(x))


def test_full_branch_matches_plain_apply(tiny):
    cfg, unet, params = tiny
    x = jax.random.normal(jax.random.key(2), (B, F, H, W, 8))
    ctx = jax.random.normal(jax.random.key(3), (B, 1, cfg.cross_attention_dim))
    atids = jnp.zeros((B, 3))
    ts = jnp.float32(1.3)
    ref = unet.apply(params, x, ts, ctx, atids)
    cache0 = jnp.zeros(unet.cache_feature_shape(B, F, H, W, 1), cfg.dtype)
    out, cache = unet.apply_cached(
        params, x, ts, ctx, atids, cache0, jnp.bool_(True)
    )
    # Same ops, separately compiled programs (lax.cond branch vs straight
    # line) — fp32 roundoff only.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    assert cache.shape == unet.cache_feature_shape(B, F, H, W, 1)


def test_shallow_with_same_input_cache_reproduces_full(tiny):
    """Splicing the deep feature captured at the SAME input back in must
    reproduce the full forward — the correctness anchor for the cache
    plumbing (any skip-tensor misalignment would show here)."""
    cfg, unet, params = tiny
    x = jax.random.normal(jax.random.key(4), (B, F, H, W, 8))
    ctx = jax.random.normal(jax.random.key(5), (B, 1, cfg.cross_attention_dim))
    atids = jnp.zeros((B, 3))
    ts = jnp.float32(0.7)
    cache0 = jnp.zeros(unet.cache_feature_shape(B, F, H, W, 1), cfg.dtype)
    full, cache = unet.apply_cached(
        params, x, ts, ctx, atids, cache0, jnp.bool_(True)
    )
    shallow, cache_out = unet.apply_cached(
        params, x, ts, ctx, atids, cache, jnp.bool_(False)
    )
    np.testing.assert_allclose(np.asarray(shallow), np.asarray(full),
                               rtol=1e-4, atol=1e-5)
    # Shallow steps pass the cache through untouched.
    assert jnp.array_equal(cache, cache_out)


def test_interval_one_equals_baseline(tiny, cond):
    cfg, unet, params = tiny
    base = StableVideoUNet(cfg, num_steps=STEPS)
    dc = StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=1)
    noise = (
        jax.random.normal(jax.random.key(6), (B, F, H, W, 4))
        * base.init_noise_sigma
    )
    r_base = _run_schedule(base, params, cond, noise)
    r_dc = _run_schedule(dc, params, cond, noise)
    np.testing.assert_allclose(r_dc, r_base, rtol=1e-4, atol=1e-5)


def test_interval_two_deviates_but_stays_finite(tiny, cond):
    """interval=2 actually takes the shallow branch (outputs differ from
    the baseline) and stays numerically sane — the opt-in trade the flag
    documents."""
    cfg, unet, params = tiny
    base = StableVideoUNet(cfg, num_steps=6)
    dc = StableVideoUNet(cfg, num_steps=6, deepcache_interval=2)
    noise = (
        jax.random.normal(jax.random.key(7), (B, F, H, W, 4))
        * base.init_noise_sigma
    )
    r_base = _run_schedule(base, params, cond, noise)
    r_dc = _run_schedule(dc, params, cond, noise)
    assert np.isfinite(r_dc).all()
    dev = np.linalg.norm(r_dc - r_base) / np.linalg.norm(r_base)
    assert 0.0 < dev < 1.0, dev  # different, same order of magnitude


def test_padded_schedule_matches_unpadded_exactly(tiny, cond):
    """The cache cadence counts REAL steps (identity-padded leading steps
    clamp to real index 0), so padding changes nothing elementwise."""
    cfg, unet, params = tiny
    dc = StableVideoUNet(cfg, num_steps=6, deepcache_interval=2)
    dcp = StableVideoUNet(cfg, num_steps=6, pad_steps_to=4,
                          deepcache_interval=2)
    assert dcp.num_steps == 8
    noise = (
        jax.random.normal(jax.random.key(8), (B, F, H, W, 4))
        * dc.init_noise_sigma
    )
    a = _run_schedule(dc, params, cond, noise)
    b = _run_schedule(dcp, params, cond, noise)
    np.testing.assert_array_equal(a, b)


def test_pipeline_stage_invariance_with_deepcache(tiny, cond):
    """The cache lanes ride the stage hand-off packed along channels:
    pipelined == single-device oracle, the repo's core invariant."""
    cfg, unet, params = tiny
    model = StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2)
    step_fn = model.pipeline_step_fn()
    bundle = (params, cond)
    noise = (
        jax.random.normal(jax.random.key(9), (2, B, F, H, W, 4))
        * model.init_noise_sigma
    )
    inputs = model.pack_initial(noise)
    assert inputs.shape[-1] == 4 + model.payload_extra_channels
    ref = run_reference_single_device(step_fn, bundle, inputs, STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2), step_fn, PipelineConfig(STEPS, 2)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    final = model.unpack_final(out)
    assert final.shape == noise.shape


def test_batched_cfg_mode_runs(tiny, cond):
    """cfg_mode='batched' carries both branch caches stacked on the batch
    axis through one UNet call; output stays close to sequential (same
    math, different fusion)."""
    cfg, unet, params = tiny
    seqm = StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2)
    batm = StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2,
                           cfg_mode="batched")
    noise = (
        jax.random.normal(jax.random.key(10), (B, F, H, W, 4))
        * seqm.init_noise_sigma
    )
    a = _run_schedule(seqm, params, cond, noise)
    b = _run_schedule(batm, params, cond, noise)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_bf16_cache_lane_packing_roundtrips_exactly():
    """bf16 caches bit-pack two-per-fp32 payload word
    (lax.bitcast_convert_type) — the roundtrip must be bitwise."""
    cfg = dataclasses.replace(SVDUNetConfig.tiny(), dtype=jnp.bfloat16)
    model = StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2)
    shape = model.unet.cache_feature_shape(B, F, H, W, 1)
    cache = jax.random.normal(jax.random.key(11), shape, jnp.bfloat16)
    packed = model._pack_cache(cache, H, W)
    assert packed.dtype == jnp.float32
    assert packed.shape[-1] == model._deepcache_packed_channels()
    back = model._unpack_cache(packed, H, W)
    assert back.dtype == jnp.bfloat16
    assert jnp.array_equal(back, cache)


def test_composes_with_dpmpp2m(tiny, cond):
    """deepcache x dpmpp2m — the production fast path (half the steps AND
    cached steps). Payload = [x ‖ old x0_hat ‖ cache lanes]; pipelined ==
    single-device oracle, and padding exactness survives the composition
    (padded steps are first-order no-ops AND clamp to real index 0)."""
    cfg, unet, params = tiny
    model = StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2,
                            solver="dpmpp2m")
    step_fn = model.pipeline_step_fn()
    bundle = (params, cond)
    noise = (
        jax.random.normal(jax.random.key(12), (2, B, F, H, W, 4))
        * model.init_noise_sigma
    )
    inputs = model.pack_initial(noise)
    assert inputs.shape[-1] == 8 + model.payload_extra_channels
    ref = run_reference_single_device(step_fn, bundle, inputs, STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2), step_fn, PipelineConfig(STEPS, 2)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert model.unpack_final(out).shape == noise.shape

    # Padding exactness for the composition.
    dc = StableVideoUNet(cfg, num_steps=6, deepcache_interval=2,
                         solver="dpmpp2m")
    dcp = StableVideoUNet(cfg, num_steps=6, pad_steps_to=4,
                          deepcache_interval=2, solver="dpmpp2m")
    one = noise[0]
    a = _run_schedule(dc, params, cond, one)
    b = _run_schedule(dcp, params, cond, one)
    np.testing.assert_array_equal(a, b)


def test_composes_with_int8_weights(tiny, cond):
    """deepcache x weight-only int8 (the serving capacity combo): both
    branches of the lax.cond read the same quantized leaves; the run must
    match the full-precision deepcache run loosely and stay finite."""
    from vdpp_tpu.ops.quant import quantize_tree

    cfg, unet, params = tiny
    model = StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2)
    noise = (
        jax.random.normal(jax.random.key(13), (B, F, H, W, 4))
        * model.init_noise_sigma
    )
    ref = _run_schedule(model, params, cond, noise)
    q = _run_schedule(model, quantize_tree(params), cond, noise)
    assert np.isfinite(q).all()
    # int8 weight rounding: same trajectory, quantization-level deviation.
    dev = np.linalg.norm(q - ref) / np.linalg.norm(ref)
    assert dev < 0.2, dev


def test_invalid_compositions_rejected(tiny, cond):
    cfg, unet, params = tiny
    with pytest.raises(ValueError, match="heun"):
        StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2,
                        solver="heun")
    with pytest.raises(ValueError, match="split"):
        StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2,
                        deepcache_split=cfg.num_levels)
    model = StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2)
    noise = jnp.zeros((B, F, H, W, 4), jnp.float32)
    with pytest.raises(ValueError, match="fp32"):
        model.pack_initial(noise.astype(jnp.bfloat16))


# --------------------------------------------------------------------- #
# deepcache x intra-sample parallel axes (round 5: exclusion lifted)
#
# The cache enters/leaves apply_cached replicated over the seq/frame
# axes (each shard slices its local W/frame block — the cache's spatial
# grid shards like the latent's, shard-exactly by the seq_min_divisor
# width check); under cfg parallelism the wrapper exchanges per-branch
# caches with the eps in one ppermute pair. Every combination must equal
# the UNSHARDED deepcache schedule elementwise (2e-5, the same bound the
# plain seq/frame tests use for psum-order roundoff).
# --------------------------------------------------------------------- #
DC_FRAMES = 4


def _dc_setup(frames=DC_FRAMES, solver="euler", interval=2):
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=STEPS, cfg_mode="sequential",
                            deepcache_interval=interval, solver=solver)
    params = model.init(jax.random.key(0))
    cond_ = make_dummy_conditioning(
        jax.random.key(1), 1, frames, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    latent = (
        jax.random.normal(jax.random.key(2), (1, frames, 16, 16, 4),
                          jnp.float32)
        * model.init_noise_sigma
    )
    return model, params, cond_, latent


def _dc_scan_fn(step, mesh):
    from jax.sharding import PartitionSpec as P

    def body(bundle, lat):
        def one(x, k):
            return step(bundle, x, k), None

        x, _ = jax.lax.scan(one, lat, jnp.arange(STEPS, dtype=jnp.int32))
        return x

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False
    ))


@pytest.mark.parametrize(
    "axes,kwargs",
    [
        ({"frame": 2}, dict(frame_axis="frame", frame_shards=2)),
        ({"seq": 2}, dict(seq_axis="seq", seq_shards=2)),
        ({"cfg": 2}, dict(cfg_axis="cfg")),
    ],
    ids=["frame", "seq", "cfg"],
)
def test_deepcache_x_intra_sample_axis_matches_oracle(axes, kwargs):
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    model, params, cond_, latent = _dc_setup()
    bundle = (params, cond_)
    inputs = model.pack_initial(latent)
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, inputs[None], STEPS
    )[0]
    fn = _dc_scan_fn(model.pipeline_step_fn(**kwargs), make_axes_mesh(**axes))
    out = fn(bundle, inputs)
    # FULL payload comparison: pins the gathered/exchanged cache lanes,
    # not just the latent head.
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_deepcache_x_dpmpp2m_x_seq_x_cfg_matches_oracle():
    """The production fast path (dpmpp2m x deepcache) on the planner's
    best LATENCY topology (seq x cfg) — the round-4 verdict's one
    mutually-exclusive feature pair, now composed in a single program:
    payload = [x ‖ old x0_hat ‖ cache_u ‖ cache_c] under both axes."""
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    model, params, cond_, latent = _dc_setup(solver="dpmpp2m")
    bundle = (params, cond_)
    inputs = model.pack_initial(latent)
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, inputs[None], STEPS
    )[0]
    step = model.pipeline_step_fn(cfg_axis="cfg", seq_axis="seq", seq_shards=2)
    fn = _dc_scan_fn(step, make_axes_mesh(seq=2, cfg=2))
    out = fn(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_deepcache_x_pipeline_x_frame_parallel():
    """(stage, frame) mesh with deepcache: the cache lanes ride the stage
    hand-off while each stage is a 2-device frame-sharded group."""
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    model, params, cond_, latent = _dc_setup()
    bundle = (params, cond_)
    inputs = model.pack_initial(jnp.stack([latent, latent * 0.5 + 0.1]))
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, inputs, STEPS
    )
    mesh = make_axes_mesh(stage=2, frame=2)
    step = model.pipeline_step_fn(frame_axis="frame", frame_shards=2)
    pipe = StepPipeline(mesh, step, PipelineConfig(STEPS, 2))
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.fast
def test_pipeline_refuses_stage_divergent_cond_branches():
    """deepcache x intra-sample axis x pipeline is only deadlock-free when
    the cached/full cond predicate is stage-invariant: steps_per_stage
    must be a multiple of the interval (branch bodies contain collectives
    — halo ppermutes, K/V gathers — and stages parked in different
    branches hang the rendezvous). StepPipeline must refuse the divergent
    config at CONSTRUCTION time; the runtime failure mode is a hang, not
    an error."""
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    model, params, cond_, latent = _dc_setup()
    step = model.pipeline_step_fn(frame_axis="frame", frame_shards=2)
    mesh = make_axes_mesh(stage=4, frame=2)
    # STEPS=4 over 4 stages -> 1 step/stage, interval=2: divergent.
    with pytest.raises(ValueError, match="collectives"):
        StepPipeline(mesh, step, PipelineConfig(STEPS, 4))
    # Padded schedules are refused too (real-index clamping diverges).
    padded = StableVideoUNet(
        dataclasses.replace(SVDUNetConfig.tiny()), num_steps=3,
        pad_steps_to=2, deepcache_interval=1,
    )
    pstep = padded.pipeline_step_fn(frame_axis="frame", frame_shards=2)
    pmesh = make_axes_mesh(stage=2, frame=2)
    with pytest.raises(ValueError, match="collectives"):
        StepPipeline(pmesh, pstep, PipelineConfig(padded.num_steps, 2))
    # No intra-sample axis -> no collectives inside the branches -> any
    # stage count stays legal (dryrun case pp-deepcache-2m relies on it).
    plain = model.pipeline_step_fn()
    StepPipeline(make_pipeline_mesh(4), plain, PipelineConfig(STEPS, 4))


def test_single_stage_deepcache_x_seq_is_exempt_and_matches_oracle():
    """num_stages == 1 is exempt from the collective-uniformity refusal:
    with one stage every device runs the SAME step index at every scan
    slot, so the cached/full predicate is globally uniform whatever the
    cadence. Regression: the check used to refuse interval-3 on 4 steps
    even at a single stage (e.g. restyle --seq-parallel N, all devices
    one stage), a config that is deadlock-free and oracle-exact."""
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    model, params, cond_, latent = _dc_setup(interval=3)  # 4 % 3 != 0
    bundle = (params, cond_)
    inputs = model.pack_initial(latent[None])
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, inputs, STEPS
    )
    mesh = make_axes_mesh(stage=1, seq=2)
    step = model.pipeline_step_fn(seq_axis="seq", seq_shards=2)
    pipe = StepPipeline(mesh, step, PipelineConfig(STEPS, 1))
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.fast
def test_planner_filters_divergent_deepcache_plans():
    """plan_topology(deepcache_interval=N) must never emit a plan that
    StepPipeline would refuse: multi-stage x intra-sample-axis plans need
    an unpadded schedule with steps_per_stage % N == 0."""
    from vdpp_tpu.parallel.topology import plan_topology

    plans = plan_topology(
        8, total_steps=6, frames=4, latent_w=64, deepcache_interval=4,
        max_plans=10_000,
    )
    assert plans, "filter must not empty the plan list (stage-only plans)"
    for p in plans:
        if p.stage > 1 and (p.seq > 1 or p.frame > 1):
            assert p.padded_steps == 6, p
            assert (6 // p.stage) % 4 == 0, p
    # and the filter is actually exercised: the unfiltered planner DOES
    # propose such plans.
    unfiltered = plan_topology(8, total_steps=6, frames=4, latent_w=64,
                               max_plans=10_000)
    assert any(
        p.stage > 1 and (p.seq > 1 or p.frame > 1)
        and ((6 // p.stage) % 4 or p.padded_steps != 6)
        for p in unfiltered
    )


def test_composes_with_euler_a(tiny, cond):
    """deepcache x euler_a: one model eval per step (same cadence as
    euler), the ancestral noise is injected OUTSIDE the cached/full
    branch — pipelined == single-device oracle with the cache lanes and
    the stochastic update riding the same payload."""
    cfg, unet, params = tiny
    model = StableVideoUNet(cfg, num_steps=STEPS, deepcache_interval=2,
                            solver="euler_a", sampler_seed=5)
    step_fn = model.pipeline_step_fn()
    bundle = (params, cond)
    noise = (
        jax.random.normal(jax.random.key(21), (2, B, F, H, W, 4))
        * model.init_noise_sigma
    )
    inputs = model.pack_initial(noise)
    ref = run_reference_single_device(step_fn, bundle, inputs, STEPS)
    pipe = StepPipeline(
        make_pipeline_mesh(2), step_fn, PipelineConfig(STEPS, 2)
    )
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert model.unpack_final(out).shape == noise.shape
