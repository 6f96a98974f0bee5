"""int8 weight-only quantization: roundtrip accuracy, byte halving, and
full-model / pipelined execution with quantized weights."""

import jax
import jax.numpy as jnp
import numpy as np

from vdpp_tpu.models.svd_unet import SVDUNetConfig
from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_dummy_conditioning
from vdpp_tpu.ops.linear import init_linear, linear
from vdpp_tpu.ops.quant import (
    dequantize_weight,
    param_bytes,
    quantize_tree,
    quantize_weight,
)
from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)


def test_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.key(0), (64, 128), jnp.float32)
    # scale columns wildly to exercise per-channel scales
    w = w * jnp.logspace(-3, 2, 128)[None, :]
    deq = dequantize_weight(quantize_weight(w), jnp.float32)
    rel = np.abs(np.asarray(deq - w)).max(axis=0) / np.abs(np.asarray(w)).max(axis=0)
    assert rel.max() < 1 / 127  # per-channel symmetric int8 bound


def test_expert_stacked_scales_strictly_improve():
    """Per-(expert, channel) scales (quantize_weight expert_stacked) must
    strictly beat one shared per-channel scale when experts differ in
    dynamic range — the exact failure mode of the shared scheme: a hot
    expert's amax crushes a quiet expert's resolution."""
    key = jax.random.key(3)
    w = jax.random.normal(key, (4, 32, 64), jnp.float32)
    # experts at wildly different magnitudes
    w = w * jnp.array([0.01, 0.1, 1.0, 10.0])[:, None, None]
    deq_shared = dequantize_weight(quantize_weight(w), jnp.float32)
    deq_expert = dequantize_weight(
        quantize_weight(w, expert_stacked=True), jnp.float32
    )

    def per_expert_rel(deq):
        # max |error| within each (expert, channel), relative to that
        # expert-channel's own amax — the resolution each expert gets
        return np.abs(np.asarray(deq - w)).max(axis=1) / np.abs(
            np.asarray(w)
        ).max(axis=1)

    rel_shared, rel_expert = per_expert_rel(deq_shared), per_expert_rel(deq_expert)
    # per-expert scheme meets the symmetric int8 bound for EVERY expert;
    # the shared scheme leaves the quietest expert ~1000x under-resolved
    assert rel_expert.max() < 1 / 127
    assert rel_shared.max() > 100 * rel_expert.max()
    # strict improvement on every expert-channel (<= elementwise, < on the
    # quiet experts)
    assert (rel_expert <= rel_shared + 1e-12).all()
    # scale carries the leading expert dim, broadcastable against q
    scale = quantize_weight(w, expert_stacked=True)["scale"]
    assert scale.shape == (4, 1, 64)


def test_linear_dispatch_matches_dequant():
    p = init_linear(jax.random.key(1), 32, 48, jnp.float32)
    x = jax.random.normal(jax.random.key(2), (4, 32), jnp.float32)
    pq = quantize_tree(p, min_size=0)
    assert isinstance(pq["w"], dict) and pq["w"]["q"].dtype == jnp.int8
    want = x @ dequantize_weight(pq["w"], jnp.float32) + p["b"]
    np.testing.assert_allclose(
        np.asarray(linear(x, pq)), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_model_bytes_halve_and_forward_close():
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=4)
    params = model.init(jax.random.key(0))
    qparams = quantize_tree(params, min_size=256)

    base = param_bytes(params)
    quant = param_bytes(qparams)
    # tiny model has many small unquantized leaves; still a clear drop.
    assert quant < 0.75 * base

    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 3, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    lat = jax.random.normal(jax.random.key(2), (1, 3, 16, 16, 4), jnp.float32)
    a = model.step(params, lat, jnp.int32(0), cond)
    b = model.step(qparams, lat, jnp.int32(0), cond)
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, rel  # weight-only int8: small relative drift


def test_a8_marking_rules():
    """quantize_tree(act_int8=True): only 2-D linears and 4-D spatial
    convs with >= 64 in AND out channels get the "q8" mark; first/last
    thin layers, temporal convs (5-D), and MoE stacks stay weight-only."""
    from vdpp_tpu.ops.conv import init_conv2d, init_conv_temporal

    k = jax.random.key(0)
    tree = {
        "big_lin": init_linear(k, 64, 128),
        "thin_lin": init_linear(k, 8, 128),
        "big_conv": init_conv2d(k, 64, 64),
        "in_conv": init_conv2d(k, 8, 64),
        "t_conv": init_conv_temporal(k, 64, 64),
        "moe": {"w_in": jax.random.normal(k, (4, 64, 128), jnp.float32)},
    }
    q = quantize_tree(tree, min_size=0, act_int8=True)
    assert "q8" in q["big_lin"]["w"] and "q" not in q["big_lin"]["w"]
    assert "q8" in q["big_conv"]["w"]
    for name in ("thin_lin", "in_conv", "t_conv"):
        assert "q" in q[name]["w"] and "q8" not in q[name]["w"], name
    assert "q" in q["moe"]["w_in"]
    # default (weight-only) never marks
    q2 = quantize_tree(tree, min_size=0)
    assert all("q8" not in leaf["w"] for leaf in
               (q2["big_lin"], q2["big_conv"]))
    # a8_convs=False: linears keep the a8 mark, convs fall back to
    # weight-only (the measured-regression mode — docs/performance.md
    # "W8A8 full forward")
    q3 = quantize_tree(tree, min_size=0, act_int8=True, a8_convs=False)
    assert "q8" in q3["big_lin"]["w"]
    assert "q" in q3["big_conv"]["w"] and "q8" not in q3["big_conv"]["w"]


def test_int8_dot_matches_manual():
    """int8_dot is EXACTLY per-row symmetric quantization + integer GEMM
    + the two-scale dequant — pinned against a numpy re-derivation."""
    from vdpp_tpu.ops.quant import int8_dot

    x = jax.random.normal(jax.random.key(1), (5, 32), jnp.float32) * 3.0
    p = quantize_tree(init_linear(jax.random.key(2), 32, 48), min_size=0,
                      act_int8=False)
    # hand-build an a8 weight from the weight-only form
    wq = {"q8": p["w"]["q"], "scale": p["w"]["scale"]}

    xs = np.abs(np.asarray(x)).max(axis=-1, keepdims=True) / 127.0
    qx = np.clip(np.round(np.asarray(x) / xs), -127, 127).astype(np.int32)
    want = (qx @ np.asarray(wq["q8"], np.int32)) * xs * np.asarray(wq["scale"])
    got = np.asarray(int8_dot(x, wq))
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6, atol=1e-6)


def _int_representable(key, shape, lo=-127, hi=127):
    """Random integer-valued floats whose per-tensor amax is exactly 127,
    so symmetric int8 quantization is LOSSLESS (scale == 1, q == x)."""
    v = jax.random.randint(key, shape, lo, hi + 1).astype(jnp.float32)
    flat = v.reshape(-1)
    v = flat.at[0].set(127.0).reshape(shape)
    return v


def test_a8_conv_geometry_exact_against_float_conv():
    """With losslessly-representable activations AND weights, the a8
    im2col GEMM must EXACTLY equal the float lax.conv — pinning the
    patch order, SAME-padding split, and stride alignment at stride 1
    and 2, odd and even spatial sizes."""
    from vdpp_tpu.ops.conv import conv2d

    for stride, hw in [(1, 9), (1, 8), (2, 8), (2, 12)]:
        kx, kw = jax.random.split(jax.random.key(10 * stride + hw))
        x = _int_representable(kx, (2, hw, hw, 64))
        w = jax.random.randint(kw, (3, 3, 64, 64), -127, 128).astype(jnp.float32)
        # per-channel lossless: force each output channel's amax to 127
        w = w.at[0, 0, 0, :].set(127.0)
        b = jax.random.normal(jax.random.key(3), (64,), jnp.float32)
        pf = {"w": w, "b": b}
        pq = {"w": quantize_weight(w, a8=True), "b": b}
        assert "q8" in pq["w"]
        ref = conv2d(x, pf, stride=stride)
        got = conv2d(x, pq, stride=stride)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref),
            err_msg=f"stride={stride} hw={hw}",
        )


def test_a8_model_forward_close_and_pipeline_oracle_equal():
    """Full tiny SVD forward under W8A8: (a) close to the float forward
    (per-tensor conv scales + per-row linear scales bound the drift);
    (b) the pipelined-equals-oracle invariant holds EXACTLY W8A8-vs-W8A8
    (same traced program on both sides)."""
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=4)
    params = model.init(jax.random.key(0))
    qparams = quantize_tree(params, min_size=256, act_int8=True)
    # the 64-channel level must actually carry a8 marks
    leaves = jax.tree_util.tree_leaves_with_path(qparams)
    assert any("q8" in str(path[-1]) for path, _ in leaves)

    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 3, 16, 16, cross_dim=cfg.cross_attention_dim
    )
    lat = jax.random.normal(jax.random.key(2), (1, 3, 16, 16, 4), jnp.float32)
    a = np.asarray(model.step(params, lat, jnp.int32(0), cond), np.float64)
    b = np.asarray(model.step(qparams, lat, jnp.int32(0), cond), np.float64)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.1, rel

    step_fn = model.pipeline_step_fn()
    bundle = (qparams, cond)
    inputs = (
        jax.random.normal(jax.random.key(4), (2, 1, 3, 16, 16, 4), jnp.float32)
        * model.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, 4)
    pipe = StepPipeline(make_pipeline_mesh(4), step_fn, PipelineConfig(4, 4))
    out = pipe.run(bundle, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fsdp_composes_with_int8():
    """FSDP parameter sharding over int8 weights: the q tensors shard
    like any other large leaf (specs are dtype-agnostic) — the two memory
    levers stack (sharded bytes ~ full_int8 / n_devices)."""
    from vdpp_tpu.parallel.data_parallel import FSDPRunner
    from vdpp_tpu.parallel.mesh import make_data_mesh

    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=2)
    params = model.init(jax.random.key(0))
    qparams = quantize_tree(params, min_size=256)
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 3, 16, 16, cross_dim=cfg.cross_attention_dim
    )
    step_fn = model.pipeline_step_fn()
    lat = jax.random.normal(jax.random.key(2), (1, 1, 3, 16, 16, 4), jnp.float32)

    ref = run_reference_single_device(step_fn, (qparams, cond), lat, 2)
    mesh = make_data_mesh(4)
    runner = FSDPRunner(mesh, step_fn, total_steps=2, min_shard_params=1024)
    out = runner.run((qparams, cond), lat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_runs_quantized():
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=4)
    qparams = quantize_tree(model.init(jax.random.key(0)), min_size=256)
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 3, 16, 16, cross_dim=cfg.cross_attention_dim
    )
    bundle = (qparams, cond)
    step_fn = model.pipeline_step_fn()
    inputs = (
        jax.random.normal(jax.random.key(2), (2, 1, 3, 16, 16, 4), jnp.float32)
        * model.init_noise_sigma
    )
    ref = run_reference_single_device(step_fn, bundle, inputs, 4)
    pipe = StepPipeline(make_pipeline_mesh(4), step_fn, PipelineConfig(4, 4))
    out = pipe.run(bundle, inputs)
    # design invariant holds for the quantized model too
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    assert bool(jnp.all(jnp.isfinite(out)))


# --------------------------------------------------------------------- #
# W8A8 x intra-sample sharding (round-4 ADVICE fixes): the activation
# scale must be mesh-GLOBAL so the sharded int8 GEMM is BIT-identical to
# the unsharded one.
# --------------------------------------------------------------------- #
def test_a8_conv2d_halo_bitexact_vs_unsharded():
    """a8 conv under W-axis sharding: pmax'd per-tensor scale + int8 halo
    exchange reproduce the unsharded int8 GEMM exactly (integer
    arithmetic, identical scalar scales) — the property that makes
    --weights-w8a8 legal under --seq-parallel. Covers stride 1 (SAME) and
    the stride-2 downsample site's explicit ((1,1),(1,1)) padding."""
    from jax.sharding import PartitionSpec as P

    from vdpp_tpu.ops.conv import conv2d, conv2d_halo, init_conv2d
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    for stride in (1, 2):
        kx, kw2 = jax.random.split(jax.random.key(stride))
        x = jax.random.normal(kx, (2, 8, 8, 64), jnp.float32)
        p = init_conv2d(kw2, 64, 64, 3)
        pq = {"w": quantize_weight(p["w"], a8=True), "b": p["b"]}
        assert "q8" in pq["w"]
        if stride == 1:
            ref = conv2d(x, pq)
        else:
            ref = conv2d(x, pq, stride=2, padding=((1, 1), (1, 1)))
        mesh = make_axes_mesh(seq=4)
        fn = jax.jit(jax.shard_map(
            lambda pp, xx, s=stride: conv2d_halo(xx, pp, "seq", stride=s),
            mesh=mesh, in_specs=(P(), P(None, None, "seq")),
            out_specs=P(None, None, "seq"), check_vma=False,
        ))
        np.testing.assert_array_equal(
            np.asarray(fn(pq, x)), np.asarray(ref),
            err_msg=f"stride={stride}",
        )


def test_a8_conv2d_frame_sharded_bitexact():
    """a8 conv whose ROWS (B*F) are sharded over a frame axis: with
    amax_axes=("frame",) the per-tensor activation scale pmaxes to the
    global value, so the frame-local conv equals the unsharded one
    bit-for-bit (the round-3 ADVICE finding: a local scale silently broke
    W8A8 oracle equality under --frame-parallel)."""
    from jax.sharding import PartitionSpec as P

    from vdpp_tpu.ops.conv import conv2d, init_conv2d
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    kx, kw2 = jax.random.split(jax.random.key(7))
    x = jax.random.normal(kx, (4, 6, 6, 64), jnp.float32)
    p = init_conv2d(kw2, 64, 64, 3)
    pq = {"w": quantize_weight(p["w"], a8=True), "b": p["b"]}
    ref = conv2d(x, pq)
    mesh = make_axes_mesh(frame=2)
    fn = jax.jit(jax.shard_map(
        lambda pp, xx: conv2d(xx, pp, amax_axes=("frame",)),
        mesh=mesh, in_specs=(P(), P("frame")), out_specs=P("frame"),
        check_vma=False,
    ))
    np.testing.assert_array_equal(np.asarray(fn(pq, x)), np.asarray(ref))


def _w8a8_svd_setup():
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=4, cfg_mode="sequential")
    qparams = quantize_tree(
        model.init(jax.random.key(0)), min_size=256, act_int8=True
    )
    leaves = jax.tree_util.tree_leaves_with_path(qparams)
    assert any("q8" in str(path[-1]) for path, _ in leaves)
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 4, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    latent = (
        jax.random.normal(jax.random.key(2), (1, 4, 16, 16, 4), jnp.float32)
        * model.init_noise_sigma
    )
    return model, (qparams, cond), latent


def _sharded_schedule(mesh, step, bundle, latent, steps=4):
    from jax.sharding import PartitionSpec as P

    def body(bundle, lat):
        def one(x, k):
            return step(bundle, x, k), None

        x, _ = jax.lax.scan(one, lat, jnp.arange(steps, dtype=jnp.int32))
        return x

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False
    ))
    return fn(bundle, latent)


def _assert_quant_step_bounded(out, ref, rel_bound=0.06, cos_bound=0.999):
    """W8A8 x intra-sample sharding drift contract.

    Unlike the float/weight-only paths (elementwise 2e-5), end-to-end
    W8A8 equality across DIFFERENTLY-SHARDED traced programs is not
    achievable: the sharded program's psum'd GroupNorm statistics and
    gathered attention reassociate fp reductions at the ~1-ulp level, and
    every dynamic int8 quantization turns a 1-ulp input difference at a
    rounding boundary into a FULL quantization-step flip (~amax/127).
    The site-level contract IS exact — given bit-equal inputs the sharded
    conv/linear int8 GEMMs are bit-identical (the two bitexact op tests
    above) — so the residual model-level drift is pure quantization noise,
    the same class as W8A8-vs-float drift (measured relL2 ~2.6%, cosine
    0.9997 at the tiny config; bounds carry ~2x margin)."""
    a = np.asarray(out, np.float64)
    b = np.asarray(ref, np.float64)
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    cos = (a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum())
    assert rel < rel_bound, f"relative L2 {rel:.4g} >= {rel_bound}"
    assert cos > cos_bound, f"cosine {cos:.6f} <= {cos_bound}"


def test_w8a8_model_seq_parallel_quant_bounded():
    """Full tiny SVD forward, W8A8 weights, W-axis sequence parallelism:
    drift vs the single-device W8A8 oracle is bounded by quantization
    noise (the old conv2d_halo silently DEQUANTIZED a8 convs to float —
    a different program, not a quantization of the same one)."""
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    model, bundle, latent = _w8a8_svd_setup()
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, latent[None], 4
    )[0]
    out = _sharded_schedule(
        make_axes_mesh(seq=2),
        model.pipeline_step_fn(seq_axis="seq", seq_shards=2),
        bundle, latent,
    )
    _assert_quant_step_bounded(out, ref)


def test_w8a8_model_frame_parallel_quant_bounded():
    """Full tiny SVD forward, W8A8 weights, frame parallelism: the
    frame-local spatial convs quantize with the pmax'd global scale
    (without it each shard derived its own per-tensor scale — the
    round-3 ADVICE finding); residual drift is quantization noise."""
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    model, bundle, latent = _w8a8_svd_setup()
    ref = run_reference_single_device(
        model.pipeline_step_fn(), bundle, latent[None], 4
    )[0]
    out = _sharded_schedule(
        make_axes_mesh(frame=2),
        model.pipeline_step_fn(frame_axis="frame", frame_shards=2),
        bundle, latent,
    )
    _assert_quant_step_bounded(out, ref)
