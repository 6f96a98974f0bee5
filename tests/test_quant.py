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
