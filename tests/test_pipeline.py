"""Pipeline-engine tests on the virtual 8-device CPU mesh.

The key invariant is the reference's simulator check: the final latent is
identical for ANY stage count (reference: src/modes/simulator.py:161-162,
EXPERIMENT_REPORT.md norm 11,545.80 at 1/2/4/7 ranks). Here it is asserted
elementwise against a single-device all-steps oracle, for 1/2/4/8 stages,
all inside jitted SPMD programs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.dummy_unet import DummyUNet
from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)

TOTAL_STEPS = 8
LATENT = (1, 8, 3, 8, 8)  # (B, C, F, H, W)


@pytest.fixture(scope="module")
def model_and_params():
    model = DummyUNet(channels=8, hidden_channels=16)
    params = model.init(jax.random.key(0))
    return model, params


@pytest.fixture(scope="module")
def oracle(model_and_params):
    model, params = model_and_params
    inputs = jax.random.normal(jax.random.key(42), (3, *LATENT), jnp.float32)
    ref = run_reference_single_device(
        lambda p, x, s: model.apply(p, x, s), params, inputs, TOTAL_STEPS
    )
    return inputs, np.asarray(ref)


@pytest.mark.parametrize("num_stages", [1, 2, 4, 8])
def test_stage_count_invariance(model_and_params, oracle, num_stages):
    model, params = model_and_params
    inputs, ref = oracle
    mesh = make_pipeline_mesh(num_stages)
    pipe = StepPipeline(
        mesh,
        lambda p, x, s: model.apply(p, x, s),
        PipelineConfig(total_steps=TOTAL_STEPS, num_stages=num_stages),
    )
    out = pipe.run(params, inputs)
    assert out.shape == inputs.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_single_sample(model_and_params, oracle):
    model, params = model_and_params
    inputs, ref = oracle
    mesh = make_pipeline_mesh(4)
    pipe = StepPipeline(
        mesh,
        lambda p, x, s: model.apply(p, x, s),
        PipelineConfig(total_steps=TOTAL_STEPS, num_stages=4),
    )
    out = pipe.run(params, inputs[:1])
    np.testing.assert_allclose(np.asarray(out), ref[:1], rtol=2e-5, atol=2e-5)


def test_sample_order_preserved(model_and_params):
    # Each sample denoised independently: permuting inputs permutes outputs.
    model, params = model_and_params
    mesh = make_pipeline_mesh(2)
    pipe = StepPipeline(
        mesh,
        lambda p, x, s: model.apply(p, x, s),
        PipelineConfig(total_steps=TOTAL_STEPS, num_stages=2),
    )
    inputs = jax.random.normal(jax.random.key(7), (4, *LATENT), jnp.float32)
    out = np.asarray(pipe.run(params, inputs))
    out_rev = np.asarray(pipe.run(params, inputs[::-1]))
    np.testing.assert_allclose(out, out_rev[::-1], rtol=2e-5, atol=2e-5)


@pytest.mark.fast  # pre-commit smoke tier: pure validation, no mesh compile
def test_config_validation():
    with pytest.raises(ValueError):
        PipelineConfig(total_steps=30, num_stages=7)  # non-divisible
    with pytest.raises(ValueError):
        PipelineConfig(total_steps=0, num_stages=1)
    cfg = PipelineConfig(total_steps=28, num_stages=7)
    assert cfg.steps_per_stage == 4
    assert cfg.num_ticks(16) == 22
    assert cfg.bubble_fraction(16) == pytest.approx(6 / 22)
    assert cfg.bubble_fraction(1) == pytest.approx(6 / 7)


def test_mesh_stage_mismatch_rejected(model_and_params):
    model, params = model_and_params
    mesh = make_pipeline_mesh(2)
    with pytest.raises(ValueError, match="stage axis"):
        StepPipeline(
            mesh,
            lambda p, x, s: model.apply(p, x, s),
            PipelineConfig(total_steps=8, num_stages=4),
        )


def test_run_ticked_matches_fused(model_and_params, oracle):
    model, params = model_and_params
    inputs, ref = oracle
    mesh = make_pipeline_mesh(4)
    pipe = StepPipeline(
        mesh,
        lambda p, x, s: model.apply(p, x, s),
        PipelineConfig(total_steps=TOTAL_STEPS, num_stages=4),
    )
    out, tick_times = pipe.run_ticked(params, inputs)
    assert len(tick_times) == pipe.config.num_ticks(3)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_2d_mesh_pp_times_dp(model_and_params, oracle):
    """Combined (stage x data) mesh: each data column pipelines its own
    sample shard; result equals the single-device oracle."""
    from vdpp_tpu.parallel.mesh import make_2d_mesh

    model, params = model_and_params
    step_fn = lambda p, x, s: model.apply(p, x, s)  # noqa: E731
    mesh = make_2d_mesh(num_stages=4, num_data=2)
    pipe = StepPipeline(
        mesh, step_fn, PipelineConfig(total_steps=TOTAL_STEPS, num_stages=4)
    )
    assert pipe.data_parallel_size == 2
    inputs = jax.random.normal(jax.random.key(11), (6, *LATENT), jnp.float32)
    ref = run_reference_single_device(step_fn, params, inputs, TOTAL_STEPS)
    out = pipe.run(params, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError, match="divisible"):
        pipe.run(params, inputs[:5])


@pytest.mark.parametrize(
    "total_steps,num_stages,num_samples",
    [(6, 2, 1), (12, 4, 5), (16, 8, 3), (8, 8, 2), (24, 4, 7)],
)
def test_schedule_invariance_matrix(model_and_params, total_steps, num_stages,
                                    num_samples):
    """Randomized (T, S, N) combos: pipelined == oracle for all of them."""
    model, params = model_and_params
    step_fn = lambda p, x, s: model.apply(p, x, s)  # noqa: E731
    inputs = jax.random.normal(
        jax.random.key(total_steps * 100 + num_stages), (num_samples, *LATENT)
    )
    ref = run_reference_single_device(step_fn, params, inputs, total_steps)
    pipe = StepPipeline(
        make_pipeline_mesh(num_stages), step_fn,
        PipelineConfig(total_steps, num_stages),
    )
    out = pipe.run(params, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_multislice_mesh_layout_and_equality(model_and_params):
    """make_multislice_mesh puts data (DCN) as the leading axis and stage
    (ICI) inside each slice row; the pipeline result on that layout equals
    the single-device oracle. On the CPU platform the topology is
    simulated by splitting the flat device list."""
    from vdpp_tpu.parallel.mesh import DATA_AXIS, STAGE_AXIS, make_multislice_mesh

    model, params = model_and_params
    step_fn = lambda p, x, s: model.apply(p, x, s)  # noqa: E731
    mesh = make_multislice_mesh(num_slices=2)
    assert mesh.axis_names == (DATA_AXIS, STAGE_AXIS)
    assert mesh.shape[DATA_AXIS] == 2 and mesh.shape[STAGE_AXIS] == 4

    pipe = StepPipeline(
        mesh, step_fn, PipelineConfig(total_steps=TOTAL_STEPS, num_stages=4)
    )
    assert pipe.data_parallel_size == 2
    inputs = jax.random.normal(jax.random.key(21), (4, *LATENT), jnp.float32)
    ref = run_reference_single_device(step_fn, params, inputs, TOTAL_STEPS)
    out = pipe.run(params, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_multislice_mesh_validation():
    from vdpp_tpu.parallel.mesh import make_multislice_mesh

    with pytest.raises(ValueError, match="num_slices"):
        make_multislice_mesh()  # single-slice platform needs explicit split
    with pytest.raises(ValueError, match="devices"):
        make_multislice_mesh(num_slices=4, stages_per_slice=4)


def test_slice_rows_groups_by_slice_index():
    """Real multi-slice grouping: rows by ascending slice_index, device
    order preserved within a slice; attribute-less devices form one row."""
    from types import SimpleNamespace

    from vdpp_tpu.parallel.mesh import _slice_rows

    d = [SimpleNamespace(id=i, slice_index=i // 3) for i in range(6)]
    rows = _slice_rows([d[4], d[0], d[5], d[1], d[2], d[3]])
    assert [[x.id for x in r] for r in rows] == [[0, 1, 2], [4, 5, 3]]
    assert len(_slice_rows([SimpleNamespace(id=0), SimpleNamespace(id=1)])) == 1


def test_pipeline_and_decode_mesh_reservation():
    """Shared stage+decode device partition: auto-sized stages, disjoint
    device sets, one backend resolution, clean error when oversubscribed."""
    from vdpp_tpu.parallel.mesh import make_pipeline_and_decode_meshes

    stage_mesh, decode_mesh = make_pipeline_and_decode_meshes(None, 2)
    assert stage_mesh.shape["stage"] == 6 and decode_mesh.shape["data"] == 2
    assert not (set(stage_mesh.devices.flat) & set(decode_mesh.devices.flat))

    stage_mesh2, none = make_pipeline_and_decode_meshes(4, 0)
    assert none is None and stage_mesh2.shape["stage"] == 4

    with pytest.raises(ValueError, match="devices"):
        make_pipeline_and_decode_meshes(8, 1)
