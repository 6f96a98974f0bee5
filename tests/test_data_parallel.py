"""DP baseline and FSDP param-sharding tests on the CPU mesh.

Semantics mirrored from the reference: DP = all steps per device on a
disjoint sample shard (reference: src/modes/benchmark_data_parallel.py),
FSDP = all devices, all steps, params sharded
(reference: src/modes/benchmark.py:111-135, 199-211). Both must equal the
single-device oracle elementwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vdpp_tpu.models.dummy_unet import DummyUNet
from vdpp_tpu.parallel.data_parallel import DataParallelRunner, FSDPRunner
from vdpp_tpu.parallel.mesh import make_data_mesh, make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import run_reference_single_device
from vdpp_tpu.parallel.sharding import fsdp_specs, leaf_spec, sharded_size_bytes

TOTAL_STEPS = 6
LATENT = (1, 8, 2, 8, 8)


@pytest.fixture(scope="module")
def setup():
    model = DummyUNet(channels=8, hidden_channels=16)
    params = model.init(jax.random.key(0))
    step_fn = lambda p, x, s: model.apply(p, x, s)  # noqa: E731
    inputs = jax.random.normal(jax.random.key(1), (8, *LATENT), jnp.float32)
    ref = np.asarray(
        run_reference_single_device(step_fn, params, inputs, TOTAL_STEPS)
    )
    return model, params, step_fn, inputs, ref


def test_data_parallel_matches_oracle(setup):
    model, params, step_fn, inputs, ref = setup
    mesh = make_data_mesh(4)
    runner = DataParallelRunner(mesh, step_fn, TOTAL_STEPS)
    out = runner.run(params, inputs)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_data_parallel_rejects_indivisible(setup):
    model, params, step_fn, inputs, ref = setup
    runner = DataParallelRunner(make_data_mesh(4), step_fn, TOTAL_STEPS)
    with pytest.raises(ValueError, match="divisible"):
        runner.run(params, inputs[:3])


def test_fsdp_matches_oracle(setup):
    model, params, step_fn, inputs, ref = setup
    mesh = make_data_mesh(8)
    # min_shard_params=0: shard every leaf that divides (tiny test model).
    runner = FSDPRunner(mesh, step_fn, TOTAL_STEPS, min_shard_params=0)
    out = runner.run(params, inputs[:2])
    np.testing.assert_allclose(np.asarray(out), ref[:2], rtol=2e-5, atol=2e-5)


def test_leaf_spec_sharding_choices():
    # Large divisible leaf: largest axis sharded.
    assert leaf_spec((2048, 1024), 8, "data", min_params=0) == P("data", None)
    # Non-divisible: replicate.
    assert leaf_spec((7, 9), 8, "data", min_params=0) == P()
    # Below threshold: replicate.
    assert leaf_spec((64, 64), 8, "data", min_params=2**20) == P()


def test_fsdp_specs_reduce_memory(setup):
    model, params, _, _, _ = setup
    mesh = make_data_mesh(8)
    specs = fsdp_specs(params, mesh, "data", min_params=0)
    full = sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree_util.tree_leaves(params)
    )
    sharded = sharded_size_bytes(params, specs, mesh)
    assert sharded < full  # something actually got sharded
