"""DummyUNet contract tests (shape preservation, step dependence).

Mirrors the reference's model-interface tests
(reference: tests/test_dummy_unet.py:1-41) plus traced-step behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.dummy_unet import DummyUNet


@pytest.fixture(scope="module")
def model_and_params():
    model = DummyUNet(channels=8, hidden_channels=16)
    params = model.init(jax.random.key(0))
    return model, params


@pytest.mark.parametrize("batch", [1, 2, 3])
def test_shape_preserved_across_batch(model_and_params, batch):
    model, params = model_and_params
    x = jnp.ones((batch, 8, 4, 8, 8), jnp.float32)
    y = model.apply(params, x, 0)
    assert y.shape == x.shape
    assert y.dtype == x.dtype


@pytest.mark.parametrize("hw", [(8, 8), (16, 12), (6, 10)])
def test_shape_preserved_across_resolution(model_and_params, hw):
    model, params = model_and_params
    h, w = hw
    x = jnp.ones((1, 8, 3, h, w), jnp.float32)
    y = model.apply(params, x, 5)
    assert y.shape == x.shape


def test_step_zero_is_layernorm_residual_only(model_and_params):
    # tanh(0/10) == 0, so the conv branch is disabled at step 0.
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(1), (1, 8, 3, 8, 8))
    y = model.apply(params, x, 0)
    # output = x + LN(x): differs from x but is independent of conv params.
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_step_ordering_matters(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(2), (1, 8, 3, 8, 8))
    a = model.apply(params, model.apply(params, x, 1), 2)
    b = model.apply(params, model.apply(params, x, 2), 1)
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_traced_step_matches_python_step(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(3), (1, 8, 3, 8, 8))

    @jax.jit
    def f(step):
        return model.apply(params, x, step)

    np.testing.assert_allclose(
        np.asarray(f(jnp.int32(7))),
        np.asarray(model.apply(params, x, 7)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_no_layernorm_variant():
    model = DummyUNet(channels=4, hidden_channels=8, use_layernorm=False)
    params = model.init(jax.random.key(0))
    assert "ln" not in params
    x = jnp.ones((1, 4, 2, 8, 8), jnp.float32)
    assert model.apply(params, x, 3).shape == x.shape
