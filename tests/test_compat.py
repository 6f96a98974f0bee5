"""Reference-API compatibility layer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.compat import (
    LatentSpec,
    resolve_backend,
    run_pipeline_latents,
    run_single_latent,
)
from vdpp_tpu.models.dummy_unet import DummyUNet
from vdpp_tpu.parallel.pipeline import run_reference_single_device

pytestmark = pytest.mark.fast  # pre-commit smoke tier (.pre-commit-config.yaml)


def test_resolve_backend_semantics(monkeypatch):
    monkeypatch.delenv("VDPP_BACKEND", raising=False)
    assert resolve_backend(simulator=True) == "cpu"
    assert resolve_backend(simulator=False) == "tpu"
    assert resolve_backend("cpu") == "cpu"
    monkeypatch.setenv("VDPP_BACKEND", "cpu")
    assert resolve_backend() == "cpu"
    with pytest.raises(ValueError):
        resolve_backend("nccl")


def test_latent_spec_empty():
    spec = LatentSpec((1, 8, 2, 4, 4))
    x = spec.empty()
    assert x.shape == (1, 8, 2, 4, 4)
    assert float(jnp.sum(jnp.abs(x))) == 0.0


def test_run_single_latent_matches_oracle():
    model = DummyUNet(channels=8, hidden_channels=16)
    params = model.init(jax.random.key(0))
    step_fn = lambda p, x, s: model.apply(p, x, s)  # noqa: E731
    latent = jax.random.normal(jax.random.key(1), (1, 8, 2, 8, 8))
    out = run_single_latent(
        step_fn, params=params, total_steps=8, world_size=4, input_latent=latent
    )
    ref = run_reference_single_device(step_fn, params, latent[None], 8)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_run_pipeline_latents_with_descending_timesteps():
    # reference simulator semantics: model receives timesteps [T-1..0]
    model = DummyUNet(channels=8, hidden_channels=16)
    params = model.init(jax.random.key(0))
    step_fn = lambda p, x, s: model.apply(p, x, s)  # noqa: E731
    total = 8
    ts = list(range(total - 1, -1, -1))
    keys = jax.random.split(jax.random.key(2), 3)
    supplier = lambda i: jax.random.normal(keys[i], (1, 8, 2, 8, 8))  # noqa: E731
    out = run_pipeline_latents(
        step_fn, params=params, total_steps=total, world_size=2,
        num_samples=3, input_supplier=supplier, timesteps=ts,
    )
    # oracle with the same timestep mapping
    mapped = lambda p, x, s: model.apply(p, x, jnp.asarray(ts)[s])  # noqa: E731
    inputs = jnp.stack([supplier(i) for i in range(3)])
    ref = run_reference_single_device(mapped, params, inputs, total)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_run_pipeline_latents_rejects_bad_samples():
    with pytest.raises(ValueError, match="positive"):
        run_pipeline_latents(
            lambda p, x, s: x, params={}, total_steps=4, world_size=2,
            num_samples=0, input_supplier=lambda i: jnp.zeros((1,)),
        )
