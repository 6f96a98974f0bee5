"""Scheduler tests: Karras sigma table + v-prediction Euler step.

Independent re-derivations (numpy, written out in full here) guard the
implementation; the configuration constants come from the reference's
embedded scheduler (reference: src/models/svd_unet.py:77-102) and the Euler
update math from src/models/svd_unet.py:427-439.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.diffusion.scheduler import (
    EulerKarrasSchedule,
    default_timestep_schedule,
    euler_step_v_prediction,
    karras_sigmas,
    scale_model_input,
)


def test_karras_endpoints_and_shape():
    sig = karras_sigmas(25)
    assert sig.shape == (26,)
    assert sig.dtype == np.float32
    assert sig[0] == pytest.approx(700.0, rel=1e-5)
    assert sig[-2] == pytest.approx(0.002, rel=1e-5)
    assert sig[-1] == 0.0


def test_karras_strictly_descending():
    sig = karras_sigmas(30)
    assert np.all(np.diff(sig) < 0)


@pytest.mark.parametrize("n", [5, 25, 28, 30, 35])
def test_karras_matches_independent_formula(n):
    # Independent derivation of the rho-7 ramp.
    rho = 7.0
    ramp = np.linspace(0, 1, n)
    expected = (700.0 ** (1 / rho) + ramp * (0.002 ** (1 / rho) - 700.0 ** (1 / rho))) ** rho
    got = karras_sigmas(n)
    np.testing.assert_allclose(got[:-1], expected, rtol=1e-5)


def test_init_noise_sigma():
    sched = EulerKarrasSchedule.create(25)
    assert sched.init_noise_sigma == pytest.approx(math.sqrt(700.0**2 + 1.0), rel=1e-6)


def test_continuous_timesteps_are_quarter_log_sigma():
    sched = EulerKarrasSchedule.create(25)
    np.testing.assert_allclose(
        sched.timesteps, 0.25 * np.log(sched.sigmas[:-1]), rtol=1e-5
    )


def test_scale_model_input():
    x = jnp.ones((2, 4, 3, 8, 8), jnp.float32)
    sigma = 700.0
    y = scale_model_input(x, sigma)
    np.testing.assert_allclose(
        np.asarray(y), 1.0 / math.sqrt(700.0**2 + 1.0), rtol=1e-5
    )


def test_euler_step_analytic():
    # Hand-computed single-element case.
    x = jnp.array([2.0], jnp.float32)
    eps = jnp.array([0.5], jnp.float32)
    sigma, sigma_next = 4.0, 3.0
    denom = sigma**2 + 1.0  # 17
    x0 = 0.5 * (-sigma / math.sqrt(denom)) + 2.0 / denom
    deriv = (2.0 - x0) / sigma
    expected = 2.0 + deriv * (sigma_next - sigma)
    got = euler_step_v_prediction(x, eps, sigma, sigma_next)
    np.testing.assert_allclose(np.asarray(got), [expected], rtol=1e-6)


def test_euler_step_preserves_dtype():
    x = jnp.ones((4,), jnp.bfloat16)
    eps = jnp.zeros((4,), jnp.bfloat16)
    out = euler_step_v_prediction(x, eps, 2.0, 1.0)
    assert out.dtype == jnp.bfloat16


def test_schedule_step_uses_table():
    sched = EulerKarrasSchedule.create(10)
    x = jnp.full((3,), 1.5, jnp.float32)
    eps = jnp.full((3,), -0.25, jnp.float32)
    got = sched.step(x, eps, 4)
    expected = euler_step_v_prediction(
        x, eps, float(sched.sigmas[4]), float(sched.sigmas[5])
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def test_schedule_step_traced_index():
    import jax

    sched = EulerKarrasSchedule.create(10)
    x = jnp.full((3,), 1.5, jnp.float32)
    eps = jnp.full((3,), -0.25, jnp.float32)

    @jax.jit
    def f(i):
        return sched.step(x, eps, i)

    np.testing.assert_allclose(
        np.asarray(f(jnp.int32(4))), np.asarray(sched.step(x, eps, 4)), rtol=1e-6
    )


def test_default_timestep_schedule_parity():
    # Mirrors reference _default_timestep_schedule semantics
    # (reference: src/models/svd_unet.py:201-217).
    ts = default_timestep_schedule(25)
    assert len(ts) == 25
    assert ts[0] == 999
    assert all(a > b for a, b in zip(ts, ts[1:]))
    step_ratio = 1000 // 25
    assert ts == list(range(999, -1, -step_ratio))[:25]


def test_final_sigma_zero_gives_x0():
    # Last step (sigma_next = 0): output equals predicted x0.
    sched = EulerKarrasSchedule.create(5)
    x = jnp.array([1.0], jnp.float32)
    eps = jnp.array([0.3], jnp.float32)
    s = float(sched.sigmas[4])
    got = sched.step(x, eps, 4)
    denom = s * s + 1.0
    x0 = 0.3 * (-s / math.sqrt(denom)) + 1.0 / denom
    np.testing.assert_allclose(np.asarray(got), [x0], rtol=1e-4)


def test_padded_schedule_identity_steps():
    """Padding to a stage multiple prepends exact-identity Euler steps."""
    import jax

    base = EulerKarrasSchedule.create(6)
    padded = EulerKarrasSchedule.create(6, pad_to_multiple_of=4)  # 6 -> 8
    assert padded.num_steps == 8
    assert padded.sigmas[0] == padded.sigmas[1] == padded.sigmas[2]
    np.testing.assert_array_equal(padded.sigmas[2:], base.sigmas)
    assert padded.init_noise_sigma == base.init_noise_sigma

    # dt == 0 steps are the identity regardless of the noise prediction.
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3)), jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).standard_normal((2, 3)), jnp.float32)
    out = padded.step(x, eps, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    # Full padded schedule == full base schedule on the same eps sequence.
    def run(s, n):
        y = x
        for i in range(n):
            y = s.step(y, eps, i)
        return np.asarray(y)

    np.testing.assert_allclose(run(padded, 8), run(base, 6), rtol=1e-6)


def test_padded_schedule_noop_when_divisible():
    base = EulerKarrasSchedule.create(8)
    padded = EulerKarrasSchedule.create(8, pad_to_multiple_of=4)
    np.testing.assert_array_equal(padded.sigmas, base.sigmas)
