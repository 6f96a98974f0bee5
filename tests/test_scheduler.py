"""Scheduler tests: Karras sigma table + v-prediction Euler step.

Independent re-derivations (numpy, written out in full here) guard the
implementation; the configuration constants come from the reference's
embedded scheduler (reference: src/models/svd_unet.py:77-102) and the Euler
update math from src/models/svd_unet.py:427-439.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.diffusion.scheduler import (
    EulerKarrasSchedule,
    default_timestep_schedule,
    euler_ancestral_step_v_prediction,
    euler_step_v_prediction,
    karras_sigmas,
    scale_model_input,
)

pytestmark = pytest.mark.fast  # pre-commit smoke tier (.pre-commit-config.yaml)


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


# ---------------------- Heun (2nd-order EDM) solver ---------------------- #
#
# Analytic oracle: data distribution N(0, v). The true denoiser is
# x0_hat(x, s) = x * v / (v + s^2), making the probability-flow ODE
# x'(s) = (x - x0_hat)/s = x * s/(v + s^2), whose exact solution is
#     x(s1) = x(s0) * sqrt((v + s1^2) / (v + s0^2)).
# The fake model below inverts the v-prediction parameterization so that
# euler_step/heun_step reconstruct exactly this x0_hat: from
#     pred_original = eps * (-s / sqrt(s^2+1)) + x / (s^2+1)
# with scaled input xs = x / sqrt(s^2+1)  =>  x = xs * sqrt(s^2+1):
#     eps = (x / (s^2+1) - x0_hat) * sqrt(s^2+1) / s
# and the solver passes the c_noise timestep t = 0.25 ln(s) => s = e^{4t}.

_V = 4.0  # oracle data variance


def _oracle_eps(xs, t):
    s = jnp.exp(4.0 * t)
    x = xs * jnp.sqrt(s * s + 1.0)
    x0 = x * (_V / (_V + s * s))
    return (x / (s * s + 1.0) - x0) * jnp.sqrt(s * s + 1.0) / s


def _solve(solver: str, n_steps: int, x0=1.7, s_hi=80.0, s_lo=0.5):
    from vdpp_tpu.diffusion.scheduler import (
        dpmpp2m_step_v_prediction,
        heun_step_v_prediction,
    )

    # Geometric sigma ladder (no trailing 0 — the analytic solution needs
    # s_lo > 0); fp64 numpy bookkeeping, fp32 steps.
    sig = np.geomspace(s_hi, s_lo, n_steps + 1)
    x = jnp.float32(x0)
    old_den = jnp.float32(0.0)
    for i in range(n_steps):
        s, s_next = jnp.float32(sig[i]), jnp.float32(sig[i + 1])
        if solver == "euler":
            eps = _oracle_eps(x * jax.lax.rsqrt(s * s + 1.0), 0.25 * jnp.log(s))
            x = euler_step_v_prediction(x, eps, s, s_next)
        elif solver == "dpmpp2m":
            s_prev = jnp.float32(sig[max(i - 1, 0)])
            eps = _oracle_eps(x * jax.lax.rsqrt(s * s + 1.0), 0.25 * jnp.log(s))
            x, old_den = dpmpp2m_step_v_prediction(
                x, eps, old_den, s_prev, s, s_next
            )
        else:
            x = heun_step_v_prediction(x, _oracle_eps, s, s_next)
    return float(x)


def _true_solution(x0=1.7, s_hi=80.0, s_lo=0.5):
    return x0 * math.sqrt((_V + s_lo**2) / (_V + s_hi**2))


def test_heun_beats_euler_and_converges_at_order_two():
    """Global error: Euler halves with step count (order 1), Heun quarters
    (order 2), and Heun at N steps beats Euler at 2N — the claim that
    justifies spending two model evals per step."""
    ref = _true_solution()
    e_n = abs(_solve("euler", 12) - ref)
    e_2n = abs(_solve("euler", 24) - ref)
    h_n = abs(_solve("heun", 12) - ref)
    h_2n = abs(_solve("heun", 24) - ref)
    assert h_n < e_n / 3, (h_n, e_n)
    assert h_n < e_2n, (h_n, e_2n)  # better at HALF the model evals' steps
    assert 1.4 < e_n / e_2n < 3.0, (e_n, e_2n)   # ~2x: first order
    assert 3.0 < h_n / h_2n < 6.5, (h_n, h_2n)   # ~4x: second order


def test_heun_identity_padding_is_exact():
    """sigma_next == sigma (the schedule-padding mechanism) must be a
    bitwise no-op under Heun too — dt == 0 kills both the predictor and
    the corrector regardless of what the model returns."""
    from vdpp_tpu.diffusion.scheduler import heun_step_v_prediction

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3)).astype(np.float32))

    def junk_eps(xs, t):
        return jnp.full_like(xs, 123.0)

    out = heun_step_v_prediction(x, junk_eps, jnp.float32(700.0), jnp.float32(700.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_dpmpp2m_converges_at_order_two_with_one_eval_per_step():
    """DPM-Solver++ (2M): global error ~quarters when steps double (order
    2) at ONE model eval per step — second-order accuracy at Euler's
    cost, the claim that justifies the multistep state."""
    ref = _true_solution()
    e_n = abs(_solve("euler", 24) - ref)
    d_n = abs(_solve("dpmpp2m", 24) - ref)
    d_2n = abs(_solve("dpmpp2m", 48) - ref)
    assert d_n < e_n / 3, (d_n, e_n)
    # ~4x when steps double (the n=12 regime is pre-asymptotic: the
    # large-h first-order bootstrap step still dominates there).
    assert 2.8 < d_n / d_2n < 6.5, (d_n, d_2n)


def test_dpmpp2m_identity_padding_is_exact():
    """sigma_next == sigma (schedule padding) must leave x bitwise
    unchanged regardless of the (finite) model output; and h_last == 0
    afterwards must force the next step first-order, so padded and
    unpadded schedules produce identical latents."""
    from vdpp_tpu.diffusion.scheduler import dpmpp2m_step_v_prediction

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3)).astype(np.float32))
    junk = jnp.full_like(x, 123.0)
    s = jnp.float32(700.0)
    out, _den = dpmpp2m_step_v_prediction(x, junk, jnp.zeros_like(x), s, s, s)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    # Padded 3-step-prefix schedule == unpadded, through real steps.
    sig = np.array([80.0, 80.0, 80.0, 20.0, 5.0, 0.5], np.float64)

    def run(sigmas):
        xx = jnp.float32(1.7)
        den = jnp.float32(0.0)
        for i in range(len(sigmas) - 1):
            s_prev = jnp.float32(sigmas[max(i - 1, 0)])
            s_i, s_n = jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1])
            eps = _oracle_eps(
                xx * jax.lax.rsqrt(s_i * s_i + 1.0), 0.25 * jnp.log(s_i)
            )
            xx, den = dpmpp2m_step_v_prediction(xx, eps, den, s_prev, s_i, s_n)
        return float(xx)

    assert run(sig) == run(sig[2:])


def test_dpmpp2m_final_step_returns_denoised():
    """At sigma_next == 0, h = inf collapses the update to x0_hat (the
    diffusers DPMSolverMultistep special case)."""
    from vdpp_tpu.diffusion.scheduler import dpmpp2m_step_v_prediction

    x = jnp.asarray([[0.3, -1.2, 2.0]], jnp.float32)
    s = jnp.float32(0.002)
    eps = _oracle_eps(x * jax.lax.rsqrt(s * s + 1.0), 0.25 * jnp.log(s))
    got, den = dpmpp2m_step_v_prediction(
        x, eps, jnp.ones_like(x), jnp.float32(0.01), s, jnp.float32(0.0)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(den), rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(got)))


def test_heun_final_step_falls_back_to_euler():
    """At sigma_next == 0 the corrector is undefined; the step must equal
    the plain Euler update (diffusers' HeunDiscrete encodes the same)."""
    from vdpp_tpu.diffusion.scheduler import heun_step_v_prediction

    x = jnp.asarray([[0.3, -1.2, 2.0]], jnp.float32)
    s = jnp.float32(0.002)
    eps = _oracle_eps(x * jax.lax.rsqrt(s * s + 1.0), 0.25 * jnp.log(s))
    want = euler_step_v_prediction(x, eps, s, jnp.float32(0.0))
    got = heun_step_v_prediction(x, _oracle_eps, s, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


# ------------------- euler_a (ancestral, stochastic) ------------------- #

def test_euler_a_ancestral_split_identity():
    """sigma_up^2 + sigma_down^2 == sigma_next^2: the deterministic step
    to sigma_down plus noise at sigma_up lands exactly at marginal level
    sigma_next (the k-diffusion/diffusers ancestral split)."""
    s, s_next = 2.5, 1.25
    up2 = s_next**2 * (s**2 - s_next**2) / s**2
    down = math.sqrt(s_next**2 - up2)
    assert up2 > 0
    np.testing.assert_allclose(up2 + down**2, s_next**2, rtol=1e-12)


def test_euler_a_identity_padding_is_bitexact():
    """sigma_next == sigma must be a bitwise no-op even with nonzero
    noise (sqrt(s_next^2 - 0) can be 1 ulp off s — the step guards it),
    preserving the padded-schedule invariant for stochastic sampling."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)), jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).normal(size=(3, 4)), jnp.float32)
    z = jnp.asarray(np.random.default_rng(2).normal(size=(3, 4)), jnp.float32)
    s = jnp.float32(700.0)
    out = euler_ancestral_step_v_prediction(x, eps, z, s, s)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_euler_a_final_step_is_deterministic():
    """sigma_next == 0 -> sigma_up == 0: the last step ignores the noise
    (same special case as diffusers) and equals the plain Euler step."""
    x = jnp.asarray(np.random.default_rng(3).normal(size=(3, 4)), jnp.float32)
    eps = jnp.asarray(np.random.default_rng(4).normal(size=(3, 4)), jnp.float32)
    z1 = jnp.asarray(np.random.default_rng(5).normal(size=(3, 4)), jnp.float32)
    z2 = jnp.asarray(np.random.default_rng(6).normal(size=(3, 4)), jnp.float32)
    s, s0 = jnp.float32(0.002), jnp.float32(0.0)
    a = euler_ancestral_step_v_prediction(x, eps, z1, s, s0)
    b = euler_ancestral_step_v_prediction(x, eps, z2, s, s0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(euler_step_v_prediction(x, eps, s, s0)),
        rtol=1e-6, atol=1e-7,
    )


def test_euler_a_noise_scale_is_sigma_up():
    """The injected-noise coefficient is exactly sigma_up: differencing
    two runs with noise z and z+1 isolates it."""
    x = jnp.zeros((2, 2), jnp.float32)
    eps = jnp.zeros((2, 2), jnp.float32)
    s, s_next = jnp.float32(2.5), jnp.float32(1.25)
    a = euler_ancestral_step_v_prediction(x, eps, jnp.zeros_like(x), s, s_next)
    b = euler_ancestral_step_v_prediction(x, eps, jnp.ones_like(x), s, s_next)
    up = math.sqrt(1.25**2 * (2.5**2 - 1.25**2) / 2.5**2)
    np.testing.assert_allclose(np.asarray(b - a), np.full((2, 2), up),
                               rtol=1e-6)


# ------------------- denoise_from (SDEdit truncation) ------------------- #

def test_denoise_from_slices_the_exact_tail():
    full = EulerKarrasSchedule.create(10)
    for k in (1, 4, 9):
        part = EulerKarrasSchedule.create(10, denoise_from=k)
        np.testing.assert_array_equal(part.sigmas, full.sigmas[k:])
        np.testing.assert_array_equal(part.timesteps, full.timesteps[k:])
        assert part.num_steps == 10 - k


def test_denoise_from_composes_with_padding():
    part = EulerKarrasSchedule.create(10, denoise_from=4,
                                      pad_to_multiple_of=4)
    assert part.num_steps == 8  # 6 real + 2 identity
    full = EulerKarrasSchedule.create(10)
    np.testing.assert_array_equal(part.sigmas[2:], full.sigmas[4:])
    assert part.sigmas[0] == part.sigmas[1] == part.sigmas[2]


def test_denoise_from_rejects_out_of_range():
    with pytest.raises(ValueError):
        EulerKarrasSchedule.create(10, denoise_from=10)
    with pytest.raises(ValueError):
        EulerKarrasSchedule.create(10, denoise_from=-1)
