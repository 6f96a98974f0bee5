"""Topology planner: constraint validity and objective-driven rankings."""

import pytest

from vdpp_tpu.parallel.topology import plan_topology

pytestmark = pytest.mark.fast  # pre-commit smoke tier (.pre-commit-config.yaml)


def _top(objective, **kw):
    defaults = dict(
        total_steps=30, frames=25, latent_w=128, num_samples=1,
        seq_min_divisor_unit=8, guidance=True, objective=objective,
    )
    defaults.update(kw)
    return plan_topology(8, **defaults)


def test_all_plans_satisfy_constraints():
    for objective in ("latency", "throughput"):
        for p in _top(objective, num_samples=16):
            assert p.devices <= 8
            assert 25 % p.frame == 0
            if p.seq > 1:
                assert 128 % (p.seq * 8) == 0
            assert p.cfg in (1, 2)
            assert p.padded_steps % p.stage == 0
            assert p.padded_steps >= 30


def test_latency_objective_prefers_intra_step_axes():
    """For one sample the pipeline cannot shrink wall time, so the best
    latency plan puts every device on cfg/seq/frame axes (stage=1)."""
    best = _top("latency")[0]
    assert best.stage == 1
    assert best.devices == 8
    assert best.cfg == 2  # removing sequential CFG's 2nd forward is the
    # cheapest 2x available
    assert best.latency_rel < 0.25  # ~4x+ faster than single device


def test_throughput_objective_uses_stages_on_long_streams():
    """With a long sample stream the fill bubble amortizes away and the
    linear-scaling stage axis dominates the discounted intra axes."""
    best = _top("throughput", num_samples=1000)[0]
    assert best.stage > 1
    assert best.throughput_rel > 4.0


def test_no_guidance_disables_cfg_axis():
    for p in _top("latency", guidance=False):
        assert p.cfg == 1


def test_step_padding_accounted():
    """total_steps=25 on 8 stages needs padding to 32; the plan records
    it and the scores are discounted by 32/25."""
    plans = plan_topology(
        8, total_steps=25, frames=25, latent_w=128, num_samples=1000,
        objective="throughput",
    )
    eight_stage = [p for p in plans if p.stage == 8]
    assert eight_stage and eight_stage[0].padded_steps == 32
    no_pad = plan_topology(
        8, total_steps=25, frames=25, latent_w=128, num_samples=1000,
        objective="throughput", allow_pad_steps=False,
    )
    assert all(25 % p.stage == 0 for p in no_pad)


def test_indivisible_axes_excluded():
    # frames=7 (prime): only frame in {1, 7}; latent_w=72: seq*8 must
    # divide 72 -> seq in {1, 3, 9...} capped by devices
    for p in plan_topology(8, total_steps=28, frames=7, latent_w=72):
        assert p.frame in (1, 7)
        assert p.seq in (1, 3)


def test_describe_is_readable():
    s = _top("latency")[0].describe()
    assert "devices" in s and "speedup" in s


def test_bad_objective_rejected():
    with pytest.raises(ValueError, match="objective"):
        _top("both")


def test_intermediate_stage_counts_enumerated():
    """A smaller-than-maximal stage count must be considered: at T=4 on 8
    devices, stage=4 (no padding) beats stage=8 (pads to 8 steps = 2x
    compute per sample) — code-review finding."""
    plans = plan_topology(
        8, total_steps=4, frames=1, latent_w=8, guidance=False,
        num_samples=100, objective="throughput",
    )
    best = plans[0]
    assert best.stage == 4 and best.padded_steps == 4
    stages = {p.stage for p in plans}
    assert 4 in stages and 8 in stages


def test_describe_never_calls_slower_plans_faster():
    plans = plan_topology(
        8, total_steps=30, frames=25, latent_w=128, num_samples=1000,
        objective="throughput",
    )
    padded = [p for p in plans if p.latency_rel > 1.0]
    assert padded, "expected a padded plan in the top ranks"
    assert "slower" in padded[0].describe()
    assert "faster" not in padded[0].describe().split("latency")[1].split(",")[0]


def test_stage_only_constraint():
    """allow_intra_sample=False restricts the enumeration itself (not a
    post-filter: max_plans truncation could otherwise drop every
    stage-only plan from the ranked list). Since round 5 --deepcache no
    longer needs it (the cache lanes compose with seq/frame/cfg); the
    flag stays as the generic escape hatch for modes that cannot shard
    within a sample."""
    plans = plan_topology(
        8, total_steps=30, frames=14, latent_w=128, num_samples=8,
        guidance=True, objective="throughput", allow_intra_sample=False,
    )
    assert plans
    assert all(p.seq == 1 and p.frame == 1 and p.cfg == 1 for p in plans)
    # The unconstrained ranking DOES lead with intra-sample axes here —
    # the constraint is load-bearing, not vacuous.
    free = plan_topology(
        8, total_steps=30, frames=14, latent_w=128, num_samples=8,
        guidance=True, objective="throughput",
    )
    best = free[0]
    assert best.seq > 1 or best.frame > 1 or best.cfg > 1
