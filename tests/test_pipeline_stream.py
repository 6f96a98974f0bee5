"""PipelineStream tests: streaming requests share one filled pipeline.

Correctness: every streamed output must equal the single-device all-steps
oracle ELEMENTWISE (the repo's core invariant). Sharing: two requests
submitted together must complete in ~S+1 ticks total, not 2S — the tick
counter makes this deterministic (no wall-clock assertions).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vdpp_tpu.models import DummyUNet
from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import (
    PipelineConfig,
    StepPipeline,
    run_reference_single_device,
)

TOTAL_STEPS = 8
STAGES = 4
LATENT = (1, 4, 2, 8, 8)  # DummyUNet keeps the reference's (B,C,F,H,W)


def _make_pipe():
    model = DummyUNet(channels=4, hidden_channels=8)
    params = model.init(jax.random.key(0))
    step_fn = lambda p, x, s: model.apply(p, x, s)  # noqa: E731
    pipe = StepPipeline(
        make_pipeline_mesh(STAGES), step_fn,
        PipelineConfig(total_steps=TOTAL_STEPS, num_stages=STAGES),
    )
    return pipe, params, step_fn


def test_stream_matches_single_device_oracle():
    pipe, params, step_fn = _make_pipe()
    stream = pipe.stream(params, LATENT, jnp.float32)
    try:
        inputs = jax.random.normal(jax.random.key(1), (3, *LATENT), jnp.float32)
        futures = [stream.submit(inputs[i]) for i in range(3)]
        outs = [f.result(timeout=300) for f in futures]
        ref = run_reference_single_device(step_fn, params, inputs, TOTAL_STEPS)
        for i, out in enumerate(outs):
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref[i]), rtol=1e-5, atol=1e-5
            )
    finally:
        stream.close()


def test_stream_overlapping_requests_share_the_pipeline():
    """Two requests submitted together need ~S+1 ticks, not 2S."""
    pipe, params, _ = _make_pipe()
    stream = pipe.stream(params, LATENT, jnp.float32)
    try:
        a = stream.submit(jax.random.normal(jax.random.key(2), LATENT))
        b = stream.submit(jax.random.normal(jax.random.key(3), LATENT))
        a.result(timeout=300)
        b.result(timeout=300)
        # b ingests one tick after a and completes at tick S+1 (allow one
        # idle-slip tick); sequential execution would need 2S ticks.
        assert stream.ticks_run <= STAGES + 2, stream.ticks_run
        assert stream.ticks_run < 2 * STAGES
    finally:
        stream.close()


def test_stream_second_request_completes_one_tick_after_first():
    """Deterministic latency proof: with both requests in flight, the
    completion tick indices differ by exactly 1."""
    pipe, params, _ = _make_pipe()
    stream = pipe.stream(params, LATENT, jnp.float32)
    completion_ticks = {}
    try:
        a = stream.submit(jax.random.normal(jax.random.key(4), LATENT))
        b = stream.submit(jax.random.normal(jax.random.key(5), LATENT))
        a.add_done_callback(lambda f: completion_ticks.setdefault("a", stream.ticks_run))
        b.add_done_callback(lambda f: completion_ticks.setdefault("b", stream.ticks_run))
        a.result(timeout=300)
        b.result(timeout=300)
        # a completes at tick S, b at tick S+1 (1 tick apart, not S apart).
        assert completion_ticks["b"] - completion_ticks["a"] <= 1 + 1
    finally:
        stream.close()


def test_stream_rejects_wrong_shape():
    pipe, params, _ = _make_pipe()
    stream = pipe.stream(params, LATENT, jnp.float32)
    try:
        import pytest

        with pytest.raises(ValueError, match="latent shape"):
            stream.submit(jnp.zeros((2, 4, 2, 8, 8)))
    finally:
        stream.close()


def test_stream_rejects_wrong_dtype_and_submit_after_close():
    """A mismatched dtype would silently promote the donated stage buffer
    for every later request; a submit after close would hang forever."""
    import pytest

    pipe, params, _ = _make_pipe()
    stream = pipe.stream(params, LATENT, jnp.float32)
    try:
        with pytest.raises(ValueError, match="dtype"):
            stream.submit(jnp.zeros(LATENT, jnp.bfloat16))
    finally:
        stream.close()
    with pytest.raises(RuntimeError, match="closed"):
        stream.submit(jnp.zeros(LATENT, jnp.float32))


def test_stream_failure_fails_all_waiters_and_rejects_new_submits():
    """A failing tick must fail every in-flight/queued future (including
    the one popped for completion) and poison the stream — not hang
    clients or keep accepting requests into a dead pipeline."""
    import pytest

    def bad_step(p, x, s):
        raise RuntimeError("injected tick failure")

    model = DummyUNet(channels=4, hidden_channels=8)
    params = model.init(jax.random.key(0))
    pipe = StepPipeline(
        make_pipeline_mesh(STAGES), bad_step,
        PipelineConfig(total_steps=TOTAL_STEPS, num_stages=STAGES),
    )
    stream = pipe.stream(params, LATENT, jnp.float32)
    try:
        futs = [stream.submit(jnp.zeros(LATENT, jnp.float32)) for _ in range(3)]
        for f in futs:
            with pytest.raises(RuntimeError, match="injected tick failure"):
                f.result(timeout=120)
        with pytest.raises(RuntimeError, match="stream failed"):
            stream.submit(jnp.zeros(LATENT, jnp.float32))
    finally:
        stream.close()
