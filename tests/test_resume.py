"""Mid-schedule checkpoint/resume (utils/resume.py + run_ticked hooks).

Preemption recovery beyond the reference: its process-per-rank pipeline
keeps in-transit latents inside blocked ``dist.recv`` calls, so there is
no snapshottable global state (reference: src/pipeline/pipeline.py:
75-98). The single-controller ticked executor's inter-tick state is
exactly ``(tick, buf)``; these tests pin that resuming from it emits the
remaining samples BIT-IDENTICALLY — including with packed cross-step
payload state (dpmpp2m) riding in buf.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models import DummyUNet
from vdpp_tpu.models.svd_unet import SVDUNetConfig
from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_dummy_conditioning
from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import PipelineConfig, StepPipeline
from vdpp_tpu.utils.resume import load_pipeline_state, save_pipeline_state


@pytest.fixture(scope="module")
def dummy_pipe():
    model = DummyUNet()
    params = model.init(jax.random.key(0))
    step_fn = lambda p, x, s: model.apply(p, x, s)  # noqa: E731
    pipe = StepPipeline(make_pipeline_mesh(2), step_fn, PipelineConfig(8, 2))
    inputs = jax.random.normal(jax.random.key(1), (4, 1, 8, 4, 8, 8))
    return params, pipe, inputs


def test_resume_emits_identical_remaining_samples(dummy_pipe, tmp_path):
    params, pipe, inputs = dummy_pipe
    path = str(tmp_path / "state.npz")
    full, _ = pipe.run_ticked(params, inputs)

    # First run "preempted" after tick 2: snapshot every tick, keep the
    # tick-2 snapshot (on_tick gives the LIVE buf — persist it to disk
    # exactly as production --state-path does).
    stop_after = 2

    def on_tick(t, buf):
        if t == stop_after:
            save_pipeline_state(path, t, buf, meta={"case": "test"})

    pipe.run_ticked(params, inputs, on_tick=on_tick)

    last_tick, buf, meta = load_pipeline_state(path)
    assert last_tick == stop_after and meta == {"case": "test"}
    rest, _ = pipe.run_ticked(
        params, inputs, start_tick=last_tick + 1, initial_buf=jnp.asarray(buf)
    )
    # Ticks 0..2 emitted samples 0..(2-(S-1))=0..1; the resume emits 2..3.
    s = pipe.config.num_stages
    already = stop_after + 1 - (s - 1)
    np.testing.assert_array_equal(np.asarray(rest), np.asarray(full[already:]))


def test_resume_with_packed_solver_state(tmp_path):
    """buf carries raw payload words — dpmpp2m's packed multistep state
    must survive the disk roundtrip byte-exactly."""
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=4, solver="dpmpp2m")
    params = model.init(jax.random.key(0))
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 3, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    pipe = StepPipeline(
        make_pipeline_mesh(2), model.pipeline_step_fn(), PipelineConfig(4, 2)
    )
    bundle = (params, cond)
    noise = (
        jax.random.normal(jax.random.key(2), (2, 1, 3, 16, 16, 4))
        * model.init_noise_sigma
    )
    inputs = model.pack_initial(noise)
    full, _ = pipe.run_ticked(bundle, inputs)

    path = str(tmp_path / "state.npz")
    pipe.run_ticked(
        bundle, inputs,
        on_tick=lambda t, buf: save_pipeline_state(path, t, buf)
        if t == 1 else None,
    )
    last_tick, buf, _ = load_pipeline_state(path)
    rest, _ = pipe.run_ticked(
        bundle, inputs, start_tick=last_tick + 1, initial_buf=jnp.asarray(buf)
    )
    already = last_tick + 1 - (pipe.config.num_stages - 1)
    np.testing.assert_array_equal(np.asarray(rest), np.asarray(full[already:]))


def test_resume_past_end_returns_empty(dummy_pipe):
    params, pipe, inputs = dummy_pipe
    n_ticks = pipe.config.num_ticks(int(inputs.shape[0]))
    buf = jnp.zeros((pipe.config.num_stages, *inputs.shape[1:]), inputs.dtype)
    out, times = pipe.run_ticked(
        params, inputs, start_tick=n_ticks, initial_buf=buf
    )
    assert out.shape == (0, *inputs.shape[1:]) and times == []


def test_save_is_atomic_and_validated(tmp_path):
    path = str(tmp_path / "s.npz")
    buf = np.arange(12, dtype=np.float32).reshape(3, 4)
    save_pipeline_state(path, 5, buf, meta={"a": 1})
    t, b, m = load_pipeline_state(path)
    assert t == 5 and m == {"a": 1}
    np.testing.assert_array_equal(b, buf)
    # overwrite keeps the file well-formed (atomic rename path)
    save_pipeline_state(path, 6, buf + 1)
    t2, b2, _ = load_pipeline_state(path)
    assert t2 == 6
    np.testing.assert_array_equal(b2, buf + 1)
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, magic=np.array("nope"), x=np.zeros(1))
    with pytest.raises(ValueError, match="state file"):
        load_pipeline_state(bad)
