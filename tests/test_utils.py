"""Utils tests: metric contract, timers, video io naming."""

import json
import logging

import pytest

import jax.numpy as jnp
import numpy as np

from vdpp_tpu.utils.bench_json import benchmark_results_dict, emit_benchmark_json
from vdpp_tpu.utils.profiling import phase_timer
from vdpp_tpu.utils.video_io import build_output_name, frames_to_uint8

pytestmark = pytest.mark.fast  # pre-commit smoke tier (.pre-commit-config.yaml)


def _mk_results(**over):
    base = dict(
        world_size=4, total_steps=28, steps_per_device=7, model="dummy",
        mode="pipeline", num_samples_measured=8, warmup_samples=1,
        latent_shape=[1, 8, 4, 16, 16], first_sample_time_s=1.0,
        avg_sample_time_s=0.25, throughput_samples_per_s=4.0,
        per_sample_times_ms=[1000.0, 250.0], peak_memory_gb_per_device=[1.5, 1.6],
    )
    base.update(over)
    return benchmark_results_dict(**base)


def test_benchmark_results_schema_parity():
    r = _mk_results()
    # keys the reference's parsers rely on
    for key in (
        "world_size", "total_steps", "steps_per_gpu", "model", "fsdp",
        "num_samples_measured", "warmup_samples", "latent_shape",
        "first_sample_time_s", "avg_sample_time_s",
        "throughput_samples_per_s", "per_sample_times_ms",
        "peak_memory_gb_per_rank", "max_peak_memory_gb",
    ):
        assert key in r
    assert r["max_peak_memory_gb"] == 1.6
    assert r["fsdp"] is False
    assert _mk_results(mode="fsdp")["fsdp"] is True


def test_emit_benchmark_json_stdout_line(capsys):
    emit_benchmark_json(_mk_results())
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("BENCHMARK_JSON=")]
    assert len(lines) == 1
    parsed = json.loads(lines[0][len("BENCHMARK_JSON="):])
    assert parsed["world_size"] == 4


def test_phase_timer_fences(caplog):
    x = jnp.ones((8, 8)) * 2
    with caplog.at_level(logging.INFO):
        with phase_timer("test-phase", x) as rec:
            y = x @ x
    assert rec["seconds"] >= 0
    assert any("test-phase" in m for m in caplog.messages)


def test_frames_to_uint8_range():
    v = np.array([[[[-1.0, 0.0, 1.0]]], [[[2.0, -2.0, 0.5]]]], np.float32)
    out = frames_to_uint8(v)
    assert out.dtype == np.uint8
    assert out[0, 0, 0, 0] == 0 and out[0, 0, 0, 2] == 255
    assert out[1, 0, 0, 0] == 255 and out[1, 0, 0, 1] == 0  # clipped


def test_build_output_name_selfdescribing():
    name = build_output_name("svd", num_frames=14, steps=25, stages=8, fps=7,
                             seed=42, ext="mp4")
    for token in ("svd", "f14", "s25", "st8", "fps7", "seed42", ".mp4"):
        assert token in name


def _load_bench_module():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_bench_backend_retry_reexecs_on_init_failure(monkeypatch):
    """bench.py's _init_backend_with_retry, watchdogged form: after the
    subprocess probe says the tunnel is up, an in-process init failure
    must re-exec with the attempt counter bumped (JAX memoizes a failed
    init, so an in-process retry cannot recover); past the attempt cap it
    emits the parseable failure line and exits nonzero. The probe is
    stubbed — a real one would spawn a child against the pinned axon
    platform and hang the suite on a dead tunnel."""
    import os
    import sys

    import pytest as _pytest

    bench = _load_bench_module()
    calls = {}

    def fake_devices():
        raise RuntimeError("Unable to initialize backend 'axon'")

    def fake_execv(exe, argv):
        calls["execv"] = (exe, list(argv))

    monkeypatch.setattr(bench, "_probe_backend", lambda t: (True, "axon"))
    monkeypatch.setattr(bench.jax, "devices", fake_devices)
    monkeypatch.setattr(bench.os, "execv", fake_execv)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    monkeypatch.setenv("VDPP_BENCH_INIT_ATTEMPT", "0")
    bench._init_backend_with_retry()
    assert calls["execv"][0] == sys.executable
    assert os.environ["VDPP_BENCH_INIT_ATTEMPT"] == "1"

    monkeypatch.setenv("VDPP_BENCH_INIT_ATTEMPT", "5")
    with _pytest.raises(SystemExit):
        bench._init_backend_with_retry()


def test_bench_dead_tunnel_fast_fails_with_parseable_json(monkeypatch, capsys):
    """A tunnel that never answers the probe must yield the NOT-MEASURED
    failure JSON within the init deadline instead of a driver timeout
    (round-3 BENCH artifact was rc=124; VERDICT r3 #2)."""
    import json

    import pytest as _pytest

    bench = _load_bench_module()
    monkeypatch.setattr(
        bench, "_probe_backend", lambda t: (False, "backend init exceeded")
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # Zero budget: the first failed probe is already past the deadline.
    monkeypatch.setenv("VDPP_BENCH_INIT_DEADLINE_S", "0")
    with _pytest.raises(SystemExit):
        bench._init_backend_with_retry()
    line = next(
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.lstrip().startswith("{")
    )
    payload = json.loads(line)
    assert payload["vs_baseline"] == 0.0
    assert "NOT MEASURED" in payload["metric"]
    assert "error" in payload


def test_compile_cache_policy():
    """Disk-cache policy: only explicit TPU-class platforms qualify.

    An UNSET platform must NOT enable the cache — JAX's implicit default
    backend is then the CPU, whose AOT executables segfault on
    cross-process deserialization on this host class (the 2026-08-18
    suite incident utils/compile_cache.py documents)."""
    from vdpp_tpu.utils.compile_cache import cache_allowed

    assert cache_allowed("tpu", None)
    assert cache_allowed("axon", None)
    assert cache_allowed("axon,cpu", None)  # first entry wins
    assert not cache_allowed("cpu", None)
    assert not cache_allowed("", None)  # unset -> implicit CPU default
    assert not cache_allowed("cpu,axon", None)
    # the knob overrides in both directions
    assert cache_allowed("cpu", "1")
    assert not cache_allowed("axon", "0")
