"""CLI smoke tests: every mode entry point runs end-to-end in a
subprocess on the virtual CPU mesh and honors its output contract."""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=300):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=env,
    )


def extract_benchmark_json(stdout: str) -> dict:
    lines = [l for l in stdout.splitlines() if l.startswith("BENCHMARK_JSON=")]
    assert lines, f"no BENCHMARK_JSON line in output:\n{stdout[-2000:]}"
    return json.loads(lines[-1][len("BENCHMARK_JSON="):])


def test_simulator_mode():
    r = run_cli([
        "-m", "vdpp_tpu.modes.simulator", "--num-stages", "4",
        "--total-steps", "8", "--backend", "cpu",
        "--latent-shape", "1", "8", "2", "8", "8",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "stage-count invariance verified" in r.stderr + r.stdout


def test_benchmark_mode_contract():
    r = run_cli([
        "-m", "vdpp_tpu.modes.benchmark", "--backend", "cpu",
        "--model", "dummy", "--num-stages", "2", "--total-steps", "4",
        "--num-samples", "2", "--warmup-samples", "0",
        "--latent-shape", "1", "8", "2", "8", "8",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    data = extract_benchmark_json(r.stdout)
    # the reference's metric-contract keys
    for key in (
        "world_size", "total_steps", "steps_per_gpu", "model",
        "first_sample_time_s", "avg_sample_time_s",
        "throughput_samples_per_s", "per_sample_times_ms",
        "peak_memory_gb_per_rank", "max_peak_memory_gb",
    ):
        assert key in data, key
    assert data["world_size"] == 2
    assert data["steps_per_gpu"] == 2
    assert data["mode"] == "pipeline"


def test_benchmark_data_parallel_contract():
    r = run_cli([
        "-m", "vdpp_tpu.modes.benchmark_data_parallel", "--backend", "cpu",
        "--model", "dummy", "--num-devices", "2", "--total-steps", "4",
        "--num-samples", "4",
        "--latent-shape", "1", "8", "2", "8", "8",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    data = extract_benchmark_json(r.stdout)
    assert data["mode"] == "data_parallel"
    assert data["steps_per_gpu"] == 4  # all steps on every device


def test_production_mode_tiny():
    r = run_cli([
        "-m", "vdpp_tpu.modes.production", "--preset", "tiny", "--backend", "cpu",
        "--num-stages", "2", "--total-steps", "4", "--num-samples", "1",
        "--latent-shape", "1", "4", "2", "16", "16",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final latent norm" in r.stderr + r.stdout


def test_production_mode_dpmpp2m():
    """--solver dpmpp2m: the multistep state packs along payload channels
    (pipeline stage hand-offs carry [x ‖ old x0_hat]) and the CLI unpacks
    before reporting — the end-to-end wiring this smoke pins."""
    r = run_cli([
        "-m", "vdpp_tpu.modes.production", "--preset", "tiny", "--backend", "cpu",
        "--num-stages", "2", "--total-steps", "4", "--num-samples", "1",
        "--solver", "dpmpp2m", "--guidance-scale", "3",
        "--latent-shape", "1", "4", "2", "16", "16",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final latent norm" in r.stderr + r.stdout


def test_production_mode_deepcache():
    """--deepcache 2: the deep-feature cache rides extra payload channels
    through the pipeline; this pins the CLI wiring end-to-end (unit
    invariants in tests/test_deepcache.py)."""
    r = run_cli([
        "-m", "vdpp_tpu.modes.production", "--preset", "tiny", "--backend", "cpu",
        "--num-stages", "2", "--total-steps", "6", "--num-samples", "1",
        "--deepcache", "2", "--guidance-scale", "3",
        "--latent-shape", "1", "4", "2", "16", "16",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final latent norm" in r.stderr + r.stdout


def test_benchmark_mode_deepcache():
    """--deepcache on the benchmark CLI: the BENCHMARK_JSON surface is
    produced with the cached-step program (timing the shape users would
    actually deploy for the speed/quality trade)."""
    r = run_cli([
        "-m", "vdpp_tpu.modes.benchmark", "--backend", "cpu",
        "--model", "svd_tiny", "--deepcache", "2", "--guidance-scale", "3",
        "--num-stages", "2", "--total-steps", "4", "--num-samples", "2",
        "--warmup-samples", "0", "--latent-shape", "1", "4", "2", "16", "16",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "BENCHMARK_JSON=" in r.stdout


def test_production_mode_state_resume(tmp_path):
    """--ticked --state-path snapshots the pipeline state every tick;
    --resume picks up from the last snapshot (here: the final tick, so
    the resumed run emits 0 remaining samples and exits cleanly).
    True mid-run bit-exact resume is pinned at the API level in
    tests/test_resume.py."""
    state = str(tmp_path / "state.npz")
    base = [
        "-m", "vdpp_tpu.modes.production", "--preset", "tiny", "--backend", "cpu",
        "--num-stages", "2", "--total-steps", "4", "--num-samples", "2",
        "--latent-shape", "1", "4", "2", "16", "16", "--ticked",
        "--state-path", state,
    ]
    r = run_cli(base, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final latent norm" in r.stderr + r.stdout
    import os

    assert os.path.exists(state)
    r2 = run_cli(base + ["--resume"], timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resuming at tick" in r2.stderr + r2.stdout

    # A snapshot must refuse to resume under a different configuration:
    # the buf-shape check alone cannot see seed/schedule/sample-count
    # changes, which would silently corrupt the emitted samples.
    mismatched = [a for a in base]
    mismatched[mismatched.index("--num-samples") + 1] = "3"
    r3 = run_cli(mismatched + ["--resume"], timeout=600)
    assert r3.returncode != 0
    assert "different run configuration" in r3.stderr + r3.stdout
    assert "num_samples" in r3.stderr + r3.stdout


def test_generate_video_long_segments():
    """Autoregressive long-video chaining: K segments re-conditioned on
    the previous segment's last decoded frame stitch to
    F + (K-1)*(F-1) frames (beyond the reference's single-window demo)."""
    r = run_cli([
        "scripts/generate_video_long.py", "--random-weights", "--preset", "tiny",
        "--backend", "cpu", "--num-frames", "4", "--steps", "4",
        "--num-stages", "2", "--segments", "2", "--width", "64",
        "--height", "64",
    ], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "2 segments -> 7 frames" in r.stderr + r.stdout


def test_production_auto_topology():
    """--auto-topology plans the mesh factorization (planner unit tests
    in tests/test_topology.py; this pins the CLI wiring end-to-end)."""
    r = run_cli([
        "-m", "vdpp_tpu.modes.production", "--preset", "tiny", "--backend", "cpu",
        "--total-steps", "4", "--num-samples", "1", "--guidance-scale", "3",
        "--latent-shape", "1", "4", "4", "16", "16",
        "--auto-topology", "latency",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stderr + r.stdout
    assert "auto-topology (latency):" in out
    assert "final latent norm" in out


def test_benchmark_cfg_parallel_contract():
    r = run_cli([
        "-m", "vdpp_tpu.modes.benchmark", "--backend", "cpu",
        "--model", "svd_tiny", "--cfg-parallel", "--guidance-scale", "3.0",
        "--num-stages", "2", "--total-steps", "4", "--num-samples", "2",
        "--warmup-samples", "0", "--latent-shape", "1", "4", "2", "16", "16",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    data = extract_benchmark_json(r.stdout)
    assert data["mode"] == "pipeline_x_cfg"
    assert data["world_size"] == 2  # stage axis only; cfg is within-stage


def test_benchmark_seq_cfg_parallel_contract():
    r = run_cli([
        "-m", "vdpp_tpu.modes.benchmark", "--backend", "cpu",
        "--model", "dit3d_tiny", "--seq-parallel", "2", "--cfg-parallel",
        "--guidance-scale", "5.0", "--num-stages", "2", "--total-steps", "4",
        "--num-samples", "2", "--warmup-samples", "0",
        "--latent-shape", "1", "4", "4", "16", "16",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    data = extract_benchmark_json(r.stdout)
    assert data["mode"] == "pipeline_x_sp2_x_cfg"


def test_generate_video_text_cli(tmp_path):
    """Text->video app (T5 + DiT + VAE) end to end on the CPU mesh."""
    r = run_cli([
        "scripts/generate_video_text.py", "--prompt", "ci smoke test",
        "--random-weights", "--preset", "tiny", "--backend", "cpu",
        "--num-frames", "2", "--steps", "4", "--num-stages", "1",
        "--output-dir", str(tmp_path),
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TIMING" in r.stderr + r.stdout
    assert any(p.suffix in (".y4m", ".mp4") for p in tmp_path.iterdir()), (
        list(tmp_path.iterdir())
    )


def test_generate_video_text_flowmatch_cli(tmp_path):
    """The rectified-flow parameterization drives the same text->video
    app end to end (--solver flowmatch swaps schedule + conventions),
    composed with negative-prompt CFG (tuple context through the
    pipeline bundle)."""
    r = run_cli([
        "scripts/generate_video_text.py", "--prompt", "ci smoke test",
        "--negative-prompt", "blurry dark frames",
        "--random-weights", "--preset", "tiny", "--backend", "cpu",
        "--num-frames", "2", "--steps", "4", "--num-stages", "2",
        "--solver", "flowmatch", "--flow-shift", "3.0",
        "--output-dir", str(tmp_path),
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TIMING" in r.stderr + r.stdout
    assert any(p.suffix in (".y4m", ".mp4") for p in tmp_path.iterdir()), (
        list(tmp_path.iterdir())
    )


def test_serve_rejects_flowmatch_for_svd():
    """Pure-argument validation: flowmatch is a DiT-family
    parameterization; the SVD preset must refuse before any model build."""
    r = run_cli([
        "-m", "vdpp_tpu.modes.serve", "--preset", "tiny", "--backend", "cpu",
        "--solver", "flowmatch", "--port", "0",
    ])
    assert r.returncode != 0
    assert "flowmatch" in (r.stderr + r.stdout)


def test_benchmark_rejects_bad_split():
    r = run_cli([
        "-m", "vdpp_tpu.modes.benchmark", "--backend", "cpu",
        "--model", "dummy", "--num-stages", "3", "--total-steps", "4",
        "--num-samples", "1",
    ])
    assert r.returncode != 0
    assert "divisible" in (r.stderr + r.stdout)


def test_benchmark_expert_parallel_contract():
    """(stage x expert) mesh: MoE DiT with sharded expert weights through
    the benchmark CLI."""
    r = run_cli([
        "-m", "vdpp_tpu.modes.benchmark", "--backend", "cpu",
        "--model", "dit3d_moe_tiny", "--expert-parallel", "2",
        "--guidance-scale", "5.0", "--num-stages", "2", "--total-steps", "4",
        "--num-samples", "2", "--warmup-samples", "0",
        "--latent-shape", "1", "4", "4", "16", "16",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    data = extract_benchmark_json(r.stdout)
    assert data["mode"] == "pipeline_x_ep2"
    assert data["world_size"] == 2  # expert axis is within-stage


def test_benchmark_expert_parallel_needs_moe_model():
    r = run_cli([
        "-m", "vdpp_tpu.modes.benchmark", "--backend", "cpu",
        "--model", "dit3d_tiny", "--expert-parallel", "2",
        "--num-stages", "2", "--total-steps", "4",
    ], timeout=600)
    assert r.returncode != 0
    assert "MoE" in (r.stderr + r.stdout)


def test_benchmark_profile_dir_writes_trace(tmp_path):
    """--profile-dir captures an xprof device trace around the measured
    runs without disturbing the BENCHMARK_JSON contract."""
    trace_dir = str(tmp_path / "trace")
    r = run_cli([
        "-m", "vdpp_tpu.modes.benchmark", "--backend", "cpu",
        "--model", "dummy", "--num-stages", "2", "--total-steps", "4",
        "--num-samples", "1", "--warmup-samples", "0",
        "--latent-shape", "1", "8", "2", "8", "8",
        "--profile-dir", trace_dir,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    extract_benchmark_json(r.stdout)  # contract intact
    produced = [
        p for p in pathlib.Path(trace_dir).rglob("*") if p.is_file()
    ]
    assert produced, "no trace files written"
    assert any(p.name.endswith(".xplane.pb") for p in produced), produced


def test_production_mode_resume_flag_consistency():
    """Argument-consistency errors fire BEFORE model construction and
    checkpoint load: a silently ignored --resume (no --state-path) would
    restart from tick 0 while the user believes the run resumed —
    code-review finding."""
    base = ["-m", "vdpp_tpu.modes.production", "--preset", "tiny",
            "--backend", "cpu", "--latent-shape", "1", "4", "2", "16", "16"]
    r = run_cli(base + ["--ticked", "--resume"], timeout=300)
    assert r.returncode != 0
    assert "--resume needs --state-path" in r.stderr + r.stdout

    r = run_cli(base + ["--state-path", "/tmp/never.npz"], timeout=300)
    assert r.returncode != 0
    assert "--state-path needs --ticked" in r.stderr + r.stdout

    r = run_cli(base + ["--ticked", "--state-every", "2"], timeout=300)
    assert r.returncode != 0
    assert "--state-every needs --state-path" in r.stderr + r.stdout


def test_production_mode_deepcache_auto_topology():
    """--deepcache + --auto-topology: since round 5 deepcache composes
    with the intra-sample axes (seq/frame/cfg), so the planner runs
    UNCONSTRAINED — on 8 virtual devices the throughput plan picks
    intra-sample axes and the run must execute them with the cache lanes
    riding the payload (the round-4 stage-only constraint is gone)."""
    r = run_cli([
        "-m", "vdpp_tpu.modes.production", "--preset", "tiny", "--backend", "cpu",
        "--deepcache", "2", "--auto-topology", "throughput",
        "--guidance-scale", "3", "--total-steps", "8", "--num-samples", "2",
        "--latent-shape", "1", "4", "2", "16", "16",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stderr + r.stdout
    assert "constrained to stage-only plans" not in out
    assert "final latent norm" in out


def test_restyle_video_cli(tmp_path):
    """Video->video SDEdit refinement end to end on the CPU mesh: write a
    synthetic y4m, restyle at strength 0.5 (schedule tail only), get a
    playable output back."""
    import numpy as np

    from vdpp_tpu.utils.native import write_y4m

    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy * 255 / h + xx * 255 / w) / 2).astype(np.uint8)
    frames = np.stack([np.stack([g, np.roll(g, i * 7, 0), g.T], -1)
                       for i in range(4)])
    src = str(tmp_path / "in.y4m")
    write_y4m(src, frames, fps=7)
    r = run_cli([
        "scripts/restyle_video.py", "--input", src, "--strength", "0.5",
        "--random-weights", "--preset", "tiny", "--backend", "cpu",
        "--steps", "8", "--num-stages", "2",
        "--output-dir", str(tmp_path / "out"),
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    log = r.stderr + r.stdout
    assert "4 of 8 steps" in log, log[-1500:]
    assert any(p.suffix == ".mp4" for p in (tmp_path / "out").iterdir())
