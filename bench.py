"""Driver benchmark: flagship SVD denoise throughput on real TPU.

Prints ONE machine-readable JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Flagship configuration = the driver metric's config (BASELINE.json:
"steady-state sec/video, 25-frame 30-step SVD"): SVD-XT UNet, 25 frames,
1024x576 (latent 72x128), 30 steps, CFG ramp 1->3, single chip. A
secondary 14f/25-step row (the reference's single-GPU demo config,
diffusion phase 47.65 s on an RTX A5000 — reference:
EXPERIMENT_RESULTS.md:255-268) is also measured and logged to stderr for
round-to-round continuity.

vs_baseline = baseline_sec / measured_sec (>1 means faster than the
reference's single-GPU number). For the flagship config the reference
published no single-GPU 25f/30-step row (it OOMs at higher settings and
was run on 7 GPUs), so the baseline is the *linear* extrapolation of its
measured 14f/25-step diffusion time by frames*steps:
    47.65 s * (25*30)/(14*25) = 102.11 s
— linear-in-frames is generous to the reference (attention grows
superlinearly in frames).

Weights are randomly initialized (bit-identical architecture & math; HF
weights are not downloadable in this environment), which does not change
the compute profile.

Stability contract: videos are measured until the last two agree within
10% (up to VDPP_BENCH_MAX_VIDEOS), and the mean of the agreeing tail is
reported.

Env knobs: VDPP_BENCH_FRAMES, VDPP_BENCH_H, VDPP_BENCH_W (latent dims),
VDPP_BENCH_STEPS, VDPP_BENCH_VIDEOS, VDPP_BENCH_MAX_VIDEOS,
VDPP_BENCH_GUIDANCE, VDPP_BENCH_CFG_MODE (sequential|batched),
VDPP_BENCH_PRESET (full|tiny), VDPP_BENCH_SECONDARY (1|0),
VDPP_BENCH_SOLVER (euler|heun|dpmpp2m), VDPP_BENCH_DEEPCACHE (int),
VDPP_BENCH_BASELINE_SEC.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import jax
import jax.numpy as jnp

from vdpp_tpu.utils.compile_cache import enable_persistent_cache

# Persist compiled executables across runs: the remote-compile tunnel
# takes minutes per first compile and can transiently fail; the on-disk
# cache replays in milliseconds (verified; utils/compile_cache.py).
enable_persistent_cache()

# Reference single-A5000 diffusion time at 14f/25-step/CFG (measured).
SECONDARY_BASELINE_SEC = 47.65
# Linear frames*steps extrapolation to the flagship 25f/30-step config.
FLAGSHIP_BASELINE_SEC = SECONDARY_BASELINE_SEC * (25 * 30) / (14 * 25)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _compile_with_retry(jitted, *args, what: str = "program"):
    """AOT lower+compile; the remote-compile path can transiently fail
    ("response body closed") — retry."""
    for attempt in range(3):
        try:
            t0 = time.perf_counter()
            compiled = jitted.lower(*args).compile()
            log(f"compile {what}: {time.perf_counter() - t0:.1f}s")
            return compiled
        except Exception as e:
            log(f"compile attempt {attempt} failed: {type(e).__name__}: {e}")
            if attempt == 2:
                raise
            time.sleep(10)


def measure_config(
    *,
    label: str,
    config,
    frames: int,
    lat_h: int,
    lat_w: int,
    steps: int,
    guidance: float,
    cfg_mode: str,
    min_videos: int,
    max_videos: int,
    solver: str | None = None,
    deepcache: int | None = None,
) -> dict:
    """Measure one (model, shape, schedule) configuration.

    Returns {"sec_per_video", "times", "memory" (program analysis or None),
    "stable" (last two runs within 10%)}.
    """
    from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_dummy_conditioning
    from vdpp_tpu.utils.memory import compiled_memory_analysis

    # Opt-in output-changing levers for MANUAL A/B runs (construction-time
    # env reads, CLAUDE.md discipline). The DRIVER metric stays euler +
    # no-deepcache: these change outputs, so they are not the contract.
    # Explicit arguments (the in-process fast-path row) override the env.
    if solver is None:
        solver = os.environ.get("VDPP_BENCH_SOLVER", "euler")
    if deepcache is None:
        deepcache = int(os.environ.get("VDPP_BENCH_DEEPCACHE", "0"))
    if solver != "euler" or deepcache:
        log(f"[{label}] OPT-IN levers: solver={solver} deepcache={deepcache} "
            "(output-changing; not the driver metric)")
    model = StableVideoUNet(config, num_steps=steps, cfg_mode=cfg_mode,
                            solver=solver, deepcache_interval=deepcache)
    t0 = time.perf_counter()
    params = jax.block_until_ready(jax.jit(model.init)(jax.random.key(0)))
    log(f"[{label}] init: {time.perf_counter() - t0:.1f}s")
    quant = os.environ.get("VDPP_BENCH_QUANT")
    if quant not in (None, "", "int8"):
        # an ignored typo would record bf16 numbers as "quantized"
        raise SystemExit(f"VDPP_BENCH_QUANT={quant!r}: only 'int8' is supported")
    if quant == "int8":
        # Opt-in weight-only int8 (quantization changes numerics — the
        # DRIVER metric stays bf16; this knob measures the int8 serving
        # configuration, docs/performance.md "int8 flagship").
        from vdpp_tpu.ops.quant import quantize_tree

        params = jax.block_until_ready(jax.jit(quantize_tree)(params))
        log(f"[{label}] weight-only int8 quantized")

    cond = make_dummy_conditioning(
        jax.random.key(1), 1, frames, lat_h, lat_w,
        cross_dim=config.cross_attention_dim,
        guidance_scale=guidance, dtype=jnp.float32,
    )
    step_fn = model.pipeline_step_fn()

    def generate(bundle, latent):
        def body(x, k):
            return step_fn(bundle, x, k), None

        out, _ = jax.lax.scan(body, latent, jnp.arange(steps, dtype=jnp.int32))
        return out

    def fresh_noise(seed: int):
        return model.pack_initial(
            jax.random.normal(
                jax.random.key(seed), (1, frames, lat_h, lat_w, 4), jnp.float32
            )
            * model.init_noise_sigma
        )

    bundle = (params, cond)
    noise0 = fresh_noise(2)
    # One AOT compile serves execution, buffer donation, and the
    # peak-memory fallback (allocator stats are empty through the tunnel).
    compiled = _compile_with_retry(
        jax.jit(generate, donate_argnums=(1,)), bundle, noise0, what=label
    )
    memory = compiled_memory_analysis(compiled)
    if memory:
        log(f"[{label}] program memory (GB/device): {memory}")

    # Timed off the SCALAR isfinite fetch: `block_until_ready` on an array
    # output returns optimistically through the relay (CLAUDE.md
    # "Remote-timing caveat" — round 4's artifact logged a dishonest
    # "first video: 0.0s" this way); forcing the reduction to the host is
    # the only honest readback, so the first-video time and the finite
    # check share one fetch.
    t0 = time.perf_counter()
    out = compiled(bundle, noise0)
    finite = bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
    log(
        f"[{label}] first video incl. finite-check scalar fetch: "
        f"{time.perf_counter() - t0:.1f}s"
    )
    assert finite, "non-finite output"

    times: list[float] = []
    stable = False
    for i in range(max_videos):
        # Fresh noise per timed video: repeated identical dispatches can be
        # deduplicated by remote-device relays, faking ~0 s timings.
        noise_i = fresh_noise(100 + i)
        t0 = time.perf_counter()
        jax.block_until_ready(compiled(bundle, noise_i))
        times.append(time.perf_counter() - t0)
        log(f"[{label}] video {i}: {times[-1]:.2f}s")
        if len(times) >= max(min_videos, 2):
            a, b = times[-2], times[-1]
            if abs(a - b) / max(a, b) <= 0.10:
                stable = True
                break
        elif min_videos <= 1 and times:
            # VDPP_BENCH_VIDEOS=1: accept a single measurement (no
            # stability pair to compare).
            stable = True
            break
    tail = times[-2:] if stable else times
    sec_per_video = sum(tail) / len(tail)
    log(
        f"[{label}] sec/video: {sec_per_video:.2f} "
        f"({'stable' if stable else 'UNSTABLE'}, {len(times)} runs)"
    )
    return {
        "sec_per_video": sec_per_video,
        "times": times,
        "memory": memory,
        "stable": stable,
    }


def _emit_failure_json(error: str) -> None:
    """A PARSEABLE failure line: the driver records bench stdout verbatim,
    so even a dead-tunnel round yields a machine-readable artifact
    (round 3 produced rc=124 with parsed=null — the gap this closes).
    value/vs_baseline of 0 cannot be mistaken for a real measurement."""
    print(
        json.dumps({
            "metric": "sec/video single-chip SVD (NOT MEASURED)",
            "value": 0.0,
            "unit": "s/video",
            "vs_baseline": 0.0,
            "error": error,
        }),
        flush=True,
    )


def _probe_backend(timeout_s: float) -> tuple[bool, str]:
    """Initialize the backend in a WATCHDOGGED child process.

    During a tunnel outage an in-process ``jax.devices()`` hangs ~25 min
    before raising UNAVAILABLE (observed 2026-08-18), and JAX memoizes the
    failed init for the process lifetime. A child probe turns that into a
    bounded, retryable check that costs this process nothing."""
    code = "import jax; print(jax.devices()[0].platform)"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend init exceeded {timeout_s:.0f}s (hung tunnel?)"
    if r.returncode == 0:
        return True, r.stdout.strip()
    tail = (r.stderr or "").strip().splitlines()
    return False, (tail[-1] if tail else f"probe rc={r.returncode}")


def _init_backend_with_retry() -> None:
    """Bounded fast-fail init: probe in a watchdogged subprocess until the
    tunnel answers or the deadline passes, then init in-process. Total
    wall is capped (VDPP_BENCH_INIT_DEADLINE_S, default 900 s) so a dead
    tunnel yields a parseable failure artifact instead of a driver
    timeout."""
    probe_cap = float(os.environ.get("VDPP_BENCH_PROBE_TIMEOUT_S", "180"))
    deadline = time.monotonic() + float(
        os.environ.get("VDPP_BENCH_INIT_DEADLINE_S", "900")
    )
    attempt = 0
    while True:
        attempt += 1
        t0 = time.perf_counter()
        ok, detail = _probe_backend(probe_cap)
        if ok:
            log(
                f"backend probe ok in {time.perf_counter() - t0:.0f}s "
                f"(platform {detail}); initializing in-process"
            )
            break
        remaining = deadline - time.monotonic()
        log(
            f"backend probe attempt {attempt} failed: {detail} "
            f"({remaining:.0f}s of init budget left)"
        )
        if remaining <= 60:
            _emit_failure_json(
                f"axon backend unavailable after {attempt} probe attempts: "
                f"{detail}"
            )
            raise SystemExit(1)
        time.sleep(min(60.0, remaining))
    try:
        jax.devices()
    except RuntimeError as e:
        # Tunnel died between probe and init; the failure is memoized for
        # this process — re-exec once per attempt, bounded.
        attempt = int(os.environ.get("VDPP_BENCH_INIT_ATTEMPT", "0"))
        if attempt >= 3:
            _emit_failure_json(f"backend init failed post-probe: {e}")
            raise SystemExit(1) from e
        log(f"init failed post-probe ({e}); re-exec attempt {attempt + 1}/3")
        os.environ["VDPP_BENCH_INIT_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _arm_wall_watchdog() -> threading.Timer:
    """Hard wall-clock bound on the WHOLE bench (default 3600 s): if a
    compile or run wedges on the tunnel past the budget, emit the
    parseable failure line and exit instead of eating the driver's
    capture window."""
    budget = float(os.environ.get("VDPP_BENCH_WALL_S", "3600"))

    def fire() -> None:
        _emit_failure_json(f"bench wall-clock budget {budget:.0f}s exceeded")
        os._exit(3)

    timer = threading.Timer(budget, fire)
    timer.daemon = True
    timer.start()
    return timer


def main() -> None:
    from vdpp_tpu.models.svd_unet import SVDUNetConfig

    watchdog = _arm_wall_watchdog()
    _init_backend_with_retry()

    preset = os.environ.get("VDPP_BENCH_PRESET", "full")
    frames = int(os.environ.get("VDPP_BENCH_FRAMES", 25))
    lat_h = int(os.environ.get("VDPP_BENCH_H", 72))
    lat_w = int(os.environ.get("VDPP_BENCH_W", 128))
    steps = int(os.environ.get("VDPP_BENCH_STEPS", 30))
    min_videos = int(os.environ.get("VDPP_BENCH_VIDEOS", 2))
    max_videos = int(os.environ.get("VDPP_BENCH_MAX_VIDEOS", 4))
    guidance = float(os.environ.get("VDPP_BENCH_GUIDANCE", 3.0))
    cfg_mode = os.environ.get("VDPP_BENCH_CFG_MODE", "sequential")
    secondary = os.environ.get("VDPP_BENCH_SECONDARY", "1") == "1"
    # The default baseline is the reference's measured 14f/25-step time
    # linearly extrapolated by frames*steps — rescale it when env knobs
    # change the measured config, so vs_baseline stays a same-config ratio
    # (a fixed 25f/30-step constant against e.g. a 14f run would inflate
    # the ratio ~2x).
    default_baseline = SECONDARY_BASELINE_SEC * (frames * steps) / (14 * 25)
    baseline_sec = float(
        os.environ.get("VDPP_BENCH_BASELINE_SEC", default_baseline)
    )

    if preset == "tiny":
        config = SVDUNetConfig.tiny()
        frames, lat_h, lat_w, steps = 3, 16, 16, 4
        secondary = False
        # The tiny model is a smoke-test architecture; no reference config
        # corresponds to it, so a frames*steps-rescaled baseline would
        # still be a cross-model ratio. Report 0 (not comparable).
        baseline_override = 0.0
    else:
        config = SVDUNetConfig.svd_xt()
        baseline_override = None

    dev = jax.devices()[0]
    log(f"device: {dev}, platform: {dev.platform}")
    log(
        f"flagship: {preset}, {frames}f latent {lat_h}x{lat_w}, {steps} steps, "
        f"guidance {guidance}, cfg_mode {cfg_mode}; baseline {baseline_sec:.2f}s"
    )

    flagship = measure_config(
        label="flagship",
        config=config,
        frames=frames, lat_h=lat_h, lat_w=lat_w, steps=steps,
        guidance=guidance, cfg_mode=cfg_mode,
        min_videos=min_videos, max_videos=max_videos,
    )

    if secondary:
        # Round-to-round continuity row: the reference's measured
        # single-GPU config (14f, 25 steps).
        sec = measure_config(
            label="secondary-14f25s",
            config=config,
            frames=14, lat_h=lat_h, lat_w=lat_w, steps=25,
            guidance=guidance, cfg_mode=cfg_mode,
            min_videos=2, max_videos=3,
        )
        log(
            f"[secondary-14f25s] vs reference single-GPU 47.65s: "
            f"{SECONDARY_BASELINE_SEC / sec['sec_per_video']:.2f}x"
        )

    sec_per_video = flagship["sec_per_video"]
    result = {
        "metric": (
            f"sec/video single-chip SVD {frames}f {lat_h}x{lat_w} latent, "
            f"{steps} steps, CFG {guidance}"
        ),
        "value": round(sec_per_video, 3),
        "unit": "s/video",
        "vs_baseline": (
            0.0 if baseline_override == 0.0
            else round(baseline_sec / sec_per_video, 3)
        ),
    }
    # The driver-contract line goes out BEFORE the optional fast-path
    # measurement: a fast-path compile timeout must never cost the
    # round its one parseable metric. The wall watchdog is cancelled HERE,
    # not at the end: once the success line is printed, a late watchdog
    # fire would append a second, contradictory bare-JSON verdict (the
    # same double-verdict hazard the dryrun guards against with its
    # marker file). The fast path gets its own QUIET bound below.
    print(json.dumps(result), flush=True)
    watchdog.cancel()

    if preset == "full" and os.environ.get("VDPP_BENCH_FASTPATH", "1") == "1":
        # Composed-lever fast path (dpmpp2m 15 steps x deepcache-2): the
        # production low-latency configuration (docs/performance.md
        # "Round-4 opt-in fast path": 21.38 s/video, 2.52x over the driver
        # metric). Output-changing (2nd-order solver at half the steps +
        # cached deep features), so it is NOT the driver metric — it is
        # emitted as a prefixed FASTPATH_JSON line the driver's one-line
        # JSON parse skips but the artifact tail captures.
        # Quiet bound: a wedged fast-path compile must not eat the rest of
        # the driver's capture window, and must NOT print another metric
        # line — the artifact already carries its one valid verdict.
        fast_budget = float(os.environ.get("VDPP_BENCH_FASTPATH_WALL_S", "900"))

        def _fast_fire() -> None:
            log(f"[fastpath] wall budget {fast_budget:.0f}s exceeded; "
                "exiting with the driver metric already emitted")
            os._exit(0)

        fast_watchdog = threading.Timer(fast_budget, _fast_fire)
        fast_watchdog.daemon = True
        fast_watchdog.start()
        try:
            fast = measure_config(
                label="fastpath-dpmpp2m15-dc2",
                config=config,
                frames=frames, lat_h=lat_h, lat_w=lat_w, steps=15,
                guidance=guidance, cfg_mode=cfg_mode,
                min_videos=2, max_videos=3,
                solver="dpmpp2m", deepcache=2,
            )
        except Exception as e:  # fast path is best-effort extra evidence
            log(f"[fastpath] skipped on error: {type(e).__name__}: {e}")
        else:
            fast_sec = fast["sec_per_video"]
            print(
                "FASTPATH_JSON="
                + json.dumps({
                    "metric": (
                        f"sec/video single-chip SVD {frames}f {lat_h}x{lat_w} "
                        "latent, dpmpp2m 15 steps x deepcache-2 "
                        "(opt-in fast path; output-changing)"
                    ),
                    "value": round(fast_sec, 3),
                    "unit": "s/video",
                    "vs_baseline": round(baseline_sec / fast_sec, 3),
                    "vs_driver_metric": round(sec_per_video / fast_sec, 3),
                }),
                flush=True,
            )
        fast_watchdog.cancel()


if __name__ == "__main__":
    main()
