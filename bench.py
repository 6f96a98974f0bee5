"""Driver benchmark: flagship SVD denoise throughput on real TPU.

Prints ONE machine-readable JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Default configuration matches the reference's single-GPU flagship demo
measurement — SVD-XT UNet, 14 frames, 1024x576 (latent 72x128), 25 steps,
CFG ramp 1->3 — whose diffusion phase took 47.65 s on an RTX A5000
(reference: EXPERIMENT_RESULTS.md:255-268; see BASELINE.md). Weights are
randomly initialized (bit-identical architecture & math; HF weights are
not downloadable in this environment), which does not change the compute
profile.

vs_baseline = baseline_sec / measured_sec  (>1 means faster than the
reference's single-GPU number on its own headline workload).

Env knobs: VDPP_BENCH_FRAMES, VDPP_BENCH_H, VDPP_BENCH_W (latent dims),
VDPP_BENCH_STEPS, VDPP_BENCH_VIDEOS, VDPP_BENCH_GUIDANCE,
VDPP_BENCH_CFG_MODE (sequential|batched), VDPP_BENCH_PRESET (full|tiny).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_dummy_conditioning

    preset = os.environ.get("VDPP_BENCH_PRESET", "full")
    frames = int(os.environ.get("VDPP_BENCH_FRAMES", 14))
    lat_h = int(os.environ.get("VDPP_BENCH_H", 72))
    lat_w = int(os.environ.get("VDPP_BENCH_W", 128))
    steps = int(os.environ.get("VDPP_BENCH_STEPS", 25))
    videos = int(os.environ.get("VDPP_BENCH_VIDEOS", 2))
    guidance = float(os.environ.get("VDPP_BENCH_GUIDANCE", 3.0))
    cfg_mode = os.environ.get("VDPP_BENCH_CFG_MODE", "sequential")
    # Reference single-A5000 diffusion-phase time for this exact config
    # (25 steps, 14f, 1024x576, CFG 1->3): 47.65 s.
    baseline_sec = float(os.environ.get("VDPP_BENCH_BASELINE_SEC", 47.65))

    if preset == "tiny":
        config = SVDUNetConfig.tiny()
        frames, lat_h, lat_w, steps = 3, 16, 16, 4
    else:
        config = SVDUNetConfig.svd_xt()

    dev = jax.devices()[0]
    log(f"device: {dev}, platform: {dev.platform}")
    log(
        f"config: {preset}, {frames}f latent {lat_h}x{lat_w}, {steps} steps, "
        f"guidance {guidance}, cfg_mode {cfg_mode}"
    )

    model = StableVideoUNet(config, num_steps=steps, cfg_mode=cfg_mode)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.key(0))
    params = jax.block_until_ready(params)
    log(f"init: {time.perf_counter() - t0:.1f}s")

    cond = make_dummy_conditioning(
        jax.random.key(1),
        1,
        frames,
        lat_h,
        lat_w,
        cross_dim=config.cross_attention_dim,
        guidance_scale=guidance,
        dtype=jnp.float32,
    )

    step_fn = model.pipeline_step_fn()

    @jax.jit
    def generate(bundle, latent):
        def body(x, k):
            return step_fn(bundle, x, k), None

        out, _ = jax.lax.scan(body, latent, jnp.arange(steps, dtype=jnp.int32))
        return out

    bundle = (params, cond)
    noise = (
        jax.random.normal(jax.random.key(2), (1, frames, lat_h, lat_w, 4), jnp.float32)
        * model.init_noise_sigma
    )

    # First execution compiles; the remote-compile path in some
    # environments fails transiently ("response body closed") — retry.
    out = None
    for attempt in range(3):
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(generate(bundle, noise))
            compile_and_first = time.perf_counter() - t0
            break
        except Exception as e:  # transient compile-transport errors
            log(f"first-run attempt {attempt} failed: {type(e).__name__}: {e}")
            if attempt == 2:
                raise
            time.sleep(10)
    log(f"first video (incl. compile): {compile_and_first:.1f}s")
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32)))), "non-finite output"

    times = []
    for i in range(videos):
        # Fresh noise per timed video: repeated identical dispatches can
        # be deduplicated by remote-device relays, faking ~0 s timings.
        noise_i = (
            jax.random.normal(
                jax.random.key(100 + i), (1, frames, lat_h, lat_w, 4), jnp.float32
            )
            * model.init_noise_sigma
        )
        t0 = time.perf_counter()
        jax.block_until_ready(generate(bundle, noise_i))
        times.append(time.perf_counter() - t0)
        log(f"video {i}: {times[-1]:.2f}s")

    try:
        from vdpp_tpu.utils.memory import peak_memory_gb_per_device

        log(f"peak HBM (GB): {peak_memory_gb_per_device()[0]:.2f}")
    except Exception:
        pass

    sec_per_video = sum(times) / len(times)
    result = {
        "metric": (
            f"sec/video single-chip SVD {frames}f {lat_h}x{lat_w} latent, "
            f"{steps} steps, CFG {guidance}"
        ),
        "value": round(sec_per_video, 3),
        "unit": "s/video",
        "vs_baseline": round(baseline_sec / sec_per_video, 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
