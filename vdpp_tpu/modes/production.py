"""Production mode: pipelined SVD inference on the TPU mesh.

Counterpart of the reference's NCCL production mode
(reference: src/modes/production.py): load/initialize the SVD UNet, set
(dummy or real) conditioning, seed per-sample noise scaled by
``init_noise_sigma`` (reference: src/modes/production.py:127-132), and run
N samples through the stage pipeline.

Example:
    python -m vdpp_tpu.modes.production --num-stages 8 --total-steps 32 \
        --latent-shape 1 4 14 72 128 --num-samples 4 --guidance-scale 3.0
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

LOGGER = logging.getLogger("vdpp.production")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-stages", type=int, default=None)
    p.add_argument("--total-steps", type=int, default=24)
    p.add_argument("--num-samples", type=int, default=1)
    p.add_argument("--latent-shape", type=int, nargs=5, default=[1, 4, 14, 40, 72],
                   metavar=("B", "C", "F", "H", "W"))
    p.add_argument("--guidance-scale", type=float, default=None)
    p.add_argument("--cfg-mode", default="sequential", choices=["sequential", "batched"])
    p.add_argument("--solver", default="euler",
                   choices=["euler", "euler_a", "heun", "dpmpp2m"],
                   help="ODE solver: euler (reference semantics), heun "
                        "(2nd-order EDM, 2 model evals/step — roughly half "
                        "the steps for the same ODE error), or dpmpp2m "
                        "(2nd-order multistep DPM-Solver++, 1 eval/step)")
    p.add_argument("--deepcache", type=int, default=0, metavar="N",
                   help="DeepCache-style cached inference: refresh the deep "
                        "feature cache every N real steps, run only the "
                        "shallow UNet levels in between (0 = off; changes "
                        "outputs — an opt-in speed/quality trade like "
                        "--solver)")
    p.add_argument("--deepcache-split", type=int, default=1,
                   help="shallow levels the cache steps still compute "
                        "(1 = cheapest)")
    p.add_argument("--preset", default="svd_xt", choices=["svd_xt", "tiny"])
    p.add_argument("--checkpoint", default=None,
                   help="path to converted weights (.npz / orbax dir); random init if omitted")
    p.add_argument("--fps", type=int, default=6)
    p.add_argument("--motion-bucket-id", type=int, default=127)
    p.add_argument("--noise-aug-strength", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--sampler-seed", type=int, default=0,
                   help="euler_a only: seed of the per-step injected "
                        "noise (construction-time; vary per run)")
    p.add_argument("--seq-parallel", type=int, default=1,
                   help="halo-exchange W sharding width per stage: a "
                        "(stage, seq[, cfg]) mesh (latent W must divide "
                        "by sp x 2^(levels-1))")
    p.add_argument("--frame-parallel", type=int, default=1,
                   help="frame sharding width per stage: a "
                        "(stage[, seq], frame[, cfg]) mesh (latent F must "
                        "divide by the shard count)")
    p.add_argument("--auto-topology", default=None,
                   choices=["latency", "throughput"],
                   help="pick the (stage, seq, frame, cfg) mesh "
                        "factorization automatically for this objective "
                        "(parallel/topology.py planner); explicit "
                        "--num-stages/--seq-parallel/--frame-parallel/"
                        "--cfg-parallel override it")
    p.add_argument("--cfg-parallel", action="store_true",
                   help="run the uncond/cond CFG branches concurrently on a "
                        "size-2 'cfg' mesh axis inside every stage (needs "
                        "--guidance-scale; uses 2x the devices per stage)")
    p.add_argument("--ticked", action="store_true",
                   help="host-stepped schedule with per-tick timing")
    p.add_argument("--state-path", default=None,
                   help="with --ticked: snapshot the pipeline state "
                        "(tick index + stage payload ring) here every "
                        "--state-every ticks — preemption recovery "
                        "(utils/resume.py)")
    p.add_argument("--state-every", type=int, default=None,
                   help="ticks between snapshots (default every tick)")
    p.add_argument("--resume", action="store_true",
                   help="resume from --state-path if it exists (emits the "
                        "remaining samples bit-identically)")
    p.add_argument("--pad-schedule", action="store_true",
                   help="allow total-steps not divisible by the stage count "
                        "by prepending exact-identity steps")
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--log-level", default="INFO")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_dummy_conditioning
    from vdpp_tpu.parallel.mesh import make_pipeline_mesh
    from vdpp_tpu.parallel.pipeline import PipelineConfig, StepPipeline
    from vdpp_tpu.utils.logging import setup_logging

    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    setup_logging(args.log_level)
    enable_persistent_cache()

    b, c, f, h, w = args.latent_shape
    # Argument-consistency checks belong BEFORE model construction and
    # checkpoint load: a multi-GB svd_xt load should never complete only
    # for the run to die on a flag mismatch (and a silently ignored
    # --resume would restart from tick 0 while the user believes the run
    # resumed).
    if args.state_path and not args.ticked:
        raise SystemExit("--state-path needs --ticked (the fused executor "
                         "runs the whole schedule in one program — there "
                         "is no host-visible state between ticks)")
    if args.resume and not args.state_path:
        raise SystemExit("--resume needs --state-path (where should the "
                         "snapshot come from?)")
    if args.state_every is not None and not args.state_path:
        raise SystemExit("--state-every needs --state-path")
    config = SVDUNetConfig.tiny() if args.preset == "tiny" else SVDUNetConfig.svd_xt()
    if args.auto_topology and not (
        args.num_stages or args.seq_parallel > 1 or args.frame_parallel > 1
        or args.cfg_parallel
    ):
        from vdpp_tpu.parallel.topology import plan_topology

        plans = plan_topology(
            len(jax.devices()),
            total_steps=args.total_steps, frames=f, latent_w=w,
            num_samples=args.num_samples,
            seq_min_divisor_unit=config.seq_min_divisor(1),
            guidance=args.guidance_scale is not None,
            objective=args.auto_topology,
            deepcache_interval=args.deepcache,
        )
        best = plans[0]
        LOGGER.info("auto-topology (%s): %s", args.auto_topology,
                    best.describe())
        for alt in plans[1:3]:
            LOGGER.info("  runner-up: %s", alt.describe())
        args.num_stages = best.stage
        args.seq_parallel = best.seq
        args.frame_parallel = best.frame
        args.cfg_parallel = best.cfg == 2
        if best.padded_steps != args.total_steps:
            args.pad_schedule = True
    elif args.auto_topology:
        LOGGER.info("auto-topology ignored: explicit axis flags given")
    sp = args.seq_parallel
    fp = args.frame_parallel
    if sp > 1 and w % config.seq_min_divisor(sp) != 0:
        raise SystemExit(
            f"--seq-parallel {sp}: latent width {w} must divide by "
            f"sp x 2^(levels-1) = {config.seq_min_divisor(sp)}"
        )
    if fp > 1 and f % fp != 0:
        raise SystemExit(
            f"--frame-parallel {fp}: frame count {f} must divide by it"
        )
    if args.cfg_parallel and args.guidance_scale is None:
        raise SystemExit("--cfg-parallel needs --guidance-scale")
    if args.cfg_parallel or sp > 1 or fp > 1:
        from vdpp_tpu.parallel.mesh import make_axes_mesh

        per_stage = sp * fp * (2 if args.cfg_parallel else 1)
        if args.num_stages is None:
            args.num_stages = len(jax.devices()) // per_stage
        axes = {"stage": args.num_stages}
        if sp > 1:
            axes["seq"] = sp
        if fp > 1:
            axes["frame"] = fp
        if args.cfg_parallel:
            axes["cfg"] = 2
        mesh = make_axes_mesh(**axes)
    else:
        mesh = make_pipeline_mesh(args.num_stages)
    stages = mesh.shape["stage"]

    LOGGER.info(
        "production: %d stages, %d steps, latent (B,C,F,H,W)=%s, preset=%s, CFG=%s",
        stages, args.total_steps, tuple(args.latent_shape), args.preset,
        args.guidance_scale,
    )

    model = StableVideoUNet(
        config, num_steps=args.total_steps, cfg_mode=args.cfg_mode,
        pad_steps_to=stages if args.pad_schedule else None,
        solver=args.solver,
        sampler_seed=args.sampler_seed,
        deepcache_interval=args.deepcache,
        deepcache_split=args.deepcache_split,
    )
    if model.num_steps != args.total_steps:
        LOGGER.info(
            "schedule padded %d -> %d steps (exact identity steps) for %d stages",
            args.total_steps, model.num_steps, stages,
        )
    t0 = time.perf_counter()
    if args.checkpoint:
        from vdpp_tpu.utils.weights import load_params

        params = load_params(args.checkpoint, dtype=config.dtype)
    else:
        params = jax.jit(model.init)(jax.random.key(args.seed))
    params = jax.block_until_ready(params)
    LOGGER.info("weights ready in %.1fs (%s)", time.perf_counter() - t0,
                "checkpoint" if args.checkpoint else "random init")

    cond = make_dummy_conditioning(
        jax.random.key(args.seed + 1), b, f, h, w,
        cross_dim=config.cross_attention_dim,
        guidance_scale=args.guidance_scale,
        fps=args.fps,
        motion_bucket_id=args.motion_bucket_id,
        noise_aug_strength=args.noise_aug_strength,
    )
    bundle = (params, cond)
    step_fn = model.pipeline_step_fn(
        cfg_axis="cfg" if args.cfg_parallel else None,
        seq_axis="seq" if sp > 1 else None, seq_shards=sp,
        frame_axis="frame" if fp > 1 else None, frame_shards=fp,
    )

    # Per-sample seeded noise x init_noise_sigma
    # (reference: src/modes/production.py:127-132).
    if c != 4:
        # The SVD UNet denoises 4 latent channels (the other 4 of its
        # 8-channel input are the conditioning concat); an unsupported C
        # must fail loudly, not silently run with 4.
        raise SystemExit(f"--latent-shape C must be 4 for the SVD family, got {c}")
    keys = jax.random.split(jax.random.key(args.seed + 2), args.num_samples)
    inputs = (
        jax.vmap(lambda k: jax.random.normal(k, (b, f, h, w, c), jnp.float32))(keys)
        * model.init_noise_sigma
    )
    # dpmpp2m threads its multistep state through the payload channels;
    # pack_initial/unpack_final are identities for euler/heun.
    inputs = model.pack_initial(inputs)

    pipe = StepPipeline(mesh, step_fn, PipelineConfig(model.num_steps, stages))

    first_sample = 0
    t0 = time.perf_counter()
    if args.ticked:
        start_tick, init_buf = 0, None
        on_tick = None
        if args.state_path:
            from vdpp_tpu.utils.resume import (
                load_pipeline_state,
                save_pipeline_state,
            )

            # Everything that shapes the run's inputs or traced program.
            # A snapshot resumed under different flags would pass the
            # executor's buf-shape check (shape is (S, *latent) — blind
            # to seed/schedule/sample count) and silently mix old
            # in-flight payloads with different fresh inputs and sigmas.
            run_meta = {
                "total_steps": model.num_steps,
                # model.num_steps alone is blind to padding: a 25-step
                # schedule padded to 28 and a real 28-step schedule both
                # record 28 while their sigma tables differ.
                "requested_steps": args.total_steps,
                "pad_schedule": bool(args.pad_schedule),
                "stages": stages,
                "num_samples": args.num_samples,
                "seed": args.seed,
                "solver": args.solver,
                # euler_a's injected noise is a function of sampler_seed:
                # resuming under a different one would splice two
                # different stochastic trajectories.
                "sampler_seed": args.sampler_seed,
                "deepcache": args.deepcache,
                "deepcache_split": args.deepcache_split,
                "latent_shape": list(args.latent_shape),
                "guidance_scale": args.guidance_scale,
                "cfg_mode": args.cfg_mode,
                # weights identity (path-level: catches the common
                # resumed-under-different-weights mistake).
                "preset": args.preset,
                "checkpoint": args.checkpoint,
            }
            if args.resume and os.path.exists(args.state_path):
                last_tick, buf0, meta = load_pipeline_state(args.state_path)
                # Validate every key the snapshot recorded (snapshots
                # from older builds carry fewer keys; those still check).
                mismatch = {
                    k: (v, run_meta.get(k))
                    for k, v in meta.items()
                    if run_meta.get(k) != v
                }
                if mismatch:
                    raise SystemExit(
                        "--resume: snapshot was written by a different "
                        f"run configuration (snapshot vs current): {mismatch}"
                    )
                start_tick, init_buf = last_tick + 1, buf0
                first_sample = max(start_tick - (stages - 1), 0)
                LOGGER.info("resuming at tick %d (samples %d.. remain; %s)",
                            start_tick, first_sample, meta)
            every = max(args.state_every or 1, 1)

            def on_tick(t, buf):
                if (t + 1) % every == 0:
                    save_pipeline_state(
                        args.state_path, t, buf, meta=run_meta,
                    )

        out, tick_times = pipe.run_ticked(
            bundle, inputs, start_tick=start_tick, initial_buf=init_buf,
            on_tick=on_tick,
        )
        jax.block_until_ready(out)
        for i, dt in enumerate(tick_times):
            LOGGER.info("tick %d: %.1f ms", start_tick + i, dt * 1e3)
    else:
        out = jax.block_until_ready(pipe.run(bundle, inputs))
    elapsed = time.perf_counter() - t0
    out = model.unpack_final(out)

    emitted = out.shape[0]
    for i in range(emitted):
        LOGGER.info("sample %d final latent norm: %.3f", first_sample + i,
                    float(jnp.linalg.norm(out[i].astype(jnp.float32))))
    LOGGER.info(
        "%d samples in %.2fs (%.2fs/video incl. compile; bubble %.1f%%)",
        emitted, elapsed, elapsed / max(emitted, 1),
        100 * pipe.config.bubble_fraction(args.num_samples),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
