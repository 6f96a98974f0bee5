"""Benchmark mode: pipeline or FSDP throughput measurement.

Counterpart of the reference's benchmark harness
(reference: src/modes/benchmark.py): dummy or SVD model, warmup + measured
samples, fill/steady/throughput accounting, per-device peak memory, and
the ``BENCHMARK_JSON=`` stdout contract.

Timing model: the ticked pipeline executor gives true per-sample
completion timestamps (sample i completes at tick i+S-1), matching the
reference's per-sample ``perf_counter`` records
(reference: src/modes/benchmark.py:228-235). ``--fused`` instead measures
the single-jit whole-schedule program (max throughput; per-sample times
are then derived, not observed).

Example:
    python -m vdpp_tpu.modes.benchmark --model dummy --num-stages 8 \
        --total-steps 28 --num-samples 8 --warmup-samples 1
"""

from __future__ import annotations

import argparse
import contextlib
import logging
import sys
import time

LOGGER = logging.getLogger("vdpp.benchmark")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="dummy",
                   choices=["dummy", "svd", "svd_tiny", "dit", "dit_tiny",
                            "dit3d", "dit3d_tiny", "dit3d_moe_tiny"])
    p.add_argument("--num-stages", type=int, default=None)
    p.add_argument("--total-steps", type=int, default=28)
    p.add_argument("--num-samples", type=int, default=4)
    p.add_argument("--warmup-samples", type=int, default=1)
    p.add_argument("--latent-shape", type=int, nargs=5, default=[1, 8, 4, 16, 16],
                   metavar=("B", "C", "F", "H", "W"))
    p.add_argument("--hidden-channels", type=int, default=16,
                   help="dummy model width")
    p.add_argument("--guidance-scale", type=float, default=None)
    p.add_argument("--fsdp", action="store_true",
                   help="parameter-sharded mode: all devices, all steps")
    p.add_argument("--data-parallel-size", type=int, default=1,
                   help="2-D (stage x data) mesh: each of the D data columns "
                        "runs an independent pipeline over its sample shard "
                        "(PP x DP combined — beyond the reference's 1-D modes; "
                        "implies --fused)")
    p.add_argument("--cfg-parallel", action="store_true",
                   help="CFG branch parallelism: uncond/cond forwards on a "
                        "size-2 'cfg' mesh axis inside every stage (needs "
                        "--guidance-scale; svd/dit models)")
    p.add_argument("--seq-parallel", type=int, default=1,
                   help="token-axis sharding width per stage: a "
                        "(stage, seq[, cfg]) mesh; dit models shard the "
                        "token set (K/V all-gather), svd models shard the "
                        "latent W axis with halo-exchange 3x3 convs")
    p.add_argument("--frame-parallel", type=int, default=1,
                   help="frame-axis sharding width per stage (svd models): "
                        "temporal convs halo-exchange one edge frame, "
                        "temporal attention all-gathers over frames; "
                        "spatial work is frame-local")
    p.add_argument("--expert-parallel", type=int, default=1,
                   help="expert-axis width per stage (MoE dit models): "
                        "expert weights sharded over an 'expert' mesh axis "
                        "(ops/moe.py)")
    p.add_argument("--deepcache", type=int, default=0, metavar="N",
                   help="svd models: DeepCache-style cached inference — "
                        "full UNet every N steps, shallow levels only in "
                        "between (0 = off; changes outputs, see "
                        "production --deepcache)")
    p.add_argument("--deepcache-split", type=int, default=1,
                   help="shallow levels the cache steps still compute")
    p.add_argument("--weights-int8", action="store_true",
                   help="weight-only int8 quantization (halves parameter "
                        "HBM; ops/quant.py)")
    p.add_argument("--weights-w8a8", action="store_true",
                   help="W8A8: weight-only int8 PLUS dynamic activation "
                        "quantization at big linear/conv sites — the "
                        "int8 x int8 double-rate MXU GEMM path. Changes "
                        "numerics (opt-in); pipelined-equals-oracle still "
                        "holds W8A8-vs-W8A8 (ops/quant.py)")
    p.add_argument("--fused", action="store_true",
                   help="single-jit whole-schedule program (derived per-sample times)")
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-level", default="INFO")
    p.add_argument("--profile-dir", default=None,
                   help="capture a device-timeline profile of the warmup + "
                        "measured runs into this directory (open with "
                        "xprof/TensorBoard); no-op on backends without "
                        "profiling support")
    return p


def _build_model(args, config_dtype):
    """Returns (step_fn, bundle, noise_shape, pack, model_name).

    ``noise_shape`` is the per-sample shape of the MODEL's latent (what
    the noise generator fills); ``pack`` (or None for identity) is the
    wrapper's ``pack_initial``, which owns the pipeline-payload layout
    ([x ‖ solver state ‖ cache lanes]) — the benchmark must not re-derive
    that layout by hand."""
    import jax
    import jax.numpy as jnp

    b, c, f, h, w = args.latent_shape
    # (getattr: benchmark_data_parallel reuses this builder with a parser
    # that has no multi-axis flags)
    cfg_parallel = getattr(args, "cfg_parallel", False)
    cfg_axis = "cfg" if cfg_parallel else None
    sp = getattr(args, "seq_parallel", 1)
    fp = getattr(args, "frame_parallel", 1)
    ep = getattr(args, "expert_parallel", 1)
    if ep > 1 and args.model != "dit3d_moe_tiny":
        raise SystemExit("--expert-parallel needs an MoE model (dit3d_moe_tiny)")
    if fp > 1 and not args.model.startswith("svd"):
        raise SystemExit("--frame-parallel needs an svd model (frame axis)")
    if fp > 1 and f % fp != 0:
        raise SystemExit(
            f"--frame-parallel {fp}: frame count {f} must divide by it"
        )
    if cfg_parallel and args.guidance_scale is None:
        raise SystemExit("--cfg-parallel needs --guidance-scale (CFG active)")
    if args.model == "dummy":
        # (--frame-parallel already rejected above: dummy is not svd*)
        if cfg_parallel or sp > 1:
            raise SystemExit(
                "--cfg-parallel/--seq-parallel need a CFG/transformer model "
                "(svd*/dit*)"
            )
        from vdpp_tpu.models.dummy_unet import DummyUNet

        model = DummyUNet(channels=c, hidden_channels=args.hidden_channels)
        params = model.init(jax.random.key(args.seed))
        step_fn = lambda p, x, s: model.apply(p, x, s)  # noqa: E731
        # DummyUNet keeps the reference's channels-first (B,C,F,H,W) layout.
        return step_fn, params, (b, c, f, h, w), None, "dummy"

    if args.model.startswith("dit"):
        from vdpp_tpu.models.dit import DiTVideoConfig, DiTVideoWrapper
        from vdpp_tpu.models.svd_wrapper import make_guidance_ramp

        dcfg = {
            "dit_tiny": DiTVideoConfig.tiny,
            "dit": DiTVideoConfig.latte_xl,
            "dit3d_tiny": DiTVideoConfig.joint3d_tiny,
            "dit3d": DiTVideoConfig.joint3d_xl,
            "dit3d_moe_tiny": DiTVideoConfig.moe_tiny,
        }[args.model]()
        wrapper = DiTVideoWrapper(dcfg, num_steps=args.total_steps)
        params = jax.jit(wrapper.init)(jax.random.key(args.seed))
        ctx = jax.random.normal(
            jax.random.key(args.seed + 1), (b, 2, dcfg.cross_attention_dim)
        )
        guidance = make_guidance_ramp(args.guidance_scale, f)
        return (
            wrapper.pipeline_step_fn(
                seq_axis="seq" if sp > 1 else None, seq_shards=sp,
                cfg_axis=cfg_axis,
                expert_axis="expert" if ep > 1 else None,
            ),
            (params, ctx, guidance),
            (b, f, h, w, dcfg.in_channels),
            None,
            args.model,
        )

    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_dummy_conditioning

    config = (
        SVDUNetConfig.tiny() if args.model == "svd_tiny" else SVDUNetConfig.svd_xt()
    )
    if sp > 1 and w % config.seq_min_divisor(sp) != 0:
        raise SystemExit(
            f"--seq-parallel {sp}: latent width {w} must be divisible by "
            f"sp x 2^(levels-1) = {config.seq_min_divisor(sp)} "
            "(halo-exchange W sharding)"
        )
    model = StableVideoUNet(
        config, num_steps=args.total_steps,
        deepcache_interval=getattr(args, "deepcache", 0),
        deepcache_split=getattr(args, "deepcache_split", 1),
    )
    params = jax.jit(model.init)(jax.random.key(args.seed))
    cond = make_dummy_conditioning(
        jax.random.key(args.seed + 1), b, f, h, w,
        cross_dim=config.cross_attention_dim,
        guidance_scale=args.guidance_scale,
    )
    # Solver/cache state (dpmpp2m x0_hat slot, deepcache lanes) is
    # attached by model.pack_initial — the single owner of the payload
    # layout; step 0 is always a full step, so the zero-initialized
    # cache lanes are refreshed before first use.
    return (
        model.pipeline_step_fn(
            cfg_axis=cfg_axis,
            seq_axis="seq" if sp > 1 else None, seq_shards=sp,
            frame_axis="frame" if fp > 1 else None, frame_shards=fp,
        ),
        (params, cond),
        (b, f, h, w, 4),
        model.pack_initial,
        args.model,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from vdpp_tpu.parallel.data_parallel import FSDPRunner
    from vdpp_tpu.parallel.mesh import make_data_mesh, make_pipeline_mesh
    from vdpp_tpu.parallel.pipeline import PipelineConfig, StepPipeline
    from vdpp_tpu.utils.bench_json import benchmark_results_dict, emit_benchmark_json
    from vdpp_tpu.utils.logging import setup_logging
    from vdpp_tpu.utils.memory import peak_memory_gb_per_device
    from vdpp_tpu.utils.profiling import force_sync

    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    setup_logging(args.log_level)
    enable_persistent_cache()
    if args.deepcache and args.model not in ("svd_tiny", "svd"):
        raise SystemExit(
            "--deepcache is implemented for the SVD UNet family only"
        )
    step_fn, bundle, noise_shape, pack, model_name = _build_model(args, None)
    w8a8 = getattr(args, "weights_w8a8", False)
    if (getattr(args, "weights_int8", False) or w8a8) and args.model == "dummy":
        raise SystemExit(
            "--weights-int8/--weights-w8a8 need the svd/dit model families "
            "(DummyUNet's OIDHW conv layout has no int8 dispatch)"
        )
    if getattr(args, "weights_int8", False) or w8a8:
        from vdpp_tpu.ops.quant import param_bytes, quantize_tree

        before = param_bytes(bundle)
        bundle = quantize_tree(bundle, act_int8=w8a8)
        LOGGER.info(
            "int8 weights%s: %.1f -> %.1f MB of parameters",
            " + a8 activations" if w8a8 else "",
            before / 2**20, param_bytes(bundle) / 2**20,
        )
    total_n = args.num_samples + args.warmup_samples

    inputs = jax.random.normal(
        jax.random.key(args.seed + 2), (total_n, *noise_shape), jnp.float32
    )
    if pack is not None:
        inputs = pack(inputs)

    # --profile-dir: device-timeline capture spanning warmup + measured
    # runs (closed before the JSON emit so the trace flushes even when
    # stdout is piped). The timing numbers in BENCHMARK_JSON remain
    # honest — profiling adds per-dispatch overhead, so treat a profiled
    # run's times as indicative, not as the metric.
    profile_stack = contextlib.ExitStack()
    if args.profile_dir:
        import atexit

        from vdpp_tpu.utils.profiling import device_trace

        profile_stack.enter_context(device_trace(args.profile_dir))
        # Flush the trace even when the run dies mid-measurement (the
        # failure one typically profiles to diagnose); close() is
        # idempotent, so the success-path close before the JSON emit
        # still runs first.
        atexit.register(profile_stack.close)

    if args.fsdp:
        if (args.seq_parallel > 1 or args.cfg_parallel
                or args.expert_parallel > 1 or args.frame_parallel > 1):
            raise SystemExit(
                "--fsdp runs every step on every device (no stage axis); "
                "drop --seq-parallel/--frame-parallel/--cfg-parallel/"
                "--expert-parallel"
            )
        mesh = make_data_mesh(args.num_stages)
        world = mesh.shape["data"]
        runner = FSDPRunner(mesh, step_fn, args.total_steps)
        # Warm the TIMED (1, ...) shape; with --warmup-samples 0 a
        # synthetic sample warms the compile so no measured input is ever
        # dispatched twice (remote-relay dedup, CLAUDE.md caveat).
        if args.warmup_samples:
            for i in range(args.warmup_samples):
                jax.block_until_ready(runner.run(bundle, inputs[i : i + 1]))
        else:
            warm = jax.random.normal(
                jax.random.key(args.seed + 4), (1, *inputs.shape[1:]),
                inputs.dtype,
            )
            jax.block_until_ready(runner.run(bundle, warm))
        per_sample = []
        for i in range(args.num_samples):
            # Fresh inputs per timed call (never re-timing a warmup
            # sample): repeated-identical dispatches can be deduplicated
            # by the remote relay and report ~0 ms (CLAUDE.md caveat).
            j = args.warmup_samples + i
            t0 = time.perf_counter()
            force_sync(jax.block_until_ready(
                runner.run(bundle, inputs[j : j + 1])))
            per_sample.append(time.perf_counter() - t0)
        first = per_sample[0]
        steady = sum(per_sample) / len(per_sample)
        throughput = 1.0 / steady if steady else 0.0
        steps_per_device = args.total_steps
        mode = "fsdp"
        per_sample_ms = [t * 1e3 for t in per_sample]
    else:
        dp = args.data_parallel_size
        sp = args.seq_parallel
        fp = args.frame_parallel
        cfg_par = args.cfg_parallel
        ep = args.expert_parallel
        if dp > 1 and (sp > 1 or fp > 1 or cfg_par or ep > 1):
            raise SystemExit(
                "--data-parallel-size composes with the stage axis only; "
                "drop --seq-parallel/--frame-parallel/--cfg-parallel/"
                "--expert-parallel"
            )
        if dp > 1:
            from vdpp_tpu.parallel.mesh import make_2d_mesh

            if not args.fused:
                LOGGER.info("2-D (stage x data) mesh runs the fused executor")
                args.fused = True
            if args.num_stages is None:
                args.num_stages = len(jax.devices()) // dp
            if total_n % dp != 0:
                raise SystemExit(
                    f"--num-samples + --warmup-samples ({total_n}) must be "
                    f"divisible by --data-parallel-size ({dp})"
                )
            mesh = make_2d_mesh(args.num_stages, dp)
        elif sp > 1 or fp > 1 or cfg_par or ep > 1:
            from vdpp_tpu.parallel.mesh import make_axes_mesh

            per_stage = sp * fp * (2 if cfg_par else 1) * ep
            if args.num_stages is None:
                args.num_stages = len(jax.devices()) // per_stage
            axes = {"stage": args.num_stages}
            if sp > 1:
                axes["seq"] = sp
            if fp > 1:
                axes["frame"] = fp
            if cfg_par:
                axes["cfg"] = 2
            if ep > 1:
                axes["expert"] = ep
            mesh = make_axes_mesh(**axes)
        else:
            mesh = make_pipeline_mesh(args.num_stages)
        world = mesh.shape["stage"]
        param_spec = None
        if ep > 1:
            from jax.sharding import PartitionSpec as P

            from vdpp_tpu.ops.moe import expert_param_spec

            # bundle = (params, ctx, guidance): shard expert leaves only.
            param_spec = (expert_param_spec(bundle[0], "expert"), P(), P())
        pipe = StepPipeline(
            mesh, step_fn, PipelineConfig(args.total_steps, world),
            param_spec=param_spec,
        )
        steps_per_device = args.total_steps // world
        mode = "pipeline" if dp == 1 else "pipeline_x_dp"
        if sp > 1:
            mode += f"_x_sp{sp}"
        if fp > 1:
            mode += f"_x_fp{fp}"
        if cfg_par:
            mode += "_x_cfg"
        if ep > 1:
            mode += f"_x_ep{ep}"
        if args.fused:
            # compile both shapes (the fill probe uses one sample per data
            # column so its N is divisible by dp), then time FRESH inputs:
            # re-dispatching the warmup arrays byte-identically can be
            # deduplicated by the remote relay (~0 ms; CLAUDE.md caveat).
            jax.block_until_ready(pipe.run(bundle, inputs[:dp]))
            jax.block_until_ready(pipe.run(bundle, inputs))
            # readied BEFORE the timed window: the lazily dispatched RNG
            # program must not bill its cost to the measured run
            fresh = jax.random.normal(
                jax.random.key(args.seed + 3), (total_n, *noise_shape),
                inputs.dtype,
            )
            if pack is not None:
                fresh = pack(fresh)
            fresh = jax.block_until_ready(fresh)
            t0 = time.perf_counter()
            force_sync(jax.block_until_ready(pipe.run(bundle, fresh[:dp])))
            first = time.perf_counter() - t0
            t0 = time.perf_counter()
            force_sync(jax.block_until_ready(pipe.run(bundle, fresh)))
            total = time.perf_counter() - t0
            # steady state emits dp samples per pipeline tick-period
            if total_n > dp:
                steady = (total - first) / (total_n - dp)
            else:
                # the whole stream fits one tick-batch: no steady phase
                # exists, and (total - first) is timing noise of two runs
                # of the SAME work (it produced a negative "steady" in a
                # sweep artifact) — report the amortized per-sample time.
                steady = total / total_n
            throughput = total_n / total
            per_sample_ms = [first * 1e3] * dp + [steady * 1e3] * (total_n - dp)
        else:
            out, tick_times = pipe.run_ticked(bundle, inputs)
            # sample i completes at tick i + S - 1
            completion = []
            acc = 0.0
            for t, dt in enumerate(tick_times):
                acc += dt
                if t >= world - 1:
                    completion.append(acc)
            per_sample = [
                completion[i] - (completion[i - 1] if i else 0.0)
                for i in range(len(completion))
            ]
            first = completion[0]
            measured = per_sample[args.warmup_samples:]
            steady = sum(measured) / len(measured) if measured else 0.0
            throughput = 1.0 / steady if steady else 0.0
            per_sample_ms = [t * 1e3 for t in per_sample]

    # Peak memory: allocator stats where the backend reports them; else
    # fall back to XLA's compile-time program analysis of the main
    # executable (reference reports torch.cuda.max_memory_allocated,
    # src/modes/benchmark.py:239-249 — the tunnel/CPU backends here return
    # empty allocator stats, so the program analysis is the honest source).
    peak_mem = peak_memory_gb_per_device(mesh.devices.flatten())
    mem_source = "allocator"
    program_mem = None
    if not any(peak_mem):
        if args.fsdp:
            # Analyze the batch-1 program — the only one warmup/timing
            # actually compile and run (a (warmup_samples, ...) shape
            # would force an extra multi-minute remote compile and report
            # a program that never executed).
            program_mem = runner.memory_analysis(bundle, inputs[:1])
        else:
            program_mem = pipe.memory_analysis(bundle, inputs, ticked=not args.fused)
        if program_mem:
            mem_source = "compiled_program"
            peak_mem = [program_mem["peak_gb"]] * int(mesh.devices.size)

    results = benchmark_results_dict(
        world_size=world,
        total_steps=args.total_steps,
        steps_per_device=steps_per_device,
        model=model_name,
        mode=mode,
        num_samples_measured=args.num_samples,
        warmup_samples=args.warmup_samples,
        latent_shape=args.latent_shape,
        first_sample_time_s=first,
        avg_sample_time_s=steady,
        throughput_samples_per_s=throughput,
        per_sample_times_ms=per_sample_ms,
        peak_memory_gb_per_device=peak_mem,
        extra={
            # per data column: N/dp samples through an S-deep pipeline
            "bubble_fraction": (
                0.0
                if args.fsdp
                else round(
                    pipe.config.bubble_fraction(
                        total_n // args.data_parallel_size
                    ),
                    4,
                )
            ),
            "data_parallel_size": 1 if args.fsdp else args.data_parallel_size,
            "platform": jax.devices()[0].platform,
            "peak_memory_source": mem_source,
            **({"program_memory_gb": program_mem} if program_mem else {}),
        },
    )
    profile_stack.close()
    emit_benchmark_json(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
