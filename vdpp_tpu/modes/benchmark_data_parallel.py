"""Data-parallel baseline benchmark.

Counterpart of the reference's DP baseline
(reference: src/modes/benchmark_data_parallel.py): every device holds the
full model and runs ALL diffusion steps for a disjoint shard of the
sample stream — zero inter-device communication during inference. Emits
the same ``BENCHMARK_JSON`` schema with ``"mode": "data_parallel"``
(reference: :232-247).

Example:
    python -m vdpp_tpu.modes.benchmark_data_parallel --model dummy \
        --num-devices 8 --total-steps 28 --num-samples 16
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

LOGGER = logging.getLogger("vdpp.benchmark_dp")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="dummy", choices=["dummy", "svd", "svd_tiny"])
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("--total-steps", type=int, default=28)
    p.add_argument("--num-samples", type=int, default=8,
                   help="must be divisible by num-devices")
    p.add_argument("--warmup-rounds", type=int, default=1)
    p.add_argument("--latent-shape", type=int, nargs=5, default=[1, 8, 4, 16, 16],
                   metavar=("B", "C", "F", "H", "W"))
    p.add_argument("--hidden-channels", type=int, default=16)
    p.add_argument("--guidance-scale", type=float, default=None)
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-level", default="INFO")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from vdpp_tpu.modes.benchmark import _build_model
    from vdpp_tpu.parallel.data_parallel import DataParallelRunner
    from vdpp_tpu.parallel.mesh import make_data_mesh
    from vdpp_tpu.utils.bench_json import benchmark_results_dict, emit_benchmark_json
    from vdpp_tpu.utils.logging import setup_logging
    from vdpp_tpu.utils.memory import peak_memory_gb_per_device

    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    setup_logging(args.log_level)
    enable_persistent_cache()
    step_fn, bundle, noise_shape, pack, model_name = _build_model(args, None)

    mesh = make_data_mesh(args.num_devices)
    world = mesh.shape["data"]
    if args.num_samples % world != 0:
        LOGGER.error("num_samples %d not divisible by %d devices",
                     args.num_samples, world)
        return 1

    runner = DataParallelRunner(mesh, step_fn, args.total_steps)
    inputs = jax.random.normal(
        jax.random.key(args.seed + 2), (args.num_samples, *noise_shape),
        jnp.float32,
    )
    if pack is not None:
        inputs = pack(inputs)

    for _ in range(args.warmup_rounds):
        jax.block_until_ready(runner.run(bundle, inputs))

    # Fresh inputs for the timed round + a 1-element readback fence:
    # remote relays can deduplicate byte-identical dispatches and return
    # optimistically for array outputs (CLAUDE.md timing caveat).
    from vdpp_tpu.utils.profiling import force_sync

    fresh = jax.random.normal(
        jax.random.key(args.seed + 3), (args.num_samples, *noise_shape),
        jnp.float32,
    )
    if pack is not None:
        fresh = pack(fresh)
    fresh = jax.block_until_ready(fresh)
    t0 = time.perf_counter()
    force_sync(jax.block_until_ready(runner.run(bundle, fresh)))
    total = time.perf_counter() - t0

    per_sample = total / args.num_samples
    # DP latency for any single sample is the full-schedule time
    # (reference measured 8.57 s DP vs 1.17 s PP latency at 7 GPUs,
    # reference: EXPERIMENT_RESULTS_JP.md:866-872).
    latency = total / (args.num_samples // world)

    peak_mem = peak_memory_gb_per_device(mesh.devices.flatten())
    mem_source = "allocator"
    program_mem = None
    if not any(peak_mem):
        program_mem = runner.memory_analysis(bundle, inputs)
        if program_mem:
            mem_source = "compiled_program"
            peak_mem = [program_mem["peak_gb"]] * int(mesh.devices.size)

    results = benchmark_results_dict(
        world_size=world,
        total_steps=args.total_steps,
        steps_per_device=args.total_steps,
        model=model_name,
        mode="data_parallel",
        num_samples_measured=args.num_samples,
        warmup_samples=0,
        latent_shape=args.latent_shape,
        first_sample_time_s=latency,
        avg_sample_time_s=per_sample,
        throughput_samples_per_s=args.num_samples / total,
        per_sample_times_ms=[per_sample * 1e3] * args.num_samples,
        peak_memory_gb_per_device=peak_mem,
        extra={
            "platform": jax.devices()[0].platform,
            "peak_memory_source": mem_source,
            **({"program_memory_gb": program_mem} if program_mem else {}),
        },
    )
    emit_benchmark_json(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
