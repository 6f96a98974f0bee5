"""Simulator mode: pipeline-logic verification on a CPU mesh.

TPU-native counterpart of the reference's CPU/Gloo simulator
(reference: src/modes/simulator.py): run the DummyUNet through the
stage pipeline on host-platform devices and log the final latent norm.
The correctness invariant is that the norm is identical for every stage
count (reference: src/modes/simulator.py:161-162; EXPERIMENT_REPORT.md
reports 11,545.80 at 1/2/4/7 ranks for the torch build).

This build checks the invariant *in one process*: it runs the pipelined
schedule AND the single-device oracle and asserts elementwise equality —
strictly stronger than comparing norms across separate launches.

Example:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m vdpp_tpu.modes.simulator --num-stages 7 --total-steps 28
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

LOGGER = logging.getLogger("vdpp.simulator")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-stages", "--world-size", dest="num_stages", type=int,
                   default=None, help="pipeline stages (default: all devices)")
    p.add_argument("--total-steps", type=int, default=28)
    p.add_argument("--num-samples", type=int, default=1)
    p.add_argument("--channels", type=int, default=8)
    p.add_argument("--hidden-channels", type=int, default=16)
    p.add_argument("--no-layernorm", action="store_true")
    p.add_argument("--latent-shape", type=int, nargs=5, default=[1, 8, 4, 16, 16],
                   metavar=("B", "C", "F", "H", "W"),
                   help="latent shape in the reference's (B,C,F,H,W) order")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", default="cpu", choices=["cpu", "tpu"],
                   help="device platform for the mesh")
    p.add_argument("--skip-oracle", action="store_true",
                   help="skip the single-device equality check")
    p.add_argument("--log-level", default="INFO")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.backend == "cpu" and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.num_stages or 8, 1)}"
        ).strip()

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from vdpp_tpu.models.dummy_unet import DummyUNet
    from vdpp_tpu.parallel.mesh import make_pipeline_mesh
    from vdpp_tpu.parallel.pipeline import (
        PipelineConfig,
        StepPipeline,
        run_reference_single_device,
    )
    from vdpp_tpu.utils.logging import setup_logging

    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    setup_logging(args.log_level)
    enable_persistent_cache()

    b, c, f, h, w = args.latent_shape
    if c != args.channels:
        LOGGER.warning("latent channels %d != --channels %d; using latent's", c, args.channels)

    mesh = make_pipeline_mesh(args.num_stages)
    stages = mesh.shape["stage"]
    LOGGER.info(
        "simulator: %d stages, %d steps (%d per stage), latent (B,C,F,H,W)=%s",
        stages, args.total_steps, args.total_steps // stages, tuple(args.latent_shape),
    )

    model = DummyUNet(
        channels=c,
        hidden_channels=args.hidden_channels,
        use_layernorm=not args.no_layernorm,
    )
    params = model.init(jax.random.key(args.seed))
    total = args.total_steps

    # The reference simulator feeds DESCENDING timesteps [T-1 .. 0] to the
    # model (reference: src/modes/simulator.py:77-79); map the pipeline's
    # ascending step index accordingly.
    step_fn = lambda p, x, s: model.apply(p, x, total - 1 - s)  # noqa: E731

    # DummyUNet keeps the reference's (B, C, F, H, W) layout.
    inputs = jax.random.normal(
        jax.random.key(args.seed + 1), (args.num_samples, b, c, f, h, w), jnp.float32
    )

    pipe = StepPipeline(
        mesh, step_fn, PipelineConfig(args.total_steps, stages)
    )
    out = jax.block_until_ready(pipe.run(params, inputs))

    for i in range(args.num_samples):
        LOGGER.info("sample %d final latent norm: %.2f", i, float(jnp.linalg.norm(out[i])))

    if not args.skip_oracle:
        ref = run_reference_single_device(step_fn, params, inputs, args.total_steps)
        max_diff = float(jnp.max(jnp.abs(out - ref)))
        LOGGER.info("max |pipelined - single-device| = %.3e", max_diff)
        if max_diff > 1e-4:
            LOGGER.error("MISMATCH: pipeline is not stage-count invariant")
            return 1
        LOGGER.info("stage-count invariance verified (%d stages)", stages)
    return 0


if __name__ == "__main__":
    sys.exit(main())
