"""Classifier-free-guidance (branch-axis) parallelism.

Every CFG denoising step runs the UNet/DiT TWICE — once with zeroed
conditioning, once conditioned (the reference runs them back to back,
reference: src/models/svd_unet.py:384-411). The two branches are
embarrassingly parallel: only their outputs interact, in the guidance
blend. CFG parallelism places them on a size-2 ``"cfg"`` mesh axis, so a
step costs ONE forward of wall-clock plus a latent-sized ``ppermute`` —
near-perfect 2x per-sample latency at 2x devices, with none of the
batched-CFG activation-memory doubling (measured slower on one chip,
docs/performance.md).

The branch selection/swap lives in the model wrappers
(``StableVideoUNet.noise_pred(cfg_axis=...)``,
``DiTVideoWrapper.step(cfg_axis=...)``); this runner carries a full
schedule on a 1-D cfg mesh. For composition, pass ``cfg_axis`` to a
wrapper's ``pipeline_step_fn`` and run it under any executor whose mesh
carries the axis — e.g. (stage, cfg) for PP x CFG, or
(stage, seq, cfg) for PP x SP x CFG (tests/test_cfg_parallel.py).

Output is elementwise-equal to the sequential-CFG single-device oracle
(both devices compute the identical blend, so the result is replicated
over the axis by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vdpp_tpu.parallel.mesh import CFG_AXIS


class CFGParallelRunner:
    """Full-schedule executor on a 1-D ``("cfg",)`` mesh of 2 devices.

    Args:
        mesh: Mesh with a size-2 ``"cfg"`` axis.
        step_fn: a cfg-axis-aware ``step_fn(bundle, latent, step)`` (from a
            wrapper's ``pipeline_step_fn(cfg_axis="cfg")``).
        total_steps: schedule length.
    """

    def __init__(self, mesh: Mesh, step_fn, total_steps: int):
        if CFG_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{CFG_AXIS}' axis")
        if mesh.shape[CFG_AXIS] != 2:
            raise ValueError("the cfg axis has exactly 2 branches (uncond, cond)")
        self.mesh = mesh
        self.step_fn = step_fn
        self.total_steps = total_steps
        self._jitted: dict = {}

    def _build(self):
        step_fn, steps = self.step_fn, self.total_steps

        def body(bundle, latent):
            def one(x, k):
                return step_fn(bundle, x, k), None

            x, _ = jax.lax.scan(one, latent, jnp.arange(steps, dtype=jnp.int32))
            return x

        sharded = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(sharded)

    def run(self, bundle, latent: jax.Array) -> jax.Array:
        """Denoise ``latent`` through all steps; returns the finished
        latent (replicated over the cfg axis)."""
        key = (latent.shape, str(latent.dtype))
        if key not in self._jitted:
            self._jitted[key] = self._build()
        return self._jitted[key](bundle, latent)
