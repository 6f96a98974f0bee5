"""Sequence (token-axis) parallelism for single-sample latency.

The reference parallelizes ONLY the diffusion-step axis: one sample's
per-step latency never improves with more devices (a 7-GPU pipeline still
takes a full schedule's wall time for the first sample —
reference: docs/performance_analysis.md "single-latent multi-GPU overhead").
Token-axis sharding is the orthogonal lever the PipeDiT/STADI line of work
applies to video DiTs (see PAPERS.md): shard the spatio-temporal token set
over a mesh axis so ONE denoising step runs S-way parallel.

TPU-native design (vs the reference's impossible-by-construction P2P shape):

* one ``shard_map`` over a ``"seq"`` mesh axis carries the whole denoising
  scan; the latent and params enter replicated;
* inside the model, tokens are sharded right after the (cheap, replicated)
  patch embedding; every transformer block computes Q locally and
  ``all_gather``-s its K/V shard over ICI (exact attention — no
  approximation); norms/MLPs/adaLN are token-local; finished tokens are
  all-gathered once before unpatchify (models/dit.py ``apply(seq_axis=...)``);
* composes with the step pipeline on a 2-D ``(stage, seq)`` mesh: each
  pipeline stage is itself a token-sharded device group
  (``make_stage_seq_mesh`` + ``DiTVideoWrapper.pipeline_step_fn(seq_axis=...)``),
  trading steady-state throughput for per-sample latency — a point the
  reference's 1-D design space cannot express.

Output is elementwise-equal to the unsharded single-device oracle (the
design invariant every executor in this framework upholds; enforced in
tests/test_sequence_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vdpp_tpu.parallel.mesh import SEQ_AXIS


class SequenceParallelRunner:
    """Run a DiT denoising schedule with the token axis sharded over a
    ``"seq"`` mesh axis.

    Args:
        mesh: a Mesh containing a ``"seq"`` axis (usually 1-D, from
            ``make_seq_mesh``).
        wrapper: a ``DiTVideoWrapper`` (any ``attention_mode``; factorized
            shards the within-frame token axis, joint3d the full F*N set).
    """

    def __init__(self, mesh: Mesh, wrapper):
        if SEQ_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{SEQ_AXIS}' axis")
        self.mesh = mesh
        self.wrapper = wrapper
        self.shards = mesh.shape[SEQ_AXIS]
        self._jitted: dict = {}

    def _build(self, num_steps: int):
        wrapper, shards, mesh = self.wrapper, self.shards, self.mesh

        def body(params, latent, context, guidance):
            def one(x, k):
                return (
                    wrapper.step(
                        params, x, k, context, guidance,
                        seq_axis=SEQ_AXIS, seq_shards=shards,
                    ),
                    None,
                )

            x, _ = jax.lax.scan(one, latent, jnp.arange(num_steps, dtype=jnp.int32))
            return x

        sharded = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(sharded)

    def run(self, params, latent: jax.Array, context=None, guidance=None) -> jax.Array:
        """Denoise ``latent (B, F, H, W, C)`` through the wrapper's full
        schedule; returns the finished latent (replicated)."""
        num_steps = self.wrapper.schedule.num_steps
        key = (latent.shape, str(latent.dtype), num_steps, context is None)
        if key not in self._jitted:
            self._jitted[key] = self._build(num_steps)
        return self._jitted[key](params, latent, context, guidance)
