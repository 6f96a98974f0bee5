"""vdpp_tpu — TPU-native step-pipelined video diffusion inference.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``inai17ibar/video-diffusion-pipeline-parallel`` (reference layout documented in
SURVEY.md): pipeline-parallel video diffusion over the *diffusion-step axis*,
where every device in a mesh holds the full denoiser, runs a contiguous slice
of the noise schedule, and hands the latent to the next stage over ICI.

Unlike the reference (one OS process per GPU + blocking NCCL send/recv,
reference: src/pipeline/pipeline.py:54-157), this framework is
single-controller: the entire multi-sample fill/steady/drain schedule is a
single jitted ``lax.scan`` over "ticks", with the per-step latent hand-off
expressed as ``jax.lax.ppermute`` along a ``Mesh`` axis.
"""

from vdpp_tpu.parallel.step_assignment import StepRange, assign_steps

__version__ = "0.1.0"

__all__ = ["StepRange", "assign_steps", "__version__"]
