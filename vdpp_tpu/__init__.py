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

__all__ = [
    "StepRange",
    "assign_steps",
    "__version__",
    # lazy: StepPipeline, PipelineConfig, StableVideoUNet, ... (see __getattr__)
]

_LAZY = {
    "StepPipeline": "vdpp_tpu.parallel.pipeline",
    "PipelineConfig": "vdpp_tpu.parallel.pipeline",
    "run_reference_single_device": "vdpp_tpu.parallel.pipeline",
    "DataParallelRunner": "vdpp_tpu.parallel.data_parallel",
    "FSDPRunner": "vdpp_tpu.parallel.data_parallel",
    "make_pipeline_mesh": "vdpp_tpu.parallel.mesh",
    "make_data_mesh": "vdpp_tpu.parallel.mesh",
    "make_2d_mesh": "vdpp_tpu.parallel.mesh",
    "EulerKarrasSchedule": "vdpp_tpu.diffusion.scheduler",
    "StableVideoUNet": "vdpp_tpu.models.svd_wrapper",
    "SVDUNetConfig": "vdpp_tpu.models.svd_unet",
    "make_conditioning": "vdpp_tpu.models.svd_wrapper",
    "make_dummy_conditioning": "vdpp_tpu.models.svd_wrapper",
    "DiTVideoWrapper": "vdpp_tpu.models.dit",
    "DiTVideoConfig": "vdpp_tpu.models.dit",
    "DummyUNet": "vdpp_tpu.models.dummy_unet",
}


def __getattr__(name):
    """Lazy top-level API (avoids importing jax-heavy modules for users
    who only need the pure-Python scheduling layer)."""
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'vdpp_tpu' has no attribute {name!r}")
