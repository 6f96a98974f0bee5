"""Parallelism: step assignment, meshes, and the pipeline engine."""

from vdpp_tpu.parallel.step_assignment import StepRange, assign_steps
from vdpp_tpu.parallel.mesh import make_pipeline_mesh, make_data_mesh

__all__ = ["StepRange", "assign_steps", "make_pipeline_mesh", "make_data_mesh"]
