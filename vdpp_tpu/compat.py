"""Reference-API compatibility layer.

Thin adapters exposing this framework under the reference's names and
call shapes (reference: src/pipeline/pipeline.py:160-208,
src/distributed/backend.py:12-31) so migrating code maps one-to-one.
The process-centric arguments (``rank``, process-group setup) have no
single-controller equivalent and are absent: one call returns the result
directly instead of returning None on non-final ranks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import PipelineConfig, StepPipeline
from vdpp_tpu.parallel.step_assignment import StepRange, assign_steps  # noqa: F401


@dataclass(frozen=True)
class LatentSpec:
    """Shape/dtype description of the pipeline latent.

    The reference uses this to preallocate ``dist.recv`` buffers
    (reference: src/pipeline/pipeline.py:25-34); here there are no recv
    buffers, so it is a plain shape contract + ``empty()`` convenience.
    """

    shape: tuple[int, ...]
    dtype: Any = jnp.float32

    def empty(self) -> jax.Array:
        return jnp.zeros(self.shape, self.dtype)


def resolve_backend(preferred: str | None = None, simulator: bool = False) -> str:
    """Reference backend resolution (src/distributed/backend.py:12-31),
    mapped to JAX platforms: explicit arg > VDPP_BACKEND env (the
    PIPELINE_BACKEND analogue) > default ('cpu' iff simulator else 'tpu')."""
    backend = preferred or os.environ.get("VDPP_BACKEND")
    if backend is None:
        backend = "cpu" if simulator else "tpu"
    if backend not in ("cpu", "tpu"):
        raise ValueError(f"unsupported backend {backend!r} (cpu|tpu)")
    return backend


def run_single_latent(
    model: Callable[[Any, jax.Array, jax.Array], jax.Array],
    *,
    params: Any,
    total_steps: int,
    world_size: int,
    input_latent: jax.Array,
    timesteps: Sequence[int] | None = None,
) -> jax.Array:
    """One latent through the full schedule on a ``world_size``-stage
    pipeline (reference: src/pipeline/pipeline.py:160-185).

    ``model`` is a ``step_fn(params, latent, step_idx)``; pass
    ``timesteps`` to feed custom (e.g. descending) step values.
    """
    return run_pipeline_latents(
        model,
        params=params,
        total_steps=total_steps,
        world_size=world_size,
        num_samples=1,
        input_supplier=lambda i: input_latent,
        timesteps=timesteps,
    )[0]


def run_pipeline_latents(
    model: Callable[[Any, jax.Array, jax.Array], jax.Array],
    *,
    params: Any,
    total_steps: int,
    world_size: int,
    num_samples: int,
    input_supplier: Callable[[int], jax.Array],
    timesteps: Sequence[int] | None = None,
) -> jax.Array:
    """Multi-sample pipelined inference
    (reference: src/pipeline/pipeline.py:188-208). Returns the stacked
    finished latents ``(num_samples, *latent)``."""
    if num_samples <= 0:
        raise ValueError("num_samples must be positive for pipeline execution")
    step_fn = model
    if timesteps is not None:
        ts = jnp.asarray(timesteps)

        def step_fn(p, x, s):  # noqa: F811 - wrap with timestep mapping
            return model(p, x, ts[s])

    mesh = make_pipeline_mesh(world_size)
    pipe = StepPipeline(mesh, step_fn, PipelineConfig(total_steps, world_size))
    inputs = jnp.stack([input_supplier(i) for i in range(num_samples)])
    return pipe.run(params, inputs)
