"""Data-parallel and FSDP execution modes.

* ``DataParallelRunner`` — the reference's zero-communication baseline
  (reference: src/modes/benchmark_data_parallel.py:154-200): each device
  holds the full model and runs ALL steps for a disjoint shard of the
  sample stream. TPU-natively this is a batch-axis sharding annotation:
  one jit, samples sharded over the ``data`` mesh axis, no collectives.

* ``FSDPRunner`` — the reference's memory-wall mode
  (reference: src/modes/benchmark.py:199-211): every device executes every
  step with parameters sharded across the mesh (see
  vdpp_tpu.parallel.sharding); GSPMD inserts the parameter all-gathers.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vdpp_tpu.parallel.mesh import DATA_AXIS
from vdpp_tpu.parallel.pipeline import StepFn
from vdpp_tpu.parallel.sharding import fsdp_specs, replicate, shard_params


class DataParallelRunner:
    """All steps on every device, disjoint samples per device."""

    def __init__(self, mesh: Mesh, step_fn: StepFn, total_steps: int):
        if DATA_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{DATA_AXIS}' axis")
        self.mesh = mesh
        self.step_fn = step_fn
        self.total_steps = total_steps
        self._jitted: Callable | None = None

    def _build(self) -> Callable:
        step_fn = self.step_fn
        total = self.total_steps
        mesh = self.mesh
        data_sharding = NamedSharding(mesh, P(DATA_AXIS))

        def run(params, inputs):
            def per_sample(x):
                def body(xc, k):
                    return step_fn(params, xc, k), None

                out, _ = jax.lax.scan(body, x, jnp.arange(total, dtype=jnp.int32))
                return out

            return jax.vmap(per_sample)(inputs)

        return jax.jit(run, in_shardings=(None, data_sharding),
                       out_shardings=data_sharding)

    def run(self, params: Any, inputs: jax.Array) -> jax.Array:
        """``inputs (N, *latent)`` with N divisible by the data-axis size."""
        n = inputs.shape[0]
        d = self.mesh.shape[DATA_AXIS]
        if n % d != 0:
            raise ValueError(f"num_samples {n} must be divisible by {d} devices")
        if self._jitted is None:
            self._jitted = self._build()
        params = replicate(params, self.mesh)
        inputs = jax.device_put(inputs, NamedSharding(self.mesh, P(DATA_AXIS)))
        return self._jitted(params, inputs)

    def memory_analysis(self, params: Any, inputs: jax.Array) -> dict | None:
        """Compile-time per-device memory accounting of the DP program."""
        from vdpp_tpu.utils.memory import jitted_memory_analysis

        if self._jitted is None:
            self._jitted = self._build()
        params = replicate(params, self.mesh)
        inputs = jax.device_put(inputs, NamedSharding(self.mesh, P(DATA_AXIS)))
        return jitted_memory_analysis(self._jitted, params, inputs)


class FSDPRunner:
    """Every device runs every step; parameters sharded across the mesh."""

    def __init__(
        self,
        mesh: Mesh,
        step_fn: StepFn,
        total_steps: int,
        axis_name: str | None = None,
        min_shard_params: int = 2**20,
    ):
        self.mesh = mesh
        self.axis_name = axis_name or mesh.axis_names[0]
        self.step_fn = step_fn
        self.total_steps = total_steps
        self.min_shard_params = min_shard_params
        self._jitted: Callable | None = None
        self._specs = None

    def specs_for(self, params: Any) -> Any:
        if self._specs is None:
            self._specs = fsdp_specs(
                params, self.mesh, self.axis_name, self.min_shard_params
            )
        return self._specs

    def _build(self, params: Any) -> Callable:
        step_fn = self.step_fn
        total = self.total_steps
        mesh = self.mesh
        param_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s),
            self.specs_for(params),
            is_leaf=lambda x: isinstance(x, P),
        )
        rep = NamedSharding(mesh, P())

        def run(p, inputs):
            def per_sample(x):
                def body(xc, k):
                    return step_fn(p, xc, k), None

                out, _ = jax.lax.scan(body, x, jnp.arange(total, dtype=jnp.int32))
                return out

            return jax.lax.map(per_sample, inputs)

        return jax.jit(run, in_shardings=(param_shardings, rep), out_shardings=rep)

    def run(self, params: Any, inputs: jax.Array) -> jax.Array:
        """``inputs (N, *latent)``, replicated; params sharded."""
        if self._jitted is None:
            self._jitted = self._build(params)
        params = shard_params(params, self.mesh, self.specs_for(params))
        inputs = jax.device_put(inputs, NamedSharding(self.mesh, P()))
        return self._jitted(params, inputs)

    def shard_params(self, params: Any) -> Any:
        """Place ``params`` with this runner's FSDP shardings (exposed so
        callers can measure per-device parameter bytes —
        vdpp_tpu.utils.memory.params_bytes_per_device)."""
        return shard_params(params, self.mesh, self.specs_for(params))

    def memory_analysis(self, params: Any, inputs: jax.Array) -> dict | None:
        """Compile-time per-device memory accounting of the FSDP program."""
        from vdpp_tpu.utils.memory import jitted_memory_analysis

        if self._jitted is None:
            self._jitted = self._build(params)
        params = self.shard_params(params)
        inputs = jax.device_put(inputs, NamedSharding(self.mesh, P()))
        return jitted_memory_analysis(self._jitted, params, inputs)
