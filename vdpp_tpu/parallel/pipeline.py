"""TPU-native step-pipeline engine.

The reference implements the diffusion-step pipeline as one OS process per
GPU with blocking ``dist.send``/``dist.recv`` latent hand-offs and a Python
loop over samples to achieve pipeline fill
(reference: src/pipeline/pipeline.py:54-157, run_many :113-132). That shape
is CUDA/NCCL-idiomatic. The TPU-native design here is single-controller
SPMD:

* one ``jax.sharding.Mesh`` axis ``"stage"`` of size S;
* the whole multi-sample schedule is a single jitted ``lax.scan`` over
  "ticks" inside ``jax.shard_map``;
* at tick ``t`` stage ``s`` runs its contiguous K = T/S steps on sample
  ``t - s`` (fill/drain ticks compute on don't-care data, which is simply
  never written to the output buffer);
* the latent hand-off is ``jax.lax.ppermute`` along the stage axis — an ICI
  neighbor transfer that XLA overlaps with compute, replacing NCCL P2P.

Schedule (N samples, S stages, T = S*K steps):

    tick:      0      1      2     ...
    stage 0:  x0:0..K x1:0..K x2:0..K
    stage 1:     -    x0:K..2K x1:K..2K
    ...
    stage S-1 emits sample t-(S-1) at tick t;  total ticks = N + S - 1.

Bubble fraction is exactly ``(S-1)/(N+S-1)``: the reference's fill/steady
accounting (reference: src/modes/benchmark.py:252-313) emerges analytically
instead of from wall-clock arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vdpp_tpu.parallel.mesh import DATA_AXIS, STAGE_AXIS
from vdpp_tpu.parallel.step_assignment import assign_steps

# step_fn(params, latent, step_idx) -> latent ; step_idx may be traced.
StepFn = Callable[[Any, jax.Array, jax.Array], jax.Array]


@dataclass(frozen=True)
class PipelineConfig:
    """Static configuration for a step pipeline.

    Mirrors the validation contract of the reference's PipelineConfig
    (reference: src/pipeline/pipeline.py:37-48) — uniform splits only for
    the SPMD schedule.
    """

    total_steps: int
    num_stages: int

    def __post_init__(self) -> None:
        # Reuse assign_steps validation: raises on bad/non-divisible splits.
        assign_steps(self.total_steps, self.num_stages, 0)

    @property
    def steps_per_stage(self) -> int:
        return self.total_steps // self.num_stages

    def num_ticks(self, num_samples: int) -> int:
        return num_samples + self.num_stages - 1

    def bubble_fraction(self, num_samples: int) -> float:
        """Exact fraction of stage-ticks wasted on fill/drain."""
        s = self.num_stages
        return (s - 1) / (num_samples + s - 1)


class StepPipeline:
    """Single-controller step-axis pipeline over a mesh ``"stage"`` axis.

    Every stage holds the full model parameters (replicated over the stage
    axis — the reference's "full UNet copy per rank" design,
    reference: docs/context.md constraint), and runs a contiguous step
    slice. ``run(params, inputs)`` processes ``inputs[(N, *latent)]`` and
    returns ``(N, *latent)`` finished latents, all inside one jit.
    """

    def __init__(
        self,
        mesh: Mesh,
        step_fn: StepFn,
        config: PipelineConfig,
        param_spec=None,
    ):
        """``param_spec``: optional PartitionSpec pytree for the params
        bundle (default fully replicated — the reference's full-copy-per-
        rank design). A sharded spec enables e.g. expert parallelism
        (ops/moe.py ``expert_param_spec``) where expert weights live split
        across a mesh axis and the step_fn combines with collectives."""
        if STAGE_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{STAGE_AXIS}' axis")
        if mesh.shape[STAGE_AXIS] != config.num_stages:
            raise ValueError(
                f"mesh stage axis ({mesh.shape[STAGE_AXIS]}) != "
                f"config.num_stages ({config.num_stages})"
            )
        # Collective-uniformity contract (svd_wrapper.pipeline_step_fn):
        # a step_fn whose lax.cond branches contain collectives (deepcache
        # x seq/frame axes) is only deadlock-free under pipelining when
        # every device evaluates the SAME branch at every scan iteration
        # of every tick. Stage s runs step s*K + k at scan slot k, so the
        # predicate (real_step % interval == 0) is stage-invariant iff
        # K % interval == 0 and the schedule has no identity padding.
        # Violations HANG (devices park in different rendezvous) rather
        # than error — observed on the 8-device XLA:CPU mesh, round 5 —
        # so refuse them at construction time.
        # num_stages == 1 is exempt: every device then runs the SAME step
        # index at every scan slot (there is only one stage group), so the
        # branch predicate is globally uniform whatever the cadence or
        # padding — refusing it would reject valid single-stage
        # deepcache x seq/frame runs (e.g. restyle --seq-parallel N with
        # all devices in one stage).
        interval = getattr(step_fn, "collective_uniform_interval", 0)
        if interval and config.num_stages > 1:
            pad = getattr(step_fn, "collective_uniform_pad", 0)
            if pad or config.steps_per_stage % interval:
                raise ValueError(
                    f"step_fn declares branch-local collectives with "
                    f"cadence {interval} (deepcache x intra-sample axis): "
                    f"pipelining needs steps_per_stage "
                    f"({config.steps_per_stage}) % interval == 0 and an "
                    f"unpadded schedule (pad={pad}), or stages take "
                    f"different cond branches in the same tick and the "
                    f"branch collectives deadlock. Pick num_stages so "
                    f"total_steps/num_stages is a multiple of {interval}."
                )
        self.mesh = mesh
        self.step_fn = step_fn
        self.config = config
        self.param_spec = P() if param_spec is None else param_spec
        self._jitted: dict[tuple, Callable] = {}

    # ------------------------------------------------------------------ #
    def _tick_core(self, params, inputs, x, t, num_samples: int):
        """One pipeline tick for the local stage (inside shard_map).

        x: this stage's current latent (*L,); returns (x_shifted, emitted)
        where ``emitted`` is the stage's post-compute latent (the finished
        sample when this is the last stage and the tick is in range).
        """
        cfg = self.config
        S, K, N = cfg.num_stages, cfg.steps_per_stage, num_samples
        step_fn = self.step_fn
        s = jax.lax.axis_index(STAGE_AXIS)
        perm = [(i, (i + 1) % S) for i in range(S)]

        # Stage 0 ingests sample t (clamped gather; fill/drain masked later).
        take = jnp.clip(t, 0, N - 1)
        fresh = jax.lax.dynamic_index_in_dim(inputs, take, 0, keepdims=False)
        x = jnp.where(s == 0, fresh, x)

        def body(xc, k):
            return step_fn(params, xc, s * K + k), None

        x, _ = jax.lax.scan(body, x, jnp.arange(K, dtype=jnp.int32))
        emitted = x
        # Hand the latent to the next stage over ICI.
        x = jax.lax.ppermute(x, STAGE_AXIS, perm)
        return x, emitted

    @property
    def data_parallel_size(self) -> int:
        """Size of the optional ``data`` mesh axis (1 when absent).

        On a 2-D (stage, data) mesh each data column runs an independent
        pipeline over a disjoint shard of the sample stream — combined
        PP x DP, a capability beyond the reference's 1-D designs.
        """
        return self.mesh.shape.get(DATA_AXIS, 1)

    def _build(self, num_samples: int) -> Callable:
        """Fused mode: the whole fill/steady/drain schedule in ONE jit.

        ``num_samples`` is the PER-DATA-COLUMN sample count.
        """
        cfg = self.config
        S = cfg.num_stages
        N = num_samples
        num_ticks = cfg.num_ticks(N)
        mesh = self.mesh
        has_data = DATA_AXIS in mesh.axis_names

        def per_stage(params, inputs, buf, out_buf):
            # Local views: buf (1, *L), out_buf (1, N, *L), inputs (N, *L).
            s = jax.lax.axis_index(STAGE_AXIS)

            def tick(carry, t):
                x, out = carry  # x: (*L,), out: (N, *L)
                x, emitted = self._tick_core(params, inputs, x, t, N)

                # Final stage commits its finished sample t-(S-1).
                out_idx = t - (S - 1)
                do_write = (s == S - 1) & (out_idx >= 0) & (out_idx < N)
                w = jnp.clip(out_idx, 0, N - 1)
                cur = jax.lax.dynamic_index_in_dim(out, w, 0, keepdims=False)
                out = jax.lax.dynamic_update_index_in_dim(
                    out, jnp.where(do_write, emitted, cur), w, 0
                )
                return (x, out), None

            (x, out), _ = jax.lax.scan(
                tick,
                (buf[0], out_buf[0]),
                jnp.arange(num_ticks, dtype=jnp.int32),
            )
            return out[None]

        dp = self.data_parallel_size
        pspec_rep = P()  # fully replicated
        param_spec = self.param_spec
        if has_data:
            # Leading axes: (stage, data-column). Each (s, d) device holds
            # its own latent slot / output buffer / sample shard.
            buf_spec = P(STAGE_AXIS, DATA_AXIS)
            inputs_spec = P(DATA_AXIS)

            def per_stage_2d(params, inputs, buf, out_buf):
                # strip the (1, 1) leading mesh dims for the 1-D body
                out = per_stage(params, inputs, buf[0], out_buf[0])
                return out[None]

            sharded = jax.shard_map(
                per_stage_2d,
                mesh=mesh,
                in_specs=(param_spec, inputs_spec, buf_spec, buf_spec),
                out_specs=buf_spec,
                check_vma=False,
            )

            def run(params, inputs):
                latent_shape = inputs.shape[1:]
                dtype = inputs.dtype
                buf = jnp.zeros((S, dp, *latent_shape), dtype)
                out_buf = jnp.zeros((S, dp, N, *latent_shape), dtype)
                out = sharded(params, inputs, buf, out_buf)
                # (dp, N, *L) -> (dp*N, *L), matching the input shard order.
                return out[S - 1].reshape(dp * N, *latent_shape)

            return jax.jit(run)

        buf_spec = P(STAGE_AXIS)
        sharded = jax.shard_map(
            per_stage,
            mesh=mesh,
            in_specs=(param_spec, pspec_rep, buf_spec, buf_spec),
            out_specs=buf_spec,
            check_vma=False,
        )

        def run(params, inputs):
            latent_shape = inputs.shape[1:]
            dtype = inputs.dtype
            buf = jnp.zeros((S, *latent_shape), dtype)
            out_buf = jnp.zeros((S, N, *latent_shape), dtype)
            out = sharded(params, inputs, buf, out_buf)
            return out[S - 1]

        return jax.jit(run)

    def _build_tick(self, num_samples: int) -> Callable:
        """Ticked mode: one jitted tick program, host-driven.

        Gives true per-sample completion timestamps (the reference's
        timing model, src/modes/benchmark.py:228-235) and is the natural
        shape for streaming/serving where samples arrive over time.
        """
        mesh = self.mesh
        buf_spec = P(STAGE_AXIS)

        def per_stage(params, inputs, buf, t):
            x, emitted = self._tick_core(params, inputs, buf[0], t, num_samples)
            return x[None], emitted[None]

        sharded = jax.shard_map(
            per_stage,
            mesh=mesh,
            in_specs=(self.param_spec, P(), buf_spec, P()),
            out_specs=(buf_spec, buf_spec),
            check_vma=False,
        )
        return jax.jit(sharded)

    # ------------------------------------------------------------------ #
    def run(self, params, inputs: jax.Array) -> jax.Array:
        """Pipeline ``inputs (N, *latent)`` through all ``total_steps``.

        On a 2-D (stage, data) mesh, N must be divisible by the data-axis
        size; each data column pipelines its own N/dp sample shard.
        Returns finished latents ``(N, *latent)``. Compiled once per
        (N, latent-shape, dtype).
        """
        n_total = int(inputs.shape[0])
        dp = self.data_parallel_size
        if n_total % dp != 0:
            raise ValueError(
                f"num_samples {n_total} must be divisible by data-axis size {dp}"
            )
        n_local = n_total // dp
        key = (n_local, inputs.shape[1:], str(inputs.dtype))
        if key not in self._jitted:
            self._jitted[key] = self._build(n_local)
        return self._jitted[key](params, inputs)

    def memory_analysis(self, params, inputs: jax.Array, ticked: bool = False) -> dict | None:
        """Compile-time per-device memory accounting (the allocator-free
        peak-memory source — vdpp_tpu.utils.memory.compiled_memory_analysis).

        ``ticked=True`` analyzes the per-tick program instead of the fused
        whole-schedule program (matching whichever executor actually ran,
        so no extra compile is paid)."""
        from vdpp_tpu.utils.memory import jitted_memory_analysis

        n_total = int(inputs.shape[0])
        if ticked:
            key = ("tick", n_total, inputs.shape[1:], str(inputs.dtype))
            if key not in self._jitted:
                self._jitted[key] = self._build_tick(n_total)
            buf = jnp.zeros((self.config.num_stages, *inputs.shape[1:]), inputs.dtype)
            return jitted_memory_analysis(
                self._jitted[key], params, inputs, buf, jnp.int32(0)
            )
        dp = self.data_parallel_size
        if n_total % dp != 0:
            # Same contract as run(): a floored n_local would hand the
            # full batch to a mismatched shard_map program.
            raise ValueError(
                f"num_samples {n_total} must be divisible by data-axis size {dp}"
            )
        n_local = n_total // dp
        key = (n_local, inputs.shape[1:], str(inputs.dtype))
        if key not in self._jitted:
            self._jitted[key] = self._build(n_local)
        return jitted_memory_analysis(self._jitted[key], params, inputs)

    def _build_stream_tick(self) -> Callable:
        """Streaming tick: stage 0 ingests an explicit ``fresh`` latent
        argument (a request arriving NOW) instead of gathering from a
        pre-staged batch. Used by ``PipelineStream`` for serving, where
        concurrent requests share one filled pipeline. The stage buffer is
        donated (one resident copy)."""
        mesh = self.mesh
        buf_spec = P(STAGE_AXIS)

        def per_stage(params, fresh, buf):
            # Same tick body as the fused/ticked executors (_tick_core):
            # a one-sample batch whose sample 0 is the fresh request —
            # the clamped gather at t=0 selects exactly ``fresh``.
            x, emitted = self._tick_core(
                params, fresh[None], buf[0], jnp.int32(0), 1
            )
            return x[None], emitted[None]

        sharded = jax.shard_map(
            per_stage,
            mesh=mesh,
            in_specs=(self.param_spec, P(), buf_spec),
            out_specs=(buf_spec, buf_spec),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(2,))

    def stream(self, params, latent_shape: tuple, dtype=jnp.float32) -> "PipelineStream":
        """Open a streaming executor: ``submit(latent) -> Future``.

        Requests arriving over time keep the stage pipeline filled — the
        serving shape the ticked executor was built for. All in-flight
        samples share ``params`` (the replicated (weights, conditioning)
        bundle)."""
        return PipelineStream(self, params, latent_shape, dtype)

    def run_ticked(self, params, inputs: jax.Array, on_sample=None,
                   start_tick: int = 0, initial_buf: jax.Array | None = None,
                   on_tick=None):
        """Host-stepped execution returning per-tick wall-clock times.

        Returns:
            (outputs, tick_seconds) where ``outputs`` stacks the samples
            finishing at ticks ``>= max(start_tick, S-1)`` (all N samples
            when ``start_tick == 0``). Sample ``i`` completes at tick
            ``i + S - 1``.

        ``on_sample(idx, latent)``: optional callback fired the moment
        sample ``idx`` finishes, with its (still device-resident, possibly
        not-yet-computed — JAX async dispatch) latent. Dispatching
        downstream work (e.g. VAE decode on a reserved device subset)
        from the callback overlaps it with the remaining pipeline ticks.

        ``start_tick``/``initial_buf``/``on_tick``: mid-schedule
        checkpoint/resume for preemptible pools. The host-visible state
        between ticks is exactly ``(t, buf)`` — the stage-sharded payload
        ring (the reference's per-rank in-transit latent, which its
        process-per-rank design cannot snapshot at all). ``on_tick(t,
        buf)`` fires after tick ``t`` completes; persist ``buf`` there
        (utils/resume.py) and resume by passing it back as
        ``initial_buf`` with ``start_tick = t + 1``. Resumed runs emit
        bit-identical remaining samples (tests/test_resume.py).
        """
        import time

        if self.data_parallel_size > 1:
            raise NotImplementedError(
                "run_ticked drives the 1-D (stage) schedule; on a "
                "(stage, data) mesh every data column would redundantly "
                "recompute all samples — use run()"
            )
        cfg = self.config
        S = cfg.num_stages
        N = int(inputs.shape[0])
        key = ("tick", N, inputs.shape[1:], str(inputs.dtype))
        if key not in self._jitted:
            self._jitted[key] = self._build_tick(N)
        tick_fn = self._jitted[key]

        if initial_buf is not None:
            if tuple(initial_buf.shape) != (S, *inputs.shape[1:]):
                raise ValueError(
                    f"initial_buf shape {initial_buf.shape} != "
                    f"{(S, *inputs.shape[1:])}"
                )
            buf = jnp.asarray(initial_buf, inputs.dtype)
        else:
            buf = jnp.zeros((S, *inputs.shape[1:]), inputs.dtype)
        # Warm the compile outside the timed loop (tick_fn is functional —
        # the discarded warm tick does not advance buf).
        jax.block_until_ready(tick_fn(params, inputs, buf, jnp.int32(0)))

        outputs = []
        tick_times = []
        for t in range(start_tick, cfg.num_ticks(N)):
            t0 = time.perf_counter()
            buf, emitted = tick_fn(params, inputs, buf, jnp.int32(t))
            jax.block_until_ready(buf)
            tick_times.append(time.perf_counter() - t0)
            if t >= S - 1:
                outputs.append(emitted[S - 1])
                if on_sample is not None:
                    on_sample(t - (S - 1), emitted[S - 1])
            if on_tick is not None:
                on_tick(t, buf)
        if not outputs:  # resume at/after the final tick: nothing left
            return jnp.zeros((0, *inputs.shape[1:]), inputs.dtype), tick_times
        return jnp.stack(outputs), tick_times


class PipelineStream:
    """Host-driven streaming executor over one filled stage pipeline.

    A background driver thread ticks the pipeline whenever work is in
    flight: at each tick stage 0 ingests the oldest queued request (or an
    idle placeholder), every stage advances its resident sample by its
    step slice, and the final stage's output completes the request that
    was ingested S-1 ticks earlier. Overlapping requests therefore share
    the pipeline — request 2 submitted during request 1's transit finishes
    one tick after it, not a full pipeline-depth later.

    This is the serving analogue of the reference's ``run_many``
    multi-sample fill (reference: src/pipeline/pipeline.py:113-132), with
    the sample stream arriving over time instead of known up front.
    """

    def __init__(self, pipe: StepPipeline, params, latent_shape: tuple, dtype):
        import queue
        import threading

        self.pipe = pipe
        self.params = params
        self.latent_shape = tuple(latent_shape)
        self._S = pipe.config.num_stages
        self._tick_fn = pipe._build_stream_tick()
        self._buf = jnp.zeros((self._S, *self.latent_shape), dtype)
        self._idle = jnp.zeros(self.latent_shape, dtype)
        self._dtype = jnp.dtype(dtype)
        self._queue: "queue.SimpleQueue" = queue.SimpleQueue()
        self._in_flight: list = []  # futures by ingestion order, newest last
        self._cv = threading.Condition()
        self._pending = 0
        self._stopped = False
        self._failure: Exception | None = None
        self.ticks_run = 0
        self._thread = threading.Thread(target=self._drive, daemon=True)
        self._thread.start()

    @property
    def unusable(self) -> bool:
        """True once the stream can never accept another submit (closed,
        or the driver thread hit a failure and poisoned it). Callers that
        cache streams (modes/serve.py) must evict on this — a dead cached
        stream would otherwise 500 every later same-key request."""
        return self._stopped or self._failure is not None

    def submit(self, latent: jax.Array):
        """Enqueue one sample ``(*latent_shape)``; returns a Future whose
        result is the finished (device-resident) latent."""
        from concurrent.futures import Future

        if self._stopped or self._failure is not None:
            raise RuntimeError(
                "stream is closed"
                if self._failure is None
                else f"stream failed: {self._failure!r}"
            )
        if tuple(latent.shape) != self.latent_shape:
            raise ValueError(
                f"latent shape {latent.shape} != stream shape {self.latent_shape}"
            )
        if jnp.dtype(latent.dtype) != self._dtype:
            # A mismatched dtype would silently promote the donated stage
            # buffer for EVERY later request (and skip donation).
            raise ValueError(
                f"latent dtype {latent.dtype} != stream dtype {self._dtype}"
            )
        fut: Future = Future()
        # Check-and-enqueue atomically under the condition lock: a submit
        # racing the driver's terminal-failure drain could otherwise slip
        # a future into the queue after the drain and never complete.
        with self._cv:
            if self._stopped or self._failure is not None:
                raise RuntimeError(
                    "stream is closed"
                    if self._failure is None
                    else f"stream failed: {self._failure!r}"
                )
            self._queue.put((latent, fut))
            self._pending += 1
            self._cv.notify()
        return fut

    def close(self) -> None:
        with self._cv:
            self._stopped = True
            self._cv.notify()
        self._thread.join(timeout=60)

    # ------------------------------------------------------------------ #
    def _drive(self) -> None:
        import queue
        from concurrent.futures import InvalidStateError

        def work_remains():
            return self._pending or any(f is not None for f in self._in_flight)

        while True:
            with self._cv:
                self._cv.wait_for(lambda: self._stopped or work_remains())
                if self._stopped and not work_remains():
                    return
            try:
                fresh, fut = self._queue.get_nowait()
                with self._cv:
                    self._pending -= 1
            except queue.Empty:
                fresh, fut = self._idle, None  # keep draining in-flight work
            done = None
            try:
                self._buf, emitted = self._tick_fn(self.params, fresh, self._buf)
                self.ticks_run += 1
                self._in_flight.append(fut)
                if len(self._in_flight) >= self._S:
                    done = self._in_flight.pop(0)
                    if done is not None:
                        # Resolve with the not-yet-computed device array —
                        # blocking here would insert one full host/device
                        # round trip of idle time per tick (the client's
                        # own use of the result synchronizes; async
                        # device errors surface there). A client may have
                        # cancelled the future meanwhile — that must not
                        # read as a tick failure and poison the stream.
                        try:
                            done.set_result(emitted[self._S - 1])
                        except InvalidStateError:
                            pass
                # Once no real request is in transit, stop burning idle
                # ticks (positional bookkeeping restarts cleanly: a future
                # ingested later still completes exactly S ticks on).
                if all(f is None for f in self._in_flight):
                    self._in_flight.clear()
            except Exception as e:
                # A failed tick may have consumed the donated stage buffer
                # — the stream cannot continue. Fail every waiter
                # (including the just-popped ``done`` and anything still
                # queued) and refuse further submits.
                with self._cv:
                    self._failure = e
                    self._stopped = True
                    self._pending = 0
                waiters = [fut, done] + self._in_flight
                self._in_flight.clear()
                while True:
                    try:
                        _, qfut = self._queue.get_nowait()
                        waiters.append(qfut)
                    except queue.Empty:
                        break
                for f in waiters:
                    if f is not None and not f.done():
                        f.set_exception(e)
                return


def run_reference_single_device(
    step_fn: StepFn, params, inputs: jax.Array, total_steps: int
) -> jax.Array:
    """Oracle: run every step sequentially on one device (no pipeline).

    Ground truth for the stage-count invariance tests — the analogue of the
    reference's world_size=1 simulator run whose final-latent norm all
    multi-rank runs must reproduce (reference: src/modes/simulator.py:161-162).
    """

    @jax.jit
    def one(params, x):
        def body(xc, k):
            return step_fn(params, xc, k), None

        x, _ = jax.lax.scan(body, x, jnp.arange(total_steps, dtype=jnp.int32))
        return x

    return jax.vmap(lambda x: one(params, x))(inputs)
