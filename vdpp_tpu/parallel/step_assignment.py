"""Step assignment for pipeline-parallel diffusion inference.

Pure Python (no jax import) so the scheduling logic unit-tests with zero
device context — the same design rule the reference follows for its
step-assignment layer (reference: src/pipeline/step_assignment.py:1-5).

Behavioral parity with reference src/pipeline/step_assignment.py:35-69:
``assign_steps`` maps (total_steps, world_size, rank) to a contiguous
closed-open ``[start, end)`` slice and hard-fails on a non-divisible split.
Beyond parity, ``assign_steps_uneven`` supports remainder distribution
(early stages receive one extra step) so an 8-chip v5e mesh can run, e.g.,
a 30-step schedule — a configuration the reference rejects.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class StepRange:
    """Closed-open interval ``[start, end)`` of diffusion steps for one stage."""

    start: int
    end: int

    def __post_init__(self) -> None:
        if self.start < 0 or self.end < 0:
            raise ValueError("Step indices must be non-negative.")
        if self.end < self.start:
            raise ValueError("Step range end must be >= start.")

    @property
    def count(self) -> int:
        """Number of steps in the range."""
        return self.end - self.start

    def __iter__(self):
        yield from range(self.start, self.end)


def _validate(total_steps: int, world_size: int, rank: int) -> None:
    if total_steps <= 0:
        raise ValueError("total_steps must be positive.")
    if world_size <= 0:
        raise ValueError("world_size must be positive.")
    if not 0 <= rank < world_size:
        raise ValueError("rank must satisfy 0 <= rank < world_size.")


def assign_steps(total_steps: int, world_size: int, rank: int) -> StepRange:
    """Uniform contiguous step slice for ``rank``.

    Raises:
        ValueError: on inconsistent arguments or when ``total_steps`` is not
            divisible by ``world_size`` (uniform splits are a correctness
            contract: every stage must do identical work per tick for the
            SPMD pipeline schedule to be bubble-free in steady state).
    """
    _validate(total_steps, world_size, rank)
    if total_steps % world_size != 0:
        raise ValueError(
            "total_steps must be divisible by world_size for uniform step assignment."
        )
    steps_per_rank = total_steps // world_size
    start = rank * steps_per_rank
    return StepRange(start=start, end=start + steps_per_rank)


def assign_steps_uneven(total_steps: int, world_size: int, rank: int) -> StepRange:
    """Near-even contiguous split: the first ``total_steps % world_size``
    stages take one extra step.

    Extension beyond the reference (which mandates even splits,
    src/pipeline/step_assignment.py:60-63). Analysis/diagnostic helper only
    (deliberately NOT in the top-level API): the production path for
    non-divisible schedules is identity-step padding
    (``EulerKarrasSchedule.create(pad_to_multiple_of=...)``,
    vdpp_tpu/diffusion/scheduler.py), which keeps per-tick work uniform —
    a requirement of the jitted SPMD pipeline — while producing
    bit-identical output to the unpadded schedule.
    """
    _validate(total_steps, world_size, rank)
    base, rem = divmod(total_steps, world_size)
    start = rank * base + min(rank, rem)
    end = start + base + (1 if rank < rem else 0)
    return StepRange(start=start, end=end)
