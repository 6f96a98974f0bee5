"""Step-assignment unit tests.

Covers the same semantic surface as the reference's test suite
(reference: tests/test_step_assignment.py:1-98): even splits for
1/2/4/7-stage configs, full coverage with no gaps/overlaps, error cases,
and StepRange semantics — plus the uneven-split extension.
"""

import pytest

from vdpp_tpu.parallel.step_assignment import (
    StepRange,
    assign_steps,
    assign_steps_uneven,
)

pytestmark = pytest.mark.fast  # pre-commit smoke tier (.pre-commit-config.yaml)


@pytest.mark.parametrize("world_size", [1, 2, 4, 7])
def test_even_split_counts(world_size):
    total = 28
    per = total // world_size
    for rank in range(world_size):
        r = assign_steps(total, world_size, rank)
        assert r.count == per
        assert r.start == rank * per
        assert r.end == (rank + 1) * per


@pytest.mark.parametrize("world_size", [1, 2, 4, 7, 8])
def test_full_coverage_no_gaps_no_overlap(world_size):
    total = 56
    covered = []
    for rank in range(world_size):
        covered.extend(list(assign_steps(total, world_size, rank)))
    assert covered == list(range(total))


def test_contiguity_across_ranks():
    total, world = 28, 4
    prev_end = 0
    for rank in range(world):
        r = assign_steps(total, world, rank)
        assert r.start == prev_end
        prev_end = r.end
    assert prev_end == total


@pytest.mark.parametrize("bad_total", [0, -1, -28])
def test_invalid_total_steps(bad_total):
    with pytest.raises(ValueError):
        assign_steps(bad_total, 4, 0)


@pytest.mark.parametrize("bad_world", [0, -2])
def test_invalid_world_size(bad_world):
    with pytest.raises(ValueError):
        assign_steps(28, bad_world, 0)


@pytest.mark.parametrize("bad_rank", [-1, 4, 100])
def test_invalid_rank(bad_rank):
    with pytest.raises(ValueError):
        assign_steps(28, 4, bad_rank)


def test_non_divisible_rejected():
    with pytest.raises(ValueError, match="divisible"):
        assign_steps(30, 7, 0)


def test_step_range_count_and_iter():
    r = StepRange(start=3, end=7)
    assert r.count == 4
    assert list(r) == [3, 4, 5, 6]


def test_step_range_empty():
    r = StepRange(start=5, end=5)
    assert r.count == 0
    assert list(r) == []


def test_step_range_validation():
    with pytest.raises(ValueError):
        StepRange(start=-1, end=3)
    with pytest.raises(ValueError):
        StepRange(start=4, end=2)


@pytest.mark.parametrize(
    "total,world,expected_counts",
    [
        (30, 8, [4, 4, 4, 4, 4, 4, 3, 3]),
        (25, 7, [4, 4, 4, 4, 3, 3, 3]),
        (28, 7, [4] * 7),
    ],
)
def test_uneven_split(total, world, expected_counts):
    ranges = [assign_steps_uneven(total, world, r) for r in range(world)]
    assert [r.count for r in ranges] == expected_counts
    covered = [s for r in ranges for s in r]
    assert covered == list(range(total))
