"""Compiled-program (HLO) invariants of the pipeline hand-off.

The north-star perf claim (BASELINE.md) is that the per-step latent
transfer rides ICI inside the compiled program. The checkable form of
that claim, on any backend, is structural:

* the WHOLE fill/steady/drain schedule compiles to ONE program with one
  ``while`` loop — no per-tick host round-trip (the reference instead
  drives one NCCL send/recv + Python sync per step,
  reference: src/parallel/pipeline.py send/recv loop);
* the per-tick hand-off is exactly ONE ``collective-permute`` with
  nearest-neighbor ring pairs {s -> s+1} — the pattern the TPU runtime
  maps onto single-hop ICI links; no other collective (all-reduce /
  all-gather / all-to-all) appears anywhere, i.e. params are never
  re-communicated per tick.

These assertions pin the structure against future regressions that would
serialize the hand-off through the host or add per-tick collectives.
(Verified identical on the real TPU backend via a topology-AOT compile —
docs/performance.md "ICI hand-off at the HLO level"; the TPU backend
keeps the op synchronous-in-schedule because its output is consumed at
the very next tick, and executes it on the ICI DMA queues.)
"""

import re

import jax
import jax.numpy as jnp
import pytest

from vdpp_tpu.models import DummyUNet
from vdpp_tpu.parallel.mesh import make_pipeline_mesh
from vdpp_tpu.parallel.pipeline import PipelineConfig, StepPipeline


@pytest.fixture(scope="module")
def compiled_text():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model = DummyUNet()
    params = jax.eval_shape(model.init, jax.random.key(0))
    pipe = StepPipeline(
        make_pipeline_mesh(8),
        lambda p, x, s: model.apply(p, x, s),
        PipelineConfig(total_steps=24, num_stages=8),
    )
    runner = pipe._build(5)
    x = jax.ShapeDtypeStruct((5, 1, 8, 4, 8, 8), jnp.float32)
    return runner.lower(params, x).compile().as_text()


def test_whole_schedule_is_one_while_program(compiled_text):
    """The tick schedule is device-side loops in ONE program: at least
    one while op (zero would mean host-driven per-tick dispatch — the
    reference's shape), and no more than two (the fused tick scan plus
    at most one nested model loop; a blow-up would mean the schedule
    fragmented). The hand-off-inside-the-loop property is pinned by
    test_tick_handoff_is_single_nearest_neighbor_ring."""
    while_ops = re.findall(r"=.* while\(", compiled_text)
    assert 1 <= len(while_ops) <= 2, (
        f"expected 1-2 while ops, found {len(while_ops)}"
    )


def test_tick_handoff_is_single_nearest_neighbor_ring(compiled_text):
    ring_pairs = "{{0,1},{1,2},{2,3},{3,4},{4,5},{5,6},{6,7},{7,0}}"
    op_lines = [
        ln for ln in compiled_text.splitlines()
        if re.search(r"=.* collective-permute\(", ln)
    ]
    ring_lines = [ln for ln in op_lines if ring_pairs in ln]
    assert len(ring_lines) == 1, (
        f"expected exactly one ring hand-off, found {len(ring_lines)} "
        f"of {len(op_lines)} collective-permutes"
    )
    # it is the per-tick ppermute inside the scanned (while) tick body
    assert "ppermute" in ring_lines[0] and "while" in ring_lines[0], (
        ring_lines[0][:200]
    )
    # any other collective-permute must be a single-pair result fetch
    # (out[S-1] relayout), never a second ring
    for ln in op_lines:
        if ln in ring_lines:
            continue
        pairs = re.search(r"source_target_pairs=\{(.*?)\}\}", ln)
        assert pairs and pairs.group(1).count("{") <= 1, ln[:200]


def test_no_per_tick_collectives_beyond_the_ring(compiled_text):
    """Inside the scanned tick body the ring ppermute must be the ONLY
    collective — params are never re-communicated per tick. Outside the
    loop, a single result-fetch collective is allowed (the ``out[S-1]``
    slice from the stage-sharded buffer: the CPU backend lowers it as a
    masked all-reduce, the TPU backend as a one-pair collective-permute).
    """
    for bad in ("all-gather(", "all-to-all("):
        assert bad not in compiled_text, f"unexpected {bad} in the program"
    reduce_lines = [
        ln for ln in compiled_text.splitlines()
        if re.search(r"=.* all-reduce\(", ln)
    ]
    assert len(reduce_lines) <= 1
    for ln in reduce_lines:
        assert "while" not in ln, f"per-tick all-reduce: {ln[:200]}"
