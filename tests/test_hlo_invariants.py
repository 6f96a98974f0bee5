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


@pytest.fixture(scope="module")
def frame_parallel_text():
    """Compiled one-step frame-parallel SVD program on a frame=4 mesh."""
    from jax.sharding import PartitionSpec as P

    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_dummy_conditioning
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 CPU devices")
    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=4, cfg_mode="sequential")
    params = jax.eval_shape(model.init, jax.random.key(0))
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 4, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    step = model.pipeline_step_fn(frame_axis="frame", frame_shards=4)
    mesh = make_axes_mesh(frame=4)
    fn = jax.jit(jax.shard_map(
        lambda b, x: step(b, x, jnp.int32(0)),
        mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False,
    ))
    x = jax.ShapeDtypeStruct((1, 4, 16, 16, 4), jnp.float32)
    return fn.lower((params, cond), x).compile().as_text()


def test_frame_halos_are_one_hop_chain_permutes(frame_parallel_text):
    """Every frame-halo exchange must lower to a collective-permute whose
    pairs are one-hop CHAIN neighbors (|src-dst| == 1, no wraparound): the
    frame axis has edges, not a ring — the zero-fill at the chain ends IS
    the temporal SAME padding. A wraparound pair would mean frames leak
    across the video boundary."""
    op_lines = [
        ln for ln in frame_parallel_text.splitlines()
        if re.search(r"=.* collective-permute\(", ln)
    ]
    assert op_lines, "expected halo collective-permutes in the program"
    for ln in op_lines:
        pairs = re.search(r"source_target_pairs=\{(.*?)\}\}", ln)
        assert pairs, ln[:200]
        for pair in re.findall(r"\{(\d+),(\d+)\}", pairs.group(0)):
            src, dst = int(pair[0]), int(pair[1])
            assert abs(src - dst) == 1, f"non-one-hop pair {pair}: {ln[:200]}"


def test_frame_parallel_gathers_are_bounded(frame_parallel_text):
    """All-gathers appear ONLY for temporal-attention K/V and the final
    output gather — the spatial ~75% of the per-step FLOPs must add none.
    The tiny config has 4 temporal-attention sites x (K, V) + 1 output
    gather per UNet call x 2 CFG branches = at most 18; XLA's
    all-gather combiner may merge some, hence the range. No all-to-all
    anywhere."""
    n = len([
        ln for ln in frame_parallel_text.splitlines()
        if re.search(r"=.* all-gather\(", ln)
    ])
    assert 1 <= n <= 18, f"unexpected all-gather count {n}"
    assert "all-to-all(" not in frame_parallel_text


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


def test_deepcache_pipeline_keeps_ring_and_real_branches():
    """The deepcache x dpmpp2m payload (extra channel lanes) must not
    change the pipeline's comm structure — still exactly one per-tick
    ring collective-permute — and the lax.cond full/shallow switch must
    survive to a compiled ``conditional`` (runtime branch selection, not
    a flattened select that would execute BOTH UNet variants every
    step)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a 2-device mesh")
    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import (
        StableVideoUNet,
        make_dummy_conditioning,
    )

    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=4, cfg_mode="sequential",
                            solver="dpmpp2m", deepcache_interval=2)
    params = jax.eval_shape(model.init, jax.random.key(0))
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 3, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    pipe = StepPipeline(
        make_pipeline_mesh(2), model.pipeline_step_fn(),
        PipelineConfig(total_steps=4, num_stages=2),
    )
    runner = pipe._build(2)
    c = 8 + model.payload_extra_channels
    x = jax.ShapeDtypeStruct((2, 1, 3, 16, 16, c), jnp.float32)
    text = runner.lower((params, cond), x).compile().as_text()

    op_lines = [
        ln for ln in text.splitlines()
        if re.search(r"=.* collective-permute\(", ln)
    ]
    ring = [ln for ln in op_lines
            if re.search(r"source_target_pairs=\{\{0,1\},\{1,0\}\}", ln)]
    assert len(ring) >= 1, "ring hand-off missing from the deepcache program"
    assert "conditional(" in text, (
        "lax.cond was flattened away — cache steps would pay for the "
        "full UNet"
    )
    for bad in ("all-gather(", "all-to-all("):
        assert bad not in text


# --------------------------------------------------------------------- #
# Topology-planner comm census vs lowered StableHLO (round 4): the
# planner's per-axis discounts must rest on pinned collective counts,
# not prose (vdpp_tpu/parallel/topology.py svd_step_comm_census).
# --------------------------------------------------------------------- #
def _lowered_step_text(seq=None, frame=None, cfg_axis=None):
    from jax.sharding import PartitionSpec as P

    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import (
        StableVideoUNet,
        make_dummy_conditioning,
    )
    from vdpp_tpu.parallel.mesh import make_axes_mesh

    cfg = SVDUNetConfig.tiny()
    model = StableVideoUNet(cfg, num_steps=4, cfg_mode="sequential")
    params = jax.eval_shape(model.init, jax.random.key(0))
    cond = make_dummy_conditioning(
        jax.random.key(1), 1, 4, 16, 16,
        cross_dim=cfg.cross_attention_dim, guidance_scale=3.0,
    )
    axes = {}
    kw = {}
    if seq:
        axes["seq"] = seq
        kw.update(seq_axis="seq", seq_shards=seq)
    if frame:
        axes["frame"] = frame
        kw.update(frame_axis="frame", frame_shards=frame)
    if cfg_axis:
        axes["cfg"] = 2
        kw.update(cfg_axis="cfg")
    step = model.pipeline_step_fn(**kw)
    mesh = make_axes_mesh(**axes)
    fn = jax.jit(jax.shard_map(
        lambda b, x: step(b, x, jnp.int32(0)),
        mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False,
    ))
    x = jax.ShapeDtypeStruct((1, 4, 16, 16, 4), jnp.float32)
    lowered = fn.lower((params, cond), x).as_text()
    return lowered, params


def _stablehlo_counts(text):
    from vdpp_tpu.parallel.topology import CommCensus

    return CommCensus(
        collective_permute=text.count("stablehlo.collective_permute"),
        all_gather=text.count("stablehlo.all_gather"),
        all_reduce=text.count("stablehlo.all_reduce"),
    )


@pytest.mark.parametrize(
    "axes_kw, census_kw",
    [
        ({"seq": 2}, {"seq": True}),
        ({"frame": 2}, {"frame": True}),
        ({"cfg_axis": True}, {"cfg_parallel": True}),
    ],
    ids=["seq", "frame", "cfg"],
)
def test_step_comm_census_matches_lowered_hlo(axes_kw, census_kw):
    """The structural census (2 ppermutes per halo conv, 2 K/V gathers
    per attention, 2 stat all-reduces per psum'd GroupNorm, 1 output
    gather per forward, 1 CFG swap ppermute) must equal the lowered
    StableHLO's collective counts EXACTLY — lowering happens before
    XLA's combiners, so every site is still visible. This pins the
    planner's per-axis comm terms to compiled-program facts."""
    from vdpp_tpu.parallel.topology import (
        count_unet_comm_sites,
        svd_step_comm_census,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 CPU devices")
    text, params = _lowered_step_text(**axes_kw)
    got = _stablehlo_counts(text)
    sites = count_unet_comm_sites(params)
    # tiny config: 8 resblocks, 4 transformers, 4 standalone halo convs
    assert sites == {"st_resblock": 8, "st_transformer": 4, "halo_conv": 4}
    want = svd_step_comm_census(sites, **census_kw)
    assert got == want, f"HLO {got} != census {want}"
    assert "stablehlo.all_to_all" not in text
