"""Device-mesh construction helpers.

The reference resolves a torch.distributed backend (NCCL vs Gloo) per
process (reference: src/distributed/backend.py:12-31, setup.py:16-47).
TPU-natively there is no process group: a single controller builds a
``jax.sharding.Mesh`` and every "rank" is a mesh coordinate. The CPU/Gloo
simulator mode maps to the same code running on a host-platform CPU mesh
(``--xla_force_host_platform_device_count=N``).

Axis conventions:
    "stage"  — pipeline stage axis (diffusion-step pipeline)
    "data"   — batch / sample axis (data-parallel baseline)
    "seq"    — token axis (sequence/context parallelism for single-sample
               latency; beyond the reference, which splits only the step
               axis — see parallel/sequence_parallel.py)
    "frame"  — video frame axis (frame parallelism for the SVD UNet:
               spatial work is frame-local; temporal convs halo-exchange,
               temporal attention all_gathers — models/svd_unet.py)
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

STAGE_AXIS = "stage"
DATA_AXIS = "data"
SEQ_AXIS = "seq"
CFG_AXIS = "cfg"
EXPERT_AXIS = "expert"
FRAME_AXIS = "frame"


def available_devices(backend: str | None = None) -> list[jax.Device]:
    """Devices to build meshes from; honors the VDPP_BACKEND env override
    (the analogue of the reference's PIPELINE_BACKEND env var,
    reference: src/distributed/backend.py:9,24)."""
    backend = backend or os.environ.get("VDPP_BACKEND") or None
    return list(jax.devices(backend)) if backend else list(jax.devices())


def make_pipeline_mesh(
    num_stages: int | None = None, backend: str | None = None
) -> Mesh:
    """1-D mesh over the pipeline-stage axis.

    Args:
        num_stages: stage count; defaults to all available devices. A value
            smaller than the device count uses the first ``num_stages``
            devices (mirrors CUDA_VISIBLE_DEVICES subsetting in the
            reference's sweeps, reference: scripts/benchmark_throughput.sh).
    """
    devices = available_devices(backend)
    if num_stages is None:
        num_stages = len(devices)
    if num_stages > len(devices):
        raise ValueError(
            f"Requested {num_stages} stages but only {len(devices)} devices available."
        )
    return make_axes_mesh(backend, **{STAGE_AXIS: num_stages})


def make_data_mesh(num_shards: int | None = None, backend: str | None = None) -> Mesh:
    """1-D mesh over the data (sample) axis for the DP baseline."""
    n = num_shards if num_shards is not None else len(available_devices(backend))
    return make_axes_mesh(backend, **{DATA_AXIS: n})


def make_2d_mesh(
    num_stages: int, num_data: int, backend: str | None = None
) -> Mesh:
    """(stage, data) mesh for combined pipeline + data parallelism."""
    return make_axes_mesh(backend, **{STAGE_AXIS: num_stages, DATA_AXIS: num_data})


def make_cfg_mesh(backend: str | None = None) -> Mesh:
    """2-device mesh over the classifier-free-guidance branch axis."""
    devices = available_devices(backend)
    if len(devices) < 2:
        raise ValueError("CFG parallelism needs 2 devices.")
    return Mesh(np.array(devices[:2]), (CFG_AXIS,))


def make_axes_mesh(backend: str | None = None, **axes: int) -> Mesh:
    """N-D mesh from named axis sizes, e.g. ``make_axes_mesh(stage=2,
    seq=2, cfg=2)`` — the general constructor the 1-D/2-D helpers wrap."""
    devices = available_devices(backend)
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    need = 1
    for s in sizes:
        need *= s
    if need > len(devices):
        raise ValueError(f"Need {need} devices, have {len(devices)}.")
    return Mesh(np.array(devices[:need]).reshape(sizes), names)


def make_seq_mesh(num_shards: int | None = None, backend: str | None = None) -> Mesh:
    """1-D mesh over the token (sequence) axis."""
    n = num_shards if num_shards is not None else len(available_devices(backend))
    return make_axes_mesh(backend, **{SEQ_AXIS: n})


def make_stage_seq_mesh(
    num_stages: int, num_seq: int, backend: str | None = None
) -> Mesh:
    """(stage, seq) mesh: step pipeline x sequence parallelism — each stage
    is itself a ``num_seq``-device token-sharded group."""
    return make_axes_mesh(backend, **{STAGE_AXIS: num_stages, SEQ_AXIS: num_seq})


def _slice_rows(devices) -> list[list]:
    """Group devices into per-slice rows by ``slice_index`` (devices
    without the attribute — CPU, single-slice — form one row), slices in
    ascending index order, device order preserved within a slice."""
    groups: dict[int, list] = {}
    for d in devices:
        groups.setdefault(getattr(d, "slice_index", 0) or 0, []).append(d)
    return [groups[k] for k in sorted(groups)]


def make_multislice_mesh(
    num_slices: int | None = None,
    stages_per_slice: int | None = None,
    backend: str | None = None,
) -> Mesh:
    """(data, stage) mesh laid out for multi-slice TPU pods: the data axis
    crosses slice (DCN) boundaries, the stage axis stays inside a slice.

    The step pipeline's per-tick latent hand-off is a ``ppermute`` along
    the stage axis, so with this layout every per-step transfer rides
    ICI; the slow DCN links only carry the embarrassingly-parallel sample
    distribution (zero per-step traffic) — the collective-placement rule
    for multi-slice topologies. The reference is explicitly single-node
    (reference: docs/context.md:99-105); this constructor is the
    scale-out extension its NCCL design never reaches.

    On real multi-slice hardware, devices are grouped by their
    ``slice_index`` so each mesh row is one physical slice. On a
    single-slice or CPU platform, pass ``num_slices`` explicitly to
    simulate the topology by splitting the flat device list (the virtual
    8-device CPU mesh tests do this).
    """
    devices = available_devices(backend)
    rows = _slice_rows(devices)

    if len(rows) > 1:
        # Real multi-slice topology: one mesh row per physical slice.
        if num_slices is not None:
            if num_slices > len(rows):
                raise ValueError(
                    f"requested {num_slices} slices but the platform has "
                    f"{len(rows)}"
                )
            rows = rows[:num_slices]
        width = min(len(r) for r in rows)
        if stages_per_slice is not None:
            if stages_per_slice > width:
                raise ValueError(
                    f"stages_per_slice {stages_per_slice} exceeds the "
                    f"smallest slice width {width}"
                )
            width = stages_per_slice
        arr = np.array([r[:width] for r in rows])
    else:
        # Single slice (or simulation): split the flat device list.
        if num_slices is None:
            raise ValueError(
                "single-slice platform: pass num_slices to simulate a "
                "multi-slice layout"
            )
        if stages_per_slice is None:
            stages_per_slice = len(devices) // num_slices
        need = num_slices * stages_per_slice
        if need > len(devices):
            raise ValueError(f"Need {need} devices, have {len(devices)}.")
        arr = np.array(devices[:need]).reshape(num_slices, stages_per_slice)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def make_pipeline_and_decode_meshes(
    num_stages: int | None,
    decode_devices: int,
    backend: str | None = None,
    seq: int = 1,
    frame: int = 1,
) -> tuple[Mesh, Mesh | None]:
    """Stage mesh plus an optional RESERVED decode mesh from one device
    list (task decoupling: decode work never lands on a stage device).

    ``num_stages=None`` auto-sizes to all devices left after the
    reservation. ``seq>1`` / ``frame>1`` make each stage a
    seq-/frame-sharded group — a (stage[, seq][, frame]) mesh. Both
    meshes draw from the same backend-resolved device list — resolving
    twice with different backends could silently hand the "reserved"
    decode devices back to the stages.
    """
    per_stage = seq * frame
    inner_axes: dict[str, int] = {}
    if seq > 1:
        inner_axes[SEQ_AXIS] = seq
    if frame > 1:
        inner_axes[FRAME_AXIS] = frame
    if not decode_devices:
        if inner_axes:
            n = num_stages
            if n is None:
                n = len(available_devices(backend)) // per_stage
            if n < 1:
                raise ValueError(
                    f"per-stage group (seq {seq} x frame {frame} = "
                    f"{per_stage}) exceeds the "
                    f"{len(available_devices(backend))} available devices"
                )
            return (
                make_axes_mesh(backend, **{STAGE_AXIS: n}, **inner_axes),
                None,
            )
        return make_pipeline_mesh(num_stages, backend), None
    devices = available_devices(backend)
    stages = (
        num_stages if num_stages is not None
        else (len(devices) - decode_devices) // per_stage
    )
    need = stages * per_stage + decode_devices
    if stages < 1 or need > len(devices):
        raise ValueError(
            f"{stages} stages x {per_stage} per-stage (seq {seq} x frame "
            f"{frame}) + {decode_devices} decode devices need {need} "
            f"devices, have {len(devices)}"
        )
    if inner_axes:
        stage_mesh = Mesh(
            np.array(devices[: stages * per_stage]).reshape(
                stages, *inner_axes.values()
            ),
            (STAGE_AXIS, *inner_axes.keys()),
        )
    else:
        stage_mesh = Mesh(np.array(devices[:stages]), (STAGE_AXIS,))
    decode_mesh = Mesh(
        np.array(devices[stages * per_stage: need]), (DATA_AXIS,))
    return stage_mesh, decode_mesh
