"""Mid-schedule checkpoint/resume for the ticked pipeline executor.

Preemption recovery the reference cannot express: its process-per-rank
design keeps each in-transit latent inside a blocked ``dist.recv`` on
some GPU, so there is no host-visible point where the whole pipeline
state could be snapshotted (reference: src/pipeline/pipeline.py:75-98).
The single-controller ticked executor's state between ticks is exactly
``(tick index, stage-sharded payload ring buf)`` — two values, trivially
persisted.

Usage (production mode wires this behind ``--state-path``):

    state = {"tick": -1}
    def on_tick(t, buf):
        if (t + 1) % every == 0:
            save_pipeline_state(path, t, buf, meta={...})
    out, _ = pipe.run_ticked(bundle, inputs, on_tick=on_tick)

    # after a preemption:
    tick, buf, meta = load_pipeline_state(path)
    out_rest, _ = pipe.run_ticked(bundle, inputs,
                                  start_tick=tick + 1, initial_buf=buf)

The resumed run emits the remaining samples bit-identically to the
uninterrupted run (tests/test_resume.py) — buf is carried as raw fp32
words, so any packed solver/cache state (dpmpp2m, deepcache lanes)
survives byte-exactly.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

_MAGIC = "vdpp_pipeline_state_v1"


def save_pipeline_state(path: str, tick: int, buf, meta: dict | None = None) -> None:
    """Persist the ticked executor's inter-tick state atomically.

    ``tick`` is the LAST COMPLETED tick; resume with ``start_tick =
    tick + 1``. Atomic rename so a preemption mid-write leaves the
    previous snapshot intact (the whole point of the file).
    """
    buf_np = np.asarray(buf)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                magic=np.array(_MAGIC),
                tick=np.asarray(int(tick), np.int64),
                buf=buf_np,
                meta=np.array(json.dumps(meta or {})),
            )
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pipeline_state(path: str) -> tuple[int, np.ndarray, dict]:
    """Load a snapshot -> (last completed tick, buf, meta)."""
    with np.load(path, allow_pickle=False) as z:
        if str(z["magic"]) != _MAGIC:
            raise ValueError(f"{path}: not a pipeline state file")
        return int(z["tick"]), z["buf"], json.loads(str(z["meta"]))
