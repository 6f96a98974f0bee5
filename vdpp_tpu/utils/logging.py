"""Logging setup matching the reference's conventions.

Uniform ``%(asctime)s %(levelname)s %(name)s`` format with a ``--log-level``
flag in every entry point (reference: src/modes/simulator.py:97-100);
stage-scoped loggers use a ``[stage=N]`` prefix — the single-controller
analogue of the reference's per-rank ``[rank=N]`` prefix
(reference: src/pipeline/pipeline.py:72-73).
"""

from __future__ import annotations

import logging


def setup_logging(level: str = "INFO") -> None:
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s %(message)s",
        force=True,
    )


def stage_logger(name: str, stage: int | None = None) -> logging.LoggerAdapter:
    logger = logging.getLogger(name)
    prefix = f"[stage={stage}] " if stage is not None else ""

    class _Adapter(logging.LoggerAdapter):
        def process(self, msg, kwargs):
            return prefix + msg, kwargs

    return _Adapter(logger, {})
