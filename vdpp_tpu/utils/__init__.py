"""Utilities: logging, benchmark metric contract, device memory stats."""

from vdpp_tpu.utils.logging import setup_logging
from vdpp_tpu.utils.bench_json import emit_benchmark_json

__all__ = ["setup_logging", "emit_benchmark_json"]
