"""CLI entry points (the reference's L5 mode layer, TPU-native):

    python -m vdpp_tpu.modes.simulator                — CPU-mesh logic check
    python -m vdpp_tpu.modes.production               — SVD pipeline inference
    python -m vdpp_tpu.modes.benchmark                — pipeline / FSDP benchmark
    python -m vdpp_tpu.modes.benchmark_data_parallel  — DP baseline benchmark
    python -m vdpp_tpu.modes.serve                    — HTTP serving endpoint

One process drives all stages (no torchrun equivalent needed): "rank" is
a mesh coordinate, not a process.
"""
