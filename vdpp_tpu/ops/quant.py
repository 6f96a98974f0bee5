"""Weight-only int8 quantization (per-output-channel scales).

The reference manages its memory wall with fp16 + FSDP sharding
(reference: src/modes/benchmark.py:111-135); on v5e (16 GB HBM vs the
A5000's 24 GB) the per-chip budget is tighter, so weight-only int8 is the
complementary lever: it HALVES parameter bytes (svd-xt ~3.0 GB bf16 ->
~1.5 GB) both at rest and on every HBM weight stream, with activations,
norm statistics, and accumulation untouched (matmuls still accumulate in
fp32 on the MXU — the dequant multiply fuses into the operand read).

Usage:
    params = quantize_tree(params)          # after init / checkpoint load
    # linear()/conv2d()/conv_temporal() dispatch on the quantized form.

Quantization: symmetric int8 with one fp32 scale per OUTPUT channel (the
last axis of the (in, out) / HWIO / DHWIO weight layouts) — the standard
weight-only scheme that keeps per-channel dynamic range; biases and
1-D/scalar parameters (norm scales, mix factors, embeddings) stay float.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> dict:
    """float (..., out) -> {"q": int8, "scale": f32 (out,)}."""
    wf = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(range(wf.ndim - 1))
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequantize_weight(p: dict, dtype) -> jax.Array:
    return (p["q"].astype(jnp.float32) * p["scale"]).astype(dtype)


def is_quantized(params: dict) -> bool:
    return isinstance(params.get("w"), dict) and "q" in params["w"]


def weight_for(params: dict, dtype, key: str = "w") -> jax.Array:
    """The ``key`` weight of a param dict in compute dtype, whether the
    stored form is float or int8-quantized — the ONE dispatch point for
    the quantized representation (linear/conv/MoE all route through it).
    """
    w = params[key]
    if isinstance(w, dict) and "q" in w:
        return dequantize_weight(w, dtype)
    return w.astype(dtype)


def quantize_tree(params, min_ndim: int = 2, min_size: int = 4096):
    """Recursively replace every ``{"w": float_array}`` weight of at least
    ``min_ndim`` dims and ``min_size`` elements with its int8 form.

    Small weights stay float (quantizing a 3x3x4x4 conv saves nothing and
    costs accuracy); biases and non-"w" leaves are untouched.
    """

    def rec(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                # "w": dense layers/convs; "w_in"/"w_out": MoE expert
                # stacks (ops/moe.py) — same last-axis-channel scheme,
                # scales shared across the expert dim (which stays
                # shardable: int8 "q" carries the leading expert axis).
                if (
                    k in ("w", "w_in", "w_out")
                    and isinstance(v, jax.Array)
                    and jnp.issubdtype(v.dtype, jnp.floating)
                    and v.ndim >= min_ndim
                    and v.size >= min_size
                ):
                    out[k] = quantize_weight(v)
                else:
                    out[k] = rec(v)
            return out
        if isinstance(node, list):
            return [rec(v) for v in node]
        if isinstance(node, tuple):
            return tuple(rec(v) for v in node)
        return node

    return rec(params)


def param_bytes(params) -> int:
    """Total bytes of every array leaf (the FSDP-memory-table analogue,
    reference: EXPERIMENT_RESULTS_JP.md FSDP memory rows)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(int(x.size) * x.dtype.itemsize for x in leaves)
