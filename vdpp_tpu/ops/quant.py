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


def quantize_weight(w: jax.Array, expert_stacked: bool = False) -> dict:
    """float (..., out) -> {"q": int8, "scale": f32 (out,)}.

    ``expert_stacked=True`` (MoE ``(E, ..., out)`` stacks): one scale per
    (expert, output-channel) — shape ``(E, 1, ..., out)``, broadcastable
    against ``q`` — instead of sharing one scale across all experts.
    Per-expert scales cost E*out floats (nothing), stay shardable with
    ``P(expert_axis)`` on the leading dim, and strictly reduce
    quantization error whenever experts differ in dynamic range.
    """
    wf = jnp.asarray(w, jnp.float32)
    if expert_stacked and wf.ndim >= 3:
        reduce_axes = tuple(range(1, wf.ndim - 1))
        amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1)))
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
                # stacks (ops/moe.py) — per-(expert, output-channel)
                # scales, shardable over the expert axis ("q" and "scale"
                # both carry the leading expert dim).
                if (
                    k in ("w", "w_in", "w_out")
                    and isinstance(v, jax.Array)
                    and jnp.issubdtype(v.dtype, jnp.floating)
                    and v.ndim >= min_ndim
                    and v.size >= min_size
                ):
                    out[k] = quantize_weight(
                        v, expert_stacked=k in ("w_in", "w_out")
                    )
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
