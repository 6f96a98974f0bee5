"""int8 quantization: weight-only (per-output-channel scales) and W8A8.

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

W8A8 (``quantize_tree(params, act_int8=True)``) additionally marks the
big linear/spatial-conv weights ``a8``: at those sites activations are
dynamically quantized (per token row for linears, per tensor for convs)
and the GEMM runs int8 x int8 -> int32 on v5e's double-rate MXU path —
measured 1.36-1.71x over bf16 at every UNet GEMM shape
(docs/performance.md "int8 MXU probe"; the conv emitter does NOT use it,
so int8 convs go through an explicit im2col dot_general). W8A8 changes
numerics — it is opt-in; the pipelined-equals-oracle invariant still
holds W8A8-vs-W8A8 (same traced program on both sides). First/last
layers (in or out channels < 64) stay weight-only for quality, the
standard W8A8 hygiene.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(
    w: jax.Array, expert_stacked: bool = False, a8: bool = False
) -> dict:
    """float (..., out) -> {"q": int8, "scale": f32 (out,)}.

    ``expert_stacked=True`` (MoE ``(E, ..., out)`` stacks): one scale per
    (expert, output-channel) — shape ``(E, 1, ..., out)``, broadcastable
    against ``q`` — instead of sharing one scale across all experts.
    Per-expert scales cost E*out floats (nothing), stay shardable with
    ``P(expert_axis)`` on the leading dim, and strictly reduce
    quantization error whenever experts differ in dynamic range.

    ``a8=True`` stores the int8 tensor under ``"q8"`` instead of ``"q"``:
    the marker that compute sites (linear/conv2d) should ALSO quantize
    activations and run the int8 MXU GEMM. The mark is a key name — not a
    bool leaf — so every param tree stays pure-array-leaved and tree_map
    -driven spec builders (parallel/sharding.py, moe.expert_param_spec)
    keep working unchanged.
    """
    wf = jnp.asarray(w, jnp.float32)
    if expert_stacked and wf.ndim >= 3:
        reduce_axes = tuple(range(1, wf.ndim - 1))
        amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1)))
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {("q8" if a8 else "q"): q, "scale": scale}


def _qtensor(p: dict):
    """The int8 tensor of a quantized weight dict, whichever key form."""
    return p["q8"] if "q8" in p else p["q"]


def dequantize_weight(p: dict, dtype) -> jax.Array:
    return (_qtensor(p).astype(jnp.float32) * p["scale"]).astype(dtype)


def is_quantized(params: dict) -> bool:
    w = params.get("w")
    return isinstance(w, dict) and ("q" in w or "q8" in w)


def weight_for(params: dict, dtype, key: str = "w") -> jax.Array:
    """The ``key`` weight of a param dict in compute dtype, whether the
    stored form is float or int8-quantized — the ONE dispatch point for
    the quantized representation (linear/conv/MoE all route through it).
    """
    w = params[key]
    if isinstance(w, dict) and ("q" in w or "q8" in w):
        return dequantize_weight(w, dtype)
    return w.astype(dtype)


def quantize_activation(
    x: jax.Array, per_row: bool = True, pmax_axes: tuple[str, ...] = ()
):
    """Dynamic symmetric int8 quantization of an activation tensor.

    ``per_row=True``: one scale per row of the trailing (reduction) axis
    — shape ``(..., 1)`` — the right granularity for a GEMM LHS.
    ``per_row=False``: one scalar scale for the whole tensor — used for
    convs, where quantizing BEFORE im2col (so the 9x patch duplication
    copies int8, not float) forces a single shared scale.

    ``pmax_axes``: mesh axes (inside ``shard_map``) over which the tensor's
    elements are SHARDED — the amax is pmax'd over them so every shard
    derives the same GLOBAL scale the unsharded program would. Without
    this, a per-tensor scale computed on a local shard diverges from the
    single-device oracle and breaks the W8A8 elementwise-equality
    invariant. Per-ROW scales never need it: under seq/frame sharding the
    rows themselves are disjoint across shards.
    Returns ``(q int8, scale f32)``.
    """
    xf = x.astype(jnp.float32)
    if per_row:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(xf))
        for ax in pmax_axes:
            amax = jax.lax.pmax(amax, ax)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dot(x: jax.Array, wq: dict) -> jax.Array:
    """``x @ w`` where ``wq`` is an a8-marked int8 weight ``{"q8": (K, N),
    "scale": (N,)}``: the LHS is dynamically quantized per row and the
    contraction runs int8 x int8 -> int32 on v5e's double-rate MXU path
    (measured 1.36-1.71x over bf16 at every UNet GEMM shape —
    docs/performance.md "int8 MXU probe"). Returns f32 ``(..., N)``; the
    caller adds bias and casts.
    """
    q, s = quantize_activation(x, per_row=True)
    y = jax.lax.dot_general(
        q,
        wq["q8"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * s * wq["scale"]


def quantize_tree(
    params,
    min_ndim: int = 2,
    min_size: int = 4096,
    act_int8: bool = False,
    a8_convs: bool = True,
):
    """Recursively replace every ``{"w": float_array}`` weight of at least
    ``min_ndim`` dims and ``min_size`` elements with its int8 form.

    Small weights stay float (quantizing a 3x3x4x4 conv saves nothing and
    costs accuracy); biases and non-"w" leaves are untouched.

    ``act_int8=True`` (W8A8): linear (2-D) and spatial-conv (4-D HWIO)
    weights with at least 64 input AND output channels are a8-marked
    (stored under ``"q8"``) so linear()/conv2d() run the int8 MXU GEMM
    with dynamically quantized activations. First/last layers (< 64
    channels on either side) stay weight-only — the standard W8A8 hygiene
    — as do temporal convs and MoE stacks (their emitters don't benefit /
    aren't converted; see docs/performance.md "int8 MXU probe").

    ``a8_convs=False`` restricts a8 marking to 2-D linear weights: the
    full-forward measurement (docs/performance.md "W8A8 full forward")
    showed the conv im2col materialization + dynamic-quant passes cost
    more HBM traffic than the double-rate MXU saves, so convs regress
    even though the isolated GEMM is 1.5-1.7x faster.
    """

    def a8_eligible(v: jax.Array) -> bool:
        if not act_int8:
            return False
        if v.ndim == 2:
            cin, cout = v.shape
        elif v.ndim == 4 and a8_convs:
            cin, cout = v.shape[2], v.shape[3]
        else:
            return False
        return min(cin, cout) >= 64

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
                        v,
                        expert_stacked=k in ("w_in", "w_out"),
                        a8=k == "w" and a8_eligible(v),
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
