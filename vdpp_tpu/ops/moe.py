"""Mixture-of-Experts feed-forward with expert parallelism (top-1, dropless).

The reference has no MoE (its model surface is diffusers' dense SVD
UNet); this is a beyond-reference capability for MoE video-DiT variants,
and a composable mesh axis ("expert") next to stage/data/seq/frame/cfg.

Design (TPU-first, exact):

* **top-1 gating, dropless**: every token is routed to its argmax expert
  with the softmax probability as the combine weight — no capacity
  factor, no token dropping, so the result is deterministic and
  independent of the expert-axis size (oracle-equality testable, the
  same bar as every other parallel axis in this framework). Caveat:
  top-1 routing is DISCONTINUOUS, so when a DIFFERENT axis (e.g. token
  sharding) perturbs the gate inputs at the last ulp, a near-tied
  token can route differently — bounded and tested in
  tests/test_moe.py::test_dit_moe_pipeline_seq_and_expert_axes.
* **expert parallelism by weight sharding**: expert weight tensors carry
  a leading ``(num_experts, ...)`` dimension sharded over the mesh axis
  (``expert_param_spec`` builds the pytree of PartitionSpecs). Inside
  ``shard_map`` each device computes only its local expert slice and the
  partial outputs are combined with one ``psum`` over the axis — the
  all-reduce rides ICI.
* **static shapes**: routing uses a dense one-hot combine (einsum over
  the local expert dimension) rather than ragged gathers — every shape
  is static, so the whole layer jits into one fused XLA program. The
  dense form computes each local expert over all tokens (masked), which
  is the standard capacity-free TPU formulation; ``moe_ff_gather`` is
  the capacity-based token-gather alternative (E-fold less compute,
  over-capacity tokens drop).

Gate math in fp32 (house rule: softmax statistics in fp32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vdpp_tpu.ops.linear import init_linear

_EXPERT_LEAVES = ("w_in", "b_in", "w_out", "b_out")


def init_moe_ff(
    key: jax.Array,
    dim: int,
    num_experts: int,
    inner_dim: int | None = None,
    dtype=jnp.float32,
) -> dict:
    """Gate + per-expert MLP (gelu) parameters.

    Expert tensors are stacked on a leading ``num_experts`` dimension so
    a single PartitionSpec shards them across the expert mesh axis.
    """
    inner_dim = inner_dim or 4 * dim
    kg, k1, k2 = jax.random.split(key, 3)
    scale_in = 1.0 / jnp.sqrt(dim)
    scale_out = 1.0 / jnp.sqrt(inner_dim)
    return {
        "gate": init_linear(kg, dim, num_experts, jnp.float32, use_bias=False),
        "w_in": (
            jax.random.normal(k1, (num_experts, dim, inner_dim), jnp.float32)
            * scale_in
        ).astype(dtype),
        "b_in": jnp.zeros((num_experts, inner_dim), dtype),
        "w_out": (
            jax.random.normal(k2, (num_experts, inner_dim, dim), jnp.float32)
            * scale_out
        ).astype(dtype),
        "b_out": jnp.zeros((num_experts, dim), dtype),
    }



def _route(params: dict, x, num_experts: int, expert_axis: str | None):
    """Shared routing preamble of both dispatch forms: fp32 gate softmax,
    dequantized expert weights, local-shard extent and offset. Any change
    to routing (top-k, jitter, renorm) lives HERE so the documented
    moe_ff == moe_ff_gather exactness contract cannot drift."""
    from vdpp_tpu.ops.quant import weight_for

    # Replicated gate: every device routes identically (fp32 routing,
    # dequantized if the tree was int8-quantized).
    logits = jnp.dot(
        x.astype(jnp.float32), weight_for(params["gate"], jnp.float32)
    )  # (B, L, E)
    probs = jax.nn.softmax(logits, axis=-1)

    w_in = weight_for(params, x.dtype, "w_in")
    w_out = weight_for(params, x.dtype, "w_out")
    e_local = w_in.shape[0]
    if expert_axis is None and e_local != num_experts:
        raise ValueError(
            f"single-device call needs all {num_experts} experts, got {e_local}"
        )
    off = (
        jax.lax.axis_index(expert_axis) * e_local if expert_axis is not None else 0
    )
    return probs, w_in, params["b_in"], w_out, params["b_out"], e_local, off


def moe_ff(
    params: dict,
    x: jax.Array,
    num_experts: int,
    expert_axis: str | None = None,
) -> jax.Array:
    """(B, L, D) -> (B, L, D) top-1 MoE feed-forward.

    Args:
        num_experts: GLOBAL expert count (the gate width).
        expert_axis: mesh axis name when called inside ``shard_map`` with
            expert weights sharded on their leading dimension (the gate
            stays replicated); None for the single-device dense form.
    """
    b, l, d = x.shape
    probs, w_in, b_in, w_out, b_out, e_local, off = _route(
        params, x, num_experts, expert_axis
    )
    # (B, L, E): top-1 probability at the argmax column, 0 elsewhere.
    # one_hot of argmax (not a ==max compare) so ties route to exactly
    # one expert — deterministic across shardings.
    combine = jax.nn.one_hot(
        jnp.argmax(probs, axis=-1), num_experts, dtype=jnp.float32
    ) * jnp.max(probs, axis=-1, keepdims=True)
    if expert_axis is not None:
        # This shard owns experts [off, off + e_local).
        combine = jax.lax.dynamic_slice_in_dim(combine, off, e_local, axis=2)

    xd = x.astype(w_in.dtype)
    h = jnp.einsum("bld,edi->ebli", xd, w_in, preferred_element_type=jnp.float32)
    h = h + b_in[:, None, None, :].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True).astype(xd.dtype)
    o = jnp.einsum(
        "ebli,eid->ebld", h, w_out, preferred_element_type=jnp.float32
    )
    o = o + b_out[:, None, None, :].astype(jnp.float32)
    out = jnp.einsum("ebld,ble->bld", o, combine.astype(jnp.float32))
    if expert_axis is not None:
        out = jax.lax.psum(out, expert_axis)
    return out.astype(x.dtype)


def moe_ff_gather(
    params: dict,
    x: jax.Array,
    num_experts: int,
    expert_axis: str | None = None,
    capacity_factor: float = 2.0,
) -> jax.Array:
    """Token-gather (capacity-based) MoE dispatch.

    The dense one-hot form (:func:`moe_ff`) computes every local expert
    over ALL tokens — exact, but E-fold the useful FLOPs. This variant
    sorts tokens by their routed expert and each expert processes only
    its own segment, padded to a static capacity
    ``C = ceil(T / num_experts * capacity_factor)`` — the GShard/Switch
    scheme, E-fold less compute. Tokens beyond an expert's capacity are
    DROPPED (their FF output is 0; the residual connection still carries
    them), so this is an approximation knob, not the exact default: with
    ``capacity_factor >= num_experts`` (C >= T) nothing can drop and the
    result equals :func:`moe_ff` exactly (tested).

    Same parameter layout and expert-axis contract as :func:`moe_ff`.
    """
    b, l, d = x.shape
    t = b * l
    probs, w_in, b_in, w_out, b_out, e_local, off = _route(
        params, x, num_experts, expert_axis
    )
    assign = jnp.argmax(probs, axis=-1).reshape(t)  # (T,) in [0, E)
    gatev = jnp.max(probs, axis=-1).reshape(t)  # (T,) combine weight

    cap = int(-(-t * capacity_factor // num_experts))  # ceil, static
    cap = min(cap, t)

    # Stable group-by-expert: sort keys expert-major, token-minor.
    order = jnp.argsort(assign * t + jnp.arange(t))  # (T,) token ids
    sorted_assign = assign[order]
    counts = jnp.bincount(assign, length=num_experts)  # (E,)
    starts = jnp.cumsum(counts) - counts  # segment start per expert

    flat = x.reshape(t, d)
    out = jnp.zeros((t, d), jnp.float32)
    for j in range(e_local):  # static, small
        e = off + j
        start = jnp.clip(starts[e], 0, t - 1)
        tok_ids = jax.lax.dynamic_slice_in_dim(order, start, cap)  # (C,)
        seg_assign = jax.lax.dynamic_slice_in_dim(sorted_assign, start, cap)
        valid = seg_assign == e  # False beyond the segment / capacity
        xt = flat[tok_ids].astype(w_in.dtype)  # (C, d)
        h = jnp.dot(xt, w_in[j], preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + b_in[j].astype(jnp.float32), approximate=True)
        o = jnp.dot(
            h.astype(xt.dtype), w_out[j], preferred_element_type=jnp.float32
        ) + b_out[j].astype(jnp.float32)
        o = o * (valid * gatev[tok_ids])[:, None]
        # Scatter back; invalid rows target their token id but add 0.
        out = out.at[tok_ids].add(o, mode="drop")
    if expert_axis is not None:
        out = jax.lax.psum(out, expert_axis)
    return out.reshape(b, l, d).astype(x.dtype)


def expert_param_spec(params, expert_axis: str):
    """PartitionSpec pytree for a params tree: expert-stacked leaves (the
    ``w_in``/``b_in``/``w_out``/``b_out`` tensors directly under a
    ``"moe"`` mapping) shard their leading dimension over ``expert_axis``;
    everything else is replicated. Feed to ``StepPipeline(param_spec=...)``
    or a ``shard_map`` in_spec."""
    from jax.tree_util import tree_map_with_path

    def spec(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "moe" in keys:
            if keys[-1] in _EXPERT_LEAVES:
                return P(expert_axis)
            # int8 form: .../moe/w_in/{q, scale} — "q" keeps the leading
            # expert dim; "scale" is per-(expert, output-channel) with the
            # same leading expert dim (ops/quant.py expert_stacked). A
            # legacy shared scale (ndim 1) stays replicated.
            if len(keys) >= 2 and keys[-2] in _EXPERT_LEAVES:
                if keys[-1] == "q" or getattr(leaf, "ndim", 0) >= 2:
                    return P(expert_axis)
                return P()
        return P()

    return tree_map_with_path(spec, params)
