"""Normalization ops (channels-last, fp32 statistics).

GroupNorm/LayerNorm are the precision-critical glue between bf16 matmuls;
statistics are always computed in fp32 and the result cast back to the
input dtype (the bf16 analogue of the reference keeping its Euler update
in fp32, reference: src/models/svd_unet.py:427-439).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_group_norm(channels: int, dtype=jnp.float32) -> dict:
    return {
        "scale": jnp.ones((channels,), dtype),
        "bias": jnp.zeros((channels,), dtype),
    }


def group_norm(
    x: jax.Array,
    params: dict,
    num_groups: int = 32,
    eps: float = 1e-6,
    psum_axis: str | tuple[str, ...] | None = None,
) -> jax.Array:
    """GroupNorm over the trailing channel axis of a channels-last tensor.

    ``x``: (..., C) with C % num_groups == 0. Statistics are taken over all
    non-batch axes within each group — i.e. over (spatial..., C//G), where
    the leading axis is the batch.

    ``psum_axis``: a shard_map mesh axis (or tuple of axes — e.g. W-halo
    sequence parallelism composed with frame parallelism) over which
    non-batch axes of x are sharded; the group statistics are then reduced
    across the axis/axes with ``pmean`` (equal shard sizes), keeping them
    identical to the unsharded computation.
    """
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    import os as _os

    if _os.environ.get("VDPP_ABLATE_GROUPNORM") == "1":  # profiling only
        return (
            x.astype(jnp.float32) * params["scale"].astype(jnp.float32)
            + params["bias"].astype(jnp.float32)
        ).astype(orig_dtype)
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    if psum_axis is None:
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    else:
        # Two-pass statistics matching the unsharded math (the one-pass
        # E[x^2]-mean^2 form costs ~2e-4 of CFG-amplified error — measured;
        # the second pmean buys exactness for one extra tiny reduction).
        mean = jax.lax.pmean(jnp.mean(xf, axis=(1, 3), keepdims=True),
                             psum_axis)
        var = jax.lax.pmean(
            jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True),
            psum_axis,
        )
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(x.shape)
    out = xn * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def group_norm_silu(
    x: jax.Array,
    params: dict,
    num_groups: int = 32,
    eps: float = 1e-6,
    psum_axis: str | tuple[str, ...] | None = None,
    fused: bool = False,
) -> jax.Array:
    """``silu(group_norm(x))`` with an optional fused-Pallas fast path.

    ``fused=True`` routes through ``ops.norm_kernel.group_norm_silu_fused``
    (one stats pass + one normalize pass instead of XLA's four HBM passes)
    whenever the kernel supports the case: unsharded statistics
    (``psum_axis is None`` — the kernel reduces locally only) and a row
    extent with an 8-aligned chunking (``_row_chunk``). Anything else
    silently takes the unfused composition, so callers can thread a single
    construction-time flag without shape-casing. Numerics: the fused path
    applies SiLU to the fp32 normalized value before the output rounding,
    so results can differ from the composition by one output-dtype ULP
    (tests/test_norm_kernel.py pins the bound).
    """
    if fused and psum_axis is None:
        from vdpp_tpu.ops.norm_kernel import _row_chunk, group_norm_silu_fused

        rows = 1
        for d in x.shape[1:-1]:
            rows *= d
        if x.shape[-1] % num_groups == 0 and _row_chunk(rows, x.shape[-1]):
            return group_norm_silu_fused(x, params, num_groups, eps, silu=True)
    h = group_norm(x, params, num_groups, eps, psum_axis=psum_axis)
    return jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)


def init_rms_norm(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(x: jax.Array, params: dict, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over the trailing axis (no mean subtraction, no bias), fp32
    statistics — the T5 / LLaMA-family norm."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + eps)
    return (xn * params["scale"].astype(jnp.float32)).astype(orig_dtype)


def init_layer_norm(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(x: jax.Array, params: dict, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the trailing axis, fp32 statistics."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xn * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)
