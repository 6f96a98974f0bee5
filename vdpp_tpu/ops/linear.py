"""Dense layers and the GEGLU feed-forward used in transformer blocks."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(
    key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32, use_bias: bool = True
) -> dict:
    """LeCun-normal init (keeps bf16 activations in range at any width)."""
    w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) / jnp.sqrt(in_dim)
    p = {"w": w.astype(dtype)}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(x: jax.Array, params: dict) -> jax.Array:
    """``x @ w + b`` with fp32 MXU accumulation, result in x.dtype.

    Accepts int8 weight-only quantized params (ops/quant.py): the
    per-channel dequant multiply fuses into the weight read. a8-marked
    weights (``{"q8": ...}``, from ``quantize_tree(act_int8=True)``)
    instead quantize the activation per row and run the int8 x int8 ->
    int32 double-rate MXU GEMM."""
    from vdpp_tpu.ops.quant import int8_dot, weight_for

    w = params["w"]
    if isinstance(w, dict) and "q8" in w:
        y = int8_dot(x, w)
    else:
        y = jnp.dot(x, weight_for(params, x.dtype), preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_geglu_ff(key: jax.Array, dim: int, inner_dim: int | None = None,
                  out_dim: int | None = None, dtype=jnp.float32) -> dict:
    """GEGLU feed-forward: Linear(dim, 2*inner) -> x * gelu(gate) -> Linear(inner, out)."""
    inner_dim = inner_dim or 4 * dim
    out_dim = out_dim or dim
    k1, k2 = jax.random.split(key)
    return {
        "proj_in": init_linear(k1, dim, 2 * inner_dim, dtype),
        "proj_out": init_linear(k2, inner_dim, out_dim, dtype),
    }


def geglu_ff(x: jax.Array, params: dict) -> jax.Array:
    """GEGLU feed-forward (exact-erf gelu, matching the transformer-block
    convention the reference model family uses)."""
    h = linear(x, params["proj_in"])
    val, gate = jnp.split(h, 2, axis=-1)
    h = val * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(val.dtype)
    return linear(h, params["proj_out"])
