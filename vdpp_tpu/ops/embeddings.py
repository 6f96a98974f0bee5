"""Timestep / positional embeddings."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vdpp_tpu.ops.linear import init_linear, linear


def sinusoidal_embedding(
    t: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers ``Timesteps`` convention:
    half sin / half cos, optionally flipped to cos-first).

    Args:
        t: scalar or (B,) timestep values (may be continuous floats — the
           SVD schedule feeds 0.25*ln(sigma)).
        dim: embedding dimension (even).
    Returns:
        (B, dim) fp32 embedding.
    """
    t = jnp.atleast_1d(jnp.asarray(t, jnp.float32))
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = scale * t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def init_timestep_mlp(
    key: jax.Array, in_dim: int, hidden_dim: int, out_dim: int | None = None,
    dtype=jnp.float32,
) -> dict:
    """Two-layer SiLU MLP (diffusers ``TimestepEmbedding`` shape)."""
    out_dim = out_dim or hidden_dim
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": init_linear(k1, in_dim, hidden_dim, dtype),
        "linear_2": init_linear(k2, hidden_dim, out_dim, dtype),
    }


def timestep_mlp(x: jax.Array, params: dict) -> jax.Array:
    h = linear(x, params["linear_1"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    return linear(h, params["linear_2"])
