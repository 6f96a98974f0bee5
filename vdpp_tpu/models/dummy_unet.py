"""Lightweight denoiser stand-in for simulator mode.

Functional JAX counterpart of the reference's DummyUNet
(reference: src/models/dummy_unet.py:17-59): two 3-D convolutions with a SiLU
between them, a residual connection scaled by ``tanh(step / 10)`` so that
step *ordering* is visible in the output, and a channel-LayerNorm branch
added on top. Used to validate the pipeline schedule: the final latent must
be bit-identical for any stage count (the reference's norm-invariance check,
reference: src/modes/simulator.py:161-162).

The ``step`` argument may be a Python int or a traced int32 scalar — the
pipeline engine calls this inside ``lax.scan`` with a dynamic step index.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _conv_init(key: jax.Array, out_ch: int, in_ch: int, k: int, dtype) -> dict:
    """Uniform fan-in init (same family as torch's Conv default)."""
    wkey, bkey = jax.random.split(key)
    fan_in = in_ch * k * k * k
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(
            wkey, (out_ch, in_ch, k, k, k), dtype, minval=-bound, maxval=bound
        ),
        "b": jax.random.uniform(bkey, (out_ch,), dtype, minval=-bound, maxval=bound),
    }


def _conv3d(x: jax.Array, p: dict) -> jax.Array:
    """3-D same-padded convolution in NCDHW layout."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return y + p["b"].astype(x.dtype)[None, :, None, None, None]


@dataclass(frozen=True)
class DummyUNet:
    """Config + init/apply for the dummy denoiser.

    Latent layout: ``(B, C, F, H, W)`` — the pipeline-wide convention
    (reference pipeline convention, src/models/svd_unet.py:32-35).
    """

    channels: int = 8
    hidden_channels: int = 16
    use_layernorm: bool = True
    dtype: jnp.dtype = jnp.float32

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        params = {
            "conv1": _conv_init(k1, self.hidden_channels, self.channels, 3, self.dtype),
            "conv2": _conv_init(k2, self.channels, self.hidden_channels, 3, self.dtype),
        }
        if self.use_layernorm:
            params["ln"] = {
                "w": jnp.ones((self.channels,), self.dtype),
                "b": jnp.zeros((self.channels,), self.dtype),
            }
        return params

    def apply(self, params: dict, latent: jax.Array, step: jax.Array | int) -> jax.Array:
        residual = latent
        out = _conv3d(latent, params["conv1"])
        out = jax.nn.silu(out)
        out = _conv3d(out, params["conv2"])
        scale = jnp.tanh(jnp.asarray(step, jnp.float32) / 10.0).astype(latent.dtype)
        out = residual + scale * out
        if self.use_layernorm:
            # LayerNorm over the channel axis: normalize the *residual* and
            # add it (matches reference src/models/dummy_unet.py:42-58).
            x = jnp.moveaxis(residual, 1, -1).astype(jnp.float32)
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            normed = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            normed = normed * params["ln"]["w"].astype(jnp.float32) + params["ln"][
                "b"
            ].astype(jnp.float32)
            out = out + jnp.moveaxis(normed.astype(latent.dtype), -1, 1)
        return out

    def bind(self, params: dict):
        """Return a ``step_fn(params, latent, step)``-shaped callable."""
        def step_fn(p, latent, step):
            return self.apply(p, latent, step)
        return step_fn
