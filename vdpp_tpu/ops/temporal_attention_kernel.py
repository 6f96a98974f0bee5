"""Fused Pallas kernel for tiny-sequence (frame-axis) attention.

Video models attend over FRAMES at every spatial location: sequence
length F is tiny (14-25) but the batch (B*L*H) is huge. As a batched
matmul this is ~46k (F, d) x (d, F) MXU calls (terrible shape); as an
XLA broadcast-reduce it is HBM-traffic-bound (measured ~56 ms of the SVD
forward for 0.02 TFLOPs of actual work).

This kernel keeps a (F, TILE_L, D) slab of q/k/v in VMEM and does the
whole F x F attention there: per-key-frame multiply-reduce for scores,
softmax over the key-frame axis, weighted accumulation for the output —
one read and one write of q/k/v/o from HBM, everything else on-chip.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _frame_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, frames: int, scale: float):
    # Intermediates are (F_q, TL) or (F_q, TL, D) with reductions on the
    # LAST axis only (Mosaic does not lower middle-axis reductions), and
    # the key-frame sweep uses fori_loop so temporaries are bounded
    # (fully unrolled loops blew the 16 MB scoped-VMEM stack).
    q = q_ref[0].astype(jnp.float32) * scale  # (F, TL, D) f32

    def score(g):
        # dynamic REF indexing (values can't be dynamically sliced in
        # Mosaic, refs can)
        kg = k_ref[0, g]  # (TL, D)
        return jnp.sum(q * kg.astype(jnp.float32)[None], axis=-1)  # (F_q, TL)

    def body_max(g, m):
        return jnp.maximum(m, score(g))

    m = jax.lax.fori_loop(
        0, frames, body_max,
        jnp.full(q.shape[:2], -jnp.inf, jnp.float32),
    )

    def body_acc(g, carry):
        denom, out = carry
        p = jnp.exp(score(g) - m)  # (F_q, TL)
        vg = v_ref[0, g]  # (TL, D)
        out = out + p[..., None] * vg.astype(jnp.float32)[None]
        return denom + p, out

    denom, out = jax.lax.fori_loop(
        0, frames, body_acc,
        (jnp.zeros(q.shape[:2], jnp.float32), jnp.zeros(q.shape, jnp.float32)),
    )
    o_ref[0] = (out / denom[..., None]).astype(o_ref.dtype)


def _pad_l(x: jax.Array, mult: int) -> jax.Array:
    rem = (-x.shape[2]) % mult
    if rem == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, rem), (0, 0)))


@functools.partial(jax.jit, static_argnames=("tile_l", "interpret"))
def _frame_attention_bhfld(
    q: jax.Array, k: jax.Array, v: jax.Array, tile_l: int, interpret: bool
) -> jax.Array:
    """q/k/v: (BH, F, L, D) -> (BH, F, L, D)."""
    bh, f, l, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qp, kp, vp = (_pad_l(t, tile_l) for t in (q, k, v))
    lp = qp.shape[2]
    # Padded locations compute garbage independently per location — the
    # frame softmax never mixes locations, so they are sliced off safely.
    kernel = functools.partial(_frame_attn_kernel, frames=f, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(bh, lp // tile_l),
        in_specs=[
            pl.BlockSpec((1, f, tile_l, d), lambda b, li: (b, 0, li, 0)),
            pl.BlockSpec((1, f, tile_l, d), lambda b, li: (b, 0, li, 0)),
            pl.BlockSpec((1, f, tile_l, d), lambda b, li: (b, 0, li, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, tile_l, d), lambda b, li: (b, 0, li, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, f, lp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :l, :]


def frame_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    tile_l: int = 128) -> jax.Array:
    """Attention over the frame axis.

    Args:
        q, k, v: (B, F, L, H, D) — frames F tiny, locations L huge.
    Returns:
        (B, F, L, H, D).
    """
    b, f, l, h, d = q.shape
    interpret = jax.default_backend() != "tpu"

    def to_bh(t):
        return t.transpose(0, 3, 1, 2, 4).reshape(b * h, f, l, d)

    out = _frame_attention_bhfld(to_bh(q), to_bh(k), to_bh(v), tile_l, interpret)
    return out.reshape(b, h, f, l, d).transpose(0, 2, 3, 1, 4)
