"""Multi-head attention for the spatio-temporal transformer blocks.

Three regimes, dispatched on static shapes:

* ``kv_len == 1`` (SVD's CLIP-image cross-attention has a single key):
  softmax over one key is identically 1, so attention degenerates to a
  broadcast of the value projection — no score matrix, no softmax. This
  removes the entire QK^T/softmax cost of every cross-attention site
  (mathematically exact, not an approximation).
* long sequences: a fused Pallas flash-attention kernel
  (vdpp_tpu.ops.flash_attention) keeps the O(L^2) score matrix out of HBM.
* short sequences / fallback: plain XLA dot-product attention with fp32
  softmax.

The reference gets this via xformers / torch SDPA on CUDA
(reference: src/models/svd_unet.py:139-149, enable_memory_optimizations
:166-194); here it is first-party.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from vdpp_tpu.ops.linear import init_linear, linear

# Sequence length at/above which the fused kernel is used on TPU
# (overridable for per-site routing experiments via VDPP_FLASH_MIN_L).
_FLASH_MIN_Q_LEN = 512


def _flash_min_q_len() -> int:
    return int(os.environ.get("VDPP_FLASH_MIN_L", _FLASH_MIN_Q_LEN))


def _attn_impl() -> str:
    """Self-attention implementation for long sequences.

    VDPP_ATTN_IMPL: "pallas" (first-party flash kernel, default),
    "xla" (jax.nn.dot_product_attention), "naive" (materialized scores).
    """
    return os.environ.get("VDPP_ATTN_IMPL", "pallas")


def init_attention(
    key: jax.Array,
    query_dim: int,
    heads: int,
    cross_dim: int | None = None,
    dtype=jnp.float32,
    qkv_bias: bool = False,
) -> dict:
    """QKV + output (bias) projections. ``qkv_bias=False`` matches the
    diffusers ``Attention`` convention; CLIP-style towers use True."""
    kv_dim = cross_dim or query_dim
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "to_q": init_linear(k1, query_dim, query_dim, dtype, use_bias=qkv_bias),
        "to_k": init_linear(k2, kv_dim, query_dim, dtype, use_bias=qkv_bias),
        "to_v": init_linear(k3, kv_dim, query_dim, dtype, use_bias=qkv_bias),
        "to_out": init_linear(k4, query_dim, query_dim, dtype),
    }


def _fuse_qkv() -> bool:
    """Fuse the three self-attention qkv projections into one matmul
    (``VDPP_FUSE_QKV=1``). Numerically identical (the concatenated
    weight's output columns are the same contractions).

    Default OFF: measured a wash on the real v5e UNet forward (529.1 ms
    split vs 532.7 ms fused at 14f/72x128 — the in-jit concat of the
    three weight matrices costs what the saved activation reads buy;
    XLA already overlaps the three dispatches). Negative result kept as
    a knob for other architectures/hardware.
    """
    return os.environ.get("VDPP_FUSE_QKV", "0") == "1"


def _qkv_fused(x: jax.Array, params: dict) -> tuple | None:
    """(q, k, v) via one fused ``x @ [Wq Wk Wv]`` matmul, or None when the
    params are not fusable (int8 weight-only dicts keep their own
    per-channel scales; heterogeneous bias layouts never occur in
    practice but are guarded)."""
    pq, pk, pv = params["to_q"], params["to_k"], params["to_v"]
    if any(isinstance(p["w"], dict) for p in (pq, pk, pv)):
        return None
    if not (("b" in pq) == ("b" in pk) == ("b" in pv)):
        return None
    fused = {"w": jnp.concatenate([pq["w"], pk["w"], pv["w"]], axis=1)}
    if "b" in pq:
        fused["b"] = jnp.concatenate([pq["b"], pk["b"], pv["b"]])
    y = linear(x, fused)
    return tuple(jnp.split(y, 3, axis=-1))


def _sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(B, L, H, D) dot-product attention with fp32 softmax."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum(
        "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhlm,bmhd->blhd", weights, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def temporal_self_attention(
    params: dict,
    x: jax.Array,
    heads: int,
    batch: int,
    frames: int,
    frame_axis: str | None = None,
) -> jax.Array:
    """Self-attention over the FRAME axis of (B*F, L, C) WITHOUT
    materializing the (B*L, F, C) transpose: qkv are projected in the
    resident layout and the frame contraction happens inside batched
    dot_generals (XLA fuses the layout change into the matmul). The
    physical transpose of video-scale activations is a measured
    HBM-bandwidth sink (docs/performance.md).

    ``frame_axis``: shard_map mesh axis over which the frame axis is
    sharded (frame parallelism): queries stay local, K/V are
    ``all_gather``-ed over the axis so every device attends its local
    frames against the full frame set — exact attention, gather riding
    ICI. ``frames`` is then the LOCAL frame count."""
    bf, l, c = x.shape
    d = c // heads
    fused = _qkv_fused(x, params) if _fuse_qkv() else None
    if fused is not None:
        q, k, v = (t.reshape(batch, frames, l, heads, d) for t in fused)
    else:
        q = linear(x, params["to_q"]).reshape(batch, frames, l, heads, d)
        k = linear(x, params["to_k"]).reshape(batch, frames, l, heads, d)
        v = linear(x, params["to_v"]).reshape(batch, frames, l, heads, d)
    if os.environ.get("VDPP_ABLATE_TEMPORAL_ATTN") == "1":  # profiling only
        return linear(v.reshape(bf, l, c), params["to_out"])
    if frame_axis is not None:
        k = jax.lax.all_gather(k, frame_axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, frame_axis, axis=1, tiled=True)
    kv_frames = k.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    impl = os.environ.get("VDPP_TEMPORAL_ATTN", "vpu")
    if impl == "pallas" and frame_axis is not None:
        # the fused kernel assumes square (F, F) attention; under frame
        # sharding fall back to the default fused-XLA form
        impl = "vpu"
    if impl == "pallas":
        # Fused VMEM kernel (ops/temporal_attention_kernel.py). Measured
        # SLOWER than the fused-XLA "vpu" form on v5e (594.8 vs 550.3
        # ms/fwd): the per-key-frame fori_loop at VMEM-safe tile sizes
        # pays more in loop overhead than it saves in HBM traffic. Kept
        # as a variant for other frame counts / future Mosaic versions.
        from vdpp_tpu.ops.temporal_attention_kernel import frame_attention

        out = frame_attention(q, k, v).astype(x.dtype)
        return linear(out.reshape(bf, l, c), params["to_out"])
    if impl == "transpose":
        # Physical relayout to (B*L, F, H, D) + XLA sdpa: pays 2 HBM
        # round-trips of the qkv activations (~0.5 GB at the L0 site) to
        # buy a standard attention shape. The frame axis becomes the
        # sequence axis, so softmax/score work is a tiny (F, F) problem
        # with a huge batch — XLA lowers it to fused batched matmuls.
        qt = q.transpose(0, 2, 3, 1, 4).reshape(batch * l, heads, frames, d)
        kt = k.transpose(0, 2, 3, 1, 4).reshape(batch * l, heads, kv_frames, d)
        vt = v.transpose(0, 2, 3, 1, 4).reshape(batch * l, heads, kv_frames, d)
        logits = jnp.einsum(
            "bhfd,bhgd->bhfg", qt, kt, preferred_element_type=jnp.float32
        ) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
        ot = jnp.einsum(
            "bhfg,bhgd->bhfd", w, vt, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = (
            ot.reshape(batch, l, heads, frames, d)
            .transpose(0, 3, 1, 2, 4)
        )  # (B, F, L, H, D)
    elif impl == "einsum":
        # Batched-matmul form: contraction d with batch (b, l, h). The
        # per-element matmuls are (F, d)x(d, F) — tiny M/N with a huge
        # batch count, a poor MXU shape.
        logits = jnp.einsum(
            "bflhd,bglhd->blhfg", q, k, preferred_element_type=jnp.float32
        ) * scale  # (B, L, H, F, F)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum(
            "blhfg,bglhd->bflhd", w, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    else:
        # Broadcast-multiply-reduce form: the same contraction expressed
        # as elementwise VPU work (total b*l*h*F^2*d MACs ~ 0.6 G at the
        # SVD level-0 shape — trivially small when fused; frames F are
        # tiny so the F^2 blowup is cheap).
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        logits = jnp.sum(qf[:, :, None] * kf[:, None, :], axis=-1) * scale
        # (B, F, G, L, H); softmax over the key-frame axis G
        w = jax.nn.softmax(logits, axis=2)
        out = jnp.sum(
            w[..., None] * v.astype(jnp.float32)[:, None], axis=2
        ).astype(x.dtype)  # (B, F, L, H, D)
    return linear(out.reshape(bf, l, c), params["to_out"])


def attention(
    x: jax.Array,
    params: dict,
    heads: int,
    context: jax.Array | None = None,
    use_flash: bool = True,
    seq_axis: str | None = None,
) -> jax.Array:
    """Multi-head attention over (B, L, C); ``context`` (B, M, Ckv) for
    cross-attention (self-attention when None).

    ``seq_axis``: name of a shard_map mesh axis along which the token axis
    L is sharded (sequence/context parallelism). Queries stay local; the
    K/V projections are computed on the local shard and ``all_gather``-ed
    over the axis, so every device attends its L/n query tokens against
    the full key set — exact attention, with the gather riding ICI.
    Cross-attention needs no communication (context is replicated).
    """
    b, l, c = x.shape
    ctx = x if context is None else context
    m = ctx.shape[1]
    d = c // heads

    if m == 1 and (context is not None or seq_axis is None):
        # Single-key cross-attention: softmax == 1 -> output is v broadcast.
        # Project through to_out BEFORE broadcasting: linear commutes with
        # row broadcast (identical rows), so to_out runs on (B, 1, C)
        # instead of an (B*L, C) GEMM over L replicated rows — ~26 GFLOP
        # saved per SVD spatial site. NOT taken for sequence-parallel
        # self-attention: there m is the LOCAL shard length — a 1-token
        # shard must still gather and attend over the full key set below.
        v = linear(ctx, params["to_v"])
        out = linear(v, params["to_out"])  # (B, 1, C)
        return jnp.broadcast_to(out, (b, l, c))

    fused = _qkv_fused(x, params) if context is None and _fuse_qkv() else None
    if fused is not None:
        q, k, v = (t.reshape(b, l, heads, d) for t in fused)
    else:
        q = linear(x, params["to_q"]).reshape(b, l, heads, d)
        k = linear(ctx, params["to_k"]).reshape(b, m, heads, d)
        v = linear(ctx, params["to_v"]).reshape(b, m, heads, d)
    if seq_axis is not None and context is None:
        k = jax.lax.all_gather(k, seq_axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, seq_axis, axis=1, tiled=True)
        m = k.shape[1]

    impl = _attn_impl()
    if use_flash and context is None and l >= _flash_min_q_len() and impl != "naive":
        if impl == "identity":
            # Profiling ablation ONLY: skip the attention core (keeps the
            # qkv/out projections) to isolate its cost. Not a real mode.
            out = v
        elif impl == "xla":
            out = jax.nn.dot_product_attention(q, k, v, implementation="xla")
        else:
            out = None
            if impl == "splash":
                # Library splash kernel: ~7% faster at the L0 site
                # (ops/splash_attention.py docstring); falls back to the
                # first-party kernel at untileable sequence lengths.
                from vdpp_tpu.ops.splash_attention import (
                    splash_attention,
                    splash_supported,
                )

                if splash_supported(l, m):
                    out = splash_attention(q, k, v)
            if out is None:
                from vdpp_tpu.ops.flash_attention import flash_attention

                out = flash_attention(q, k, v)
    else:
        out = _sdpa_xla(q, k, v)
    return linear(out.reshape(b, l, c), params["to_out"])
