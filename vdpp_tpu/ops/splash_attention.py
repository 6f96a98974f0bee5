"""Splash-attention routing (optional alternative to the first-party kernel).

JAX ships a second-generation TPU attention kernel family ("splash",
``jax.experimental.pallas.ops.tpu.splash_attention``) — the production
kernel of large public TPU codebases. Measured on a real v5e at SVD's
level-0 shape (B=14, L=9216, H=5, D=64, bf16; scripts/bench_attention.py
--sections splash):

    splash 1024/1536/512 : 46.90 ms  (32.4 TFLOP/s)  — best splash config
    splash  512/1536/512 : 49.12 ms
    first-party kernel   : 45.14 ms  (33.7 TFLOP/s)  — 1536/1536/1536,
                           now the ops/flash_attention.py default; the
                           pre-sweep 512-q-block default was 48.5 ms and
                           jax's older official flash kernel 50.2 ms

The splash probe is what surfaced the big-q-block direction; re-sweeping
the first-party kernel with q blocks >= 1024 then beat splash, so
"pallas" (first-party) remains the default. Enabled with
``VDPP_ATTN_IMPL=splash``; sites whose sequence length the splash block
constraints cannot divide fall back to the first-party kernel, so the
flag is always safe. Outputs agree with the reference attention to bf16
tolerance (tests/test_ops.py::test_splash_attention_matches_xla).

The reference repo reaches its attention kernels through xformers/torch
SDPA (reference: src/models/svd_unet.py:139-149); both kernels here are
the TPU-native replacement for that layer.
"""

from __future__ import annotations

import functools

import jax

# Candidate block sizes, best-first (measured above). A candidate is
# usable when it divides the sequence length (splash requires exact
# tiling of the q and kv sequence axes).
_Q_BLOCKS = (1024, 512, 256, 128)
_KV_BLOCKS = (1536, 1024, 768, 512, 256, 128)


def _pick(candidates: tuple[int, ...], length: int) -> int | None:
    for c in candidates:
        if length % c == 0:
            return c
    return None


@functools.lru_cache(maxsize=32)
def _kernel(lq: int, lk: int, heads: int, interpret: bool):
    """Build (and cache) a splash MHA kernel for a full (non-causal,
    unmasked) attention of shape (H, Lq, D) x (H, Lk, D), or None when
    the shape cannot be tiled."""
    bq = _pick(_Q_BLOCKS, lq)
    bkv = _pick(_KV_BLOCKS, lk)
    if bq is None or bkv is None:
        return None
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    bkvc = min(bkv, 512) if bkv % min(bkv, 512) == 0 else bkv
    block_sizes = sk.BlockSizes(block_q=bq, block_kv=bkv, block_kv_compute=bkvc)
    mask = sm.MultiHeadMask([sm.FullMask((lq, lk)) for _ in range(heads)])
    return sk.make_splash_mha(
        mask=mask,
        block_sizes=block_sizes,
        head_shards=1,
        q_seq_shards=1,
        interpret=interpret,
    )


def splash_supported(lq: int, lk: int) -> bool:
    return _pick(_Q_BLOCKS, lq) is not None and _pick(_KV_BLOCKS, lk) is not None


def splash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Full (non-causal) attention over (B, L, H, D) via the splash kernel.

    The kernel applies no softmax scale — it is folded into q here. The
    caller is responsible for checking :func:`splash_supported`.
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    interpret = jax.default_backend() != "tpu"
    kern = _kernel(lq, lk, h, interpret)
    if kern is None:
        raise ValueError(
            f"splash attention cannot tile Lq={lq}, Lk={lk}; "
            "guard with splash_supported()"
        )
    scale = 1.0 / (d ** 0.5)
    qh = (q * scale).transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    out = jax.vmap(kern)(qh, kh, vh)  # (B, H, L, D)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
