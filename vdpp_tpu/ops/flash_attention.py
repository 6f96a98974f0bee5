"""Fused flash attention (Pallas/Mosaic) for TPU.

Non-causal flash attention with online softmax: the (L_q, L_k) score
matrix never materializes in HBM — scores, the running max, and the
output accumulator live in VMEM, with QK^T and PV on the MXU in fp32
accumulation.

This is the first-party replacement for the xformers / torch-SDPA path
the reference leans on for its spatio-temporal attention memory wall
(reference: src/models/svd_unet.py:139-149). SVD's spatial attention runs
at L = H*W up to 9216 tokens (1024x576 -> 72x128 latent), head_dim 64 —
XLA's stock attention materializes a 23.7 GB score tensor there and OOMs
(measured), so this kernel is required, not optional.

Measured bottleneck (v5e): the kernel is VPU-bound on the softmax
elementwise passes over the (BQ, BK) score tile, NOT MXU- or DMA-bound
(block-size sweeps showed time ∝ number of score-tile passes). The
kernel therefore minimizes VPU passes:

* **base-2 softmax**: q is pre-scaled by ``sm_scale * log2(e)`` outside
  the kernel, and the kernel uses ``exp2`` — removes the per-tile scale
  multiply and uses the cheaper exponential (FlashAttention-2 trick);
* **MXU row-sums**: V is augmented with a ones column (free: head_dim 64
  already pads to the 128-lane tile), so the softmax denominator comes
  out of the PV matmul instead of a VPU reduction; the running ``l``
  lives in the accumulator and is rescaled by the same alpha;
* **conditional masking**: the padded-key mask is emitted only when the
  sequence actually needs padding (compile-time decision);
* **static-max softmax** (default; ``VDPP_FLASH_SOFTMAX=running`` to
  disable): non-causal attention over post-norm activations keeps logits
  far below the fp32 exp2 overflow line, so the kernel computes
  ``exp2(s)`` directly — the subtracted running max is a constant factor
  that cancels exactly in the normalization. Removes the per-tile
  (BQ,BK) max-reduce, the subtract, and the accumulator rescale; a
  ``min(s, 100)`` clamp guards pathological logits (beyond
  |logit| ~ 69 the softmax saturates and only finiteness is guaranteed —
  the running-max mode remains available for that regime). Measured
  +6.9% at the L0 site (chained honest harness, 20.5 -> 19.1 ms/call);
* fp32 running statistics; bf16 P for the PV matmul; mask value
  -0.7*float_max (avoids exp(-inf - -inf) NaNs).

Timing note (round 3): per-dispatch kernel timings through the remote
relay carry ~25 ms of overhead even with fresh inputs — the honest
harness chains ITERS kernel calls in one scan AND fetches an in-jit
scalar reduction (a bare block_until_ready returns optimistically). The
round-2 "45.1 ms / 33.7 TFLOP/s" L0 figure was dispatch-inflated; the
kernel actually runs ~20.5 ms (74 TFLOP/s) running-max, ~19.1 ms
(79.5 TFLOP/s) static-max.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = math.log2(math.e)


def _aug_width(d: int) -> int:
    """Lane width of the ones-augmented V / accumulator: head_dim + 1
    rounded up to the 128-lane tile (a single extra lane register when
    head_dim is itself a multiple of 128)."""
    return ((d + 1 + 127) // 128) * 128


# Static-max clamps, log2 domain. Upper: exp2(_S_CLAMP) * L keys must
# stay finite in the fp32 denominator (2^100 * 2^14 = 2^114 << 2^128).
# Lower: a whole row of strongly negative logits must not underflow to
# l == 0 (which would collapse the output to zero — caught by round-3
# code review with q=4*ones, k=-4*ones); clipping at -100 keeps
# l >= 2^-100, far above the fp32 denormal line. Post-norm activations
# put |logits| orders of magnitude inside +-100, so neither clamp
# engages in practice; outside them the softmax saturates gracefully.
# Masked (padded) keys are set to _PAD_LOGIT *after* the clip: exp2(-126)
# is ~1.5e-8 of the smallest possible valid weight exp2(-100) — masked
# keys stay negligible even in the all-underflow regime.
_S_CLAMP = 100.0
_S_CLAMP_LO = -100.0
_PAD_LOGIT = -126.0


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr,
    *, kv_valid: int, bk_major: int, bk: int, need_mask: bool, head_dim: int,
    exp_bf16: bool = False, static_max: bool = False,
):
    ki_major = pl.program_id(2)
    nk_major = pl.num_programs(2)

    @pl.when(ki_major == 0)
    def _init():
        if not static_max:
            m_scr[:] = jnp.full_like(m_scr, _MASK_VALUE)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, D) — pre-scaled by sm_scale * log2(e)

    for start in range(0, bk_major, bk):
        k = k_ref[0, start : start + bk, :]  # (BK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK), log2-domain logits

        if need_mask:
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + ki_major * bk_major
                + start
            )

        if static_max:
            # Static-max softmax: exp2(s) directly — the subtracted max is
            # a constant factor that cancels exactly in the l
            # normalization, so dropping it changes only fp32 rounding.
            # Removes the per-tile (BQ,BK) max-reduce, the subtract, and
            # the (BQ,AUG) accumulator rescale — the kernel is VPU-bound
            # on exactly these passes (module docstring). The two-sided
            # clamp replaces the running max as the overflow AND
            # underflow guard (see _S_CLAMP notes); padded keys are set
            # below the lower clamp AFTER it so they stay negligible.
            s = jnp.clip(s, _S_CLAMP_LO, _S_CLAMP)
            if need_mask:
                s = jnp.where(col < kv_valid, s, _PAD_LOGIT)
            p = jnp.exp2(s)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, start : start + bk, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BQ, AUG)
            acc_scr[:] = acc_scr[:] + pv
            continue

        if need_mask:
            s = jnp.where(col < kv_valid, s, _MASK_VALUE)
        m_prev = m_scr[:, :1]  # (BQ, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        if exp_bf16:
            # Experimental: bf16 exponent pass (softmax precision drops to
            # ~3 decimal digits; perf experiment only — see VDPP_FLASH_EXP).
            p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
        else:
            p = jnp.exp2(s - m_new)

        # PV on the MXU; v is ones-augmented so column ``head_dim`` of the
        # accumulator is the softmax denominator l.
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, start : start + bk, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, AUG)
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki_major == nk_major - 1)
    def _finalize():
        l = acc_scr[:, head_dim : head_dim + 1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:, :head_dim] * l_inv).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k_major", "block_k", "interpret",
                     "exp_bf16", "static_max"),
)
def _flash_bhld(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int,
    block_k_major: int,
    block_k: int,
    interpret: bool,
    exp_bf16: bool = False,
    static_max: bool = False,
) -> jax.Array:
    """q/k/v: (BH, L, D) -> (BH, Lq, D)."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    aug = _aug_width(d)

    # Pre-scale q: softmax(s/sqrt(d)) == exp2(q' k^T - m) normalization
    # with q' = q * log2(e)/sqrt(d).
    q = (q.astype(jnp.float32) * (_LOG2E / math.sqrt(d))).astype(q.dtype)
    # Ones-augmented V: [v | 1 | 0...] up to the 128-lane tile the layout
    # pads to anyway.
    v_aug = jnp.concatenate(
        [
            v,
            jnp.ones((bh, lk, 1), v.dtype),
            jnp.zeros((bh, lk, aug - d - 1), v.dtype),
        ],
        axis=-1,
    )

    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k_major)
    vp = _pad_to(v_aug, 1, block_k_major)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    nq, nk_major = lq_p // block_q, lk_p // block_k_major
    # Padded keys produce exp2(MASK - m) == 0 only if masked; the ones
    # column would otherwise count them in l, so mask whenever padded.
    need_mask = lk_p != lk

    kernel = functools.partial(
        _flash_kernel,
        kv_valid=lk,
        bk_major=block_k_major,
        bk=block_k,
        need_mask=need_mask,
        head_dim=d,
        exp_bf16=exp_bf16,
        static_max=static_max,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk_major),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k_major, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k_major, aug), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, aug), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq_p * lk_p * d,
            bytes_accessed=(
                bh * (lq_p + 2 * lk_p * nq + lq_p) * d * q.dtype.itemsize
            ),
            transcendentals=bh * lq_p * lk_p,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :lq, :]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_VMEM_BUDGET = 12 * 2 ** 20  # stay under the ~16M scoped-vmem limit


def _pick_blocks(lq: int, lk: int, block_q: int, block_k_major: int,
                 block_k: int, d: int = 64, itemsize: int = 2):
    """Clamp requested blocks to the 128-rounded sequence lengths (avoids
    gross padding when a block exceeds the sequence), then halve the q
    AND k-major blocks while that strictly reduces padding (floor 512):
    large blocks win only when they tile the sequence about as cleanly —
    e.g. 1536 stays 1536 at L=9216 (6 clean blocks) but drops to 768 at
    L=2304 (3 clean blocks instead of 2 blocks with 768 padded rows).
    The k-side shrink is round 3's honest-harness finding: at L=2304 the
    33%-padded 1536 k block measured 4.27 ms vs 3.03 ms for 768
    (+29% from eliminating masked-key passes).

    Finally, shrink blocks to a ~12M VMEM budget: at large head dims the
    default tiles blow the ~16M scoped-vmem limit (the VAE mid-block
    attention, d=512 fp32 at L=9216, needs ~19-25M at 1536 tiles —
    found by the round-3 e2e demo; budget model counts double-buffered
    operand tiles plus the f32 scratch)."""
    bq = min(block_q, _round_up(lq, 128))

    def pad_q(b: int) -> int:
        return -lq % b

    while bq // 2 >= 512 and pad_q(bq // 2) < pad_q(bq):
        bq //= 2
    bkm = min(block_k_major, _round_up(lk, 128))

    def pad_k(b: int) -> int:
        return -lk % b

    while bkm // 2 >= 512 and pad_k(bkm // 2) < pad_k(bkm):
        bkm //= 2

    aug = _aug_width(d)

    def vmem(bq_: int, bkm_: int) -> int:
        # q + out + 2x(k, v_aug) double-buffered, input dtype; acc + m
        # scratch in f32
        return (
            itemsize * (2 * bq_ * d + 2 * bkm_ * d + 2 * bkm_ * aug)
            + 4 * (bq_ * aug + bq_ * 128)
        )

    while vmem(bq, bkm) > _VMEM_BUDGET and max(bq, bkm) > 256:
        if bkm >= bq and bkm > 256:
            bkm //= 2
        else:
            bq //= 2
    bk = min(block_k, bkm)
    if bkm % bk != 0:
        bk = bkm
    return bq, bkm, bk


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 1536,
    block_k_major: int = 1536,
    block_k: int = 1536,
    static_max: bool | None = None,
) -> jax.Array:
    """Flash attention over (B, L, H, D) tensors (non-causal, no mask).

    PRECONDITION (static-max softmax, the default): logits must satisfy
    |q.k/sqrt(d)| <= ~69 (log2-logits within +-100). ``static_max=True``
    skips the running row-max and normalizes by a CONSTANT bound instead
    — exact within the clamp, but logits beyond it SATURATE rather than
    matching true softmax (only finiteness is guaranteed). Every in-repo
    caller feeds post-LayerNorm/GroupNorm activations whose logits sit
    well inside the clamp (measured |logit| < 30 across the UNet/DiT
    sites, docs/performance.md "static-max softmax"). Callers feeding
    UN-normalized activations must pass ``static_max=False`` (or set
    VDPP_FLASH_SOFTMAX=running) to get the classic running-max kernel.

    Default blocks are the measured v5e optimum at the dominant SVD site
    (L=9216: 1536/1536/1536 = 45.1 ms / 33.7 TFLOP/s vs 48.5 ms for the
    previous 512-row q block; scripts/bench_attention.py 2026-08-16);
    ``_pick_blocks`` shrinks the q block at lengths it would pad badly.

    Falls back to interpret mode off-TPU so the same code path is exercised
    by the CPU-mesh tests.
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    block_q, block_k_major, block_k = _pick_blocks(
        lq, lk, block_q, block_k_major, block_k, d, q.dtype.itemsize
    )
    interpret = jax.default_backend() != "tpu"

    qt = q.transpose(0, 2, 1, 3).reshape(b * h, lq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    # The env knobs must be part of the jit cache key (static args):
    # read inside the traced body they would pin the FIRST call's value
    # for every later call at the same shape.
    import os

    exp_bf16 = os.environ.get("VDPP_FLASH_EXP") == "bf16"
    if static_max is None:
        static_max = os.environ.get("VDPP_FLASH_SOFTMAX", "static") == "static"
    out = _flash_bhld(
        qt, kt, vt, block_q, block_k_major, block_k, interpret, exp_bf16,
        static_max,
    )
    return out.reshape(b, h, lq, d).transpose(0, 2, 1, 3)
