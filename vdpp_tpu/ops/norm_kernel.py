"""Fused GroupNorm(+SiLU) as a single Pallas kernel.

The roofline case for fusing: XLA lowers ``silu(group_norm(x))`` into
four HBM passes over the activation — the mean reduce, the dependent
variance reduce, and the normalize+affine+SiLU consumer (3 reads +
1 write; the two reductions cannot fuse because the second consumes the
first's result). This kernel streams the tensor twice instead: a
statistics pass that merges per-chunk Welford partials in a VMEM scratch
that persists across grid steps, then a normalize pass — 2 reads +
1 write, a 4:3 traffic reduction at identical fp32-statistics accuracy
(parallel Welford merging is as stable as the two-pass form; the one-pass
E[x^2]-mean^2 shortcut was measured to cost ~2e-4 CFG-amplified error,
normalization.py:58-60, and is NOT used here).

Group sums ride the MXU as a (rows, C) x (C, G) matmul with a
group-indicator matrix, avoiding sub-lane reshapes of the
(…, G, C/G) form.

This is the "GroupNorm/SiLU fusion via a Pallas kernel" lever from
docs/performance.md "Levers not yet pulled"; scripts/exp_groupnorm.py
measures it against the XLA path on the real chip (reference analogue:
the reference profiles block-level costs in docs/performance_analysis.md
but writes no kernels — it inherits torch's fused GroupNorm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_chunk(s: int, c: int, budget_bytes: int = 2 << 20) -> int | None:
    """Largest divisor of ``s`` that is a multiple of 8 (fp32 sublane tile)
    and keeps a (chunk, C) fp32 temporary under ``budget_bytes``.

    The budget bounds the Mosaic scoped-VMEM *stack*, not just the block:
    the stats phase materializes ~4 fp32 temporaries of the chunk (xf, d,
    d*d, and dot outputs), so a 4 MiB per-temporary budget overflowed the
    16 MiB scoped limit by ~0.5 MiB at the real 960-channel UNet shape
    (chunk 1024: "Ran out of memory in memory space vmem ... allocating
    on stack", real-chip A/B 2026-08-19). 2 MiB keeps the stack near
    ~8 MiB at worst."""
    best = None
    for chunk in range(8, s + 1, 8):
        if s % chunk == 0 and chunk * c * 4 <= budget_bytes:
            best = chunk
    return best


def _gn_silu_kernel(
    x_ref, g_ref, gt_ref, w_ref, b_ref, o_ref, stat_ref,
    *, n_chunk: float, eps: float, silu: bool, num_groups: int,
):
    """Grid (B, 2, NS), iterated batch-major with the chunk axis fastest.

    phase 0 (stats): merge this chunk's (mean, M2) into the running
    Welford partials held in ``stat_ref`` (rows 0/1), which persists
    across grid steps; reset at chunk 0.
    phase 1 (normalize): fold the finished statistics into one
    multiply-add per element (+ optional SiLU) and write the chunk.
    """
    phase = pl.program_id(1)
    j = pl.program_id(2)
    gmat = g_ref[...]                                   # (C, G) fp32
    gt = gt_ref[...]                                    # (G, C)
    g = num_groups

    @pl.when(phase == 0)
    def _stats():
        xf = x_ref[0].astype(jnp.float32)               # (chunk, C)
        s1 = jnp.sum(jnp.dot(xf, gmat, preferred_element_type=jnp.float32),
                     axis=0, keepdims=True)             # (1, G)
        mean_c = s1 / n_chunk
        d = xf - jnp.dot(mean_c, gt, preferred_element_type=jnp.float32)
        m2_c = jnp.sum(jnp.dot(d * d, gmat,
                               preferred_element_type=jnp.float32),
                       axis=0, keepdims=True)

        @pl.when(j == 0)
        def _init():
            stat_ref[0:1, :g] = mean_c
            stat_ref[1:2, :g] = m2_c

        @pl.when(j > 0)
        def _merge():
            # Parallel Welford: merge (n_prev, mean, M2) with the chunk's
            # (n_chunk, mean_c, M2_c). n_prev = j * n_chunk.
            n_prev = j.astype(jnp.float32) * n_chunk
            tot = n_prev + n_chunk
            mean = stat_ref[0:1, :g]
            delta = mean_c - mean
            stat_ref[0:1, :g] = mean + delta * (n_chunk / tot)
            stat_ref[1:2, :g] = (
                stat_ref[1:2, :g] + m2_c
                + delta * delta * (n_prev * n_chunk / tot)
            )

    @pl.when(phase == 1)
    def _normalize():
        n_total = float(pl.num_programs(2)) * n_chunk
        mean_ch = jnp.dot(stat_ref[0:1, :g], gt,
                          preferred_element_type=jnp.float32)   # (1, C)
        inv = jax.lax.rsqrt(stat_ref[1:2, :g] / n_total + eps)
        inv_ch = jnp.dot(inv, gt, preferred_element_type=jnp.float32)
        # Affine folded into one multiply-add: y = x*a + b.
        a = inv_ch * w_ref[...].astype(jnp.float32)
        b = b_ref[...].astype(jnp.float32) - mean_ch * a
        y = x_ref[0].astype(jnp.float32) * a + b
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "silu", "interpret")
)
def group_norm_silu_fused(
    x: jax.Array,
    params: dict,
    num_groups: int = 32,
    eps: float = 1e-6,
    silu: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused ``silu(group_norm(x, params))`` (or bare GroupNorm when
    ``silu=False``) over the trailing channel axis of a channels-last
    tensor, streaming the activation twice instead of XLA's four passes.

    ``x``: (B, ..., C); statistics per (batch row, group) over all middle
    axes — identical contract to ``normalization.group_norm`` with
    ``psum_axis=None``. Falls back to interpret mode off-TPU so tests
    exercise the same kernel on the CPU mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = x.shape[0]
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    orig_shape = x.shape
    x3 = x.reshape(b, -1, c)
    s = x3.shape[1]
    chunk = _row_chunk(s, c)
    if chunk is None:
        raise ValueError(
            f"rows {s} have no 8-aligned divisor fitting the VMEM budget; "
            "pad the spatial extent or use normalization.group_norm"
        )
    gsize = c // num_groups
    gmat = (
        jnp.arange(c)[:, None] // gsize == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)

    kernel = functools.partial(
        _gn_silu_kernel,
        n_chunk=float(chunk * gsize),
        eps=eps,
        silu=silu,
        num_groups=num_groups,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, 2, s // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, p, j: (i, j, 0)),
            pl.BlockSpec((c, num_groups), lambda i, p, j: (0, 0)),
            pl.BlockSpec((num_groups, c), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
        ],
        # p*j pins every phase-0 step to block (i, 0): the block index only
        # advances during phase 1, so Pallas copies each output window out
        # exactly once (a phase-oblivious (i, j) map would flush the
        # never-written buffer once per stats chunk — write traffic x2).
        # The phase-0-resident (i, 0) buffer is overwritten by phase 1's
        # j=0 step before its first flush, so no garbage ever lands.
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, p, j: (i, p * j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        scratch_shapes=[
            # rows 0/1 = running Welford (mean, M2); persists across the
            # grid, reset at (phase 0, chunk 0) of every batch row.
            pltpu.VMEM((8, max(num_groups, 128)), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * s * c,
            bytes_accessed=3 * b * s * c * x.dtype.itemsize,
            transcendentals=b * s * c if silu else 0,
        ),
        interpret=interpret,
    )(x3, gmat, gmat.T, params["scale"].reshape(1, c),
      params["bias"].reshape(1, c))
    return out.reshape(orig_shape)
