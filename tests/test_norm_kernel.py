"""Fused GroupNorm(+SiLU) Pallas kernel vs the XLA composition.

Runs the kernel in interpret mode on the CPU mesh (the conftest forces
CPU), same as the flash-attention tests — identical kernel code to what
executes on TPU. Tolerances: the kernel applies SiLU to the fp32
normalized value BEFORE the bf16 output rounding, while the XLA
composition rounds GroupNorm to bf16 first, so GN+SiLU can differ by one
bf16 ULP at the output magnitude; bare GroupNorm matches to fp32 noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vdpp_tpu.ops.norm_kernel import _row_chunk, group_norm_silu_fused
from vdpp_tpu.ops.normalization import group_norm, init_group_norm


def _params(c, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "scale": jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2
                             + 1.0),
        "bias": jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1),
    }


@pytest.mark.parametrize(
    "shape,groups",
    [
        ((2, 24, 64), 32),
        ((3, 40, 128), 32),
        ((2, 8, 16, 320), 32),   # 4-D channels-last, like UNet activations
        ((1, 16, 48), 8),
        ((2, 64, 256), 32),
    ],
)
def test_fused_gn_silu_matches_xla(shape, groups):
    c = shape[-1]
    p = _params(c)
    x = (jax.random.normal(jax.random.key(1), shape, jnp.float32) * 3.0
         ).astype(jnp.bfloat16)

    ref = group_norm(x, p, groups, 1e-6)
    ref_silu = jax.nn.silu(ref.astype(jnp.float32)).astype(x.dtype)

    got = group_norm_silu_fused(x, p, groups, 1e-6, silu=True)
    assert got.shape == shape and got.dtype == x.dtype
    # one bf16 ULP at the observed output magnitude
    ulp = float(np.spacing(np.abs(ref_silu.astype(np.float32)).max(),
                           dtype=np.float32)) * 2 ** 16
    np.testing.assert_allclose(
        got.astype(np.float32), ref_silu.astype(np.float32), atol=ulp)

    # Bare GN: Welford chunk-merge order differs from XLA's two-pass
    # reduction, so borderline bf16 roundings can flip — same ULP bound.
    bare = group_norm_silu_fused(x, p, groups, 1e-6, silu=False)
    np.testing.assert_allclose(
        bare.astype(np.float32), ref.astype(np.float32), atol=ulp)


def test_fused_gn_matches_torch():
    """Direct torch.nn.GroupNorm oracle in fp32 (no bf16 rounding)."""
    rng = np.random.default_rng(2)
    b, s, c, g = 2, 48, 64, 16
    x = rng.standard_normal((b, s, c)).astype(np.float32)
    p = _params(c, seed=3)

    got = group_norm_silu_fused(
        jnp.asarray(x), p, g, 1e-5, silu=True).astype(jnp.float32)

    gn = torch.nn.GroupNorm(g, c, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        gn.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        # torch GroupNorm is channels-first over (B, C, *)
        ref = torch.nn.functional.silu(
            gn(torch.from_numpy(x).permute(0, 2, 1))).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_fused_gn_welford_stability_large_offset():
    """Statistics must hold up with a large common-mode offset — the case
    the one-pass E[x^2]-mean^2 shortcut fails (normalization.py keeps the
    two-pass form for the same reason)."""
    shape, c = (2, 64, 128), 128
    p = _params(c)
    x = (jax.random.normal(jax.random.key(4), shape) + 64.0
         ).astype(jnp.float32)
    ref = group_norm(x, p, 32, 1e-6)
    got = group_norm_silu_fused(x, p, 32, 1e-6, silu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_unet_matches_unfused():
    """cfg.fused_groupnorm routes every GN->SiLU pair in the SVD UNet
    through the kernel; the full forward must match the XLA composition
    (fp32 tiny config: only Welford merge-order noise)."""
    import dataclasses

    from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig

    cfg = SVDUNetConfig.tiny()
    unet = SVDUNet(cfg)
    params = unet.init(jax.random.key(0))
    b, f, h, w = 1, 3, 16, 16
    x = jax.random.normal(jax.random.key(2), (b, f, h, w, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(3), (b, 1, cfg.cross_attention_dim))
    tids = jnp.zeros((b, 3))
    ref = unet.apply(params, x, jnp.float32(1.0), ctx, tids)

    fused_unet = SVDUNet(dataclasses.replace(cfg, fused_groupnorm=True))
    got = fused_unet.apply(params, x, jnp.float32(1.0), ctx, tids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_group_norm_silu_dispatch_fallbacks():
    """The dispatch helper silently keeps the XLA composition for sharded
    statistics and non-8-aligned rows, so callers never shape-case."""
    from vdpp_tpu.ops.normalization import group_norm_silu

    p = _params(64)
    # 12 rows: no 8-aligned divisor -> must NOT raise, takes unfused path.
    x = jax.random.normal(jax.random.key(5), (2, 12, 64))
    ref = jax.nn.silu(group_norm(x, p, 8, 1e-6).astype(jnp.float32))
    got = group_norm_silu(x, p, 8, 1e-6, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_rejects_intra_sample_sharding():
    """fused_groupnorm x seq/frame axes would silently break the
    sharded-equals-unsharded elementwise invariant (psum sites fall back
    to two-pass stats while the oracle takes the Welford kernel), so
    apply() must reject the combination up front."""
    import dataclasses

    import pytest

    from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig

    cfg = dataclasses.replace(SVDUNetConfig.tiny(), fused_groupnorm=True)
    unet = SVDUNet(cfg)
    params = unet.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(2), (1, 2, 16, 16, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(3), (1, 1, cfg.cross_attention_dim))
    tids = jnp.zeros((1, 3))
    with pytest.raises(ValueError, match="fused_groupnorm is incompatible"):
        unet.apply(params, x, jnp.float32(1.0), ctx, tids, seq_axis="seq")
    with pytest.raises(ValueError, match="fused_groupnorm is incompatible"):
        unet.apply(params, x, jnp.float32(1.0), ctx, tids, frame_axis="frame")


def test_row_chunk_picker():
    import inspect

    # 9216 rows x 320 ch fp32: full row is ~11.8 MB, must chunk
    ch = _row_chunk(9216, 320)
    assert ch is not None and 9216 % ch == 0 and ch % 8 == 0
    # The picker's default budget bounds the Mosaic scoped-VMEM STACK:
    # the stats phase holds ~4 fp32 chunk temporaries, and the 16 MiB
    # scoped limit overflowed at the real 960-channel shape under the old
    # 4 MiB per-temporary budget (norm_kernel.py:_row_chunk docstring,
    # real-chip A/B 2026-08-19). Pin the shipped default and the stack
    # reasoning so a budget regression past 2 MiB fails here.
    default_budget = inspect.signature(_row_chunk).parameters[
        "budget_bytes"
    ].default
    assert default_budget == 2 << 20
    assert ch * 320 * 4 <= default_budget
    assert ch * 320 * 4 * 4 <= 16 << 20  # 4 temporaries under scoped VMEM
    # the 960-channel real-UNet shape that overflowed must stay bounded too
    ch960 = _row_chunk(9216, 960)
    assert ch960 is not None and ch960 * 960 * 4 <= default_budget
    # tiny rows fit whole
    assert _row_chunk(24, 64) == 24
    # no 8-aligned divisor
    assert _row_chunk(12, 64) is None


def test_fused_gn_rejects_bad_shapes():
    p = _params(64)
    x = jnp.zeros((2, 24, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="not divisible"):
        group_norm_silu_fused(x, p, num_groups=48)
    x2 = jnp.zeros((2, 12, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="8-aligned"):
        group_norm_silu_fused(x2, p, num_groups=32)
