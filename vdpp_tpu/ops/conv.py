"""Convolutions in channels-last layouts (the TPU-native conv layout).

Spatial convs run per-frame on (N, H, W, C); temporal convs run on
(B, F, H, W, C) with a (k,1,1) kernel over the frame axis — the layout
XLA tiles best onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_conv2d(
    key: jax.Array, in_ch: int, out_ch: int, kernel: int = 3, dtype=jnp.float32
) -> dict:
    """HWIO kernel, LeCun-normal."""
    fan_in = in_ch * kernel * kernel
    w = jax.random.normal(key, (kernel, kernel, in_ch, out_ch), jnp.float32) / jnp.sqrt(
        fan_in
    )
    return {"w": w.astype(dtype), "b": jnp.zeros((out_ch,), dtype)}


def _kernel_in(params: dict, dtype) -> jax.Array:
    """Conv kernel in compute dtype; accepts the int8 weight-only form."""
    from vdpp_tpu.ops.quant import weight_for

    return weight_for(params, dtype)


def _im2col_int8_gemm(
    qp: jax.Array, wq: dict, stride: int, ho: int, wo: int
) -> jax.Array:
    """int8 x int8 -> int32 GEMM over im2col patches of an already-padded
    int8 input ``qp``. Returns (N, Ho, Wo, Cout) int32."""
    kh, kw, cin, cout = wq["q8"].shape
    # (i, j)-major patch order matches the HWIO kernel's reshape order.
    cols = [
        qp[
            :,
            i : i + (ho - 1) * stride + 1 : stride,
            j : j + (wo - 1) * stride + 1 : stride,
            :,
        ]
        for i in range(kh)
        for j in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (N, Ho, Wo, kh*kw*Cin) int8
    return jax.lax.dot_general(
        patches,
        wq["q8"].reshape(kh * kw * cin, cout),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _conv2d_int8(
    x: jax.Array, params: dict, stride: int, padding,
    amax_axes: tuple[str, ...] = (),
) -> jax.Array:
    """W8A8 spatial conv: per-tensor activation quantization, explicit
    im2col, then an int8 x int8 -> int32 GEMM.

    XLA's conv EMITTER does not use the double-rate int8 MXU path (an
    int8 ``lax.conv`` measured 1.02x bf16), but int8 ``dot_general`` at
    the im2col shape measured 1.51-1.71x (docs/performance.md "int8 MXU
    probe") — so the a8 conv is formulated as the GEMM directly. The
    activation is quantized BEFORE patch extraction so the kh*kw-fold
    patch duplication copies int8 bytes, which forces one per-tensor
    scale (exactness vs the dequant conv is bounded by that scale's
    granularity; oracle-equality pipelined-vs-single-device still holds
    because both sides trace the same program).

    ``amax_axes``: mesh axes sharding x's elements (e.g. the frame axis
    when spatial convs run frame-locally inside shard_map) — the
    activation scale is pmax'd over them so it matches the global scale
    the unsharded program derives (quantize_activation docstring).
    """
    from vdpp_tpu.ops.quant import quantize_activation

    wq = params["w"]
    kh, kw, _, _ = wq["q8"].shape
    n, h, w, _ = x.shape
    q, ascale = quantize_activation(x, per_row=False, pmax_axes=amax_axes)
    if padding == "SAME":
        ho, wo = -(-h // stride), -(-w // stride)
        ph = max((ho - 1) * stride + kh - h, 0)
        pw = max((wo - 1) * stride + kw - w, 0)
        pads = (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)
    elif padding == "VALID":
        ho, wo = (h - kh) // stride + 1, (w - kw) // stride + 1
        pads = (0, 0), (0, 0)
    else:  # explicit ((lo, hi), (lo, hi)) as lax.conv takes it
        (phl, phh), (pwl, pwh) = padding
        ho = (h + phl + phh - kh) // stride + 1
        wo = (w + pwl + pwh - kw) // stride + 1
        pads = (phl, phh), (pwl, pwh)
    qp = jnp.pad(q, ((0, 0), pads[0], pads[1], (0, 0)))
    y = _im2col_int8_gemm(qp, wq, stride, ho, wo)
    y = y.astype(jnp.float32) * ascale * wq["scale"]
    return (y + params["b"].astype(jnp.float32)).astype(x.dtype)


def conv2d(
    x: jax.Array, params: dict, stride: int = 1, padding="SAME",
    amax_axes: tuple[str, ...] = (),
) -> jax.Array:
    """2-D conv, NHWC. fp32 accumulation on the MXU, output in x.dtype.
    a8-marked int8 weights route to the im2col int8 GEMM form.
    ``amax_axes``: mesh axes sharding x (a8 path only — global activation
    scale; see _conv2d_int8)."""
    w = params["w"]
    if isinstance(w, dict) and "q8" in w:
        return _conv2d_int8(x, params, stride, padding, amax_axes)
    y = jax.lax.conv_general_dilated(
        x,
        _kernel_in(params, x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + params["b"].astype(jnp.float32)).astype(x.dtype)


def _conv2d_int8_halo(
    x: jax.Array, params: dict, seq_axis: str, stride: int,
    amax_axes: tuple[str, ...],
) -> jax.Array:
    """W8A8 form of ``conv2d_halo``: quantize with the mesh-GLOBAL
    per-tensor scale (pmax over ``seq_axis`` + any other sharding axes),
    halo-exchange the INT8 shard (4x cheaper on ICI than the float halo),
    then run the same im2col int8 GEMM as ``_conv2d_int8``.

    Because the scale is global, every shard quantizes identically, the
    exchanged halo columns carry the neighbors' exact int8 values, and the
    ppermute zero-fill at the chain ends equals the unsharded program's
    zero padding (0 quantizes to 0) — so given BIT-EQUAL inputs the int32
    GEMM results are bit-identical to the unsharded ``_conv2d_int8``
    (tests/test_quant.py bitexact op tests). End-to-end, the sharded
    model's psum'd norm statistics / gathered attention differ from the
    unsharded program at the ~1-ulp level, and dynamic quantization can
    turn such a difference at a rounding boundary into a full
    quantization-step flip — so full-model W8A8 x seq/frame parity is
    quantization-noise bounded, not elementwise (same test module)."""
    from vdpp_tpu.ops.quant import quantize_activation

    wq = params["w"]
    kh, kw, _, _ = wq["q8"].shape
    n, h, wl, _ = x.shape
    axes = (seq_axis,) + tuple(a for a in amax_axes if a != seq_axis)
    q, ascale = quantize_activation(x, per_row=False, pmax_axes=axes)
    qh = _halo_exchange(q, seq_axis, axis=2, halo=1)
    qp = jnp.pad(qh, ((0, 0), (1, 1), (0, 0), (0, 0)))
    ho = (h + 2 - kh) // stride + 1
    wo = (wl + 2 - kw) // stride + 1
    y = _im2col_int8_gemm(qp, wq, stride, ho, wo)
    y = y.astype(jnp.float32) * ascale * wq["scale"]
    return (y + params["b"].astype(jnp.float32)).astype(x.dtype)


def conv2d_halo(
    x: jax.Array, params: dict, seq_axis: str, stride: int = 1,
    amax_axes: tuple[str, ...] = (),
) -> jax.Array:
    """3x3 conv on an input whose W axis is sharded over ``seq_axis``.

    Must run inside ``shard_map``; ``x`` is the local (N, H, W_local, C)
    shard of contiguous global columns. Each device exchanges ONE edge
    column with each neighbor (two ``ppermute``s riding ICI) — the halo a
    3x3 kernel needs — then convolves with no W padding. ``ppermute``
    zero-fills targets no source covers, which IS the global SAME zero
    padding at the outer edges, so no masking is needed.

    stride=2 (the downsample site) stays aligned because every level's
    W_local is even: local window starts map exactly onto the global
    stride grid. Elementwise-equal to the unsharded ``conv2d`` (enforced
    in tests/test_sequence_parallel.py).

    a8-marked int8 weights route to ``_conv2d_int8_halo`` (the sharded
    W8A8 path — same int8 GEMM, mesh-global activation scale); weight-only
    int8 dequantizes identically on every shard, so both quantized forms
    preserve the oracle-equality invariant.
    """
    w = params["w"]
    if isinstance(w, dict) and "q8" in w:
        return _conv2d_int8_halo(x, params, seq_axis, stride, amax_axes)
    xh = _halo_exchange(x, seq_axis, axis=2, halo=1)
    y = jax.lax.conv_general_dilated(
        xh,
        _kernel_in(params, x.dtype),
        window_strides=(stride, stride),
        padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + params["b"].astype(jnp.float32)).astype(x.dtype)


def _halo_exchange(x: jax.Array, axis_name: str, axis: int, halo: int) -> jax.Array:
    """Concatenate each neighbor's ``halo`` edge slices along ``axis``
    (two one-hop ``ppermute``s). ``ppermute`` zero-fills targets no source
    covers, which IS the global SAME zero padding at the chain ends."""
    n = jax.lax.psum(1, axis_name)
    send_right = [(i, i + 1) for i in range(n - 1)]
    send_left = [(i + 1, i) for i in range(n - 1)]
    lo = [slice(None)] * x.ndim
    hi = [slice(None)] * x.ndim
    lo[axis] = slice(None, halo)
    hi[axis] = slice(-halo, None)
    from_left = jax.lax.ppermute(x[tuple(hi)], axis_name, send_right)
    from_right = jax.lax.ppermute(x[tuple(lo)], axis_name, send_left)
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def init_conv_temporal(
    key: jax.Array, in_ch: int, out_ch: int, kernel: int = 3, dtype=jnp.float32
) -> dict:
    """(k,1,1) temporal kernel in DHWIO layout."""
    fan_in = in_ch * kernel
    w = jax.random.normal(key, (kernel, 1, 1, in_ch, out_ch), jnp.float32) / jnp.sqrt(
        fan_in
    )
    return {"w": w.astype(dtype), "b": jnp.zeros((out_ch,), dtype)}


def conv_temporal_halo(x: jax.Array, params: dict, frame_axis: str) -> jax.Array:
    """Temporal conv on an input whose FRAME axis is sharded over
    ``frame_axis`` (frame parallelism, the temporal analogue of
    ``conv2d_halo``).

    Must run inside ``shard_map``; ``x`` is the local (B, F_local, H, W, C)
    shard of contiguous global frames. Each device exchanges ``(k-1)//2``
    edge frames with each neighbor via two ``ppermute``s; zero-fill at the
    chain ends IS the global SAME padding, so the conv then runs with no
    frame padding. Elementwise-equal to the unsharded ``conv_temporal``
    (enforced in tests/test_frame_parallel.py)."""
    from vdpp_tpu.ops.quant import _qtensor

    w = params["w"]
    if isinstance(w, dict) and "q8" in w:
        # quantize_tree never a8-marks 5-D temporal kernels (their emitter
        # has no int8 fast path) — refuse a hand-marked one rather than
        # silently dequantizing an activation-quantization request.
        raise NotImplementedError(
            "a8 (W8A8) temporal convs are not implemented; use weight-only "
            "int8 for temporal kernels"
        )
    k = (_qtensor(w) if isinstance(w, dict) else w).shape[0]
    if k % 2 == 0:
        # conv_temporal's symmetric (k-1)//2 SAME padding shrinks even-k
        # outputs globally; the per-shard halo form cannot reproduce that
        raise ValueError(f"conv_temporal_halo requires odd kernel, got {k}")
    halo = (k - 1) // 2
    if halo == 0:
        return conv_temporal(x, params)
    if x.shape[1] < halo:
        # one-hop ppermute reaches only the adjacent shard
        raise ValueError(
            f"local frame shard {x.shape[1]} smaller than the kernel halo "
            f"{halo}"
        )
    xh = _halo_exchange(x, frame_axis, axis=1, halo=halo)
    y = jax.lax.conv_general_dilated(
        xh,
        _kernel_in(params, x.dtype),
        window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + params["b"].astype(jnp.float32)).astype(x.dtype)


def conv_temporal(x: jax.Array, params: dict) -> jax.Array:
    """Temporal conv over the frame axis of (B, F, H, W, C), SAME padding."""
    from vdpp_tpu.ops.quant import _qtensor

    w = params["w"]
    if isinstance(w, dict) and "q8" in w:
        # same guard as conv_temporal_halo: no silent a8 -> float dequant
        raise NotImplementedError(
            "a8 (W8A8) temporal convs are not implemented; use weight-only "
            "int8 for temporal kernels"
        )
    k = (_qtensor(w) if isinstance(w, dict) else w).shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        _kernel_in(params, x.dtype),
        window_strides=(1, 1, 1),
        padding=((pad, pad), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + params["b"].astype(jnp.float32)).astype(x.dtype)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x spatial upsample of (N, H, W, C)."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)
