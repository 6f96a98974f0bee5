"""Plain-torch oracle for the video DiT (models/dit.py).

The SVD UNet family is pinned by hand-derived torch oracles
(tests/torch_svd_oracle.py) and CLIP/T5 by the real transformers
implementations; this gives the DiT family the same independent check:
the forward is re-derived in torch.nn.functional from the architecture
description alone, consuming the SAME parameter pytree (numpy views), so
any disagreement localizes a defect in one of the two implementations.

Covers both attention modes (factorized spatial/temporal alternation and
CogVideoX-style joint-3D), adaLN modulation, qkv-bias attention,
single/multi-key cross-attention, tanh-GELU MLPs, and the sinusoidal
position embeddings.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, np.float32))


def _linear(x: torch.Tensor, p: dict) -> torch.Tensor:
    y = x @ _t(p["w"])
    if "b" in p:
        y = y + _t(p["b"])
    return y


def _layer_norm(x: torch.Tensor, p: dict, eps: float = 1e-5) -> torch.Tensor:
    return F.layer_norm(x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]), eps)


def _sinusoidal(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    freqs = torch.exp(exponent)
    args = t[:, None].float() * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip sin->cos


def _timestep_mlp(x: torch.Tensor, p: dict) -> torch.Tensor:
    h = _linear(x, p["linear_1"])
    return _linear(F.silu(h), p["linear_2"])


def _attention(x: torch.Tensor, p: dict, heads: int,
               ctx: torch.Tensor | None = None) -> torch.Tensor:
    """(B, L, C) standard scaled-dot-product multi-head attention."""
    b, l, c = x.shape
    kv = x if ctx is None else ctx
    m = kv.shape[1]
    d = c // heads
    q = _linear(x, p["to_q"]).reshape(b, l, heads, d).permute(0, 2, 1, 3)
    k = _linear(kv, p["to_k"]).reshape(b, m, heads, d).permute(0, 2, 1, 3)
    v = _linear(kv, p["to_v"]).reshape(b, m, heads, d).permute(0, 2, 1, 3)
    out = F.scaled_dot_product_attention(q, k, v)
    out = out.permute(0, 2, 1, 3).reshape(b, l, c)
    return _linear(out, p["to_out"])


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _ada(c_emb: torch.Tensor, p: dict, n: int):
    ada = F.silu(c_emb) @ _t(p["w"]) + _t(p["b"])
    return torch.chunk(ada, n, dim=-1)


def _block(p: dict, x: torch.Tensor, c_emb: torch.Tensor,
           ctx: torch.Tensor | None, heads: int) -> torch.Tensor:
    sh1, sc1, g1, sh2, sc2, g2 = _ada(c_emb, p["ada"], 6)
    h = _modulate(_layer_norm(x, p["norm1"]), sh1, sc1)
    x = x + g1[:, None, :] * _attention(h, p["attn"], heads)
    if "cross_attn" in p and ctx is not None:
        h = _layer_norm(x, p["norm_cross"])
        x = x + _attention(h, p["cross_attn"], heads, ctx=ctx)
    h = _modulate(_layer_norm(x, p["norm2"]), sh2, sc2)
    h = _linear(h, p["mlp_in"])
    h = F.gelu(h, approximate="tanh")
    return x + g2[:, None, :] * _linear(h, p["mlp_out"])


def _temporal_block(p: dict, x: torch.Tensor, c_emb_b: torch.Tensor,
                    heads: int, batch: int, frames: int) -> torch.Tensor:
    """Frame-axis attention via the explicit (B*N, F, D) transpose the
    resident-layout implementation avoids."""
    bf, n, d = x.shape
    sh1, sc1, g1, sh2, sc2, g2 = (
        t.repeat_interleave(frames, dim=0) for t in _ada(c_emb_b, p["ada"], 6)
    )
    h = _modulate(_layer_norm(x, p["norm1"]), sh1, sc1)
    # (B*F, N, D) -> (B*N, F, D), frame attention, back
    hh = h.reshape(batch, frames, n, d).permute(0, 2, 1, 3).reshape(batch * n, frames, d)
    att = _attention(hh, p["attn"], heads)
    att = att.reshape(batch, n, frames, d).permute(0, 2, 1, 3).reshape(bf, n, d)
    x = x + g1[:, None, :] * att
    h = _modulate(_layer_norm(x, p["norm2"]), sh2, sc2)
    h = _linear(h, p["mlp_in"])
    h = F.gelu(h, approximate="tanh")
    return x + g2[:, None, :] * _linear(h, p["mlp_out"])


def dit_forward(params: dict, latent: np.ndarray, timestep: float,
                context: np.ndarray | None, cfg) -> np.ndarray:
    """Oracle forward: latent (B, F, H, W, C) -> (B, F, H, W, C_out)."""
    b, f, hh, ww, cch = latent.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    n = gh * gw
    d = cfg.hidden_size

    x = _t(latent)
    x = x.reshape(b * f, gh, p, gw, p, cch)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b * f, n, p * p * cch)
    x = _linear(x, params["patch_embed"])

    pos_s = _sinusoidal(torch.arange(n, dtype=torch.float32), d)
    pos_t = _sinusoidal(torch.arange(f, dtype=torch.float32), d)
    x = x + pos_s[None]

    t_emb = _sinusoidal(torch.full((b,), float(timestep)), 256)
    c_emb = _timestep_mlp(t_emb, params["t_embed"])  # (B, D)
    c_f = c_emb.repeat_interleave(f, dim=0)          # (B*F, D)

    ctx_b = _t(context) if context is not None else None
    ctx_f = ctx_b.repeat_interleave(f, dim=0) if ctx_b is not None else None

    if cfg.attention_mode == "joint3d":
        x = (x.reshape(b, f, n, d) + pos_t[None, :, None, :]).reshape(b, f * n, d)
        for blk in params["blocks"]:
            x = _block(blk, x, c_emb, ctx_b, cfg.num_heads)
        sh, sc = _ada(c_emb, params["final_ada"], 2)
        x = _modulate(_layer_norm(x, params["final_norm"]), sh, sc)
        x = _linear(x, params["final_proj"])
        x = x.reshape(b * f, n, -1)
    else:
        first_temporal = True
        for i, blk in enumerate(params["blocks"]):
            if i % 2 == 0:
                x = _block(blk, x, c_f, ctx_f, cfg.num_heads)
            else:
                if first_temporal:
                    x = (x.reshape(b, f, n, d) + pos_t[None, :, None, :]).reshape(
                        b * f, n, d
                    )
                    first_temporal = False
                x = _temporal_block(blk, x, c_emb, cfg.num_heads, b, f)
        sh, sc = _ada(c_f, params["final_ada"], 2)
        x = _modulate(_layer_norm(x, params["final_norm"]), sh, sc)
        x = _linear(x, params["final_proj"])

    x = x.reshape(b * f, gh, gw, p, p, cfg.out_channels)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, f, hh, ww, cfg.out_channels)
    return x.numpy()
