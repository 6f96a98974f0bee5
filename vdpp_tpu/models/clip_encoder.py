"""CLIP vision tower (ViT + projection) for image conditioning.

The reference encodes the conditioning image with a HF
``CLIPVisionModelWithProjection`` on CUDA
(reference: scripts/generate_video_demo.py:110-115). This is the
first-party functional JAX implementation of that tower (pre-norm ViT,
class token, learned position embeddings, post-LN pooled output, linear
projection) — SVD's checkpoint is the laion ViT-H/14 shape: width 1280,
32 layers, 16 heads, patch 14, projection 1024.

Also includes the CLIP preprocessing convention (shortest-edge resize,
center crop, rescale, mean/std normalize) so conditioning matches the
official pipeline's feature extractor.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vdpp_tpu.ops.attention import attention, init_attention
from vdpp_tpu.ops.linear import init_linear, linear
from vdpp_tpu.ops.normalization import init_layer_norm, layer_norm

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def vit_h_14(cls, dtype=jnp.float32) -> "CLIPVisionConfig":
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "CLIPVisionConfig":
        return cls(
            image_size=32, patch_size=8, hidden_size=32, num_layers=2,
            num_heads=2, projection_dim=16, dtype=dtype,
        )

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


from vdpp_tpu.models._common import FreshKeys as _Keys  # noqa: E402


class CLIPVisionEncoder:
    """init/apply for the vision tower; returns projected image embeds."""

    def __init__(self, config: CLIPVisionConfig | None = None):
        self.config = config or CLIPVisionConfig.vit_h_14()

    def init(self, key: jax.Array) -> dict:
        cfg = self.config
        kg = _Keys(key)
        d = cfg.hidden_size
        mlp = int(d * cfg.mlp_ratio)
        patch_dim = 3 * cfg.patch_size * cfg.patch_size
        params: dict = {
            # Patch embedding as a linear on flattened patches (equivalent
            # to the stride-p conv, and a single big MXU matmul on TPU).
            "patch_embed": init_linear(kg(), patch_dim, d, cfg.dtype, use_bias=False),
            "class_embed": jax.random.normal(kg(), (d,), cfg.dtype) * 0.02,
            "pos_embed": jax.random.normal(
                kg(), (cfg.num_patches + 1, d), cfg.dtype
            ) * 0.02,
            "pre_ln": init_layer_norm(d, cfg.dtype),
            "layers": [],
            "post_ln": init_layer_norm(d, cfg.dtype),
            "projection": init_linear(kg(), d, cfg.projection_dim, cfg.dtype,
                                       use_bias=False),
        }
        for _ in range(cfg.num_layers):
            params["layers"].append(
                {
                    "ln1": init_layer_norm(d, cfg.dtype),
                    "attn": init_attention(kg(), d, cfg.num_heads, dtype=cfg.dtype,
                                           qkv_bias=True),
                    "ln2": init_layer_norm(d, cfg.dtype),
                    "mlp_in": init_linear(kg(), d, mlp, cfg.dtype),
                    "mlp_out": init_linear(kg(), mlp, d, cfg.dtype),
                }
            )
        return params

    def apply(self, params: dict, pixels: jax.Array) -> jax.Array:
        """pixels (B, H, W, 3), preprocessed -> image embeds (B, projection_dim)."""
        cfg = self.config
        b, hh, ww, _ = pixels.shape
        p = cfg.patch_size
        x = pixels.astype(cfg.dtype)
        # (B, H/p, p, W/p, p, 3) -> (B, N, p*p*3)
        x = x.reshape(b, hh // p, p, ww // p, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (hh // p) * (ww // p), p * p * 3)
        x = linear(x, params["patch_embed"])
        cls_tok = jnp.broadcast_to(
            params["class_embed"][None, None, :], (b, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls_tok, x], axis=1) + params["pos_embed"][None]
        x = layer_norm(x, params["pre_ln"], cfg.layer_norm_eps)
        for lp in params["layers"]:
            h = layer_norm(x, lp["ln1"], cfg.layer_norm_eps)
            x = x + attention(h, lp["attn"], cfg.num_heads, use_flash=False)
            h = layer_norm(x, lp["ln2"], cfg.layer_norm_eps)
            h = linear(h, lp["mlp_in"])
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
            x = x + linear(h, lp["mlp_out"])
        pooled = layer_norm(x[:, 0], params["post_ln"], cfg.layer_norm_eps)
        return linear(pooled, params["projection"])


def preprocess_image(
    image: np.ndarray, size: int = 224
) -> np.ndarray:
    """CLIP preprocessing: shortest-edge resize (bicubic), center crop,
    rescale to [0,1], normalize with CLIP mean/std.

    Args:
        image: (H, W, 3) uint8 or float [0,255].
    Returns:
        (size, size, 3) float32.
    """
    from PIL import Image

    img = Image.fromarray(image.astype(np.uint8))
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize(
        (max(size, round(w * scale)), max(size, round(h * scale))),
        Image.Resampling.BICUBIC,
    )
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
