"""CLIP vision tower tests (tiny config) + preprocessing conventions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.clip_encoder import (
    CLIP_MEAN,
    CLIP_STD,
    CLIPVisionConfig,
    CLIPVisionEncoder,
    preprocess_image,
)


@pytest.fixture(scope="module")
def enc():
    cfg = CLIPVisionConfig.tiny()
    e = CLIPVisionEncoder(cfg)
    return cfg, e, e.init(jax.random.key(0))


def test_output_shape(enc):
    cfg, e, params = enc
    px = jax.random.normal(jax.random.key(1), (2, cfg.image_size, cfg.image_size, 3))
    emb = e.apply(params, px)
    assert emb.shape == (2, cfg.projection_dim)
    assert bool(jnp.all(jnp.isfinite(emb)))


def test_image_sensitivity(enc):
    cfg, e, params = enc
    a = jax.random.normal(jax.random.key(2), (1, cfg.image_size, cfg.image_size, 3))
    ea = e.apply(params, a)
    eb = e.apply(params, a + 0.5)
    assert not np.allclose(np.asarray(ea), np.asarray(eb))


def test_vit_h_14_shape_budget():
    cfg = CLIPVisionConfig.vit_h_14()
    enc = CLIPVisionEncoder(cfg)
    shapes = jax.eval_shape(lambda k: enc.init(k), jax.random.key(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    # laion ViT-H/14 vision tower ~630M params.
    assert 5.5e8 < n < 7.5e8, f"{n/1e6:.0f}M"


def test_preprocess_shape_and_range():
    img = (np.random.default_rng(0).random((300, 400, 3)) * 255).astype(np.uint8)
    out = preprocess_image(img, size=224)
    assert out.shape == (224, 224, 3)
    # normalized: roughly zero-centered, bounded by (1-mean)/std
    assert out.min() >= (0 - max(CLIP_MEAN)) / min(CLIP_STD) - 1e-5
    assert out.max() <= (1 - min(CLIP_MEAN)) / min(CLIP_STD) + 1e-5


def test_preprocess_small_image_upscales():
    img = np.zeros((100, 50, 3), np.uint8)
    out = preprocess_image(img, size=224)
    assert out.shape == (224, 224, 3)
