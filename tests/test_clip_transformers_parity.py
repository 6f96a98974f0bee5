"""CLIP vision tower golden test against the REAL transformers library.

Unlike the UNet/VAE (whose torch oracles in tests/torch_svd_oracle.py are
re-derived by hand because diffusers is absent), ``transformers`` IS
installed here — so the CLIP encoder and its checkpoint converter are
validated against the genuine third-party implementation the reference
uses (reference: scripts/generate_video_demo.py:110-115 loads
``CLIPVisionModelWithProjection``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vdpp_tpu.models.clip_encoder import CLIPVisionConfig, CLIPVisionEncoder
from vdpp_tpu.utils.weights import convert_clip_state_dict


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = HFConfig(
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=int(cfg.hidden_size * cfg.mlp_ratio),
        projection_dim=cfg.projection_dim,
        hidden_act="gelu",  # laion ViT-H/14 (the SVD image encoder) uses gelu
        layer_norm_eps=cfg.layer_norm_eps,
    )
    torch.manual_seed(0)
    hf_model = CLIPVisionModelWithProjection(hf_cfg).eval()

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_clip_state_dict(
        sd, num_layers=cfg.num_layers, patch_size=cfg.patch_size
    )
    return cfg, hf_model, CLIPVisionEncoder(cfg), params


def test_image_embeds_match_transformers(hf_and_ours):
    cfg, hf_model, enc, params = hf_and_ours
    rng = np.random.default_rng(1)
    px = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )

    with torch.no_grad():
        want = hf_model(
            pixel_values=torch.from_numpy(px).permute(0, 3, 1, 2)
        ).image_embeds.numpy()

    got = np.asarray(enc.apply(params, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_converter_covers_all_transformers_keys(hf_and_ours):
    cfg, hf_model, enc, params = hf_and_ours
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    converted_keys = set()

    class Recorder(dict):
        def __getitem__(self, k):
            converted_keys.add(k)
            return sd[k]

        def __contains__(self, k):
            return k in sd

    convert_clip_state_dict(
        Recorder(), num_layers=cfg.num_layers, patch_size=cfg.patch_size
    )
    missed = set(sd) - converted_keys
    # position_ids is a non-parameter buffer in some transformers versions
    missed = {k for k in missed if not k.endswith("position_ids")}
    assert not missed, f"converter ignored checkpoint keys: {sorted(missed)}"
