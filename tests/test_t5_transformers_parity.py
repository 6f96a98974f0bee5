"""T5 text encoder golden test against the REAL transformers library.

``transformers`` is installed in this environment, so the first-party T5
encoder (models/t5_encoder.py) and its checkpoint converter are validated
against the genuine ``T5EncoderModel`` — both FF variants (v1.1
gated-GELU, the CogVideoX text-encoder shape, and the original ReLU form),
with and without padding masks."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vdpp_tpu.models.t5_encoder import T5EncoderConfig, T5TextEncoder
from vdpp_tpu.utils.weights import convert_t5_encoder_state_dict


def _build(ff_proj: str):
    from transformers import T5Config as HFConfig
    from transformers import T5EncoderModel

    cfg = T5EncoderConfig.tiny()
    if ff_proj == "relu":
        cfg = T5EncoderConfig.tiny().__class__(
            **{**cfg.__dict__, "feed_forward_proj": "relu"}
        )
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_buckets,
        relative_attention_max_distance=cfg.relative_max_distance,
        feed_forward_proj="gated-gelu" if ff_proj == "gated-gelu" else "relu",
        layer_norm_epsilon=cfg.layer_norm_eps,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_t5_encoder_state_dict(
        sd, num_layers=cfg.num_layers, gated=ff_proj == "gated-gelu"
    )
    return cfg, hf, T5TextEncoder(cfg), params


@pytest.mark.parametrize("ff_proj", ["gated-gelu", "relu"])
def test_hidden_states_match_transformers(ff_proj):
    cfg, hf, enc, params = _build(ff_proj)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (2, 11)).astype(np.int32)

    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids).long()).last_hidden_state.numpy()

    got = np.asarray(enc.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_padding_mask_matches_transformers():
    cfg, hf, enc, params = _build("gated-gelu")
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[0, 6:] = 0
    mask[1, 4:] = 0

    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()

    got = np.asarray(enc.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    # Compare only non-padded positions (HF zeroes nothing; outputs at
    # padded queries differ only through their own row, which is unused).
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], want[b, :n], atol=3e-5, rtol=1e-4)


def test_converter_covers_all_transformers_keys():
    cfg, hf, enc, params = _build("gated-gelu")
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    seen = set()

    class Recorder(dict):
        def __getitem__(self, k):
            seen.add(k)
            return sd[k]

        def __contains__(self, k):
            return k in sd

    convert_t5_encoder_state_dict(Recorder(), num_layers=cfg.num_layers, gated=True)
    missed = set(sd) - seen
    missed = {
        k
        for k in missed
        # embed_tokens.weight is tied to shared.weight in HF
        if not k.endswith("embed_tokens.weight")
    }
    assert not missed, f"converter ignored checkpoint keys: {sorted(missed)}"


def test_xxl_param_budget():
    cfg = T5EncoderConfig.xxl()
    enc = T5TextEncoder(cfg)
    import jax

    shapes = jax.eval_shape(lambda k: enc.init(k), jax.random.key(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    # T5-v1.1-XXL encoder: ~4.7B params.
    assert 4.0e9 < n < 5.5e9, f"{n/1e9:.2f}B"
