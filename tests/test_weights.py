"""Checkpoint converter tests.

Strategy: export a randomly-initialized tiny model into a synthetic
*torch-layout, diffusers-named* state dict (the inverse mapping, written
independently here), run the converter, and require the result to equal
the original tree exactly — this pins both the name mapping and every
axis permutation. Plus npz save/load roundtrips.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.svd_unet import SVDUNet, SVDUNetConfig
from vdpp_tpu.utils.weights import (
    convert_unet_state_dict,
    flatten_params,
    load_params,
    save_params,
    unflatten_params,
)


def _inv_linear(p, name, sd):
    sd[name + ".weight"] = np.asarray(p["w"]).T
    if "b" in p:
        sd[name + ".bias"] = np.asarray(p["b"])


def _inv_conv2d(p, name, sd):
    sd[name + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    sd[name + ".bias"] = np.asarray(p["b"])


def _inv_conv3d(p, name, sd):
    sd[name + ".weight"] = np.transpose(np.asarray(p["w"]), (4, 3, 0, 1, 2))
    sd[name + ".bias"] = np.asarray(p["b"])


def _inv_norm(p, name, sd):
    sd[name + ".weight"] = np.asarray(p["scale"])
    sd[name + ".bias"] = np.asarray(p["bias"])


def _inv_attn(p, name, sd):
    for k in ("to_q", "to_k", "to_v"):
        sd[name + f".{k}.weight"] = np.asarray(p[k]["w"]).T
        if "b" in p[k]:
            sd[name + f".{k}.bias"] = np.asarray(p[k]["b"])
    _inv_linear(p["to_out"], name + ".to_out.0", sd)


def _inv_ff(p, name, sd):
    _inv_linear(p["proj_in"], name + ".net.0.proj", sd)
    _inv_linear(p["proj_out"], name + ".net.2", sd)


def _inv_spatial_resnet(p, name, sd):
    _inv_norm(p["norm1"], name + ".norm1", sd)
    _inv_conv2d(p["conv1"], name + ".conv1", sd)
    if "time_emb_proj" in p:
        _inv_linear(p["time_emb_proj"], name + ".time_emb_proj", sd)
    _inv_norm(p["norm2"], name + ".norm2", sd)
    _inv_conv2d(p["conv2"], name + ".conv2", sd)
    if "conv_shortcut" in p:
        _inv_conv2d(p["conv_shortcut"], name + ".conv_shortcut", sd)


def _inv_temporal_resnet(p, name, sd):
    _inv_norm(p["norm1"], name + ".norm1", sd)
    _inv_conv3d(p["conv1"], name + ".conv1", sd)
    if "time_emb_proj" in p:
        _inv_linear(p["time_emb_proj"], name + ".time_emb_proj", sd)
    _inv_norm(p["norm2"], name + ".norm2", sd)
    _inv_conv3d(p["conv2"], name + ".conv2", sd)


def _inv_st_resblock(p, name, sd):
    _inv_spatial_resnet(p["spatial"], name + ".spatial_res_block", sd)
    _inv_temporal_resnet(p["temporal"], name + ".temporal_res_block", sd)
    sd[name + ".time_mixer.mix_factor"] = np.asarray(p["mix_factor"]).reshape(1)


def _inv_tblock(p, name, sd):
    _inv_norm(p["norm1"], name + ".norm1", sd)
    _inv_attn(p["attn1"], name + ".attn1", sd)
    _inv_norm(p["norm2"], name + ".norm2", sd)
    _inv_attn(p["attn2"], name + ".attn2", sd)
    _inv_norm(p["norm3"], name + ".norm3", sd)
    _inv_ff(p["ff"], name + ".ff", sd)


def _inv_temporal_tblock(p, name, sd):
    _inv_norm(p["norm_in"], name + ".norm_in", sd)
    _inv_ff(p["ff_in"], name + ".ff_in", sd)
    _inv_tblock(p, name, sd)  # shares norm1/attn1/norm2/attn2/norm3/ff


def _inv_st_transformer(p, name, sd):
    _inv_norm(p["norm"], name + ".norm", sd)
    _inv_linear(p["proj_in"], name + ".proj_in", sd)
    _inv_linear(p["time_pos_embed"]["linear_1"], name + ".time_pos_embed.linear_1", sd)
    _inv_linear(p["time_pos_embed"]["linear_2"], name + ".time_pos_embed.linear_2", sd)
    for i, b in enumerate(p["blocks"]):
        _inv_tblock(b, f"{name}.transformer_blocks.{i}", sd)
    for i, b in enumerate(p["temporal_blocks"]):
        _inv_temporal_tblock(b, f"{name}.temporal_transformer_blocks.{i}", sd)
    sd[name + ".time_mixer.mix_factor"] = np.asarray(p["mix_factor"]).reshape(1)
    _inv_linear(p["proj_out"], name + ".proj_out", sd)


def export_torch_style(params) -> dict:
    sd: dict = {}
    _inv_conv2d(params["conv_in"], "conv_in", sd)
    for n in ("time_embedding", "add_embedding"):
        _inv_linear(params[n]["linear_1"], f"{n}.linear_1", sd)
        _inv_linear(params[n]["linear_2"], f"{n}.linear_2", sd)
    for i, block in enumerate(params["down_blocks"]):
        base = f"down_blocks.{i}"
        for j, r in enumerate(block["resnets"]):
            _inv_st_resblock(r, f"{base}.resnets.{j}", sd)
        for j, a in enumerate(block["attentions"]):
            _inv_st_transformer(a, f"{base}.attentions.{j}", sd)
        if "downsample" in block:
            _inv_conv2d(block["downsample"], f"{base}.downsamplers.0.conv", sd)
    for j, r in enumerate(params["mid_block"]["resnets"]):
        _inv_st_resblock(r, f"mid_block.resnets.{j}", sd)
    _inv_st_transformer(params["mid_block"]["attentions"][0], "mid_block.attentions.0", sd)
    for i, block in enumerate(params["up_blocks"]):
        base = f"up_blocks.{i}"
        for j, r in enumerate(block["resnets"]):
            _inv_st_resblock(r, f"{base}.resnets.{j}", sd)
        for j, a in enumerate(block["attentions"]):
            _inv_st_transformer(a, f"{base}.attentions.{j}", sd)
        if "upsample" in block:
            _inv_conv2d(block["upsample"], f"{base}.upsamplers.0.conv", sd)
    _inv_norm(params["conv_norm_out"], "conv_norm_out", sd)
    _inv_conv2d(params["conv_out"], "conv_out", sd)
    return sd


@pytest.fixture(scope="module")
def tiny_params():
    cfg = SVDUNetConfig.tiny()
    return cfg, SVDUNet(cfg).init(jax.random.key(0))


def test_unet_convert_roundtrip(tiny_params):
    cfg, params = tiny_params
    sd = export_torch_style(params)
    restored = convert_unet_state_dict(
        sd,
        num_levels=cfg.num_levels,
        layers_per_block=cfg.layers_per_block,
        transformer_layers=cfg.transformer_layers_per_block,
        dtype=jnp.float32,
        strict=True,
    )
    orig_flat = flatten_params(params)
    rest_flat = flatten_params(restored)
    assert set(orig_flat) == set(rest_flat)
    for k in orig_flat:
        np.testing.assert_allclose(
            np.asarray(orig_flat[k]), np.asarray(rest_flat[k]), atol=0,
            err_msg=k,
        )


def test_converted_forward_matches(tiny_params):
    cfg, params = tiny_params
    restored = convert_unet_state_dict(
        export_torch_style(params),
        num_levels=cfg.num_levels,
        layers_per_block=cfg.layers_per_block,
        dtype=jnp.float32,
    )
    unet = SVDUNet(cfg)
    x = jax.random.normal(jax.random.key(1), (1, 2, 16, 16, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(2), (1, 1, cfg.cross_attention_dim))
    tids = jnp.zeros((1, 3))
    a = unet.apply(params, x, jnp.float32(1.0), ctx, tids)
    b = unet.apply(restored, x, jnp.float32(1.0), ctx, tids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_strict_rejects_leftover_keys(tiny_params):
    cfg, params = tiny_params
    sd = export_torch_style(params)
    sd["some.bogus.weight"] = np.zeros(3)
    with pytest.raises(ValueError, match="unconverted"):
        convert_unet_state_dict(
            sd, num_levels=cfg.num_levels, layers_per_block=cfg.layers_per_block,
            strict=True,
        )


def test_npz_roundtrip(tmp_path, tiny_params):
    _, params = tiny_params
    path = os.path.join(tmp_path, "unet.npz")
    save_params(params, path)
    restored = load_params(path)
    of, rf = flatten_params(params), flatten_params(restored)
    assert set(of) == set(rf)
    for k in of:
        np.testing.assert_array_equal(np.asarray(of[k]), np.asarray(rf[k]))


def test_npz_bf16_roundtrip(tmp_path):
    params = {"a": {"w": jnp.ones((4, 4), jnp.bfloat16) * 1.5}, "n": jnp.arange(3)}
    path = os.path.join(tmp_path, "p.npz")
    save_params(params, path)
    restored = load_params(path)
    assert restored["a"]["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored["a"]["w"], np.float32), np.full((4, 4), 1.5, np.float32)
    )
    np.testing.assert_array_equal(np.asarray(restored["n"]), np.arange(3))


def test_unflatten_listify():
    flat = {"blocks//0//w": jnp.zeros(2), "blocks//1//w": jnp.ones(2), "top": jnp.zeros(1)}
    tree = unflatten_params(flat)
    assert isinstance(tree["blocks"], list) and len(tree["blocks"]) == 2
