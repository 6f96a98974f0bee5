"""VAE / CLIP checkpoint-converter roundtrip tests (inverse exporters)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.clip_encoder import CLIPVisionConfig, CLIPVisionEncoder
from vdpp_tpu.models.vae import TemporalVAEDecoder, VAEConfig, VAEEncoder
from vdpp_tpu.utils.weights import (
    convert_clip_state_dict,
    convert_vae_decoder_state_dict,
    convert_vae_encoder_state_dict,
    flatten_params,
)
from tests.test_weights import (
    _inv_conv2d,
    _inv_conv3d,
    _inv_linear,
    _inv_norm,
)


def _inv_resnet2d(p, name, sd):
    _inv_norm(p["norm1"], name + ".norm1", sd)
    _inv_conv2d(p["conv1"], name + ".conv1", sd)
    _inv_norm(p["norm2"], name + ".norm2", sd)
    _inv_conv2d(p["conv2"], name + ".conv2", sd)
    if "conv_shortcut" in p:
        _inv_conv2d(p["conv_shortcut"], name + ".conv_shortcut", sd)


def _inv_vae_attn(p, name, sd):
    _inv_norm(p["norm"], name + ".group_norm", sd)
    for k in ("to_q", "to_k", "to_v"):
        _inv_linear(p["attn"][k], f"{name}.{k}", sd)
    _inv_linear(p["attn"]["to_out"], name + ".to_out.0", sd)


def _inv_temporal_resnet(p, name, sd):
    _inv_norm(p["norm1"], name + ".norm1", sd)
    _inv_conv3d(p["conv1"], name + ".conv1", sd)
    _inv_norm(p["norm2"], name + ".norm2", sd)
    _inv_conv3d(p["conv2"], name + ".conv2", sd)


def _inv_st_resblock(p, name, sd):
    _inv_resnet2d(p["spatial"], name + ".spatial_res_block", sd)
    _inv_temporal_resnet(p["temporal"], name + ".temporal_res_block", sd)
    sd[name + ".time_mixer.mix_factor"] = np.asarray(p["mix_factor"]).reshape(1)


def export_vae_torch_style(enc_params, dec_params) -> dict:
    sd: dict = {}
    # encoder
    _inv_conv2d(enc_params["conv_in"], "encoder.conv_in", sd)
    for i, block in enumerate(enc_params["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _inv_resnet2d(r, f"encoder.down_blocks.{i}.resnets.{j}", sd)
        if "downsample" in block:
            _inv_conv2d(block["downsample"],
                        f"encoder.down_blocks.{i}.downsamplers.0.conv", sd)
    _inv_resnet2d(enc_params["mid"]["resnet1"], "encoder.mid_block.resnets.0", sd)
    _inv_vae_attn(enc_params["mid"]["attn"], "encoder.mid_block.attentions.0", sd)
    _inv_resnet2d(enc_params["mid"]["resnet2"], "encoder.mid_block.resnets.1", sd)
    _inv_norm(enc_params["norm_out"], "encoder.conv_norm_out", sd)
    _inv_conv2d(enc_params["conv_out"], "encoder.conv_out", sd)
    # decoder
    _inv_conv2d(dec_params["conv_in"], "decoder.conv_in", sd)
    _inv_st_resblock(dec_params["mid"]["resnet1"], "decoder.mid_block.resnets.0", sd)
    _inv_vae_attn(dec_params["mid"]["attn"], "decoder.mid_block.attentions.0", sd)
    _inv_st_resblock(dec_params["mid"]["resnet2"], "decoder.mid_block.resnets.1", sd)
    for i, block in enumerate(dec_params["up_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _inv_st_resblock(r, f"decoder.up_blocks.{i}.resnets.{j}", sd)
        if "upsample" in block:
            _inv_conv2d(block["upsample"],
                        f"decoder.up_blocks.{i}.upsamplers.0.conv", sd)
    _inv_norm(dec_params["norm_out"], "decoder.conv_norm_out", sd)
    _inv_conv2d(dec_params["conv_out"], "decoder.conv_out", sd)
    _inv_conv3d(dec_params["time_conv_out"], "decoder.time_conv_out", sd)
    return sd


def export_clip_torch_style(params, cfg) -> dict:
    sd: dict = {}
    vm = "vision_model."
    p = cfg.patch_size
    d = params["patch_embed"]["w"].shape[1]
    # our (p*p*3, D) -> torch conv (D, 3, p, p)
    w = np.asarray(params["patch_embed"]["w"]).reshape(p, p, 3, d)
    sd[vm + "embeddings.patch_embedding.weight"] = np.transpose(w, (3, 2, 0, 1))
    sd[vm + "embeddings.class_embedding"] = np.asarray(params["class_embed"])
    sd[vm + "embeddings.position_embedding.weight"] = np.asarray(params["pos_embed"])
    _inv_norm(params["pre_ln"], vm + "pre_layrnorm", sd)
    _inv_norm(params["post_ln"], vm + "post_layernorm", sd)
    sd["visual_projection.weight"] = np.asarray(params["projection"]["w"]).T
    for i, lp in enumerate(params["layers"]):
        base = f"{vm}encoder.layers.{i}"
        _inv_norm(lp["ln1"], base + ".layer_norm1", sd)
        _inv_linear(lp["attn"]["to_q"], base + ".self_attn.q_proj", sd)
        _inv_linear(lp["attn"]["to_k"], base + ".self_attn.k_proj", sd)
        _inv_linear(lp["attn"]["to_v"], base + ".self_attn.v_proj", sd)
        _inv_linear(lp["attn"]["to_out"], base + ".self_attn.out_proj", sd)
        _inv_norm(lp["ln2"], base + ".layer_norm2", sd)
        _inv_linear(lp["mlp_in"], base + ".mlp.fc1", sd)
        _inv_linear(lp["mlp_out"], base + ".mlp.fc2", sd)
    return sd


def _assert_trees_equal(a, b):
    fa, fb = flatten_params(a), flatten_params(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)


def test_vae_roundtrip_and_forward():
    cfg = VAEConfig.tiny()
    enc = VAEEncoder(cfg)
    dec = TemporalVAEDecoder(cfg)
    ep = enc.init(jax.random.key(0))
    dp = dec.init(jax.random.key(1))
    sd = export_vae_torch_style(ep, dp)
    ep2 = convert_vae_encoder_state_dict(
        sd, num_levels=len(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block, strict=True,
    )
    dp2 = convert_vae_decoder_state_dict(
        sd, num_levels=len(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block, strict=True,
    )
    _assert_trees_equal(ep, ep2)
    _assert_trees_equal(dp, dp2)

    img = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    np.testing.assert_array_equal(
        np.asarray(enc.apply(ep, img)), np.asarray(enc.apply(ep2, img))
    )
    lat = jax.random.normal(jax.random.key(3), (1, 2, 8, 8, cfg.latent_channels))
    np.testing.assert_array_equal(
        np.asarray(dec.apply(dp, lat)), np.asarray(dec.apply(dp2, lat))
    )


def test_clip_roundtrip_and_forward():
    cfg = CLIPVisionConfig.tiny()
    enc = CLIPVisionEncoder(cfg)
    p = enc.init(jax.random.key(0))
    sd = export_clip_torch_style(p, cfg)
    p2 = convert_clip_state_dict(
        sd, num_layers=cfg.num_layers, patch_size=cfg.patch_size,
    )
    _assert_trees_equal(p, p2)
    px = jax.random.normal(jax.random.key(1), (2, cfg.image_size, cfg.image_size, 3))
    np.testing.assert_array_equal(
        np.asarray(enc.apply(p, px)), np.asarray(enc.apply(p2, px))
    )


def test_convert_checkpoint_cli(tmp_path):
    """python -m vdpp_tpu.utils.weights <hf_dir> <out>: end-to-end on a
    synthetic safetensors checkpoint (tiny VAE exported through the
    inverse mapping), plus the empty-dir error path."""
    import numpy as np
    import subprocess
    import sys

    from safetensors.numpy import save_file

    from vdpp_tpu.models.vae import TemporalVAEDecoder, VAEConfig, VAEEncoder
    from vdpp_tpu.utils.weights import load_params

    cfg = VAEConfig.tiny()
    ep = VAEEncoder(cfg).init(jax.random.key(0))
    dp = TemporalVAEDecoder(cfg).init(jax.random.key(1))
    # ascontiguousarray: safetensors serializes the raw buffer, so the
    # exporter's transposed VIEWS must be materialized before save_file.
    sd = {k: np.ascontiguousarray(np.asarray(v, np.float32))
          for k, v in export_vae_torch_style(ep, dp).items()}
    hf_dir = tmp_path / "ckpt"
    (hf_dir / "vae").mkdir(parents=True)
    save_file(sd, str(hf_dir / "vae" / "diffusion_pytorch_model.safetensors"))

    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "vdpp_tpu.utils.weights", str(hf_dir),
         str(out_dir), "--dtype", "float32"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "vae_encoder.npz").exists()
    dec = load_params(str(out_dir / "vae_decoder.npz"))
    _assert_trees_equal(dec, dp)

    r2 = subprocess.run(
        [sys.executable, "-m", "vdpp_tpu.utils.weights",
         str(tmp_path / "empty"), str(out_dir)],
        capture_output=True, text=True, timeout=120,
    )
    assert r2.returncode == 1
