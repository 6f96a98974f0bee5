"""Checkpoint conversion and persistence.

Two jobs:

1. ``save_params`` / ``load_params`` — persist this framework's pytrees as
   flat ``.npz`` files (path-keyed), the local checkpoint format used by
   the CLIs.

2. ``convert_unet_state_dict`` / ``convert_vae_state_dict`` /
   ``convert_clip_state_dict`` — map a HuggingFace-format SVD checkpoint
   (diffusers ``UNetSpatioTemporalConditionModel`` +
   ``AutoencoderKLTemporalDecoder`` + transformers CLIP vision tower,
   loaded from safetensors) into this framework's parameter trees. The
   reference pulls the same weights via ``from_pretrained``
   (reference: src/models/svd_unet.py:104-164); here the conversion is an
   explicit, testable name/layout mapping:

   * torch Linear ``(out, in)``      -> ``w (in, out)``  (transpose)
   * torch Conv2d ``(O, I, kh, kw)`` -> ``w (kh, kw, I, O)``  (HWIO)
   * torch Conv3d ``(O, I, kd, 1, 1)`` -> ``w (kd, 1, 1, I, O)`` (DHWIO)
   * GroupNorm/LayerNorm weight/bias -> scale/bias

   Channel semantics (skip-concat order, group ordering) are preserved by
   construction since only axes are permuted, never channel order.
"""

from __future__ import annotations

import os
import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

# ----------------------------- npz io -------------------------------- #
_SEP = "//"


def flatten_params(params: Any, prefix: str = "") -> dict[str, jax.Array]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = _SEP.join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        flat[key] = leaf
    return flat


def unflatten_params(flat: Mapping[str, Any]) -> dict:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return _listify(root)


def _listify(node):
    """Convert {'0': .., '1': ..} dicts back into lists."""
    if not isinstance(node, dict):
        return node
    node = {k: _listify(v) for k, v in node.items()}
    if node and all(re.fullmatch(r"\d+", k) for k in node):
        idx = sorted(node, key=int)
        if [int(i) for i in idx] == list(range(len(idx))):
            return [node[i] for i in idx]
    return node


def save_params(params: Any, path: str) -> str:
    """Save a pytree as a flat .npz (bf16 stored as uint16 views)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = flatten_params(params)
    arrays = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if arr.dtype == jnp.bfloat16:
            arrays["__bf16__" + k] = arr.view(np.uint16)
        else:
            arrays[k] = arr
    np.savez(path, **arrays)
    return path


def load_params(path: str, dtype=None) -> dict:
    """Load a .npz pytree; optionally cast floating leaves to ``dtype``."""
    loaded = np.load(path)
    flat = {}
    for k in loaded.files:
        arr = loaded[k]
        if k.startswith("__bf16__"):
            k = k[len("__bf16__"):]
            arr = arr.view(jnp.bfloat16)
        # jnp.floating, not np.floating: ml_dtypes' bfloat16 (the primary
        # stored format) is NOT a np.floating subtype, so the np check
        # silently skipped the cast for bf16 leaves.
        if dtype is not None and jnp.issubdtype(np.asarray(arr).dtype, jnp.floating):
            arr = np.asarray(arr, dtype)
        flat[k] = jnp.asarray(arr)
    return unflatten_params(flat)


def save_params_orbax(params: Any, path: str) -> str:
    """Persist a pytree with orbax (sharded-friendly checkpoint dir)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    return path


def load_params_orbax(path: str) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


# ------------------------ torch-layout helpers ------------------------ #
def _t_linear(w) -> jnp.ndarray:
    return jnp.asarray(w).T


def _t_conv2d(w) -> jnp.ndarray:
    return jnp.transpose(jnp.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _t_conv3d(w) -> jnp.ndarray:
    return jnp.transpose(jnp.asarray(w), (2, 3, 4, 1, 0))  # OIDHW -> DHWIO


class _SD:
    """State-dict view with presence tracking."""

    def __init__(self, sd: Mapping[str, Any], dtype=None):
        self.sd = sd
        self.dtype = dtype
        self.used: set[str] = set()

    def __contains__(self, k):
        return k in self.sd

    def get(self, k):
        self.used.add(k)
        v = jnp.asarray(self.sd[k])
        if self.dtype is not None and jnp.issubdtype(v.dtype, jnp.floating):
            v = v.astype(self.dtype)
        return v

    def linear(self, prefix):
        p = {"w": _t_linear(self.get(prefix + ".weight"))}
        if prefix + ".bias" in self.sd:
            p["b"] = self.get(prefix + ".bias")
        return p

    def conv2d(self, prefix):
        return {
            "w": _t_conv2d(self.get(prefix + ".weight")),
            "b": self.get(prefix + ".bias"),
        }

    def conv3d(self, prefix):
        return {
            "w": _t_conv3d(self.get(prefix + ".weight")),
            "b": self.get(prefix + ".bias"),
        }

    def norm(self, prefix):
        return {
            "scale": self.get(prefix + ".weight"),
            "bias": self.get(prefix + ".bias"),
        }

    def unused(self) -> list[str]:
        return sorted(set(self.sd.keys()) - self.used)


# --------------------------- UNet mapping ----------------------------- #
def _conv_attention(sd: _SD, p: str) -> dict:
    out = {
        "to_q": {"w": _t_linear(sd.get(p + ".to_q.weight"))},
        "to_k": {"w": _t_linear(sd.get(p + ".to_k.weight"))},
        "to_v": {"w": _t_linear(sd.get(p + ".to_v.weight"))},
        "to_out": sd.linear(p + ".to_out.0"),
    }
    for name in ("to_q", "to_k", "to_v"):
        bkey = f"{p}.{name}.bias"
        if bkey in sd:
            out[name]["b"] = sd.get(bkey)
    return out


def _conv_ff(sd: _SD, p: str) -> dict:
    return {
        "proj_in": sd.linear(p + ".net.0.proj"),
        "proj_out": sd.linear(p + ".net.2"),
    }


def _conv_spatial_resnet(sd: _SD, p: str) -> dict:
    out = {
        "norm1": sd.norm(p + ".norm1"),
        "conv1": sd.conv2d(p + ".conv1"),
        "norm2": sd.norm(p + ".norm2"),
        "conv2": sd.conv2d(p + ".conv2"),
    }
    if p + ".time_emb_proj.weight" in sd:
        out["time_emb_proj"] = sd.linear(p + ".time_emb_proj")
    if p + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = sd.conv2d(p + ".conv_shortcut")
    return out


def _conv_temporal_resnet(sd: _SD, p: str) -> dict:
    out = {
        "norm1": sd.norm(p + ".norm1"),
        "conv1": sd.conv3d(p + ".conv1"),
        "norm2": sd.norm(p + ".norm2"),
        "conv2": sd.conv3d(p + ".conv2"),
    }
    if p + ".time_emb_proj.weight" in sd:
        out["time_emb_proj"] = sd.linear(p + ".time_emb_proj")
    return out


def _conv_st_resblock(sd: _SD, p: str) -> dict:
    return {
        "spatial": _conv_spatial_resnet(sd, p + ".spatial_res_block"),
        "temporal": _conv_temporal_resnet(sd, p + ".temporal_res_block"),
        "mix_factor": sd.get(p + ".time_mixer.mix_factor").reshape(()),
    }


def _conv_tblock(sd: _SD, p: str) -> dict:
    return {
        "norm1": sd.norm(p + ".norm1"),
        "attn1": _conv_attention(sd, p + ".attn1"),
        "norm2": sd.norm(p + ".norm2"),
        "attn2": _conv_attention(sd, p + ".attn2"),
        "norm3": sd.norm(p + ".norm3"),
        "ff": _conv_ff(sd, p + ".ff"),
    }


def _conv_temporal_tblock(sd: _SD, p: str) -> dict:
    return {
        "norm_in": sd.norm(p + ".norm_in"),
        "ff_in": _conv_ff(sd, p + ".ff_in"),
        "norm1": sd.norm(p + ".norm1"),
        "attn1": _conv_attention(sd, p + ".attn1"),
        "norm2": sd.norm(p + ".norm2"),
        "attn2": _conv_attention(sd, p + ".attn2"),
        "norm3": sd.norm(p + ".norm3"),
        "ff": _conv_ff(sd, p + ".ff"),
    }


def _conv_st_transformer(sd: _SD, p: str, n_layers: int) -> dict:
    return {
        "norm": sd.norm(p + ".norm"),
        "proj_in": sd.linear(p + ".proj_in"),
        "time_pos_embed": {
            "linear_1": sd.linear(p + ".time_pos_embed.linear_1"),
            "linear_2": sd.linear(p + ".time_pos_embed.linear_2"),
        },
        "blocks": [
            _conv_tblock(sd, f"{p}.transformer_blocks.{i}") for i in range(n_layers)
        ],
        "temporal_blocks": [
            _conv_temporal_tblock(sd, f"{p}.temporal_transformer_blocks.{i}")
            for i in range(n_layers)
        ],
        "mix_factor": sd.get(p + ".time_mixer.mix_factor").reshape(()),
        "proj_out": sd.linear(p + ".proj_out"),
    }


def convert_unet_state_dict(
    state_dict: Mapping[str, Any],
    num_levels: int = 4,
    layers_per_block: int = 2,
    transformer_layers: int = 1,
    dtype=jnp.bfloat16,
    strict: bool = True,
) -> dict:
    """diffusers UNetSpatioTemporalConditionModel state dict -> our tree."""
    sd = _SD(state_dict, dtype)
    params: dict = {
        "conv_in": sd.conv2d("conv_in"),
        "time_embedding": {
            "linear_1": sd.linear("time_embedding.linear_1"),
            "linear_2": sd.linear("time_embedding.linear_2"),
        },
        "add_embedding": {
            "linear_1": sd.linear("add_embedding.linear_1"),
            "linear_2": sd.linear("add_embedding.linear_2"),
        },
        "conv_norm_out": sd.norm("conv_norm_out"),
        "conv_out": sd.conv2d("conv_out"),
    }

    down = []
    for i in range(num_levels):
        base = f"down_blocks.{i}"
        block: dict = {
            "resnets": [
                _conv_st_resblock(sd, f"{base}.resnets.{j}")
                for j in range(layers_per_block)
            ],
            "attentions": [],
        }
        if f"{base}.attentions.0.proj_in.weight" in sd:
            block["attentions"] = [
                _conv_st_transformer(sd, f"{base}.attentions.{j}", transformer_layers)
                for j in range(layers_per_block)
            ]
        if f"{base}.downsamplers.0.conv.weight" in sd:
            block["downsample"] = sd.conv2d(f"{base}.downsamplers.0.conv")
        down.append(block)
    params["down_blocks"] = down

    params["mid_block"] = {
        "resnets": [
            _conv_st_resblock(sd, "mid_block.resnets.0"),
            _conv_st_resblock(sd, "mid_block.resnets.1"),
        ],
        "attentions": [
            _conv_st_transformer(sd, "mid_block.attentions.0", transformer_layers)
        ],
    }

    up = []
    for i in range(num_levels):
        base = f"up_blocks.{i}"
        block = {
            "resnets": [
                _conv_st_resblock(sd, f"{base}.resnets.{j}")
                for j in range(layers_per_block + 1)
            ],
            "attentions": [],
        }
        if f"{base}.attentions.0.proj_in.weight" in sd:
            block["attentions"] = [
                _conv_st_transformer(sd, f"{base}.attentions.{j}", transformer_layers)
                for j in range(layers_per_block + 1)
            ]
        if f"{base}.upsamplers.0.conv.weight" in sd:
            block["upsample"] = sd.conv2d(f"{base}.upsamplers.0.conv")
        up.append(block)
    params["up_blocks"] = up

    if strict and sd.unused():
        raise ValueError(f"unconverted checkpoint keys: {sd.unused()[:10]} ...")
    return params


# ---------------------------- VAE mapping ----------------------------- #
def _conv_vae_attention(sd: _SD, p: str) -> dict:
    return {
        "norm": sd.norm(p + ".group_norm"),
        "attn": {
            "to_q": sd.linear(p + ".to_q"),
            "to_k": sd.linear(p + ".to_k"),
            "to_v": sd.linear(p + ".to_v"),
            "to_out": sd.linear(p + ".to_out.0"),
        },
    }


def convert_vae_encoder_state_dict(
    state_dict: Mapping[str, Any],
    num_levels: int = 4,
    layers_per_block: int = 2,
    dtype=jnp.float32,
    strict: bool = True,
) -> dict:
    """diffusers KL ``encoder.*`` subtree -> VAEEncoder tree (+ quant_conv
    folded if present as identity-like 1x1 — SVD's VAE has no quant_conv)."""
    sd = _SD(
        {k[len("encoder."):]: v for k, v in state_dict.items()
         if k.startswith("encoder.")},
        dtype,
    )
    params: dict = {"conv_in": sd.conv2d("conv_in")}
    blocks = []
    for i in range(num_levels):
        base = f"down_blocks.{i}"
        block = {
            "resnets": [
                {
                    "norm1": sd.norm(f"{base}.resnets.{j}.norm1"),
                    "conv1": sd.conv2d(f"{base}.resnets.{j}.conv1"),
                    "norm2": sd.norm(f"{base}.resnets.{j}.norm2"),
                    "conv2": sd.conv2d(f"{base}.resnets.{j}.conv2"),
                    **(
                        {"conv_shortcut": sd.conv2d(f"{base}.resnets.{j}.conv_shortcut")}
                        if f"{base}.resnets.{j}.conv_shortcut.weight" in sd
                        else {}
                    ),
                }
                for j in range(layers_per_block)
            ]
        }
        if f"{base}.downsamplers.0.conv.weight" in sd:
            block["downsample"] = sd.conv2d(f"{base}.downsamplers.0.conv")
        blocks.append(block)
    params["down_blocks"] = blocks
    params["mid"] = {
        "resnet1": {
            "norm1": sd.norm("mid_block.resnets.0.norm1"),
            "conv1": sd.conv2d("mid_block.resnets.0.conv1"),
            "norm2": sd.norm("mid_block.resnets.0.norm2"),
            "conv2": sd.conv2d("mid_block.resnets.0.conv2"),
        },
        "attn": _conv_vae_attention(sd, "mid_block.attentions.0"),
        "resnet2": {
            "norm1": sd.norm("mid_block.resnets.1.norm1"),
            "conv1": sd.conv2d("mid_block.resnets.1.conv1"),
            "norm2": sd.norm("mid_block.resnets.1.norm2"),
            "conv2": sd.conv2d("mid_block.resnets.1.conv2"),
        },
    }
    params["norm_out"] = sd.norm("conv_norm_out")
    params["conv_out"] = sd.conv2d("conv_out")
    if strict and sd.unused():
        raise ValueError(f"unconverted encoder keys: {sd.unused()[:10]} ...")
    return params


def convert_vae_decoder_state_dict(
    state_dict: Mapping[str, Any],
    num_levels: int = 4,
    layers_per_block: int = 2,
    dtype=jnp.float32,
    strict: bool = True,
) -> dict:
    """diffusers TemporalDecoder ``decoder.*`` subtree -> our decoder tree."""
    sd = _SD(
        {k[len("decoder."):]: v for k, v in state_dict.items()
         if k.startswith("decoder.")},
        dtype,
    )
    params: dict = {
        "conv_in": sd.conv2d("conv_in"),
        "mid": {
            "resnet1": _conv_st_resblock(sd, "mid_block.resnets.0"),
            "attn": _conv_vae_attention(sd, "mid_block.attentions.0"),
            "resnet2": _conv_st_resblock(sd, "mid_block.resnets.1"),
        },
    }
    blocks = []
    for i in range(num_levels):
        base = f"up_blocks.{i}"
        block = {
            "resnets": [
                _conv_st_resblock(sd, f"{base}.resnets.{j}")
                for j in range(layers_per_block + 1)
            ]
        }
        if f"{base}.upsamplers.0.conv.weight" in sd:
            block["upsample"] = sd.conv2d(f"{base}.upsamplers.0.conv")
        blocks.append(block)
    params["up_blocks"] = blocks
    params["norm_out"] = sd.norm("conv_norm_out")
    params["conv_out"] = sd.conv2d("conv_out")
    params["time_conv_out"] = sd.conv3d("time_conv_out")
    if strict and sd.unused():
        raise ValueError(f"unconverted decoder keys: {sd.unused()[:10]} ...")
    return params


# ---------------------------- CLIP mapping ---------------------------- #
def convert_clip_state_dict(
    state_dict: Mapping[str, Any],
    num_layers: int = 32,
    patch_size: int = 14,
    dtype=jnp.float32,
    strict: bool = False,
) -> dict:
    """transformers CLIPVisionModelWithProjection state dict -> our tree."""
    sd = _SD(state_dict, dtype)
    vm = "vision_model."
    patch_w = sd.get(vm + "embeddings.patch_embedding.weight")  # (O, 3, p, p)
    params: dict = {
        "patch_embed": {
            "w": jnp.transpose(patch_w, (2, 3, 1, 0)).reshape(
                patch_size * patch_size * 3, -1
            )
        },
        "class_embed": sd.get(vm + "embeddings.class_embedding"),
        "pos_embed": sd.get(vm + "embeddings.position_embedding.weight"),
        "pre_ln": sd.norm(vm + "pre_layrnorm"),
        "post_ln": sd.norm(vm + "post_layernorm"),
        "projection": {"w": _t_linear(sd.get("visual_projection.weight"))},
        "layers": [],
    }
    for i in range(num_layers):
        base = f"{vm}encoder.layers.{i}"
        params["layers"].append(
            {
                "ln1": sd.norm(base + ".layer_norm1"),
                "attn": {
                    "to_q": sd.linear(base + ".self_attn.q_proj"),
                    "to_k": sd.linear(base + ".self_attn.k_proj"),
                    "to_v": sd.linear(base + ".self_attn.v_proj"),
                    "to_out": sd.linear(base + ".self_attn.out_proj"),
                },
                "ln2": sd.norm(base + ".layer_norm2"),
                "mlp_in": sd.linear(base + ".mlp.fc1"),
                "mlp_out": sd.linear(base + ".mlp.fc2"),
            }
        )
    if strict and sd.unused():
        raise ValueError(f"unconverted CLIP keys: {sd.unused()[:10]} ...")
    return params


def convert_t5_encoder_state_dict(
    state_dict: Mapping[str, Any],
    num_layers: int = 24,
    gated: bool = True,
    dtype=jnp.float32,
) -> dict:
    """transformers ``T5EncoderModel`` state dict -> our tree
    (models/t5_encoder.py). ``gated`` selects the v1.1 gated-GELU FF
    (wi_0/wi_1) vs the original ReLU FF (wi)."""
    sd = _SD(state_dict, dtype)
    embed_key = "shared.weight" if "shared.weight" in sd else "encoder.embed_tokens.weight"
    params: dict = {
        "embed": sd.get(embed_key),
        "rel_bias": sd.get(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "final_ln": {"scale": sd.get("encoder.final_layer_norm.weight")},
        "blocks": [],
    }
    for i in range(num_layers):
        a = f"encoder.block.{i}.layer.0"
        ff = f"encoder.block.{i}.layer.1"
        blk = {
            "ln1": {"scale": sd.get(a + ".layer_norm.weight")},
            "q": sd.linear(a + ".SelfAttention.q"),
            "k": sd.linear(a + ".SelfAttention.k"),
            "v": sd.linear(a + ".SelfAttention.v"),
            "o": sd.linear(a + ".SelfAttention.o"),
            "ln2": {"scale": sd.get(ff + ".layer_norm.weight")},
        }
        if gated:
            blk["wi0"] = sd.linear(ff + ".DenseReluDense.wi_0")
            blk["wi1"] = sd.linear(ff + ".DenseReluDense.wi_1")
        else:
            blk["wi"] = sd.linear(ff + ".DenseReluDense.wi")
        blk["wo"] = sd.linear(ff + ".DenseReluDense.wo")
        params["blocks"].append(blk)
    return params


# --------------------------- entry points ----------------------------- #
def load_safetensors(path: str) -> dict[str, jnp.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="flax") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def convert_svd_checkpoint(
    model_dir: str, out_dir: str, dtype=jnp.bfloat16
) -> dict[str, str]:
    """Convert a local HF SVD checkpoint directory (diffusers layout:
    unet/, vae/, image_encoder/ with .safetensors shards) into this
    framework's .npz checkpoints."""
    import glob

    written = {}

    def load_dir(sub):
        files = sorted(
            glob.glob(os.path.join(model_dir, sub, "*.safetensors"))
        )
        sd: dict = {}
        for fp in files:
            sd.update(load_safetensors(fp))
        return sd

    unet_sd = load_dir("unet")
    if unet_sd:
        params = convert_unet_state_dict(unet_sd, dtype=dtype)
        written["unet"] = save_params(params, os.path.join(out_dir, "unet.npz"))

    vae_sd = load_dir("vae")
    if vae_sd:
        # Infer the block layout from the checkpoint keys instead of
        # assuming the full-size SVD VAE (tiny/test checkpoints differ).
        lv = 1 + max(
            (int(m.group(1)) for k in vae_sd
             if (m := re.match(r"encoder\.down_blocks\.(\d+)\.", k))),
            default=3,
        )
        lpb = 1 + max(
            (int(m.group(1)) for k in vae_sd
             if (m := re.match(
                 r"encoder\.down_blocks\.0\.resnets\.(\d+)\.", k))),
            default=1,
        )
        enc = convert_vae_encoder_state_dict(
            vae_sd, num_levels=lv, layers_per_block=lpb, strict=False
        )
        dec = convert_vae_decoder_state_dict(
            vae_sd, num_levels=lv, layers_per_block=lpb, strict=False
        )
        written["vae_encoder"] = save_params(
            enc, os.path.join(out_dir, "vae_encoder.npz")
        )
        written["vae_decoder"] = save_params(
            dec, os.path.join(out_dir, "vae_decoder.npz")
        )

    clip_sd = load_dir("image_encoder")
    if clip_sd:
        clip = convert_clip_state_dict(clip_sd)
        written["clip"] = save_params(clip, os.path.join(out_dir, "clip.npz"))
    return written


def _main(argv=None) -> int:
    """CLI: ``python -m vdpp_tpu.utils.weights <hf_model_dir> <out_dir>``
    — convert a local diffusers-layout SVD checkpoint into this
    framework's .npz files (the load path the reference gets from
    ``from_pretrained``, reference: src/models/svd_unet.py:104-164)."""
    import argparse

    ap = argparse.ArgumentParser(description=_main.__doc__)
    ap.add_argument("model_dir", help="HF checkpoint dir (unet/ vae/ image_encoder/)")
    ap.add_argument("out_dir", help="output directory for the .npz files")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--backend", default="cpu",
                    help="JAX platform for the conversion (default cpu: "
                    "conversion is pure layout mapping and needs no "
                    "accelerator; a sitecustomize may pin a remote TPU "
                    "platform, which env vars alone cannot override)")
    args = ap.parse_args(argv)
    jax.config.update("jax_platforms", args.backend)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    os.makedirs(args.out_dir, exist_ok=True)
    written = convert_svd_checkpoint(args.model_dir, args.out_dir, dtype=dtype)
    if not written:
        print(f"no convertible components found under {args.model_dir}")
        return 1
    for name, path in written.items():
        print(f"{name}: {path}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(_main())
