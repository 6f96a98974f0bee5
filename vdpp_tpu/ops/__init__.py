"""Core compute ops: norms, attention, embeddings, convolutions.

All ops are functional (params-in, array-out), channels-last (NHWC /
N...C — the TPU-native conv layout), run statistics in fp32, and are
jit/shard_map-safe.
"""

from vdpp_tpu.ops.normalization import group_norm, layer_norm
from vdpp_tpu.ops.embeddings import sinusoidal_embedding, timestep_mlp, init_timestep_mlp
from vdpp_tpu.ops.attention import attention, init_attention
from vdpp_tpu.ops.linear import linear, init_linear, geglu_ff, init_geglu_ff
from vdpp_tpu.ops.conv import conv2d, conv_temporal, init_conv2d, init_conv_temporal

__all__ = [
    "group_norm",
    "layer_norm",
    "sinusoidal_embedding",
    "timestep_mlp",
    "init_timestep_mlp",
    "attention",
    "init_attention",
    "linear",
    "init_linear",
    "geglu_ff",
    "init_geglu_ff",
    "conv2d",
    "conv_temporal",
    "init_conv2d",
    "init_conv_temporal",
]
