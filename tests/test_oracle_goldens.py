"""Committed NUMERIC goldens for the torch-oracle parity chain.

The block/model parity tests (tests/test_torch_block_parity.py)
regenerate both the oracle and the JAX side at test time — so a refactor
that drifted BOTH in the same wrong way would pass unnoticed. This file
checks each side independently against arrays frozen on disk
(tests/fixtures/oracle_goldens.npz, generated once by
tests/fixtures/gen_oracle_goldens.py):

* the torch oracle must reproduce its stored outputs EXACTLY
  (bit-for-bit: same code, same inputs, CPU float32 — any diff means the
  oracle's math changed);
* the JAX converter+blocks must match the stored outputs to the same
  tolerance the live parity tests use.

The reference anchors its quality story the same way — against fixed
outputs of the official pipeline (reference:
scripts/compare_with_official.py), which this environment cannot run;
the frozen arrays are the in-env equivalent.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_svd_oracle as oracle
from vdpp_tpu.models.svd_unet import (
    SVDUNet,
    SVDUNetConfig,
    _st_resblock,
    _st_transformer,
)
from vdpp_tpu.utils.weights import (
    _SD,
    _conv_st_resblock,
    _conv_st_transformer,
    convert_unet_state_dict,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "oracle_goldens.npz"
)
B, F_ = 2, 3


@pytest.fixture(scope="module")
def goldens():
    return np.load(FIXTURE)


def _case(goldens, prefix):
    sd = {
        k[len(prefix) + 4:]: torch.from_numpy(goldens[k])
        for k in goldens.files if k.startswith(prefix + "/sd/")
    }
    return sd, {k[len(prefix) + 1:]: goldens[k]
                for k in goldens.files
                if k.startswith(prefix + "/") and "/sd/" not in k}


def test_resblock_oracle_reproduces_stored_golden(goldens):
    sd, io = _case(goldens, "resblock")
    got = oracle.st_resblock(
        sd, "res", torch.from_numpy(io["x"]), torch.from_numpy(io["temb"]),
        F_, 8, eps=1e-6, teps=1e-6, switch=False,
    )
    np.testing.assert_array_equal(got.numpy(), io["out"])


def test_resblock_jax_matches_stored_golden(goldens):
    sd, io = _case(goldens, "resblock")
    cfg = SVDUNetConfig(norm_num_groups=8)
    params = _conv_st_resblock(
        _SD({k: v.numpy() for k, v in sd.items()}, jnp.float32), "res"
    )
    got = _st_resblock(
        params,
        jnp.asarray(io["x"].transpose(0, 2, 3, 1)),
        jnp.asarray(io["temb"]),
        cfg, B, F_,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), io["out"], atol=5e-5
    )


def test_transformer_oracle_reproduces_stored_golden(goldens):
    sd, io = _case(goldens, "transformer")
    got = oracle.st_transformer(
        sd, "attn", torch.from_numpy(io["x"]), torch.from_numpy(io["ctx"]),
        F_, 2, 8,
    )
    np.testing.assert_array_equal(got.numpy(), io["out"])


def test_transformer_jax_matches_stored_golden(goldens):
    sd, io = _case(goldens, "transformer")
    cfg = SVDUNetConfig(norm_num_groups=8, cross_attention_dim=24)
    params = _conv_st_transformer(
        _SD({k: v.numpy() for k, v in sd.items()}, jnp.float32), "attn", 1
    )
    got = _st_transformer(
        params,
        jnp.asarray(io["x"].transpose(0, 2, 3, 1)),
        jnp.asarray(io["ctx"]),
        cfg, 2, B, F_,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), io["out"], atol=5e-5
    )


def test_full_unet_oracle_reproduces_stored_golden(goldens):
    sd, io = _case(goldens, "unet")
    got = oracle.unet_forward(
        sd, oracle.OracleUNetConfig.tiny(),
        torch.from_numpy(io["sample"]),
        torch.from_numpy(io["timestep"]),
        torch.from_numpy(io["ctx"]),
        torch.from_numpy(io["tids"]),
    )
    np.testing.assert_array_equal(got.numpy(), io["out"])


def test_full_unet_jax_matches_stored_golden(goldens):
    sd, io = _case(goldens, "unet")
    jcfg = SVDUNetConfig.tiny()
    params = convert_unet_state_dict(
        {k: v.numpy() for k, v in sd.items()},
        num_levels=jcfg.num_levels,
        layers_per_block=jcfg.layers_per_block,
        transformer_layers=jcfg.transformer_layers_per_block,
        dtype=jnp.float32,
    )
    got = SVDUNet(jcfg).apply(
        params,
        jnp.asarray(io["sample"].transpose(0, 1, 3, 4, 2)),
        jnp.float32(float(io["timestep"])),
        jnp.asarray(io["ctx"]),
        jnp.asarray(io["tids"]),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 1, 4, 2, 3), io["out"],
        atol=3e-4, rtol=1e-4,
    )
