"""Pin the converter to the real diffusers checkpoint key inventory.

Round-1 gap: the HF->JAX converter was validated only against self-written
inverse exporters, so a drifted key name would pass the roundtrip and fail
on a real checkpoint. Here the full svd-xt key list (1428 keys, generated
from the diffusers naming rules that the torch-oracle block tests verify
mathematically) is frozen as a fixture, and ``convert_unet_state_dict`` in
strict mode must consume EXACTLY that set — any missing key raises
KeyError, any unconsumed key fails strict validation.
"""

import os

import numpy as np
import pytest
import torch_svd_oracle as oracle

from vdpp_tpu.utils.weights import convert_unet_state_dict

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "svd_xt_unet_keys.txt")


def _fixture_keys():
    with open(FIXTURE) as f:
        return [line.strip() for line in f if line.strip()]


def test_svd_xt_key_template_matches_fixture():
    tpl = oracle.make_unet_key_template(oracle.OracleUNetConfig())
    assert sorted(tpl.keys()) == sorted(_fixture_keys())


def test_converter_consumes_exactly_the_svd_xt_keys():
    tpl = oracle.make_unet_key_template(oracle.OracleUNetConfig())
    sd = {k: np.asarray(v.numpy()) for k, v in tpl.items()}
    # strict=True raises on unconsumed keys; a missing key raises KeyError.
    params = convert_unet_state_dict(sd, strict=True, dtype=np.float32)
    assert "conv_in" in params and len(params["down_blocks"]) == 4


def test_converter_rejects_extra_keys_in_strict_mode():
    tpl = oracle.make_unet_key_template(oracle.OracleUNetConfig())
    sd = {k: np.asarray(v.numpy()) for k, v in tpl.items()}
    sd["mid_block.resnets.0.spatial_res_block.bogus.weight"] = np.zeros((1,))
    with pytest.raises(ValueError, match="unconverted"):
        convert_unet_state_dict(sd, strict=True, dtype=np.float32)
