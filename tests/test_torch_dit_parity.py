"""DiT golden test vs the plain-torch oracle (tests/torch_dit_oracle.py):
both attention modes, with and without cross-attention context — the same
independent-rederivation check the SVD UNet family gets from
tests/torch_svd_oracle.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.torch_dit_oracle import dit_forward
from vdpp_tpu.models.dit import DiTVideo, DiTVideoConfig

B, F, H, W = 2, 4, 8, 8


def _params_numpy(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)


@pytest.mark.parametrize("mode", ["factorized", "joint3d"])
@pytest.mark.parametrize("with_ctx", [True, False])
def test_dit_matches_torch_oracle(mode, with_ctx):
    cfg = (
        DiTVideoConfig.tiny() if mode == "factorized"
        else DiTVideoConfig.joint3d_tiny()
    )
    m = DiTVideo(cfg)
    params = m.init(jax.random.key(0))
    x = np.asarray(
        jax.random.normal(jax.random.key(1), (B, F, H, W, cfg.in_channels)),
        np.float32,
    )
    ctx = (
        np.asarray(
            jax.random.normal(jax.random.key(2), (B, 3, cfg.cross_attention_dim)),
            np.float32,
        )
        if with_ctx
        else None
    )
    timestep = 0.73

    ours = np.asarray(
        m.apply(params, jnp.asarray(x), jnp.float32(timestep),
                jnp.asarray(ctx) if ctx is not None else None)
    )
    want = dit_forward(_params_numpy(params), x, timestep, ctx, cfg)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)
