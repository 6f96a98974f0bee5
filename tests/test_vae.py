"""VAE encoder / temporal decoder tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdpp_tpu.models.vae import TemporalVAEDecoder, VAEConfig, VAEEncoder


@pytest.fixture(scope="module")
def enc():
    cfg = VAEConfig.tiny()
    e = VAEEncoder(cfg)
    return cfg, e, e.init(jax.random.key(0))


@pytest.fixture(scope="module")
def dec():
    cfg = VAEConfig.tiny()
    d = TemporalVAEDecoder(cfg)
    return cfg, d, d.init(jax.random.key(1))


def test_encoder_shape(enc):
    cfg, e, params = enc
    # tiny config has 2 levels -> one stride-2 downsample (factor 2).
    img = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    m = e.apply(params, img)
    assert m.shape == (2, 16, 16, 2 * cfg.latent_channels)
    z = e.mode(m)
    assert z.shape == (2, 16, 16, cfg.latent_channels)


def test_decoder_shape(dec):
    cfg, d, params = dec
    lat = jax.random.normal(jax.random.key(3), (1, 4, 8, 8, cfg.latent_channels))
    video = d.apply(params, lat)
    assert video.shape == (1, 4, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(video)))


def test_decoder_temporal_coupling(dec):
    # The temporal convs couple frames: changing frame 0 must change the
    # decode of frame 1 (within the temporal receptive field).
    cfg, d, params = dec
    lat = jax.random.normal(jax.random.key(4), (1, 4, 8, 8, cfg.latent_channels))
    lat2 = lat.at[:, 0].add(1.0)
    v1 = d.apply(params, lat)
    v2 = d.apply(params, lat2)
    assert not np.allclose(np.asarray(v1[:, 1]), np.asarray(v2[:, 1]))


def test_decode_chunked_shapes(dec):
    cfg, d, params = dec
    lat = jax.random.normal(jax.random.key(5), (1, 6, 8, 8, cfg.latent_channels))
    full = d.apply(params, lat)
    chunked = d.decode_chunked(params, lat, chunk_frames=2)
    assert chunked.shape == full.shape
    assert bool(jnp.all(jnp.isfinite(chunked)))
    # Note: chunked decode is NOT bit-equal to full decode — temporal
    # convs and cross-frame GroupNorm statistics change with the chunk
    # boundary. The reference's decode_chunk_size has the same property.
    # Outputs should still be in the same ballpark statistically.
    assert abs(float(jnp.std(chunked)) - float(jnp.std(full))) < 0.5 * float(
        jnp.std(full)
    )


def test_roundtrip_runs(enc, dec):
    cfg_e, e, pe = enc
    cfg_d, d, pd = dec
    img = jax.random.normal(jax.random.key(6), (4, 32, 32, 3))  # 4 frames
    z = e.mode(e.apply(pe, img))  # (4, 16, 16, C)
    zf = z[None]  # (1, 4, 16, 16, C)
    out = d.apply(pd, zf)
    assert out.shape == (1, 4, 32, 32, 3)


def test_decode_data_parallel_matches_chunked(dec):
    from vdpp_tpu.parallel.mesh import make_data_mesh

    cfg, d, params = dec
    lat = jax.random.normal(jax.random.key(7), (1, 6, 8, 8, cfg.latent_channels))
    mesh = make_data_mesh(4)
    out_dp = d.decode_data_parallel(params, lat, mesh, chunk_frames=2)
    out_seq = d.decode_chunked(params, lat, chunk_frames=2)
    assert out_dp.shape == out_seq.shape
    np.testing.assert_allclose(
        np.asarray(out_dp), np.asarray(out_seq), rtol=2e-5, atol=2e-5
    )


def test_decode_data_parallel_partial_chunk_matches_chunked(dec):
    """f % chunk_frames != 0: the trailing partial chunk must decode at
    its true length (regression: frame-padding used to bleed zeros into
    real frames through the temporal convs of the mixed chunk)."""
    from vdpp_tpu.parallel.mesh import make_data_mesh

    cfg, d, params = dec
    lat = jax.random.normal(jax.random.key(40), (1, 6, 8, 8, cfg.latent_channels))
    out_dp = d.decode_data_parallel(params, lat, make_data_mesh(2), chunk_frames=4)
    out_seq = d.decode_chunked(params, lat, chunk_frames=4)
    np.testing.assert_allclose(
        np.asarray(out_dp), np.asarray(out_seq), rtol=1e-5, atol=1e-5
    )
