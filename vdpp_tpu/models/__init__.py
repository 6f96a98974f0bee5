"""Model zoo: denoisers exposing the ``apply(params, latent, step) -> latent``
contract consumed by the pipeline engine (the functional analogue of the
reference's ``forward(latent, step)`` interface,
reference: src/pipeline/pipeline.py:95)."""

from vdpp_tpu.models.dummy_unet import DummyUNet

__all__ = ["DummyUNet"]
