"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-build analogue of the reference's CPU/Gloo simulator
(reference: src/modes/simulator.py): distributed *logic* is verified on a
host-platform mesh; performance runs happen on real TPU.

Note: the environment may pre-register a TPU PJRT plugin and pin
``JAX_PLATFORMS`` — ``jax.config.update`` below overrides it reliably.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persist compiled executables across test runs (keyed by HLO + jax
# version — safe by construction); the suite is compile-dominated.
from vdpp_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
