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

# No-op on the CPU backend by policy (utils/compile_cache.py: XLA:CPU
# executables don't survive cross-process (de)serialization on this host
# class); kept so a TPU-backed test invocation still gets the cache.
from vdpp_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live jit caches/executables at each module boundary.

    A full-suite process accumulates hundreds of compiled CPU programs;
    on this host that state deterministically segfaulted a later
    XLA:CPU compile (2026-08-18: test_deepcache's int8 x lax.cond test
    crashed inside backend_compile_and_load at the SAME point in every
    full run — with the persistent cache disabled and with/without an
    --xla_cpu_max_isa=AVX2 codegen cap — yet passes in any fresh
    process, even running its whole module alone). Running the exact
    same file prefix WITH this fixture is green, so bounding the live-
    executable set per module is the empirically sufficient fix.
    Modules share essentially no compilations, so the recompile cost is
    negligible.

    VDPP_NO_CLEAR_CACHES=1 disables the workaround — used ONLY by
    scripts/repro_xla_cpu_segfault.py --from-suite to replay the exact
    incident configuration.
    """
    yield
    if os.environ.get("VDPP_NO_CLEAR_CACHES") != "1":
        jax.clear_caches()
