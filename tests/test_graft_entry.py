"""Driver entry-point contract tests.

The round-1 official multi-chip artifact failed because ``dryrun_multichip``
did not self-provision a virtual mesh when the active platform (one tunneled
TPU chip) had fewer devices than requested.  These tests pin both paths:

* in-process: conftest provides an 8-device CPU platform, so the dryrun body
  runs directly;
* re-exec: the child-interpreter path used under the driver (where
  ``JAX_PLATFORMS=axon`` is pinned and only one device exists) must provision
  its own ``--xla_force_host_platform_device_count`` mesh and succeed.
"""

import jax

import __graft_entry__ as graft


def test_dryrun_in_process_on_virtual_mesh():
    # conftest forces an 8-CPU platform; 8 >= 4 so no re-exec happens.
    assert len(jax.devices()) >= 4
    graft.dryrun_multichip(4)


def test_dryrun_reexec_provisions_virtual_mesh():
    # Exercise the child-interpreter path directly: it must build its own
    # 2-device CPU mesh regardless of this process's JAX state.
    graft._reexec_on_virtual_cpu_mesh(2)


def test_needs_reexec_is_env_only(monkeypatch):
    """The re-exec decision must come from configuration alone — round 3's
    MULTICHIP artifact timed out because the old probe initialized the
    tunneled axon backend (a ~25 min hang during an outage) on a path
    whose job is the tunnel-free virtual CPU mesh."""
    # conftest pins platform cpu with 8 forced host devices: fits 8, not 16.
    monkeypatch.delenv(graft._CHILD_ENV, raising=False)
    monkeypatch.delenv("VDPP_DRYRUN_REAL", raising=False)
    assert not graft._needs_reexec(8)
    assert graft._needs_reexec(16)
    # Child interpreters and the explicit real-platform opt-in never re-exec.
    monkeypatch.setenv(graft._CHILD_ENV, "1")
    assert not graft._needs_reexec(16)
    monkeypatch.delenv(graft._CHILD_ENV)
    monkeypatch.setenv("VDPP_DRYRUN_REAL", "1")
    assert not graft._needs_reexec(16)


def test_dryrun_source_never_probes_devices_before_reexec():
    """Regression guard: no jax.devices()/jax.local_devices() call may
    precede the re-exec decision in dryrun_multichip."""
    import inspect

    src = inspect.getsource(graft.dryrun_multichip)
    reexec_at = src.index("_reexec_on_virtual_cpu_mesh")
    head = src[:reexec_at]
    assert "jax.devices" not in head and "local_devices" not in head
