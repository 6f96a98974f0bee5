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
