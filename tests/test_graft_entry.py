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

import json
import os
import subprocess
import sys

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


def test_dryrun_budget_expiry_emits_parseable_partial_and_exits_zero():
    """Rounds 3 and 4 lost the multichip artifact to rc=124 with an EMPTY
    tail.  The round-5 contract: on self-budget expiry the driver-spawned
    child prints a PARTIAL but parseable ``DRYRUN_JSON`` line (with
    ``budget_exhausted: true``) and exits 0.  Pin it with budget=0 so every
    case is budget-skipped — the cheapest possible end-to-end run of the
    expiry path."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env[graft._CHILD_ENV] = "1"  # the driver-child path (arms the watchdog)
    env["VDPP_DRYRUN_BUDGET_S"] = "0"
    env.pop("VDPP_DRYRUN_MARKER", None)
    code = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(2)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("DRYRUN_JSON=")
    ]
    assert len(json_lines) == 1, proc.stdout
    payload = json.loads(json_lines[0][len("DRYRUN_JSON="):])
    assert payload["budget_exhausted"] is True
    assert payload["n_devices"] == 2
    # Nothing ran, so ok must be false — but every case is accounted for.
    assert payload["ok"] is False
    assert payload["cases"], payload
    assert all(
        v in ("skipped", "skipped_budget") for v in payload["cases"].values()
    ), payload
    # Per-case lines were flushed before the final verdict (never an
    # empty tail again).
    assert any(
        ln.startswith("DRYRUN_CASE ") for ln in proc.stdout.splitlines()
    ), proc.stdout


def test_dryrun_source_never_probes_devices_before_reexec():
    """Regression guard: no jax.devices()/jax.local_devices() call may
    precede the re-exec decision in dryrun_multichip."""
    import inspect

    src = inspect.getsource(graft.dryrun_multichip)
    reexec_at = src.index("_reexec_on_virtual_cpu_mesh")
    head = src[:reexec_at]
    assert "jax.devices" not in head and "local_devices" not in head
