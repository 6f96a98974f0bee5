"""Standalone repro harness for the XLA:CPU accumulated-executables crash.

The incident (2026-08-18, recorded in CLAUDE.md and tests/conftest.py):
full-suite pytest runs on this host died DETERMINISTICALLY with SIGSEGV
inside a plain XLA:CPU ``backend_compile_and_load`` — always at the same
test (test_deepcache's int8 x lax.cond case), with the persistent
compile cache fully disabled, with and without an
``--xla_cpu_max_isa=AVX2`` codegen cap — while the same test passes in
any fresh process and its module passes alone. The empirical trigger was
the ACCUMULATED LIVE EXECUTABLE SET of the preceding modules; the
workaround that has been green since is ``jax.clear_caches()`` at module
boundaries (tests/conftest.py autouse fixture).

This script reproduces that load pattern OUTSIDE pytest so the
workaround has a tracked, bisectable cause:

  1. compile-and-keep-alive N distinct CPU programs on an 8-device
     virtual mesh (shape/dtype-varied: jit, shard_map+ppermute/scan,
     lax.cond — the suite's program mix);
  2. then compile the incident-shaped program (int8-dequant conv inside
     a ``lax.cond`` branch under a multi-step scan);
  3. report PASS, or die in the child with the signal — the parent
     prints the rc either way.

Usage:
    python scripts/repro_xla_cpu_segfault.py [--programs 300] [--clear-every 0]

``--clear-every K`` calls jax.clear_caches() every K programs (0 = never
— the incident configuration; the conftest workaround corresponds to
K ~ tens). The probe runs in a SUBPROCESS so a segfault is captured as a
negative returncode instead of killing the harness.

``--from-suite`` replays the real suite via pytest with the conftest
fixture DISABLED (VDPP_NO_CLEAR_CACHES=1) — the exact incident
configuration. See docs/performance.md "XLA:CPU accumulated-executables
segfault" for the latest run status of both modes on this host.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(n_programs: int, clear_every: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = jax.make_mesh((8,), ("stage",))
    keep = []  # hold every executable live, like a pytest process does

    def make_program(i: int):
        """A shape/structure-varied program from the suite's mix."""
        k = i % 4
        n = 8 + (i % 13)
        if k == 0:  # plain jit matmul+elementwise chain
            def f(x):
                for _ in range(1 + i % 3):
                    x = jnp.tanh(x @ x.T)
                return x.sum()

            return jax.jit(f), (jnp.ones((n, n + 1), jnp.float32),)
        if k == 1:  # shard_map ring ppermute + scan (pipeline shape)
            def body(x):
                def step(c, _):
                    c = jax.lax.ppermute(c, "stage",
                                         [(j, (j + 1) % 8) for j in range(8)])
                    return c * 1.01, ()

                y, _ = jax.lax.scan(step, x, None, length=4 + i % 5)
                return y

            f = jax.jit(jax.shard_map(
                body, mesh=mesh, in_specs=P("stage"), out_specs=P("stage"),
                check_vma=False,
            ))
            return f, (jnp.ones((8, n), jnp.float32),)
        if k == 2:  # lax.cond with asymmetric branches
            def f(flag, x):
                return jax.lax.cond(
                    flag, lambda v: (v @ v.T).sum(), lambda v: v.sum(), x
                )

            return jax.jit(f), (jnp.bool_(i % 2), jnp.ones((n, n), jnp.float32))
        # k == 3: int8 dequant matmul (quant-path shape)
        def f(w, s, x):
            return (x @ (w.astype(jnp.float32) * s)).sum()

        return jax.jit(f), (
            jnp.ones((n, n), jnp.int8), jnp.float32(0.02),
            jnp.ones((4, n), jnp.float32),
        )

    for i in range(n_programs):
        f, args = make_program(i)
        out = f(*args)
        jax.block_until_ready(out)
        keep.append(f)
        if clear_every and (i + 1) % clear_every == 0:
            jax.clear_caches()
        if (i + 1) % 50 == 0:
            print(f"  {i + 1}/{n_programs} programs live", flush=True)

    # The incident-shaped compile: int8-dequant conv in a cond branch
    # under a scan (test_deepcache.test_composes_with_int8_weights's
    # structure, distilled).
    print("compiling the incident-shaped program ...", flush=True)
    w8 = jnp.ones((3, 3, 8, 8), jnp.int8)
    scale = jnp.float32(0.05)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(jnp.float32) * scale, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def step(x, k):
        full = (k % 2) == 0
        x = jax.lax.cond(
            full, lambda v: conv(v, w8), lambda v: conv(v * 0.5, w8) + v, x
        )
        return x, ()

    def sched(x):
        y, _ = jax.lax.scan(step, x, jnp.arange(6, dtype=jnp.int32))
        return y.sum()

    out = jax.jit(sched)(jnp.ones((2, 16, 16, 8), jnp.float32))
    jax.block_until_ready(out)
    print(f"PASS: incident-shaped program compiled and ran ({float(out):.3f}) "
          f"with {len(keep)} live executables", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", type=int, default=300)
    ap.add_argument("--clear-every", type=int, default=0)
    ap.add_argument("--from-suite", action="store_true",
                    help="replay the real suite prefix (pytest up to and "
                         "incl. test_deepcache) with the conftest "
                         "clear_caches fixture disabled")
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._child:
        _child(args.programs, args.clear_every)
        return 0

    if args.from_suite:
        env = dict(os.environ, VDPP_NO_CLEAR_CACHES="1")
        cmd = [sys.executable, "-m", "pytest", "tests/", "-x", "-q",
               "--deselect", "tests/test_xt_unet_golden.py"]
        print("replaying the suite prefix with clear_caches disabled "
              "(the incident configuration); this takes ~the full suite "
              "time ...", flush=True)
        rc = subprocess.call(cmd, cwd=REPO, env=env)
    else:
        cmd = [sys.executable, os.path.abspath(__file__), "--_child",
               "--programs", str(args.programs),
               "--clear-every", str(args.clear_every)]
        rc = subprocess.call(cmd, cwd=REPO)
    if rc < 0:
        print(f"REPRODUCED: child died with signal {-rc}", flush=True)
    else:
        print(f"child exited rc={rc} "
              f"({'ok' if rc == 0 else 'failed without a signal'})",
              flush=True)
    return 0 if rc == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
