"""The driver's checkable artifacts must work on ANY host.

Round-1 shipped with ``dryrun_multichip`` asserting >= 8 real devices, which
failed on the 1-TPU bench host (MULTICHIP_r01.json ok=false) while all 137
component tests stayed green — because nothing invoked the entry point
itself.  These tests run it exactly the way the driver does: a fresh
subprocess, no test-harness env, letting ``dryrun_multichip`` provision its
own virtual mesh.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """An env like the driver's bench host: no forced CPU platform."""
    env = os.environ.copy()
    # conftest exports JAX_PLATFORMS=cpu for subprocesses; drop it so the
    # entry point has to do its own provisioning (axon isn't importable in
    # the test sandbox, so unset entirely -> jax picks its default).
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_self_provisions():
    """dryrun_multichip(8) must pass in a subprocess with no special env."""
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code, REPO],
        cwd=REPO, env=_clean_env(), text=True, capture_output=True,
        timeout=1200,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    assert "dryrun_multichip OK" in proc.stdout


def test_entry_compiles():
    """entry() must return a jittable fn + example args (driver contract).

    The subprocess pins the CPU backend via jax.config (NOT the env var:
    the image's sitecustomize re-registers the axon platform at every
    interpreter start, clobbering JAX_PLATFORMS — and axon backend init
    hangs for minutes when the relay is down)."""
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import jax; "
        "jax.config.update('jax_platforms', 'cpu'); "
        "from __graft_entry__ import entry; "
        "fn, args = entry(); "
        "out = jax.jit(fn)(*args); "
        "jax.block_until_ready(out); "
        "print('entry OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code, REPO],
        cwd=REPO, env=os.environ.copy(), text=True, capture_output=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    assert "entry OK" in proc.stdout
