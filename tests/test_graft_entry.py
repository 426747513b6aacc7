"""The driver entry points stay healthy: entry() traces, dryrun runs."""
import jax
import numpy as np


def test_entry_traces_and_shapes():
    """entry() must be jittable; validate via abstract tracing (eval_shape)
    so the full-res program is checked without executing it on CPU."""
    import __graft_entry__ as ge
    fn, (variables, batch) = ge.entry()
    out = jax.eval_shape(fn, variables, batch)
    assert out.a_theta.shape == (1, 100, 100)
    assert out.card.shape == (1, 1)
    assert out.pose[0].shape == (1, 100, 4)
    assert batch.images.shape == (1, 15, 720, 1280, 3)
    assert batch.rulebook is not None


def test_dryrun_multichip_2_devices():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)   # 2 devices -> (data=1, fsdp=2) mesh


def test_dryrun_multichip_subprocess_fallback():
    """Driver contract: calling dryrun_multichip(8) from a process whose jax
    backend has ONE device must still succeed (re-exec with a CPU mesh) —
    this is exactly the call that produced MULTICHIP_r01.json rc=1."""
    import os
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');\n"
            "import __graft_entry__ as ge\n"
            "assert jax.device_count() == 1, jax.device_count()\n"
            "ge.dryrun_multichip(8)\n")
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo_root, env=env,
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout
