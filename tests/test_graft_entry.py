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
