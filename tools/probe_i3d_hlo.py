"""Compiled-HLO diff of the flagship I3D at b1 vs b4 (VERDICT r5 item 1).

The I3D body's per-clip cost inflates ~1.5x from b1 to b4 on the real chip
(tools/bench_batch_scaling.py, docs/ROUND5_NOTES.md) even though per-clip
work is batch-independent. This probe compiles the same eval forward at
both batches on the active backend and prints, per batch: XLA cost_analysis
(flops / bytes accessed, normalized per clip) and a histogram of the
compiled executable's ops (convolutions by shape, copies, transposes,
reduce-windows, fusion count). A per-clip bytes-accessed blowup or an op
histogram delta (extra copies, layout changes, algorithm switches) names
the regression mechanism that per-component timing cannot see.

Usage: python tools/probe_i3d_hlo.py [--batches 1,4] [--cull] [--dump DIR]
"""
from __future__ import annotations

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_gar_tpu.models.i3d import InceptionI3d


def op_histogram(txt: str) -> dict:
    """Histogram of compiled-HLO ops that matter for the batch-scaling
    question: convolution shapes, copy/transpose/reshape counts, fusion
    count, reduce-window count."""
    hist = collections.Counter()
    conv_shapes = collections.Counter()
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"^(?:ROOT )?%?[\w.\-]+ = (\S+?)\[([\d,]*)\][^ ]* (\w+)",
                     line)
        if not m:
            continue
        op = m.group(3)
        if op in ("convolution", "copy", "transpose", "reshape", "fusion",
                  "reduce-window", "custom-call", "dot", "all-gather"):
            hist[op] += 1
            if op == "convolution":
                conv_shapes[f"{m.group(1)}[{m.group(2)}]"] += 1
    return {"ops": dict(hist), "conv_shapes": dict(conv_shapes)}


def main():
    argv = sys.argv[1:]
    batches = [1, 4]
    if "--batches" in argv:
        batches = [int(b) for b in
                   argv[argv.index("--batches") + 1].split(",")]
    cull = "--cull" in argv
    dump = (argv[argv.index("--dump") + 1] if "--dump" in argv else None)

    rng = np.random.default_rng(0)
    for bsz in batches:
        x = jnp.asarray(rng.normal(size=(bsz, 15, 720, 1280, 3))
                        .astype(np.float32))
        model = InceptionI3d(center_slice=cull)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        variables = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables)

        def fn(variables, xx):
            return jnp.sum(model.apply(variables, xx, train=False)
                           .astype(jnp.float32))

        compiled = jax.jit(fn).lower(variables, x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        txt = compiled.as_text()
        if dump:
            with open(os.path.join(dump, f"i3d_b{bsz}.hlo"), "w") as f:
                f.write(txt)
        row = {
            "batch": bsz,
            "flops_per_clip": float(ca.get("flops", 0.0)) / bsz,
            "bytes_per_clip": float(ca.get("bytes accessed", 0.0)) / bsz,
        }
        row.update(op_histogram(txt))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
