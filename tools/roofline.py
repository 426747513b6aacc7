"""Roofline accounting for the flagship eval forward (VERDICT r4 item 2).

For each forward component (stem, I3D body, sparse backbone / lidar, RGB
post, fusion+heads) this prints: XLA-reported FLOPs and HBM bytes accessed
(from ``jit(fn).lower(args).compile().cost_analysis()``), and — when a
measured-ms JSONL from tools/bench_batch_scaling.py is supplied — achieved
TF/s and GB/s against the v5e peaks (197 TF/s bf16 / ~819 GB/s HBM), plus
the binding roofline and the % of it achieved. Components below ~40% of
their binding bound are this round's optimization (or named-blocker) list.

The FLOP/byte numbers come from the compiled executable, so they include
XLA's actual fusion/layout choices (not hand math). bytes_accessed counts
HBM traffic of each fusion's operands/outputs; intra-fusion reuse is free,
which matches the roofline's HBM axis.

Usage:
  python tools/roofline.py [--cap 40000] [--batch 1]
      [--ms-jsonl /tmp/batch_scaling_r5.jsonl]
      [--components full,stem,i3d,rgb,lidar]
      [--overrides model.rgb.i3d_center_slice=true]
Prints one JSON line per component.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.bench_batch_scaling import build_probes
from multimodal_gar_tpu.utils.testing import flagship_config, synthetic_batch

PEAK_TFLOPS = 197.0     # v5e bf16 MXU peak (f32 ops also route via MXU)
PEAK_GBS = 819.0        # v5e HBM bandwidth


def cost_of(fn, args):
    compiled = jax.jit(fn).lower(args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):       # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def load_ms(path, batch):
    ms = {}
    if not path or not os.path.exists(path):
        return ms
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            row = json.loads(line)
            if row.get("batch") == batch and "ms" in row:
                ms[row["component"].split("=")[0]] = row["ms"]
    return ms


def main():
    argv = sys.argv[1:]

    def arg(flag, default):
        return argv[argv.index(flag) + 1] if flag in argv else default

    cap = int(arg("--cap", "40000"))
    batch = int(arg("--batch", "1"))
    components = arg("--components", "full,stem,i3d,rgb,lidar").split(",")
    ms_path = arg("--ms-jsonl", "/tmp/batch_scaling_r5.jsonl")

    cfg = flagship_config(max_voxels=cap)
    if "--overrides" in argv:
        import yaml
        from multimodal_gar_tpu.config import _apply_override
        for ov in arg("--overrides", "").split(","):
            key, _, raw = ov.partition("=")
            cfg = _apply_override(cfg, key.strip().split("."),
                                  yaml.safe_load(raw))

    batch_data = synthetic_batch(cfg, batch_size=batch, n_valid=100)
    probes = build_probes(cfg, batch_data, components)
    measured = load_ms(ms_path, batch)

    rows = {}
    for name, (fn, _perturb, args) in probes.items():
        try:
            flops, bytes_ = cost_of(fn, args)
        except Exception as e:
            msg = str(e).splitlines()[-1][-300:] if str(e) else repr(e)
            print(json.dumps({"component": name, "error": msg}), flush=True)
            continue
        rows[name] = (flops, bytes_)
        emit(name, flops, bytes_, measured.get(name), batch)

    # derived splits mirror bench_batch_scaling: body = i3d - stem,
    # rgb_post = rgb - i3d, tail = full - rgb - lidar
    for name, hi, lo in (("body", "i3d", "stem"), ("rgb_post", "rgb", "i3d")):
        if hi in rows and lo in rows:
            f = rows[hi][0] - rows[lo][0]
            b = rows[hi][1] - rows[lo][1]
            m = None
            if hi in measured and lo in measured:
                m = measured[hi] - measured[lo]
            emit(name, f, b, m, batch, derived=True)
    if all(k in rows for k in ("full", "rgb", "lidar")):
        f = rows["full"][0] - rows["rgb"][0] - rows["lidar"][0]
        b = rows["full"][1] - rows["rgb"][1] - rows["lidar"][1]
        m = None
        if all(k in measured for k in ("full", "rgb", "lidar")):
            m = measured["full"] - measured["rgb"] - measured["lidar"]
        emit("tail", f, b, m, batch, derived=True)


def emit(name, flops, bytes_, ms, batch, derived=False):
    row = {"component": name, "batch": batch, "gflops": round(flops / 1e9, 2),
           "hbm_gb": round(bytes_ / 1e9, 3),
           "arith_intensity": round(flops / max(bytes_, 1.0), 1)}
    # the machine-balance point: below ~240 FLOP/byte (197e12/819e9) a
    # component is HBM-bound; above it, MXU-bound
    balance = PEAK_TFLOPS * 1e12 / (PEAK_GBS * 1e9)
    row["bound"] = "hbm" if row["arith_intensity"] < balance else "mxu"
    if ms is not None:
        sec = ms / 1e3
        tfs = flops / sec / 1e12
        gbs = bytes_ / sec / 1e9
        row.update(ms=round(ms, 2), achieved_tflops=round(tfs, 2),
                   achieved_gbs=round(gbs, 1))
        frac = (gbs / PEAK_GBS) if row["bound"] == "hbm" \
            else (tfs / PEAK_TFLOPS)
        row["pct_of_binding_roofline"] = round(100 * frac, 1)
    if derived:
        row["derived"] = True
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
