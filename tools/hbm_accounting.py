"""Per-tensor HBM accounting for the monolithic eval program (VERDICT r3 #5).

For each (batch, dtype) at the flagship 40k-voxel eval point, AOT-compile the
monolithic eval forward and print XLA's memory analysis (argument / output /
temp / peak bytes). If compilation itself fails with an allocation error, the
error text is the accounting: XLA's OOM report lists the largest buffer
assignments — print its tail. This answers "batch-8 monolithic eval or the
HBM math that forbids it" (eval semantics of reference gat_model.py:1828-1853)
without guessing.

Usage: python tools/hbm_accounting.py [b1,b2,...] [--dtypes f32,bf16]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench

GB = 1024 ** 3


def analyze(batch_size: int, dtype: str):
    fn, variables, batch = bench.build_eval(batch_size, dtype=dtype)
    try:
        compiled = jax.jit(fn).lower(variables, batch).compile()
    except Exception as e:
        msg = str(e)
        print(f"b={batch_size} {dtype}: COMPILE FAILED — tail of XLA report:",
              flush=True)
        print(msg[-3000:], flush=True)
        return {"batch": batch_size, "dtype": dtype, "fits": False,
                "error_head": msg[:300]}
    row = {"batch": batch_size, "dtype": dtype, "fits": True}
    try:
        m = compiled.memory_analysis()
        row.update({
            "argument_gb": round(m.argument_size_in_bytes / GB, 3),
            "output_gb": round(m.output_size_in_bytes / GB, 3),
            "temp_gb": round(m.temp_size_in_bytes / GB, 3),
            "peak_gb": round((m.argument_size_in_bytes
                              + m.output_size_in_bytes
                              + m.temp_size_in_bytes) / GB, 3),
        })
    except Exception as e:
        row["memory_analysis_error"] = str(e)[:200]
    print(json.dumps(row), flush=True)
    return row


def main():
    batches = [1, 2, 4, 8]
    dtypes = ["float32", "bfloat16"]
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--dtypes"):
            # accept both --dtypes=f32,bf16 and --dtypes f32,bf16
            if "=" in a:
                spec = a.split("=", 1)[1]
            else:
                i += 1
                spec = argv[i]
            dtypes = [{"f32": "float32", "bf16": "bfloat16"}.get(n, n)
                      for n in spec.split(",")]
        elif not a.startswith("--"):
            batches = [int(x) for x in a.split(",")]
        i += 1
    rows = [analyze(b, d) for d in dtypes for b in batches]
    print("SUMMARY " + json.dumps(rows))


if __name__ == "__main__":
    main()
