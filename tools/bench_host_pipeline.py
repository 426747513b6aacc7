"""Host input-pipeline throughput: on-disk mini-JRDB -> DataPipeline batches.

VERDICT r2 weak #6: every device-side number assumed a resident synthetic
batch; the true production bottleneck on a 1-core host is jpg decode + pcd
parse + voxelize + rulebook build. This writes a synthetic on-disk JRDB
(real jpg/pcd files in the reference layout), pushes it through
JRDBActDataset + DataPipeline (prefetch thread on, rulebook build on), and
reports host clips/s plus a per-stage breakdown — to be read side-by-side
with the device clips/s from bench.py. Matches the reference's DataLoader
role (dataloader.py:133-198).

Usage: python tools/bench_host_pipeline.py [--full-res]
  default: 480x854 frames, 8k-point scans (fits small tmp disk, ~minutes);
  --full-res: 720x1280 flagship frames, 25k-point dual scans, full
  2000x2000x40 voxel grid.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RULEBOOK_CAPS = (16000, 16000, 8000, 4000)


def main():
    full = "--full-res" in sys.argv
    hw = (720, 1280) if full else (480, 854)
    pts_per_scan = 25000 if full else 8000
    num_seqs, frames = (1, 17) if full else (2, 12)

    from multimodal_gar_tpu.config import (DataConfig, PointCloudConfig,
                                           VoxelizationConfig)
    from multimodal_gar_tpu.data.jrdb import JRDBActDataset
    from multimodal_gar_tpu.data.pipeline import DataPipeline
    from multimodal_gar_tpu.data.synthetic import write_synthetic_jrdb

    root = tempfile.mkdtemp(prefix="jrdb_bench_")
    try:
        t0 = time.perf_counter()
        write_synthetic_jrdb(root, num_seqs=num_seqs, frames_per_seq=frames,
                             people_per_frame=20, image_hw=hw,
                             points_per_scan=pts_per_scan,
                             point_range=90.0 if full else 14.0)
        print(f"wrote synthetic JRDB ({num_seqs}x{frames} frames @ {hw}, "
              f"{pts_per_scan} pts/scan) in {time.perf_counter() - t0:.1f}s",
              flush=True)

        if full:
            # the flagship working point (mil3.yaml / utils.testing)
            pc = PointCloudConfig(
                num_points=35000,
                range=(-100.0, -100.0, -25.0, 100.0, 100.0, 25.0),
                voxel=VoxelizationConfig((0.1, 0.1, 1.25), 5, 16000, 16000))
        else:
            pc = PointCloudConfig(
                num_points=16384,
                range=(-15.0, -15.0, -1.0, 15.0, 15.0, 3.0),
                voxel=VoxelizationConfig((0.05, 0.05, 0.1), 5, 16000, 16000))
        data = DataConfig(root=root, image_size=hw, num_frames=15,
                          num_boxes=100, point_cloud=pc)
        ds = JRDBActDataset(data, split="train",
                            rulebook_caps=RULEBOOK_CAPS)
        print(f"dataset: {len(ds)} key frames", flush=True)

        # --- per-stage breakdown on one mid-sequence key frame ---
        mid = len(ds) // 2
        sid, fid = ds.frames[mid]
        stages = {}
        t0 = time.perf_counter()
        for f in ds.clip_frame_ids(fid):
            ds._load_image(sid, f, fid)
        stages["decode_15_jpgs_s"] = time.perf_counter() - t0

        from multimodal_gar_tpu.data.pointcloud import load_dual_velodyne
        pc_path = os.path.join(ds.pc_root, ds.seq_names[sid],
                               f"{fid:06d}.pcd")
        t0 = time.perf_counter()
        pts = load_dual_velodyne(pc_path, num_points=pc.num_points,
                                 rng=np.random.default_rng(0),
                                 calibs=ds.velodyne_calibs)
        stages["load_pcd_pair_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        vox = ds.voxelizer(pts)
        stages["voxelize_s"] = time.perf_counter() - t0

        from multimodal_gar_tpu.data.rulebook import build_rulebook
        from multimodal_gar_tpu.data.voxelizer import pad_voxels
        _, coords, _, vvalid = pad_voxels(
            vox, ds.voxelizer.max_voxels, pc.num_point_features,
            pc.voxel.max_points_per_voxel)
        nx, ny, nz = pc.grid_size
        t0 = time.perf_counter()
        build_rulebook(coords, int(vvalid.sum()), (nz + 1, ny, nx),
                       RULEBOOK_CAPS)
        stages["build_rulebook_s"] = time.perf_counter() - t0
        print(json.dumps({"stage_breakdown_s":
                          {k: round(v, 3) for k, v in stages.items()}}),
              flush=True)

        pipe = DataPipeline(ds, batch_size=1, shuffle=False, prefetch=2,
                            with_eig=True)

        # cold epoch = decode throughput; the producer thread is ON, so this
        # measures the host path exactly as the train loop consumes it.
        results = {}
        for label, ep in (("cold", 0), ("warm_fs_cache", 1)):
            n = 0
            t0 = time.perf_counter()
            for batch in pipe.epoch(ep):
                n += int(np.asarray(batch.person_valid).shape[0])
            dt = time.perf_counter() - t0
            results[label] = n / dt
            print(f"host pipeline ({label}): {n} clips in {dt:.2f}s = "
                  f"{n / dt:.3f} clips/s (1 CPU core, prefetch=2)",
                  flush=True)

        # --- multi-process decode pool sweep (reference num_workers=4,
        # train_func.py:506). On a 1-core host workers just timeshare, so
        # alongside measured clips/s we report the projected N-core
        # requirement: cores ~= device_clips_per_sec / per_core_clips_per_sec.
        worker_counts = [2, 4]
        for a in sys.argv[1:]:
            if a.startswith("--workers="):
                worker_counts = [int(x) for x in a.split("=")[1].split(",")]
        pool_results = {}
        for w in worker_counts:
            wpipe = DataPipeline(ds, batch_size=1, shuffle=False, prefetch=2,
                                 with_eig=True, num_workers=w)
            try:
                n = 0
                t0 = time.perf_counter()
                for batch in wpipe.epoch(1):
                    n += int(np.asarray(batch.person_valid).shape[0])
                dt = time.perf_counter() - t0
                pool_results[str(w)] = round(n / dt, 4)
                print(f"host pipeline (pool workers={w}): {n} clips in "
                      f"{dt:.2f}s = {n / dt:.3f} clips/s", flush=True)
            finally:
                wpipe.close()
        per_core = results["warm_fs_cache"]
        print(json.dumps({
            "host_clips_per_sec": round(results["warm_fs_cache"], 4),
            "pool_clips_per_sec": pool_results,
            "per_core_clips_per_sec": round(per_core, 4),
            "cores_needed_for_device_rate":
                {str(d): round(d / per_core, 1) for d in (13.45, 16.0, 20.0)},
            "full_res": full,
            "stage_breakdown_s": {k: round(v, 3) for k, v in stages.items()},
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
