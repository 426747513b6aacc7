"""Typed configuration tree for the MGAR-TPU framework.

Capability parity with the reference's YAML->EasyDict config system
(/root/reference/pcdet/config.py:51-98 and Multimodal_cfg/mil3.yaml), redesigned as
typed dataclasses: no mutable global singletons, explicit defaults, YAML loading with
recursive merge + ``_BASE_CONFIG_`` inheritance + dotted-path overrides.
"""
from __future__ import annotations

import dataclasses
import pathlib
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml


# ---------------------------------------------------------------------------
# Data / input pipeline
# ---------------------------------------------------------------------------

@dataclass
class VoxelizationConfig:
    """Voxelizer settings (reference: mil3.yaml DATA_PROCESSOR transform_points_to_voxels)."""
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 1.25)
    max_points_per_voxel: int = 5
    max_voxels_train: int = 16000
    max_voxels_test: int = 40000

    def max_voxels(self, training: bool) -> int:
        return self.max_voxels_train if training else self.max_voxels_test


@dataclass
class PointCloudConfig:
    """Point-cloud pipeline (reference: mil3.yaml train.augmentation.point_cloud + ranges)."""
    num_points: int = 35000
    range: Tuple[float, float, float, float, float, float] = (
        -100.0, -100.0, -25.0, 100.0, 100.0, 25.0)
    num_point_features: int = 4  # x, y, z, intensity
    shuffle_train: bool = True
    voxel: VoxelizationConfig = field(default_factory=VoxelizationConfig)

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        """(nx, ny, nz) = round((range_max - range_min) / voxel_size).

        Reference: data_processor.py:134-135. mil3.yaml => (2000, 2000, 40).
        """
        vs = self.voxel.voxel_size
        return tuple(
            int(round((self.range[i + 3] - self.range[i]) / vs[i])) for i in range(3)
        )


@dataclass
class DataConfig:
    """Dataset layout + per-sample padding (reference: dataloader.py:16-77, mil3.yaml DATALOADER)."""
    root: str = ""
    image_size: Tuple[int, int] = (720, 1280)  # (H, W) after resize
    num_frames: int = 15
    num_boxes: int = 100          # MAX people per scene, padded
    num_actions: int = 27
    crop_size: int = 5            # RoIAlign output size
    point_cloud: PointCloudConfig = field(default_factory=PointCloudConfig)
    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # STRICT-COMPAT (reference dataloader.py:264): the reference reads the
    # action/activity labels from the FIRST frame of the 15-frame clip while
    # boxes/ids come from the key frame. False (default) = labels from the
    # key frame (the fix); True = bug-compatible clip-start labels.
    actions_from_clip_start: bool = False
    # JPEG DCT-domain pre-scaling on decode (PIL Image.draft): near-free
    # power-of-two downscale inside libjpeg when the source is >= 2x the
    # target size; a no-op otherwise. False = full decode + bilinear only
    # (bit-parity with the reference's torchvision Resize path).
    jpeg_draft: bool = True
    # Ship raw uint8 frames to the device and normalize there (MGAR entry):
    # 4x fewer host->device bytes per clip and no host float math. False =
    # host-side float normalize (the reference's torchvision pipeline).
    images_uint8: bool = False


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

@dataclass
class RGBBackboneConfig:
    """Reference: mil3.yaml RGB_BACKBONE + gat_model.py:973-1095."""
    i3d_endpoint: str = "Mixed_4f"
    i3d_freeze: bool = True
    embedding_dim: int = 512
    inter_person: bool = False
    two_stage_att: bool = False
    gat_module: bool = False
    i3d_checkpoint: Optional[str] = None   # converted Kinetics weights (.npz); None = random init
    # TPU eval-path stem: Pallas im2col-GEMM kernel with folded BN+ReLU
    # (ops/pallas/stem_conv.py); False = XLA space-to-depth stem.
    pallas_stem: bool = True
    # jax.checkpoint the I3D Inception modules in the backward pass
    # (activation-HBM for recompute-FLOPs; enables larger train batches).
    i3d_remat: bool = False
    # eval-path (3,3,3) convs as 3 temporally-shifted native 2D convs
    # (models/i3d.py:_conv3d_t2d). Perf experiment; exact same sums.
    i3d_t2d: bool = False
    # post-stem I3D convs in bfloat16 while keeping the f32 Pallas stem
    # (InceptionI3d.body_dtype); features re-cast to f32 after extraction.
    i3d_bf16_body: bool = False
    # temporal-cone culling of the Mixed_4x modules to the backward cone of
    # Mixed_4f's center slice — the only slice the model consumes
    # (gat_model.py:1050). Exact (value-identical features); Mixed_4f runs
    # 1/4 of its temporal positions at the flagship T=15. Eval-only (the
    # rgb backbone gates it off under train-mode BN). On-chip A/B: body
    # 16.87 vs 17.99 ms/clip at b1, 25.71 vs 28.43 at b4 (ROUND5_NOTES).
    i3d_center_slice: bool = True
    # bf16 product split of the Pallas stem kernel (1 | 2 | 3): 3 is the
    # designed error-compensated split; 1 is plain bf16 — one third of the
    # MXU issue and half the DMA/patch traffic. On this image's Mosaic the
    # 3-pass compensation is dropped anyway (1.6e-3 measured vs 1.7e-3 for
    # 1-pass, both bf16 class), so 1 trades ~no accuracy for ~5 ms/clip
    # (fused-affine A/B 22.65 -> 17.55 ms, tools/bench_stem.py 2026-08-19).
    pallas_stem_passes: int = 1
    # round-5 di-major stem kernel (ops/pallas/stem_conv.py
    # _stem_kernel_dimajor): one lane-shifted patch per dj instead of one
    # per (row pair, dj) — identical sums, ~45% less VMEM copy traffic.
    # Measured a wash on chip (17.0/17.7 vs 17.3 ms, 2026-08-20): the
    # kernel is not patch-copy-bound. Kept for the record.
    pallas_stem_dimajor: bool = False
    # round-5 cout-major stem output (ops/pallas/stem_conv.py cmajor=True):
    # replaces the 8 per-program (cout, n) VPU output transposes with pure
    # sublane splits + ONE XLA-side HBM-bandwidth transpose. Identical sums.
    pallas_stem_cmajor: bool = False
    # round-5 aliased-BlockSpec stem (ops/pallas/stem_conv.py
    # pipelined=True): the window arrives through 8 aliased block-spec'd
    # views instead of a synchronous in-kernel DMA, so the Pallas grid
    # pipeline prefetches the next program's window during compute.
    # Identical sums (bitwise-parity-tested vs the manual-DMA kernel);
    # requires pallas_stem_passes=1 and the flagship kt=7/ks=4 geometry,
    # falling back to the manual-DMA kernel otherwise. On-chip A/B
    # (2026-08-20, flagship fused-affine stem): 15.44 ms vs 17.11 manual
    # (-10%, outside the ±0.6 noise band) — default ON.
    pallas_stem_pipelined: bool = True
    # eval-path batched I3D as batched stem + Python-unrolled per-clip body
    # (InceptionI3d.batch_unroll): XLA's folded-batch layout of the small
    # Mixed_4x convs executes super-linearly (body per-clip ms inflates 1.5x
    # b1->b4 at identical per-clip FLOPs/bytes), while B copies of the b1
    # body keep each clip on the b1 fast path. Exact under eval-mode BN.
    # On-chip A/B (2026-08-19, cull+1-pass-stem defaults): i3d b4 39.18
    # ms/clip unrolled vs 53.5 folded (b1 40.13) — the inversion is gone.
    i3d_batch_unroll: bool = True


@dataclass
class PoolLayerConfig:
    """One ROI-grid pooling scale (reference: mil3.yaml ROI_GRID_POOL.POOL_LAYERS.x_convK)."""
    source: str = "x_conv2"
    mlps: Tuple[int, int] = (32, 32)
    query_range: Tuple[int, int, int] = (4, 4, 4)  # (z, y, x) half-window in voxels
    radius: float = 0.4
    nsample: int = 16
    pool_method: str = "max_pool"


@dataclass
class LiDARBackboneConfig:
    """Reference: mil3.yaml LiDAR_BACKBONE + gat_model.py:868-971."""
    grid_pool_size: int = 6        # 6x6x6 grid points per box
    shared_fc: Tuple[int, ...] = (512, 512)
    dp_ratio: float = 0.3
    pool_layers: Tuple[PoolLayerConfig, ...] = (
        PoolLayerConfig("x_conv2", (32, 32), (4, 4, 4), 0.4, 16),
        PoolLayerConfig("x_conv3", (32, 32), (4, 4, 4), 0.8, 16),
        PoolLayerConfig("x_conv4", (32, 32), (4, 4, 4), 1.6, 16),
    )
    self_att_use: bool = True
    self_att_dim: int = 3
    self_att_inter_person: bool = False
    two_stage_att: bool = False
    embedding_dim: int = 512
    # Max active voxels per downsampling stage, static shapes for XLA. Stage 0 covers
    # stride-1 voxels (bounded by voxelizer max_voxels); later stages shrink.
    max_voxels_per_stage: Tuple[int, int, int, int] = (16000, 16000, 8000, 4000)
    # STRICT-COMPAT (ops/voxel.py:197-206): False (default) = approx_max_k
    # neighbor selection (recall ~0.99, much faster on TPU); True = bitwise
    # scan-order parity with the reference voxel_query CUDA kernel.
    voxel_query_exact: bool = False
    # Per-box spatial cull for the grid-pool voxel query
    # (ops/voxel.py:voxel_query_boxed): each ROI queries only its
    # pool_cull_k nearest voxels instead of the full per-scale voxel set.
    # Exact whenever <= pool_cull_k active voxels lie within reach of the
    # box (people-sized ROIs occupy a few hundred; the K-nearest cull ball
    # must cover the query-reach ball, so dense crowds at the stride-2
    # scale are the binding case). Combined with the gather-as-GEMM
    # one-hot grouping (roi_grid_pool.py), the culled pool measured
    # 10.0 ms vs 30.8 ms for the dense path at the flagship working point
    # (v5e, K=256). 0 disables the cull (dense (R, M) relation + row
    # gathers).
    pool_cull_k: int = 256
    # approx_max_k for the grid pool's first-nsample neighbor selection
    # (recall ~0.99) instead of the exact top_k over (N*G3, cull_k) —
    # the same approximation voxel_query uses by default; False = exact.
    # Default True: the round-4 hardware flag sweep picked xwin+poolapprox
    # as the fastest combination (docs/ROUND4_NOTES.md).
    pool_approx_nsample: bool = True
    # x-window sparse-conv gathers (sparse_backbone.window_gather): 9 wide
    # window gathers per query instead of 27 row gathers, using the packed
    # maps the host rulebook emits (data/rulebook.py). Requires the host
    # rulebook; falls back to the nbr/down maps when they are absent.
    x_window: bool = True
    # fuse the x-window gather + tap GEMM of every submanifold layer into
    # one Pallas kernel (ops/pallas/window_conv.py: full-table
    # tpu.dynamic_gather per window slot, f32 eval path only).
    x_window_fused: bool = False


@dataclass
class FusionConfig:
    """Reference: mil3.yaml GAR_MODEL + gat_model.py:1130-1699."""
    modality: str = "Multi"              # RGB | LiDAR | Multi
    fusion: str = "Attention_mat"        # DAFM; also sum/concat/crossAtt/Attention_normal/...
    sigma: float = 10.0
    feat_norm: bool = True
    euclidean: bool = True
    ind_action_concat: bool = True
    sg_feat_org: bool = False
    feature_dim: int = 1024              # action-head input dim (RGB||LiDAR concat)
    hidden_dim: int = 512                # SG-head input dim
    sim: str = "cosine"                  # cosine | Graph | Graph2 | Graph3 | Graph4
    num_fusion_layers: int = 2
    # Social_Layer / Social_Encoder (gat_model.py:1144-1147): transform the
    # fused features before the cosine similarity. none | mlp | encoder
    social_layer: str = "none"


@dataclass
class ModelConfig:
    rgb: RGBBackboneConfig = field(default_factory=RGBBackboneConfig)
    lidar: LiDARBackboneConfig = field(default_factory=LiDARBackboneConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    dtype: str = "float32"               # compute dtype for backbones ("bfloat16" on TPU)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

@dataclass
class StageConfig:
    """One training stage (reference: mil3.yaml TRAINER.STAGE_1/2)."""
    epochs: int = 50
    learning_rate: float = 1e-3
    loss: str = "L_total"                # L_total | L_g | L_bce | L_bce2 | L_act


@dataclass
class TrainConfig:
    batch_size: int = 1
    shuffle: bool = True
    seed: int = 2023
    grad_accum_steps: int = 8            # reference: train_func.py:262-269
    lr_decay_gamma: float = 0.9          # reference: 0.9**epoch LambdaLR
    stages: Tuple[StageConfig, ...] = (
        StageConfig(50, 1e-3, "L_total"),
        StageConfig(0, 3e-4, "L_total"),
    )
    save_path: str = "checkpoints"
    eval_every_epochs: int = 1
    log_every_steps: int = 8
    num_workers: int = 0                 # decode processes (reference
    # train_func.py:506 uses 4); 0 = single producer thread. Size so that
    # host clips/s >= device clips/s (tools/bench_host_pipeline.py).


@dataclass
class MeshConfig:
    """Device-mesh layout for pjit sharding (TPU-native replacement of
    nn.DataParallel at train_func.py:512 and pcdet's dormant DDP infra)."""
    data: int = -1                        # -1 = all devices on the data axis
    fsdp: int = 1                         # optional parameter sharding axis


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


# ---------------------------------------------------------------------------
# YAML loading: recursive merge, _BASE_CONFIG_ inheritance, dotted overrides
# ---------------------------------------------------------------------------

def _merge_into_dataclass(obj: Any, data: Dict[str, Any]) -> Any:
    """Recursively overlay a dict onto a dataclass instance, returning a new one."""
    if not dataclasses.is_dataclass(obj):
        return data
    updates = {}
    names = {f.name: f for f in dataclasses.fields(obj)}
    for key, val in data.items():
        if key not in names:
            raise KeyError(f"Unknown config key {key!r} for {type(obj).__name__}")
        cur = getattr(obj, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, dict):
            updates[key] = _merge_into_dataclass(cur, val)
        elif isinstance(cur, tuple) and isinstance(val, (list, tuple)):
            if cur and dataclasses.is_dataclass(cur[0]) and val and isinstance(val[0], dict):
                updates[key] = tuple(
                    _merge_into_dataclass(type(cur[0])(), v) for v in val)
            else:
                updates[key] = tuple(
                    tuple(v) if isinstance(v, list) else v for v in val)
        else:
            updates[key] = val
    return dataclasses.replace(obj, **updates)


def load_config(path: Optional[str] = None,
                overrides: Optional[Sequence[str]] = None) -> Config:
    """Load a Config from YAML with ``_BASE_CONFIG_`` inheritance and
    ``a.b.c=value`` dotted overrides (reference: pcdet/config.py:16-81)."""
    cfg = Config()
    if path is not None:
        cfg = _merge_into_dataclass(cfg, _load_yaml_with_base(path))
    for ov in overrides or ():
        key, _, raw = ov.partition("=")
        cfg = _apply_override(cfg, key.strip().split("."), yaml.safe_load(raw))
    return cfg


def _load_yaml_with_base(path: str) -> Dict[str, Any]:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    base = data.pop("_BASE_CONFIG_", None)
    if base:
        base_path = pathlib.Path(path).parent / base if not pathlib.Path(base).is_absolute() else base
        merged = _load_yaml_with_base(str(base_path))
        _deep_update(merged, data)
        return merged
    return data


def _deep_update(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


def _apply_override(obj: Any, keys: List[str], value: Any) -> Any:
    if len(keys) == 1:
        return _merge_into_dataclass(obj, {keys[0]: value})
    child = getattr(obj, keys[0])
    return dataclasses.replace(obj, **{keys[0]: _apply_override(child, keys[1:], value)})


def config_to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
