"""Model registry + config-driven builder.

Capability parity with the reference's dependency-injection construction
chain (SURVEY.md §3.5): ``build_network`` -> detector registry ->
``Detector3DTemplate.build_networks`` (pcdet/models/__init__.py:16,
detectors/__init__.py:17-37, detector3d_template.py:23-50), where the dataset
supplies grid_size / voxel_size / point_cloud_range to the model. Here the
typed Config carries that information (cfg.data.point_cloud), and the registry
maps names to constructors so drivers stay model-agnostic.
"""
from __future__ import annotations

from typing import Callable, Dict

from ..config import Config

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def available_models():
    return sorted(_REGISTRY)


def build_model(cfg: Config, name: str = "MGAR"):
    """Construct a model by registry name; dataset-derived geometry
    (voxel grid, ranges) is threaded through cfg.data.point_cloud.

    Falls through to the detector-zoo registry (detection/) so a driver can
    build any of the 15 detector families by name too — the analogue of
    pcdet's unified build_network (pcdet/models/__init__.py:16)."""
    if name in _REGISTRY:
        return _REGISTRY[name](cfg)
    from ..detection import available_detectors, build_detector
    from ..detection.detectors import default_config
    if name in available_detectors():
        # thread the caller's point-cloud geometry into the detector config
        # (the promise above): range/voxel size drive the anchor grid and
        # sparse shape, so silently using KITTI defaults against a
        # differently-voxelized batch would produce garbage targets
        import dataclasses as _dc
        pc = cfg.data.point_cloud
        det_cfg = _dc.replace(default_config(name),
                              point_cloud_range=tuple(pc.range),
                              voxel_size=tuple(pc.voxel.voxel_size))
        return build_detector(name, det_cfg)
    raise KeyError(f"unknown model {name!r}; have {available_models()} "
                   f"+ detectors {available_detectors()}")


@register("MGAR")
def _build_mgar(cfg: Config):
    from .mgar import MGAR
    return MGAR(cfg)


@register("GARFusionNet")
def _build_fusion_net(cfg: Config):
    from .mgar import GARFusionNet
    return GARFusionNet(cfg.model)


@register("RGBBackbone")
def _build_rgb(cfg: Config):
    from .rgb_backbone import RGBBackbone
    return RGBBackbone(cfg.model.rgb)


@register("LiDARBackbone")  # the VoxelRCNN-as-feature-extractor equivalent
def _build_lidar(cfg: Config):
    from .lidar_backbone import LiDARBackbone
    return LiDARBackbone(cfg.model.lidar, cfg.data.point_cloud)


@register("GARNet")
def _build_garnet(cfg: Config):
    from .legacy import GARNet
    return GARNet(feature_dim=cfg.model.fusion.feature_dim)


@register("TranSG")
def _build_transg(cfg: Config):
    from .legacy import TranSG
    return TranSG()


@register("ActBaseline")
def _build_act_baseline(cfg: Config):
    from .legacy import ActBaseline
    return ActBaseline()
