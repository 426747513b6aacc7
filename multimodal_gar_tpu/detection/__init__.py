"""Detector zoo: TPU-native re-designs of the pcdet detector families.

The reference vendors OpenPCDet's full model zoo (SURVEY.md §2.4 rows 26/33,
§2.6) of which only VoxelRCNN-as-feature-extractor is on the MGAR path (that
slice lives in models/). This package provides the rest of the capability
surface: anchors, box coders, target assignment, BEV trunks, dense heads,
RoI heads, post-processing, and the assembled detectors.
"""
from .detectors import (DetBatch, DetectorConfig, available_detectors,
                        build_detector, default_config)
from .post import NMSConfig, post_processing

__all__ = ["DetBatch", "DetectorConfig", "available_detectors",
           "build_detector", "default_config", "NMSConfig",
           "post_processing"]
