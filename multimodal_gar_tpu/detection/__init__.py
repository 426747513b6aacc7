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
from . import roi_detectors as _roi_detectors   # registers two-stage models
from . import point_rcnn as _point_rcnn         # registers PointRCNN
from . import parta2 as _parta2                 # registers PartA2
from . import voxelnext as _voxelnext           # registers VoxelNeXt
from . import pv_rcnn_pp as _pv_rcnn_pp         # registers PV-RCNN++
from . import caddn as _caddn                   # registers CaDDN
from . import mppnet as _mppnet                 # registers MPPNet / E2E

__all__ = ["DetBatch", "DetectorConfig", "available_detectors",
           "build_detector", "default_config", "NMSConfig",
           "post_processing"]
