"""multimodal_gar_tpu: TPU-native multimodal social group activity recognition.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
kdu3613/Multimodal_GAR (MGAR-net, VCIP 2023): joint social grouping,
individual-action and social-group-activity recognition on JRDB-Act from
panoramic RGB clips + LiDAR point clouds.
"""
from .config import Config, load_config

__version__ = "0.1.0"
