"""Tests import the package-level synthetic fixtures."""
from multimodal_gar_tpu.utils.testing import synthetic_batch, tiny_config

__all__ = ["synthetic_batch", "tiny_config"]
