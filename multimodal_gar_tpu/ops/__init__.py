from . import geometry, grouping, masked, roi_align, voxel
