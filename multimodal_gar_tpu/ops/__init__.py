from . import (boxes3d, geometry, grouping, masked, neighbor, roi_align,
               sampling, vector_pool, voxel)
