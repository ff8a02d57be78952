from particle_col_image_segmentation_tpu.ops.filters import median_label_filter  # noqa: F401
from particle_col_image_segmentation_tpu.ops.ccl import (  # noqa: F401
    connected_components,
    compact_labels,
    label_image,
)
from particle_col_image_segmentation_tpu.ops.regionprops import region_props  # noqa: F401
