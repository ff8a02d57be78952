from particle_col_image_segmentation_tpu.parallel.mesh import make_mesh  # noqa: F401
from particle_col_image_segmentation_tpu.parallel.sharded import (  # noqa: F401
    sharded_segment_batch,
)
