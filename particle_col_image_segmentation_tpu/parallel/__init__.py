from particle_col_image_segmentation_tpu.parallel.mesh import (  # noqa: F401
    initialize_multihost,
    make_mesh,
)
from particle_col_image_segmentation_tpu.parallel.sharded import (  # noqa: F401
    sharded_segment_batch,
)
