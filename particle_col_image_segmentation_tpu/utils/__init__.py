from particle_col_image_segmentation_tpu.utils.logging import get_logger  # noqa: F401
from particle_col_image_segmentation_tpu.utils.manifest import RunManifest  # noqa: F401
from particle_col_image_segmentation_tpu.utils.profiling import stage  # noqa: F401
