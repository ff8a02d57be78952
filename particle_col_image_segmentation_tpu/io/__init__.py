from particle_col_image_segmentation_tpu.io.hdf5 import load_h5_plane  # noqa: F401
from particle_col_image_segmentation_tpu.io.discovery import (  # noqa: F401
    get_h5_files_recursively,
)
