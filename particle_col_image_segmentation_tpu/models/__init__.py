from particle_col_image_segmentation_tpu.models.single_channel import (  # noqa: F401
    PlaneAnalysis,
    analyze_plane,
)
