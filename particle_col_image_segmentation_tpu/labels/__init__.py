from particle_col_image_segmentation_tpu.labels import classmaps  # noqa: F401
