import sys

from particle_col_image_segmentation_tpu.cli import main

sys.exit(main())
