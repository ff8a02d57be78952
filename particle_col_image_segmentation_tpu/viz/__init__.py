from particle_col_image_segmentation_tpu.viz.figures import (  # noqa: F401
    create_channel_plots,
    create_plot,
    create_single_plots,
    get_color_map,
    plot_original_vs_merged,
    visualize_dapi_overlap_results,
)
