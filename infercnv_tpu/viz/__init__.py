from infercnv_tpu.viz.heatmap import color_palette, get_x_range_auto, plot_cnv  # noqa: F401
