from infercnv_tpu.ops import layout, smoothing, transforms  # noqa: F401
