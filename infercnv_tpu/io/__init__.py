from infercnv_tpu.io.loaders import (  # noqa: F401
    load_bundled_example,
    load_infercnv_object,
    read_annotations_file,
    read_counts_matrix,
    read_gene_order_file,
    read_mtx,
)
