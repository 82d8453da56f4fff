"""The reference's NAMESPACE exports all have top-level analogues."""


def test_reference_namespace_parity():
    import infercnv_tpu as m

    # reference NAMESPACE exports (R/NAMESPACE) -> our names
    for name in ["run", "CreateInfercnvObject", "plot_cnv", "plot_per_group",
                 "plot_subclusters", "sample_object", "add_to_seurat",
                 "apply_median_filtering", "inferCNVBayesNet",
                 "filterHighPNormals", "color_palette", "add_to_metadata",
                 "InferCNV", "GeneOrder", "create_infercnv_object"]:
        assert hasattr(m, name), name
