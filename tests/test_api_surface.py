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


def test_create_infercnv_object_reference_signature(tmp_path):
    """CreateInfercnvObject accepts the reference's calling convention
    verbatim (R/inferCNV.R:133-165: raw_counts_matrix path,
    annotations_file, gene_order_file, ref_group_names, delim) so a
    reference user's script runs unchanged."""
    import numpy as np
    from infercnv_tpu import CreateInfercnvObject

    rng = np.random.default_rng(0)
    cm, an, gp = (tmp_path / "c.tsv", tmp_path / "a.tsv", tmp_path / "g.tsv")
    with open(cm, "w") as f:
        f.write("\t" + "\t".join(f"cell{i}" for i in range(6)) + "\n")
        for g in range(30):
            f.write(f"gene{g}\t"
                    + "\t".join(str(rng.integers(20, 90)) for _ in range(6))
                    + "\n")
    with open(an, "w") as f:
        for i in range(6):
            f.write(f"cell{i}\t{'normal' if i < 3 else 'tumor'}\n")
    with open(gp, "w") as f:
        for g in range(30):
            f.write(f"gene{g}\tchr1\t{g*100}\t{g*100+50}\n")
    obj = CreateInfercnvObject(raw_counts_matrix=str(cm),
                               annotations_file=str(an),
                               gene_order_file=str(gp),
                               ref_group_names=["normal"])
    assert (obj.num_genes, obj.num_cells) == (30, 6)
    # positional in the reference's argument order also works
    obj2 = CreateInfercnvObject(str(cm), str(gp), str(an), ["normal"])
    assert (obj2.num_genes, obj2.num_cells) == (30, 6)
    # a wrong ref group name errors and NAMES the group (reference parity)
    try:
        CreateInfercnvObject(raw_counts_matrix=str(cm),
                             annotations_file=str(an),
                             gene_order_file=str(gp),
                             ref_group_names=["nope"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "nope" in str(e)
    # unknown kwargs are rejected, not swallowed
    try:
        CreateInfercnvObject(raw_counts_matrix=str(cm),
                             annotations_file=str(an),
                             gene_order_file=str(gp),
                             ref_group_names=["normal"], bogus=1)
        raise AssertionError("expected TypeError")
    except TypeError as e:
        assert "bogus" in str(e)
