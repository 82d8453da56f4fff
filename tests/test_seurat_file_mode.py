"""File-based metadata export: add_to_seurat reads a FINISHED out_dir
(reference R/seurat_interaction.R:23-100 readRDS + report-file ingestion)
and must reproduce the in-memory feature computation."""

import os

import numpy as np
import pytest

from infercnv_tpu.report.seurat_export import (
    add_to_seurat,
    compute_cnv_features,
    load_group_regions_from_out_dir,
)
from infercnv_tpu.runner.pipeline import run
from tests.test_pipeline import make_synthetic


@pytest.fixture(scope="module")
def finished_dir(tmp_path_factory):
    obj = make_synthetic()
    out = str(tmp_path_factory.mktemp("finished"))
    res = run(obj, out_dir=out, HMM=True, HMM_type="i6",
              analysis_mode="samples", denoise=True,
              HMM_report_by="consensus", window_length=21, no_plot=True,
              BayesMaxPNormal=0.5, save_rds=True)
    return res, out


def test_file_mode_reconstructs_regions(finished_dir):
    res, out = finished_dir
    obj, group_regions, hmm_type = load_group_regions_from_out_dir(out)
    assert hmm_type == "i6"
    assert obj.num_cells == res.infercnv_obj.num_cells
    got_groups = {gr.group_name for gr in group_regions}
    want_groups = {gr.group_name for gr in res.region_reports}
    assert want_groups <= got_groups
    # regions parsed back with genes attached
    n_regions = sum(len(gr.regions) for gr in group_regions)
    assert n_regions > 0
    for gr in group_regions:
        for r in gr.regions:
            assert len(r.genes) == len(r.gene_states) > 0
            assert r.state != 3  # neutral regions are not reported


def test_file_mode_features_match_in_memory(finished_dir):
    res, out = finished_dir
    final = res.infercnv_obj

    feats_file = add_to_seurat(out)
    assert os.path.exists(os.path.join(out, "map_metadata_from_infercnv.txt"))

    # in-memory recompute on the post-Bayes reports must agree: the file-mode
    # loader prefers the same HMM_CNV_predictions…Pnorm files the pipeline
    # wrote after filtering
    obj2, group_regions, hmm_type = load_group_regions_from_out_dir(out)
    feats_mem, order = compute_cnv_features(obj2, group_regions, hmm_type)
    for name in order:
        np.testing.assert_array_equal(
            np.asarray(feats_file[name]), np.asarray(feats_mem[name]),
            err_msg=name)

    # the planted chr2 deletion must be a feature for tumor cells
    tumor = [i for i, c in enumerate(final.cell_names) if c.startswith("t")]
    assert feats_file["has_loss_chr2"][tumor].mean() > 0.9
    assert not feats_file["has_loss_chr1"].any()


def test_file_mode_attaches_anndata(finished_dir):
    anndata = pytest.importorskip("anndata")
    res, out = finished_dir
    final = res.infercnv_obj
    import pandas as pd

    ad = anndata.AnnData(
        X=np.zeros((final.num_cells, 5), np.float32),
        obs=pd.DataFrame(index=final.cell_names))
    add_to_seurat(out, adata=ad, column_prefix="infercnv_")
    assert "infercnv_has_cnv_chr2" in ad.obs.columns
