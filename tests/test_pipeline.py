"""End-to-end pipeline tests on small synthetic data with planted CNVs."""

import os

import numpy as np
import pytest

from infercnv_tpu.core.object import create_infercnv_object
from infercnv_tpu.runner.pipeline import run


def make_synthetic(seed=7, n_normal=30, n_tumor=30, genes_per_chr=60, n_chr=4,
                   del_factor=0.5, amp_factor=2.0):
    """Counts with a planted deletion on chr2 and amplification on chr3 in
    tumor cells."""
    rng = np.random.default_rng(seed)
    G = genes_per_chr * n_chr
    base = rng.gamma(2.0, 50.0, G)  # per-gene mean expression
    C = n_normal + n_tumor
    factor = np.ones((C, G))
    tumor = slice(n_normal, C)
    factor[tumor, genes_per_chr:2 * genes_per_chr] = del_factor   # chr2 deletion
    factor[tumor, 2 * genes_per_chr:3 * genes_per_chr] = amp_factor  # chr3 amp
    lam = factor * base[None, :]
    counts = rng.poisson(lam).astype(np.float64).T  # [G, C]
    gene_names = [f"g{i}" for i in range(G)]
    cell_names = [f"n{i}" for i in range(n_normal)] + [f"t{i}" for i in range(n_tumor)]
    ann = {c: ("normal" if c.startswith("n") else "tumor") for c in cell_names}
    table = {}
    for i in range(G):
        chrom = f"chr{i // genes_per_chr + 1}"
        pos = (i % genes_per_chr) * 1000 + 1
        table[f"g{i}"] = (chrom, pos, pos + 500)
    return create_infercnv_object(
        counts_matrix=counts, gene_names=gene_names, cell_names=cell_names,
        annotations=ann, gene_order_table=table,
        chr_file_order=[f"chr{i+1}" for i in range(n_chr)],
        ref_group_names=["normal"], chr_exclude=(),
        min_max_counts_per_cell=(1, np.inf),
    )


@pytest.fixture(scope="module")
def synthetic_result(tmp_path_factory):
    obj = make_synthetic()
    out = str(tmp_path_factory.mktemp("icnv"))
    res = run(obj, out_dir=out, HMM=True, HMM_type="i6",
              analysis_mode="samples", denoise=True,
              HMM_report_by="consensus", window_length=21, no_plot=True,
              BayesMaxPNormal=0.5)
    return obj, res, out


def test_pipeline_residuals_detect_cnv(synthetic_result):
    obj, res, out = synthetic_result
    expr = res.infercnv_obj.expr
    go = res.infercnv_obj.gene_order
    tumor = res.infercnv_obj.all_obs_idx()
    chr2 = go.chr_gene_indices("chr2")
    chr3 = go.chr_gene_indices("chr3")
    chr1 = go.chr_gene_indices("chr1")
    assert expr[np.ix_(tumor, chr2)].mean() < 0.9
    assert expr[np.ix_(tumor, chr3)].mean() > 1.1
    assert abs(expr[np.ix_(tumor, chr1)].mean() - 1.0) < 0.1


def test_pipeline_hmm_states(synthetic_result):
    obj, res, out = synthetic_result
    st = res.hmm_states
    go = res.infercnv_obj.gene_order
    ref = res.infercnv_obj.all_ref_idx()
    tumor = res.infercnv_obj.all_obs_idx()
    chr2 = go.chr_gene_indices("chr2")
    chr3 = go.chr_gene_indices("chr3")
    assert (st[ref] == 3).mean() > 0.95
    assert (st[np.ix_(tumor, chr2)] < 3).mean() > 0.8   # deletion called
    assert (st[np.ix_(tumor, chr3)] > 3).mean() > 0.8   # amplification called


def test_pipeline_report_files(synthetic_result):
    obj, res, out = synthetic_result
    files = os.listdir(out)
    assert any(f.endswith(".pred_cnv_regions.dat") for f in files)
    assert any(f.endswith(".pred_cnv_genes.dat") for f in files)
    assert any(f.endswith(".cell_groupings") for f in files)
    assert any(f.endswith(".genes_used.dat") for f in files)
    # region report contains the planted CNVs
    reg = [f for f in files if f.startswith("17_") and f.endswith(".pred_cnv_regions.dat")][0]
    lines = open(os.path.join(out, reg)).read().strip().split("\n")[1:]
    chroms = {l.split("\t")[3] for l in lines}
    assert "chr2" in chroms and "chr3" in chroms


def test_pipeline_resume(synthetic_result):
    obj, res, out = synthetic_result
    # re-running with the same args must reuse checkpoints (no recompute of
    # steps 1-16) and produce identical residuals
    obj2 = make_synthetic()
    res2 = run(obj2, out_dir=out, HMM=True, HMM_type="i6",
               analysis_mode="samples", denoise=True,
               HMM_report_by="consensus", window_length=21, no_plot=True,
               BayesMaxPNormal=0.5)
    np.testing.assert_allclose(res2.infercnv_obj.expr, res.infercnv_obj.expr,
                               rtol=1e-5, atol=1e-5)


def test_pipeline_i3(tmp_path):
    # i3 state means sit at mu -/+ ~1.645 sigma of the normal residuals, and
    # the reference's 1/(-log p) emission scoring compresses extreme
    # deviations, so plant i3-scale CNVs (the reference behaves identically:
    # a 2x amp 26 sigma beyond the amp state mean stays neutral at t=1e-6)
    obj = make_synthetic(del_factor=0.7, amp_factor=1.3)
    res = run(obj, out_dir=str(tmp_path), HMM=True, HMM_type="i3",
              analysis_mode="samples", HMM_report_by="consensus",
              window_length=21, no_plot=True, BayesMaxPNormal=0)
    st = res.hmm_states
    go = res.infercnv_obj.gene_order
    tumor = res.infercnv_obj.all_obs_idx()
    ref = res.infercnv_obj.all_ref_idx()
    chr2 = go.chr_gene_indices("chr2")
    chr3 = go.chr_gene_indices("chr3")
    assert set(np.unique(st)) <= {1, 2, 3}
    assert (st[ref] == 2).mean() > 0.95
    assert (st[np.ix_(tumor, chr2)] == 1).mean() > 0.8
    assert (st[np.ix_(tumor, chr3)] == 3).mean() > 0.8


def test_pipeline_no_hmm_samples_mode(tmp_path):
    obj = make_synthetic()
    res = run(obj, out_dir=str(tmp_path), HMM=False, analysis_mode="samples",
              denoise=True, no_plot=True)
    assert res.hmm_states is None
    assert res.infercnv_obj.expr.shape[0] == obj.num_cells
