"""CLI end-to-end coverage (comma-delimited input, custom plot flags) and
automated heatmap-rendering assertions (file structure + text outputs +
dynamic_resize geometry), closing the 'visual check only' gap."""

import os

import numpy as np
import pytest

from tests.test_pipeline import make_synthetic


def _write_example_files(tmp_path, sep=","):
    rng = np.random.default_rng(5)
    G, C = 120, 24
    genes = [f"g{i}" for i in range(G)]
    cells = [f"c{i}" for i in range(C)]
    counts = rng.poisson(rng.gamma(2.0, 40.0, G)[None, :] * np.ones((C, 1))).T
    counts_path = tmp_path / "counts.csv"
    with open(counts_path, "w") as f:
        f.write(sep.join(cells) + "\n")
        for gi, g in enumerate(genes):
            f.write(g + sep + sep.join(str(int(v)) for v in counts[gi]) + "\n")
    genes_path = tmp_path / "genes.txt"
    with open(genes_path, "w") as f:
        for i, g in enumerate(genes):
            chrom = f"chr{i // 40 + 1}"
            f.write(f"{g}\t{chrom}\t{i * 1000 + 1}\t{i * 1000 + 500}\n")
    ann_path = tmp_path / "annots.txt"
    with open(ann_path, "w") as f:
        for i, c in enumerate(cells):
            f.write(f"{c}\t{'normal' if i < 12 else 'tumor'}\n")
    return counts_path, genes_path, ann_path


def test_cli_e2e_comma_delim_and_plot_flags(tmp_path):
    """--delim wires into the counts reader and --title/--contig_lab_size/
    --color_safe/--dynamic_resize reach plot_cnv (previously parsed but
    dead)."""
    from infercnv_tpu.cli import main

    counts_path, genes_path, ann_path = _write_example_files(tmp_path, sep=",")
    out_dir = tmp_path / "out"
    rc = main([
        "--raw_counts_matrix", str(counts_path),
        "--gene_order_file", str(genes_path),
        "--annotations_file", str(ann_path),
        "--ref_group_names", "normal",
        "--out_dir", str(out_dir),
        "--delim", ",",
        "--cutoff", "1",
        "--window_length", "21",
        "--analysis_mode", "samples",
        "--denoise",
        "--no_save_rds",
        "--title", "Custom Title",
        "--contig_lab_size", "9",
        "--color_safe",
        "--dynamic_resize", "0.5",
    ])
    assert rc == 0
    assert (out_dir / "infercnv.png").exists()
    assert (out_dir / "infercnv.observation_groupings.txt").exists()
    thresholds = (out_dir / "infercnv.heatmap_thresholds.txt").read_text().split()
    assert len(thresholds) == 31


def test_cli_rejects_wrong_delim(tmp_path):
    """A comma matrix read with the default tab delimiter must fail loudly,
    not silently produce a 1-column matrix."""
    from infercnv_tpu.cli import main

    counts_path, genes_path, ann_path = _write_example_files(tmp_path, sep=",")
    with pytest.raises(Exception):
        main([
            "--raw_counts_matrix", str(counts_path),
            "--gene_order_file", str(genes_path),
            "--annotations_file", str(ann_path),
            "--ref_group_names", "normal",
            "--out_dir", str(tmp_path / "out2"),
            "--no_save_rds",
        ])


def test_plot_cnv_outputs_and_dynamic_resize(tmp_path):
    """plot_cnv writes the image + the reference's text outputs; with > 200
    observation cells, dynamic_resize grows the rendered image height
    (reference inferCNV_heatmap.R:254-262)."""
    from PIL import Image

    from infercnv_tpu.viz.heatmap import plot_cnv

    obj = make_synthetic(n_normal=20, n_tumor=600)
    obj.expr = np.exp2(np.random.default_rng(0).normal(0, 0.2, obj.expr.shape)).astype(np.float32)

    p0 = plot_cnv(obj, out_dir=str(tmp_path), output_filename="flat",
                  x_center=1.0, dynamic_resize=0.0, png_res=60)
    p1 = plot_cnv(obj, out_dir=str(tmp_path), output_filename="tall",
                  x_center=1.0, dynamic_resize=1.0, png_res=60)
    h0 = Image.open(p0).size[1]
    h1 = Image.open(p1).size[1]
    assert h1 > h0 * 1.2, (h0, h1)

    # text outputs the downstream tooling consumes
    assert os.path.exists(tmp_path / "flat.observation_groupings.txt")
    lines = (tmp_path / "flat.observation_groupings.txt").read_text().strip().splitlines()
    assert lines[0].startswith("cell_group_name")
    assert len(lines) == 1 + 600  # one row per observation cell
    th = [float(v) for v in (tmp_path / "flat.heatmap_thresholds.txt").read_text().split()]
    assert len(th) == 31 and th[0] < 1.0 < th[-1]


def test_plot_cnv_expr_matrices_roundtrip(tmp_path):
    """write_expr writes .observations.txt / .references.txt with the
    clamped values in genes x cells orientation."""
    from infercnv_tpu.viz.heatmap import plot_cnv

    obj = make_synthetic(n_normal=10, n_tumor=12, genes_per_chr=30)
    obj.expr = np.exp2(np.random.default_rng(1).normal(0, 0.2, obj.expr.shape)).astype(np.float32)
    plot_cnv(obj, out_dir=str(tmp_path), output_filename="m",
             x_center=1.0, write_expr=True, png_res=50)
    obs_lines = (tmp_path / "m.observations.txt").read_text().strip().splitlines()
    assert len(obs_lines) == 1 + obj.num_genes  # header + genes
    # R write.table format: space-separated throughout, quoted names
    header = obs_lines[0].split(" ")
    assert len(header) == 12  # one column per observation cell
    assert all(h.startswith('"') for h in header)
    assert len(obs_lines[1].split(" ")) == 13  # gene name + 12 values
    ref_lines = (tmp_path / "m.references.txt").read_text().strip().splitlines()
    assert len(ref_lines[0].split(" ")) == 10


def test_color_safe_palette_differs():
    from infercnv_tpu.viz.heatmap import color_palette

    default = color_palette(False)
    safe = color_palette(True)
    assert default(0.0) != safe(0.0)
    # both white at center
    assert np.allclose(default(0.5), safe(0.5), atol=0.02)


def test_plot_cnv_chr_scale(tmp_path):
    """plot_chr_scale resamples the gene axis onto bp proportions
    (reference inferCNV_heatmap.R:352-397)."""
    import numpy as np

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.viz.heatmap import plot_cnv

    rng = np.random.default_rng(12)
    G = 60
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.repeat([0, 1], 30).astype(np.int32),
        start=np.arange(G) * 1000, stop=np.arange(G) * 1000 + 900,
    )
    obj = InferCNV(
        expr=rng.normal(1.0, 0.2, (30, G)).astype(np.float32),
        counts=None, gene_order=go,
        cell_names=[f"c{i}" for i in range(30)],
        ref_groups={"n": np.arange(10)},
        obs_groups={"t": np.arange(10, 30)},
    )
    out = plot_cnv(obj, out_dir=str(tmp_path), output_filename="chr_scale",
                   plot_chr_scale=True, chr_lengths=[40_000, 35_000])
    import os

    assert out is not None and os.path.exists(out)


def test_plot_cnv_hclust_method_ref_contig_custom_pal(tmp_path, rng):
    """Reference plot_cnv surface: hclust_method for pane ordering
    (inferCNV_heatmap.R:103), ref_contig single-contig clustering (:553-573),
    and custom_color_pal as a color list."""
    import numpy as np

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.viz.heatmap import plot_cnv

    G, C = 40, 24
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.array([0] * 20 + [1] * 20, np.int32),
        start=np.arange(1, G + 1) * 100, stop=np.arange(1, G + 1) * 100 + 50,
    )
    expr = rng.normal(1, 0.1, (C, G)).astype(np.float32)
    expr[12:, 20:] += 1.0  # chr2 signal separates half the tumor cells
    obj = InferCNV(
        expr=expr, counts=expr, gene_order=go,
        cell_names=[f"c{i}" for i in range(C)],
        ref_groups={"normal": np.arange(0, 6)},
        obs_groups={"tumor": np.arange(6, C)},
    )
    p1 = plot_cnv(obj, str(tmp_path), output_filename="m_complete",
                  hclust_method="complete",
                  custom_color_pal=["#000080", "#FFFFFF", "#803000"])
    p2 = plot_cnv(obj, str(tmp_path), output_filename="m_contig",
                  ref_contig="chr2")
    import os

    assert os.path.exists(p1) and os.path.exists(p2)
    # unknown contig logs a warning and falls back — should still render
    p3 = plot_cnv(obj, str(tmp_path), output_filename="m_badcontig",
                  ref_contig="chrZ")
    assert os.path.exists(p3)


def test_row_order_cache_keys_by_method(tmp_path, rng):
    """Different hclust_method / ref_contig values must NOT reuse each
    other's cached row orders (the cache key includes both)."""
    import numpy as np

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.viz.heatmap import plot_cnv

    G, C = 30, 16
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.array([0] * 15 + [1] * 15, np.int32),
        start=np.arange(1, G + 1), stop=np.arange(1, G + 1),
    )
    expr = rng.normal(1, 0.3, (C, G)).astype(np.float32)
    obj = InferCNV(
        expr=expr, counts=expr, gene_order=go,
        cell_names=[f"c{i}" for i in range(C)],
        ref_groups={"normal": np.arange(0, 4)},
        obs_groups={"tumor": np.arange(4, C)},
    )
    cache = {}
    plot_cnv(obj, str(tmp_path), output_filename="a",
             hclust_method="ward.D", row_order_cache=cache)
    plot_cnv(obj, str(tmp_path), output_filename="b",
             hclust_method="complete", row_order_cache=cache)
    plot_cnv(obj, str(tmp_path), output_filename="c",
             ref_contig="chr2", row_order_cache=cache)
    methods = {k[1] for k in cache}
    assert {"ward.D", "complete"}.issubset(methods)
    assert any(k[2] is not None for k in cache)  # the ref_contig entries
