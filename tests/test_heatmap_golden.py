"""Durable rendering golden for the final heatmap (VERDICT r4 item 7).

plot_cnv is 700+ LoC of pane geometry (reference plot_cnv
R/inferCNV_heatmap.R:90-470 plus the vendored GMD heatmap.cnv engine);
its round-4 byte-identity check was one-off.  This locks BOTH the pane
layout (every axes bounding box, exact to 1e-3 figure units) and a
coarse pixel fingerprint (24x24 block means of the rasterized PNG,
tolerant to font antialiasing) against a committed golden, so a viz
refactor cannot silently move panes or recolor the matrix.

Regenerate after an INTENDED change with:
    python tests/test_heatmap_golden.py --regen
"""

import os
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "heatmap_golden.npz")


def _render(tmp_dir):
    """Deterministic render: seeded synthetic object, fixed plot args.
    Returns (axes bounds [N, 4], 24x24 gray block means)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib.figure import Figure

    from infercnv_tpu.viz.heatmap import plot_cnv
    from tests.test_pipeline import make_synthetic

    obj = make_synthetic()
    obj.expr = np.log1p(np.asarray(obj.expr, np.float64)) / 4.0  # deterministic values
    captured = {}
    orig = Figure.savefig

    def grab(fig, *a, **k):
        captured["bounds"] = np.array(
            [ax.get_position().bounds for ax in fig.axes], np.float64)
        return orig(fig, *a, **k)

    Figure.savefig = grab
    try:
        plot_cnv(obj, out_dir=tmp_dir, output_filename="golden_hm",
                 title="golden", x_center=1.0, x_range=(0.6, 1.4),
                 png_res=120, write_expr=False)
    finally:
        Figure.savefig = orig
    import matplotlib.image as mpimg

    img = mpimg.imread(os.path.join(tmp_dir, "golden_hm.png"))
    gray = img[..., :3].mean(axis=2)
    H, W = gray.shape
    bh, bw = H // 24, W // 24
    blocks = gray[:bh * 24, :bw * 24].reshape(24, bh, 24, bw).mean(axis=(1, 3))
    return captured["bounds"], blocks


def test_heatmap_matches_committed_golden(tmp_path):
    assert os.path.exists(GOLDEN), "run: python tests/test_heatmap_golden.py --regen"
    g = np.load(GOLDEN)
    bounds, blocks = _render(str(tmp_path))
    assert bounds.shape == g["bounds"].shape, \
        f"pane count changed: {bounds.shape} vs {g['bounds'].shape}"
    np.testing.assert_allclose(bounds, g["bounds"], atol=1e-3,
                               err_msg="pane geometry moved")
    # block means are robust to antialiasing; 0.02 ~= 2% gray intensity
    np.testing.assert_allclose(blocks, g["blocks"], atol=0.02,
                               err_msg="rendered pixels diverged")


if __name__ == "__main__" and "--regen" in sys.argv:
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        bounds, blocks = _render(td)
    np.savez_compressed(GOLDEN, bounds=bounds, blocks=blocks)
    print(f"wrote {GOLDEN}: {bounds.shape[0]} axes, blocks {blocks.shape}")
