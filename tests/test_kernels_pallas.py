"""Interpret-mode tests for the Pallas median and banded-smooth kernels.

These run the kernels through the Pallas interpreter on CPU (exact same
kernel code the TPU compiles); tests/test_tpu_hardware.py additionally
compile-checks them on a real chip when INFERCNV_TPU_HW_TESTS=1.
"""

import numpy as np
import jax.numpy as jnp

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.ops.layout import coordinate_smoothing_operator, smoothing_operator
from infercnv_tpu.ops.median import row_median, row_median_pallas
from infercnv_tpu.ops.smoothing import (
    apply_banded_operator,
    apply_banded_operator_pallas,
)


def _gene_order(lens):
    G = sum(lens)
    return GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(len(lens))),
        chr_ids=np.repeat(np.arange(len(lens)), lens).astype(np.int32),
        start=np.arange(G, dtype=np.int64) * 1000,
        stop=np.arange(G, dtype=np.int64) * 1000 + 500,
    )


def test_row_median_pallas_exact(rng):
    for (C, G) in [(4, 9), (5, 10), (17, 131), (40, 257), (3, 2)]:
        x = rng.normal(size=(C, G)).astype(np.float32) * 10
        x[0, : G // 2] = -x[0, : G // 2]          # negatives cross zero
        x[1] = 0.0                                 # all-equal row
        got = np.asarray(row_median_pallas(jnp.asarray(x), interpret=True))
        want = np.median(x, axis=1)
        assert np.array_equal(got, want), (C, G)
        # and agrees with the XLA radix path bit-for-bit
        assert np.array_equal(got, np.asarray(row_median(jnp.asarray(x))))


def test_row_median_pallas_ties_and_inf(rng):
    x = rng.integers(-3, 4, size=(11, 64)).astype(np.float32)  # heavy ties
    got = np.asarray(row_median_pallas(jnp.asarray(x), interpret=True))
    assert np.array_equal(got, np.median(x, axis=1))


def test_banded_pallas_k256_matches_xla(rng):
    go = _gene_order([300, 150, 80, 41, 1, 2])
    op = smoothing_operator(go, 101, "pyramidinal")
    assert op.side_tiles == 1 and op.halfband <= 64  # K=256 fast path
    x = rng.normal(size=(37, go.num_genes)).astype(np.float32)
    got = np.asarray(apply_banded_operator_pallas(x, op, interpret=True))
    want = np.asarray(apply_banded_operator(x, op))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # float64 host reference (ground truth band application)
    np.testing.assert_allclose(got, op.apply_np(x.astype(np.float64)),
                               atol=1e-5)


def test_banded_pallas_generic_sides(rng):
    # a bp-coordinate operator with a wide band exercises the generic
    # (2S+1)-input kernel
    go = _gene_order([120, 60, 30])
    op = coordinate_smoothing_operator(go, 200_000)
    x = rng.normal(size=(12, go.num_genes)).astype(np.float32)
    got = np.asarray(apply_banded_operator_pallas(x, op, interpret=True))
    want = np.asarray(apply_banded_operator(x, op))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_engine_pallas_interpret_matches_xla(rng):
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    go = _gene_order([200, 90, 50, 2, 1])
    hmm = HMMParams(means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
                    sds=np.array([0.15, 0.18, 0.12, 0.2, 0.22, 0.3]), t=1e-6)
    cfg = EngineConfig(denoise=True, sd_amplifier=1.5)
    eng_p = CnvEngine(go, hmm, cfg, use_pallas=True)   # interpret on CPU
    eng_x = CnvEngine(go, hmm, cfg, use_pallas=False)
    gm = rng.gamma(2.0, 30.0, go.num_genes).astype(np.float32)
    counts = rng.poisson(gm[None, :], (64, go.num_genes)).astype(np.float32)
    refc = rng.poisson(gm[None, :], (32, go.num_genes)).astype(np.float32)
    nf = float(np.median(counts.sum(axis=1)))
    ml, mr, nb = eng_p.ref_stats(refc, nf)
    tp = np.asarray(eng_p.transform_chunk(counts, nf, ml, mr))
    tx = np.asarray(eng_x.transform_chunk(counts, nf, ml, mr))
    np.testing.assert_allclose(tp, tx, atol=1e-5)
    _, sp = eng_p.full_chunk(counts, nf, ml, mr, nb)
    _, sx = eng_x.full_chunk(counts, nf, ml, mr, nb)
    assert np.array_equal(np.asarray(sp), np.asarray(sx))


def test_banded_smooth_bf16_close_to_f32():
    """bf16-MXU smooth variant (EngineConfig.matmul_dtype='bfloat16'):
    interpret-mode kernel agrees with the exact f32 path to bf16 mantissa
    precision (~0.4% worst-case on softmax-normalized pyramid weights)."""
    import numpy as np

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.ops.layout import smoothing_operator
    from infercnv_tpu.ops.smoothing import _apply_banded_pallas_k256

    G = 300
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.array([0] * 150 + [1] * 150, np.int32),
        start=np.arange(G), stop=np.arange(G),
    )
    op = smoothing_operator(go, 51, "pyramidinal")
    assert op.side_tiles == 1 and op.halfband <= 64
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (16, G)).astype(np.float32)
    w = np.asarray(op.shifted_blocks())
    f32 = np.asarray(_apply_banded_pallas_k256(
        x, w, op.n_tiles, op.side_tiles, op.num_genes, True))
    bf16 = np.asarray(_apply_banded_pallas_k256(
        x, w, op.n_tiles, op.side_tiles, op.num_genes, True,
        matmul_dtype="bfloat16"))
    # error bounded relative to the row scale (near-zero entries carry
    # absolute bf16 rounding noise)
    assert np.max(np.abs(bf16 - f32)) < 2e-2 * np.max(np.abs(f32))
    # and it is NOT bitwise identical (i.e. the variant actually engaged)
    assert not np.array_equal(bf16, f32)


def test_fused_median_residual_matches_unfused():
    """median_center_residual_pallas (interpret mode) == row-median
    subtraction + bounds subtraction + exp2 composed from the unfused
    ops, on a padded smooth output."""
    import numpy as np

    from infercnv_tpu.ops.median import median_center_residual_pallas

    rng = np.random.default_rng(3)
    C, G = 24, 300
    Gp = 384  # padded to the lane multiple
    yp = np.zeros((C, Gp), np.float32)
    yp[:, :G] = rng.normal(0, 0.5, (C, G)).astype(np.float32)
    gmin = rng.normal(-0.1, 0.02, G).astype(np.float32)
    gmax = rng.normal(0.1, 0.02, G).astype(np.float32)
    got = np.asarray(median_center_residual_pallas(
        yp, gmin, gmax, G, interpret=True))[:, :G]

    x = yp[:, :G]
    med = np.median(x, axis=1, keepdims=True)
    y = x - med
    exp = np.where(y > gmax, y - gmax, 0.0)
    exp = np.where(y < gmin, y - gmin, exp)
    exp = np.exp2(exp)
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6)


def test_engine_fused_pallas_residual_matches_xla(rng):
    """The engine's fused Pallas residual path (use_pallas + interpret)
    equals the pure-XLA path on the same inputs."""
    import numpy as np

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    G = 320
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.array([0] * 160 + [1] * 160, np.int32),
        start=np.arange(G), stop=np.arange(G),
    )
    hmm = HMMParams(means=np.arange(1, 7) / 3.0, sds=np.full(6, 0.1), t=1e-6)
    counts = rng.poisson(rng.gamma(2.0, 8.0, G)[None, :] *
                         np.ones((64, 1))).astype(np.float32)
    nf = float(np.median(counts.sum(axis=1)))
    cfgk = dict(window_length=31, denoise=False)
    e_xla = CnvEngine(go, hmm, EngineConfig(**cfgk), use_pallas=False)
    e_pal = CnvEngine(go, hmm, EngineConfig(**cfgk), use_pallas=True)
    assert e_pal._pallas_interpret  # CPU test env runs the kernels interpreted
    ml, mr, nb = e_xla.ref_stats(counts[:16], nf)
    r_xla = np.asarray(e_xla.transform_chunk(counts, nf, ml, mr))
    r_pal = np.asarray(e_pal.transform_chunk(counts, nf, ml, mr))
    np.testing.assert_allclose(r_pal, r_xla, rtol=2e-5, atol=2e-5)


def test_residual_band_kernel_all_configs(rng):
    """The single-kernel fused residual pass (ops/residual_fused.py)
    matches the unfused XLA path across the config matrix it claims:
    bounds/mean subtraction x median/mean centering x radix digits x
    odd/even gene counts."""
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    hmm = HMMParams(means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
                    sds=np.full(6, 0.15), t=1e-6)
    for lens in ([200, 90, 51], [150, 150]):   # odd and even num_genes
        go = _gene_order(lens)
        gm = rng.gamma(2.0, 30.0, go.num_genes).astype(np.float32)
        counts = rng.poisson(gm[None, :], (40, go.num_genes)).astype(np.float32)
        refc = rng.poisson(gm[None, :], (24, go.num_genes)).astype(np.float32)
        nf = float(np.median(counts.sum(axis=1)))
        for use_bounds in (True, False):
            for center in ("median", "mean"):
                for D in (1, 2):
                    cfg = EngineConfig(denoise=False,
                                       ref_subtract_use_bounds=use_bounds,
                                       center_method=center,
                                       median_radix_bits=D)
                    e_pal = CnvEngine(go, hmm, cfg, use_pallas=True)
                    e_xla = CnvEngine(go, hmm, cfg, use_pallas=False)
                    assert e_pal._w_stacked is not None
                    ml, mr, _ = e_xla.ref_stats(refc, nf)
                    r_pal = np.asarray(e_pal.transform_chunk(counts, nf, ml, mr))
                    r_xla = np.asarray(e_xla.transform_chunk(counts, nf, ml, mr))
                    np.testing.assert_allclose(
                        r_pal, r_xla, rtol=2e-5, atol=2e-5,
                        err_msg=f"{lens} bounds={use_bounds} {center} D={D}")


def test_residual_band_kernel_multigroup_refs(rng):
    """K>1 reference groups: the fused kernel's min/max bounds must match
    the unfused multi-group .subtract_expr semantics."""
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    go = _gene_order([130, 120])
    hmm = HMMParams(means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
                    sds=np.full(6, 0.15), t=1e-6)
    gm = rng.gamma(2.0, 30.0, go.num_genes).astype(np.float32)
    counts = rng.poisson(gm[None, :], (32, go.num_genes)).astype(np.float32)
    refc = rng.poisson(gm[None, :], (30, go.num_genes)).astype(np.float32)
    onehot = np.zeros((3, 30), np.float32)
    onehot[0, :10] = 1; onehot[1, 10:20] = 1; onehot[2, 20:] = 1
    nf = float(np.median(counts.sum(axis=1)))
    e_pal = CnvEngine(go, hmm, EngineConfig(denoise=False), use_pallas=True)
    e_xla = CnvEngine(go, hmm, EngineConfig(denoise=False), use_pallas=False)
    ml, mr, _ = e_xla.ref_stats(refc, nf, onehot)
    r_pal = np.asarray(e_pal.transform_chunk(counts, nf, ml, mr))
    r_xla = np.asarray(e_xla.transform_chunk(counts, nf, ml, mr))
    np.testing.assert_allclose(r_pal, r_xla, rtol=2e-5, atol=2e-5)


def test_residual_band_kernel_u16_counts_exact(rng):
    """uint16 raw counts through the fused kernel produce EXACTLY the f32
    result (the in-VMEM conversion is lossless below 2^16)."""
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    go = _gene_order([150, 100, 57])
    hmm = HMMParams(means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
                    sds=np.full(6, 0.15), t=1e-6)
    gm = rng.gamma(2.0, 30.0, go.num_genes).astype(np.float32)
    counts = rng.poisson(gm[None, :], (40, go.num_genes)).astype(np.uint16)
    refc = counts[:16].astype(np.float32)
    nf = float(np.median(counts.sum(axis=1, dtype=np.int64)))
    eng = CnvEngine(go, hmm, EngineConfig(denoise=False), use_pallas=True)
    ml, mr, _ = eng.ref_stats(refc, nf)
    r16 = np.asarray(eng.transform_chunk(counts, nf, ml, mr))
    r32 = np.asarray(eng.transform_chunk(counts.astype(np.float32), nf, ml, mr))
    np.testing.assert_array_equal(r16, r32)


def test_residual_band_kernel_f16_out_matches_cast(rng):
    """out_dtype='float16' stores the kernel's f32 result rounded at the
    final write — BIT-IDENTICAL to casting the f32 output afterwards (the
    smooth/median intermediates stay f32 in the dedicated scratch)."""
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    go = _gene_order([150, 100, 57])
    hmm = HMMParams(means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
                    sds=np.full(6, 0.15), t=1e-6)
    gm = rng.gamma(2.0, 30.0, go.num_genes).astype(np.float32)
    counts = rng.poisson(gm[None, :], (40, go.num_genes)).astype(np.uint16)
    refc = counts[:16].astype(np.float32)
    nf = float(np.median(counts.sum(axis=1, dtype=np.int64)))
    e32 = CnvEngine(go, hmm, EngineConfig(denoise=False), use_pallas=True)
    ml, mr, _ = e32.ref_stats(refc, nf)
    r32 = np.asarray(e32.transform_chunk(counts, nf, ml, mr))
    for odt in ("float16", "bfloat16"):
        en = CnvEngine(go, hmm, EngineConfig(denoise=False, out_dtype=odt),
                       use_pallas=True)
        rn = np.asarray(en.transform_chunk(counts, nf, ml, mr))
        assert rn.dtype == np.dtype(odt if odt == "float16" else jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(rn), np.asarray(jnp.asarray(r32).astype(rn.dtype)))
    # the unfused fallback honors out_dtype too (API contract)
    exla = CnvEngine(go, hmm, EngineConfig(denoise=False, out_dtype="float16"),
                     use_pallas=False)
    rx = np.asarray(exla.transform_chunk(counts.astype(np.float32), nf, ml, mr))
    assert rx.dtype == np.float16
