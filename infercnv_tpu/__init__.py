"""infercnv_tpu — a TPU-native framework for inferring copy-number variation
from single-cell RNA-seq, built on JAX/XLA/Pallas.

Capabilities mirror broadinstitute/infercnv (R/Bioconductor): depth
normalization, log transform, reference subtraction, chromosome-ordered
pyramidal smoothing, denoising, Leiden subclustering, hspike-calibrated
i6/i3 HMM CNV-state inference, Bayesian mixture-model posterior filtering,
region reporting, and heatmap visualization — redesigned TPU-first:

* expression lives as a ``[cells, genes]`` array, cell-sharded over a
  ``jax.sharding.Mesh`` (genes replicated — the gene axis is small),
* chromosome-ordered smoothing is a block-banded matmul on the MXU,
* HMM Viterbi is a batched ``lax.scan`` over genes, vmapped over
  (cells|subclusters) x chromosomes,
* group statistics are computed with collectives (psum/all_gather).

See ``SURVEY.md`` at the repo root for the structural analysis of the
reference that this package is built to.
"""

__version__ = "0.1.0"

from infercnv_tpu.core.object import InferCNV, create_infercnv_object  # noqa: F401
from infercnv_tpu.core.genome import GeneOrder  # noqa: F401


def run(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.runner.pipeline.run`."""
    from infercnv_tpu.runner.pipeline import run as _run

    return _run(*args, **kwargs)


def apply_median_filtering(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.ops.median_filter.apply_median_filtering`."""
    from infercnv_tpu.ops.median_filter import apply_median_filtering as _f

    return _f(*args, **kwargs)


def plot_cnv(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.viz.heatmap.plot_cnv`."""
    from infercnv_tpu.viz.heatmap import plot_cnv as _f

    return _f(*args, **kwargs)


def plot_per_group(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.viz.per_group.plot_per_group`."""
    from infercnv_tpu.viz.per_group import plot_per_group as _f

    return _f(*args, **kwargs)


def sample_object(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.viz.per_group.sample_object`."""
    from infercnv_tpu.viz.per_group import sample_object as _f

    return _f(*args, **kwargs)


def add_to_metadata(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.report.seurat_export.add_to_metadata`
    (the add_to_seurat analogue)."""
    from infercnv_tpu.report.seurat_export import add_to_metadata as _f

    return _f(*args, **kwargs)
