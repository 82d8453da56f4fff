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

__version__ = "0.2.0"

import os as _os


def _enable_persistent_compile_cache():
    """Point JAX at an on-disk compilation cache (tunnel-attached TPU compiles
    are expensive; repeat runs of the same programs should be free)."""
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.environ.get(
            "INFERCNV_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                ".jax_cache")
            _os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from infercnv_tpu.core.object import InferCNV, create_infercnv_object  # noqa: F401,E402
from infercnv_tpu.core.genome import GeneOrder  # noqa: F401,E402


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


def add_to_seurat(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.report.seurat_export.add_to_seurat`:
    file-based metadata export from a finished out_dir (the reference's
    exported add_to_seurat, R/seurat_interaction.R:23)."""
    from infercnv_tpu.report.seurat_export import add_to_seurat as _f

    return _f(*args, **kwargs)


def plot_subclusters(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.viz.subclusters.plot_subclusters`
    (reference exported plot_subclusters, inferCNV_tumor_subclusters.R:336)."""
    from infercnv_tpu.viz.subclusters import plot_subclusters as _f

    return _f(*args, **kwargs)


def inferCNVBayesNet(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.models.bayes.inferCNVBayesNet`
    (reference exported name, inferCNV_BayesNet.R:1237)."""
    from infercnv_tpu.models.bayes import inferCNVBayesNet as _f

    return _f(*args, **kwargs)


def filterHighPNormals(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.models.bayes.filterHighPNormals`
    (reference exported name, inferCNV_BayesNet.R:1394)."""
    from infercnv_tpu.models.bayes import filterHighPNormals as _f

    return _f(*args, **kwargs)


def color_palette(*args, **kwargs):
    """Lazy alias for :func:`infercnv_tpu.viz.heatmap.color_palette`
    (reference exported color.palette, inferCNV_ops.R:1808)."""
    from infercnv_tpu.viz.heatmap import color_palette as _f

    return _f(*args, **kwargs)


# CamelCase alias matching the reference's exported constructor name
def CreateInfercnvObject(*args, **kwargs):
    """The reference's exported constructor (R/inferCNV.R:133-337), both
    calling conventions:

    * reference style — ``CreateInfercnvObject(raw_counts_matrix=<path or
      genes x cells DataFrame>, annotations_file=<path>,
      gene_order_file=<path>, ref_group_names=[...], delim="\\t", ...)``
      (file paths may be tsv/gz/.rds/.mtx/.h5ad/10x-.h5);
    * in-memory arrays — the keyword signature of
      :func:`infercnv_tpu.core.object.create_infercnv_object`.
    """
    ref_style = ("raw_counts_matrix" in kwargs or "annotations_file" in kwargs
                 or "gene_order_file" in kwargs
                 or (args and isinstance(args[0], (str, _os.PathLike))))
    if not ref_style:
        return create_infercnv_object(*args, **kwargs)
    names = ("raw_counts_matrix", "gene_order_file", "annotations_file",
             "ref_group_names")
    for name, val in zip(names, args):
        if name in kwargs:
            raise TypeError(f"CreateInfercnvObject() got multiple values for {name!r}")
        kwargs[name] = val
    counts = kwargs.pop("raw_counts_matrix")
    gene_order_file = kwargs.pop("gene_order_file")
    annotations_file = kwargs.pop("annotations_file")
    ref_group_names = kwargs.pop("ref_group_names", None)
    sep = kwargs.pop("delim", "\t")
    passthrough = {k: kwargs.pop(k) for k in
                   ("chr_exclude", "min_max_counts_per_cell",
                    "max_cells_per_group") if k in kwargs}
    if kwargs:
        raise TypeError("CreateInfercnvObject() got unexpected keyword "
                        f"argument(s): {sorted(kwargs)}")
    if isinstance(counts, (str, _os.PathLike)):
        from infercnv_tpu.io.loaders import load_infercnv_object

        return load_infercnv_object(
            counts_path=_os.fspath(counts), gene_order_path=_os.fspath(gene_order_file),
            annotations_path=_os.fspath(annotations_file),
            ref_group_names=ref_group_names, sep=sep, **passthrough)
    # genes x cells DataFrame (the reference's in-memory matrix form carries
    # dimnames; the Python analogue is a pandas-like frame)
    if not (hasattr(counts, "index") and hasattr(counts, "columns")):
        raise TypeError(
            "raw_counts_matrix must be a file path or a genes x cells "
            "DataFrame (rownames=genes, colnames=cells); for bare arrays "
            "use create_infercnv_object(counts_matrix=..., gene_names=..., "
            "cell_names=...)")
    from infercnv_tpu.io.loaders import read_annotations_file, read_gene_order_file

    table, chr_order = read_gene_order_file(_os.fspath(gene_order_file))
    ann = read_annotations_file(_os.fspath(annotations_file))
    import numpy as _np

    return create_infercnv_object(
        counts_matrix=_np.asarray(counts, _np.float64),
        gene_names=[str(g) for g in counts.index],
        cell_names=[str(c) for c in counts.columns],
        annotations=ann, gene_order_table=table, chr_file_order=chr_order,
        ref_group_names=ref_group_names, **passthrough)
