"""Chromosome-ordered smoothing (the reference's hot loop #1) on TPU.

reference: smooth_by_chromosome (R/inferCNV_ops.R:2406-2434, 'pyramidinal'
via .smooth_helper/.smooth_center_helper :2483-2532/:2640-2661),
smooth_by_chromosome_runmeans (:2679-2704), and
smooth_by_chromosome_coordinates (:2534-2622).

All three are expressed as one banded linear operator over the gene axis
(see ops/layout.py) and applied as tiled 128x128 matmuls — MXU work with a
single pass over HBM, instead of the reference's per-cell scalar loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from infercnv_tpu.ops.layout import (
    LANE,
    BandedGeneOperator,
    coordinate_smoothing_operator,
    smoothing_operator,
)


@functools.partial(jax.jit, static_argnames=("n_tiles", "side_tiles", "num_genes"))
def _apply_banded(x: jax.Array, blocks: jax.Array, n_tiles: int, side_tiles: int,
                  num_genes: int) -> jax.Array:
    """y[:, tile j] = sum_s x[:, tile j+s] @ blocks[s][j].  x: [C, G]."""
    C = x.shape[0]
    padded = n_tiles * LANE
    xp = jnp.zeros((C, padded), x.dtype).at[:, :num_genes].set(x)
    xt = xp.reshape(C, n_tiles, LANE)
    out = jnp.zeros((C, n_tiles, LANE), jnp.float32)
    for s in range(-side_tiles, side_tiles + 1):
        if s == 0:
            xs = xt
        elif s > 0:
            xs = jnp.concatenate([xt[:, s:], jnp.zeros((C, s, LANE), x.dtype)], axis=1)
        else:
            xs = jnp.concatenate([jnp.zeros((C, -s, LANE), x.dtype), xt[:, :s]], axis=1)
        out = out + jnp.einsum(
            "ctg,tgh->cth", xs, blocks[s + side_tiles],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return out.reshape(C, padded)[:, :num_genes]


def apply_banded_operator(x, op: BandedGeneOperator) -> jax.Array:
    return _apply_banded(
        jnp.asarray(x, jnp.float32), jnp.asarray(op.blocks),
        op.n_tiles, op.side_tiles, op.num_genes,
    )


def smooth_by_chromosome(x, gene_order, window_length: int = 101,
                         method: str = "pyramidinal") -> jax.Array:
    """Smooth [C, G] expression along the genomically ordered gene axis.

    method: 'pyramidinal' (triangular window, renormalized at chromosome
    ends) or 'runmeans' (flat window, same end handling — caTools::runmean
    endrule='mean').
    """
    op = smoothing_operator(gene_order, window_length, method)
    return apply_banded_operator(x, op)


def smooth_by_chromosome_coordinates(x, gene_order, window_length: int = 10_000_000) -> jax.Array:
    op = coordinate_smoothing_operator(gene_order, window_length)
    return apply_banded_operator(x, op)


# ---------------------------------------------------------------------------
# Host-side exact reference implementation (float64) for golden tests.
# ---------------------------------------------------------------------------

def smooth_window_reference(x_gc: np.ndarray, window_length: int) -> np.ndarray:
    """Direct float64 implementation of the single-chromosome smoother on a
    [G, C] matrix (the orientation the reference's .smooth_window uses).

    y[g] = sum k[d] x[g+d] / sum k[d] over in-range taps — algebraically
    identical to .smooth_helper's interior filter + end renormalization
    (denominator ((w-1)/2)^2 + w - r_l(r_l+1)/2 - r_r(r_r+1)/2 equals the sum
    of the included triangular weights).
    """
    if window_length < 2:
        return x_gc.copy()
    t = (window_length - 1) // 2
    k = np.concatenate([np.arange(1, t + 1), [t + 1], np.arange(t, 0, -1)]).astype(np.float64)
    G = x_gc.shape[0]
    out = np.empty_like(x_gc, np.float64)
    for g in range(G):
        lo = max(0, g - t)
        hi = min(G, g + t + 1)
        seg = k[(lo - g) + t:(hi - g) + t]
        out[g] = (x_gc[lo:hi].T @ seg) / seg.sum()
    return out
