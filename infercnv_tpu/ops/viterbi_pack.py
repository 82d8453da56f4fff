"""Bin-packed batched Viterbi — the ONE hot-path implementation.

reference semantics: Viterbi.dthmm.adj (R/inferCNV_HMM.R:1101-1176) run
per (row x chromosome); state sds collapse to their median (:1122); the
per-gene emission score is normalize_over_states(1 / (-log P(Z > |x-mu|/sd)))
then log (:1129-1133); sequences of length < 2 get the neutral state
(:1104-1107).

TPU design (shared by parallel/engine.py and models/hmm.py so the product
pipeline and the streaming engine run the exact same kernel):

* Chromosomes are first-fit-decreasing bin-packed into bins of capacity
  Lmax = longest chromosome, with the Viterbi chain RESTARTING at each
  chromosome start inside a bin — the sequential scan length is
  ~sum(chr lengths), not n_chr * max(chr length) (a human genome would
  otherwise pay ~2x).
* The batch axis (rows x bins) lives on the LAST (lane) dimension of every
  tensor in the scan: with the tiny state axis (S=6) leading, each op keeps
  all 128 lanes busy instead of wasting 95% of the VPU on an S-minor layout.
* On TPU the whole recursion runs as a fused Pallas kernel
  (ops/viterbi_pallas.py); off-TPU an XLA lax.scan with a one-hot-select
  backtrace (per-lane gathers serialize on TPU; the S-way compare+sum stays
  on the VPU).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from infercnv_tpu.core.genome import GeneOrder


def pack_indices(gene_order: GeneOrder) -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray, int]:
    """First-fit-decreasing bin-packing of chromosomes into padded bins.

    Returns (gather_idx [n_bins, Lmax], valid [n_bins, Lmax],
    boundaries [n_bins, Lmax], Lmax)."""
    ranges = [r for r in gene_order.chr_ranges() if r[1] > r[0]]
    Lmax = max(e - b for (b, e) in ranges)
    order = sorted(range(len(ranges)),
                   key=lambda i: ranges[i][1] - ranges[i][0], reverse=True)
    bins: list = []       # list of (used, [range, ...])
    for i in order:
        n = ranges[i][1] - ranges[i][0]
        for bi, (used, members) in enumerate(bins):
            if used + n <= Lmax:
                bins[bi] = (used + n, members + [ranges[i]])
                break
        else:
            bins.append((n, [ranges[i]]))
    n_bins = len(bins)
    gather = np.zeros((n_bins, Lmax), np.int32)
    valid = np.zeros((n_bins, Lmax), bool)
    boundaries = np.zeros((n_bins, Lmax), np.int8)
    for bi, (_used, members) in enumerate(bins):
        pos = 0
        for (b, e) in members:
            n = e - b
            gather[bi, pos:pos + n] = np.arange(b, e)
            valid[bi, pos:pos + n] = True
            boundaries[bi, pos] = 1
            pos += n
    return gather, valid, boundaries, Lmax


@dataclasses.dataclass
class PackedLayout:
    """Packing of one genome plus the inverse map for unpacking."""

    gather: np.ndarray       # [n_bins, Lmax] int32 gene gather indices
    valid: np.ndarray        # [n_bins, Lmax] bool
    boundaries: np.ndarray   # [n_bins, Lmax] int8 chromosome starts
    Lmax: int
    inv_pack: np.ndarray     # [G] flat position of gene g in the packed layout
    short_genes: Optional[np.ndarray]  # genes on < 2-gene chromosomes
    num_genes: int

    @staticmethod
    def from_gene_order(gene_order: GeneOrder) -> "PackedLayout":
        gather, valid, boundaries, Lmax = pack_indices(gene_order)
        inv = np.zeros(gene_order.num_genes, np.int32)
        flat = gather.reshape(-1)
        fvalid = valid.reshape(-1)
        inv[flat[fvalid]] = np.nonzero(fvalid)[0]
        short = [np.arange(b, e) for (b, e) in gene_order.chr_ranges()
                 if 0 < e - b < 2]
        short_genes = (np.concatenate(short).astype(np.int32)
                       if short else None)
        return PackedLayout(gather=gather, valid=valid, boundaries=boundaries,
                            Lmax=Lmax, inv_pack=inv, short_genes=short_genes,
                            num_genes=gene_order.num_genes)


# genome-content -> layout memo (a process holds only a handful of genomes;
# GeneOrder carries numpy arrays so it is not hashable for lru_cache).
# Keyed on CONTENT, never id(): a garbage-collected GeneOrder's address can
# be reused by a different genome, which would silently return the wrong
# packing.
_LAYOUT_MEMO: dict = {}


def layout_key(gene_order: GeneOrder) -> tuple:
    """Hashable content fingerprint of the chromosome structure (everything
    the packing depends on)."""
    return (gene_order.num_genes, tuple(gene_order.chr_names),
            gene_order.chr_ids.tobytes())


def get_layout(gene_order: GeneOrder) -> PackedLayout:
    key = layout_key(gene_order)
    hit = _LAYOUT_MEMO.get(key)
    if hit is None:
        hit = PackedLayout.from_gene_order(gene_order)
        if len(_LAYOUT_MEMO) > 64:
            _LAYOUT_MEMO.clear()
        _LAYOUT_MEMO[key] = hit
    return hit


def force_short_neutral(states, short_genes, S: int):
    """Chromosomes with < 2 genes get the neutral state
    (R/inferCNV_HMM.R:1104-1107)."""
    if short_genes is None:
        return states
    neutral = (S - 1) // 2 + 1
    return states.at[:, jnp.asarray(short_genes)].set(
        jnp.asarray(neutral, states.dtype))


def viterbi_packed(resid, layout: PackedLayout, means, sigma_rows,
                   log_pi, log_delta, hmm_means_np: np.ndarray, hmm_t: float,
                   use_pallas: bool = False, interpret: bool = False,
                   unroll: int = 1):
    """Traceable per-row Viterbi over bin-packed chromosomes.

    resid: [C, G]; sigma_rows: [C] per-row emission sigma (the reference's
    median-collapsed state sd, per subcluster when the hspike cell-count
    trend applies); means/log_pi/log_delta: jnp HMM parameters;
    hmm_means_np/hmm_t: host copies for the Pallas kernel's closure.
    Returns 1-based states [C, G].

    This function is pure-traceable: callers wrap it in their own jit /
    shard_map (the engine runs it inside the fused per-chunk program; the
    pipeline wraps it via :func:`viterbi_rows`).
    """
    means = jnp.asarray(means, jnp.float32)
    gather = jnp.asarray(layout.gather)
    valid = jnp.asarray(layout.valid)
    boundaries = jnp.asarray(layout.boundaries)
    inv_pack = jnp.asarray(layout.inv_pack)
    C = resid.shape[0]
    S = means.shape[0]
    Lmax = layout.Lmax
    xp = resid[:, gather]                # [C, n_bins, Lmax]
    n_bins = xp.shape[1]
    B = C * n_bins
    sigma_b = jnp.repeat(jnp.asarray(sigma_rows, jnp.float32), n_bins)
    if use_pallas:
        from infercnv_tpu.ops.viterbi_pallas import viterbi_pallas

        lengths = jnp.tile(jnp.sum(valid, axis=1).astype(jnp.int32), C)
        bnd = jnp.tile(boundaries, (C, 1))
        states = viterbi_pallas(xp.reshape(B, Lmax), lengths, sigma_b,
                                hmm_means_np, hmm_t,
                                boundaries=bnd, interpret=interpret)
        vals = states.reshape(C, n_bins * Lmax)
        return force_short_neutral(
            vals[:, inv_pack].astype(jnp.int8), layout.short_genes, S)
    xl = xp.reshape(B, Lmax).T           # [L, B]
    mask = jnp.broadcast_to(valid[None], (C, n_bins, Lmax))
    mask = mask.reshape(B, Lmax).T       # [L, B]
    bndm = jnp.tile(boundaries != 0, (C, 1)).T  # [L, B]

    # all emissions in one fused elementwise pass (no transcendentals
    # inside the sequential scan): [L, S, B].  The reference's per-position
    # normalizer log(sum_s e) is constant across states, so the Viterbi
    # decisions are identical without it (see models/hmm.py emission note).
    z = jnp.abs(xl[:, None, :] - means[None, :, None]) / sigma_b[None, None, :]
    logp = jax.scipy.special.log_ndtr(-z)
    em_all = -jnp.log(-logp)

    nu0 = log_delta[:, None] + em_all[0]            # [S, B]

    def step(nu_prev, inputs):
        em, mv, bv = inputs                          # [S,B], [B], [B]
        scores = nu_prev[:, None, :] + log_pi[:, :, None]  # [j, s, B]
        best = jnp.max(scores, axis=0)               # [S, B]
        bp = jnp.argmax(scores, axis=0).astype(jnp.int8)
        # chromosome start inside a bin: restart the chain
        nu_new = jnp.where(bv[None, :], log_delta[:, None] + em, best + em)
        nu_new = jnp.where(mv[None, :], nu_new, nu_prev)
        ident = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int8)[:, None], bp.shape)
        bp = jnp.where((mv & ~bv)[None, :], bp, ident)
        # argmax of nu BEFORE this step: closes the previous chromosome
        # during backtrace when stepping back over a restart
        am = jnp.argmax(nu_prev, axis=0).astype(jnp.int8)  # [B]
        return nu_new, (bp, am)

    nu_last, (bps, ams) = jax.lax.scan(
        step, nu0, (em_all[1:], mask[1:], bndm[1:]), unroll=unroll)
    y_last = jnp.argmax(nu_last, axis=0).astype(jnp.int8)  # [B]

    # backtrace via one-hot select: per-lane take_along_axis gathers
    # lower to a ~2ms/step serialized gather on TPU; the S=6 compare+sum
    # is pure VPU work (measured >1000x faster)
    sr = jnp.arange(S, dtype=jnp.int8)[:, None]
    bcut = (bndm[1:] & mask[1:])  # [L-1, B] restart positions

    def back(y_next, inputs):
        bp, am, bc = inputs
        onehot = sr == y_next[None, :]
        y = jnp.sum(jnp.where(onehot, bp, jnp.int8(0)), axis=0).astype(jnp.int8)
        y = jnp.where(bc, am, y)
        return y, y

    _, ys = jax.lax.scan(back, y_last, (bps, ams, bcut),
                         reverse=True, unroll=unroll)
    states = jnp.concatenate([ys, y_last[None, :]], axis=0) + 1  # [L, B]
    vals = states.T.reshape(C, n_bins * Lmax)
    return force_short_neutral(vals[:, inv_pack], layout.short_genes, S)


def default_flags() -> Tuple[bool, bool, int]:
    """(use_pallas, interpret, scan_unroll) for the current default backend:
    the fused Pallas kernel on real TPU; interpreted only when forced
    off-TPU (tests); scan unrolling helps TPU (~1.3x) but inflates CPU
    compile time ~4x."""
    platform = jax.default_backend()
    # Mosaic TPU kernel only: GPU and other accelerators take the XLA scan
    # path (the kernel does not lower there)
    use_pallas = _is_tpu_platform(platform)
    return use_pallas, False, (1 if platform == "cpu" else 4)


def _is_tpu_platform(platform: str) -> bool:
    """TPU-family backends, incl. the axon remote-TPU plugin."""
    return platform in ("tpu", "axon")
