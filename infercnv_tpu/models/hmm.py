"""i6 / i3 HMM CNV-state inference with a batched TPU Viterbi.

reference: R/inferCNV_HMM.R and R/inferCNV_i3HMM.R.

* i6: 6 states <-> CNV levels {0, 0.5, 1, 1.5, 2, 3}; emission N(mean, sd)
  per state measured from the hspike residuals (get_spike_dists :15-31);
  per-subcluster sd rescaled by cell count via lm(log sd ~ log n) on
  bootstrap means (get_hspike_cnv_mean_sd_trend_by_num_cells_fit :154-212).
* i3: 3 states {del, neutral, amp}; means mu -/+ mean_delta with
  mean_delta from qnorm or the HoneyBADGER KS fit (i3HMM.R:435-493).
* Viterbi (Viterbi.dthmm.adj :1101-1176) is NOT Gaussian-likelihood: state
  sds collapse to their median, and the per-gene emission score is
  normalize_over_states( 1 / (-log P(Z > |x-mu_s|/sd)) ), then log.

TPU design: sequences are per-(batch row x chromosome), padded to the
longest chromosome; the forward max-product is a single lax.scan over the
gene axis with the whole batch vectorized in one [B, S] carry — the
reference's per-cell serial loops become one fused device program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.core.object import InferCNV
from infercnv_tpu.utils.logging import log_info

I6_LEVELS = ("cnv:0.01", "cnv:0.5", "cnv:1", "cnv:1.5", "cnv:2", "cnv:3")
I6_PROXY_VALUES = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0])
I3_PROXY_VALUES = np.array([0.5, 1.0, 1.5])
NEUTRAL_STATE_I6 = 3  # 1-based, as reported
NEUTRAL_STATE_I3 = 2


# ---------------------------------------------------------------------------
# emission calibration from the hspike
# ---------------------------------------------------------------------------

def gene_expr_by_cnv(hspike: InferCNV) -> Dict[str, np.ndarray]:
    """Residual expr values of hspike *tumor* cells pooled per CNV level
    (reference .get_gene_expr_by_cnv :45-68)."""
    from infercnv_tpu.models.hspike import hspike_chr_info, HSPIKE_GENES_PER_CHR

    info = hspike_chr_info(HSPIKE_GENES_PER_CHR, 1)
    spike_idx = hspike.all_obs_idx()
    expr = hspike.expr[spike_idx]  # [C_spike, G]
    by_cnv: Dict[str, List[np.ndarray]] = {}
    for (name, cnv, _n) in info:
        key = f"cnv:{cnv:g}"
        if name not in hspike.gene_order.chr_names:
            continue
        gidx = hspike.gene_order.chr_gene_indices(name)
        if gidx.size == 0:
            continue
        by_cnv.setdefault(key, []).append(expr[:, gidx].ravel())
    return {k: np.concatenate(v) for k, v in by_cnv.items()}


def get_spike_dists(hspike: InferCNV) -> Dict[str, Tuple[float, float]]:
    """{cnv_level: (mean, sd)} (reference get_spike_dists :15-31; sd ddof=1)."""
    out = {}
    for k, vals in gene_expr_by_cnv(hspike).items():
        out[k] = (float(vals.mean()), float(vals.std(ddof=1)))
    return out


def cnv_mean_sd_trend_fit(hspike: InferCNV, seed: int = 777,
                          nrounds: int = 100, max_cells: int = 100) -> Dict[str, Tuple[float, float]]:
    """Per CNV level, fit log(sd of n-cell means) ~ log(n); returns
    {level: (intercept, slope)}.

    reference get_hspike_cnv_mean_sd_trend_by_num_cells_fit (:154-212):
    bootstrap-sample n values, sd over 100 replicates, for n = 1..100, then
    lm(log(sd) ~ log(n)).  Here the bootstrap is one vectorized draw per
    level: sample [nrounds, max_cells] values and take prefix means, giving
    every n at once (distributionally identical, fully parallel).
    """
    key = jax.random.PRNGKey(seed)
    fits: Dict[str, Tuple[float, float]] = {}
    logn = np.log(np.arange(1, max_cells + 1))
    X = np.stack([np.ones_like(logn), logn], axis=1)
    for lvl, vals in gene_expr_by_cnv(hspike).items():
        key, k = jax.random.split(key)
        v = jnp.asarray(vals, jnp.float32)
        idx = jax.random.randint(k, (nrounds, max_cells), 0, v.shape[0])
        draws = v[idx]                                    # [rounds, n]
        prefix_means = jnp.cumsum(draws, axis=1) / jnp.arange(1, max_cells + 1)
        sds = jnp.std(prefix_means, axis=0, ddof=1)       # [n]
        y = np.log(np.maximum(np.asarray(sds), 1e-12))
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        fits[lvl] = (float(beta[0]), float(beta[1]))
    return fits


def state_emission_sds(num_cells: int, trend_fits: Dict[str, Tuple[float, float]],
                       levels: Sequence[str] = I6_LEVELS) -> np.ndarray:
    """sd per state for a group of `num_cells` cells
    (reference .get_state_emission_params :586-614: exp(lm predict))."""
    return np.array([
        np.exp(trend_fits[lvl][0] + trend_fits[lvl][1] * np.log(num_cells))
        for lvl in levels
    ])


# ---------------------------------------------------------------------------
# HMM parameterization
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HMMParams:
    means: np.ndarray    # [S] state emission means
    sds: np.ndarray      # [S] state emission sds (pre median-collapse)
    t: float             # off-diagonal transition probability

    @property
    def num_states(self) -> int:
        return self.means.shape[0]

    def delta(self) -> np.ndarray:
        """Start distribution: neutral-favoring (reference .get_HMM :230-265
        i6; .i3HMM_get_HMM i3HMM.R:99-156)."""
        S = self.num_states
        d = np.full(S, self.t)
        d[(S - 1) // 2] = 1.0 - (S - 1) * self.t
        return d

    def log_pi(self) -> np.ndarray:
        S = self.num_states
        P = np.full((S, S), self.t)
        np.fill_diagonal(P, 1.0 - (S - 1) * self.t)
        return np.log(P)


def i6_hmm_params(cnv_mean_sd: Dict[str, Tuple[float, float]], t: float = 1e-6) -> HMMParams:
    means = np.array([cnv_mean_sd[lvl][0] for lvl in I6_LEVELS])
    sds = np.array([cnv_mean_sd[lvl][1] for lvl in I6_LEVELS])
    return HMMParams(means=means, sds=sds, t=t)


def determine_mean_delta_via_Z(sigma: float, p: float = 0.05) -> float:
    """|qnorm(p, sd=sigma)| (reference i3HMM.R:435-445)."""
    from scipy.stats import norm
    return float(abs(norm.ppf(p, loc=0, scale=sigma)))


def honeybadger_setGexpDev(gexp_sd: float, alpha: float = 0.05, k_cells: int = 1) -> float:
    """HoneyBADGER-style KS deviation (reference get_HoneyBADGER_setGexpDev
    i3HMM.R:469-493): smallest dev where a two-sample KS test between
    N(0, sd) and N(dev, sd) samples of size k reaches significance — the
    reference optimizes 1-pnorm(sqrt(k)*dev/(2*sd)) ~ alpha/2; we solve it
    in closed form."""
    from scipy.stats import norm
    # P(KS detects) approx: dev such that pnorm upper tail at
    # sqrt(k)*dev/(2 sd) equals alpha -> dev = 2 sd qnorm(1-alpha)/sqrt(k)
    return float(2.0 * gexp_sd * norm.ppf(1.0 - alpha) / np.sqrt(k_cells))


def i3_hmm_params(expr_cg: np.ndarray, ref_groups: Sequence[np.ndarray],
                  obs_groups: Sequence[np.ndarray], t: float = 1e-6,
                  i3_p_val: float = 0.05, use_KS: bool = False) -> HMMParams:
    """i3 parameterization from normal-cell residuals
    (reference .i3HMM_get_sd_trend_by_num_cells_fit i3HMM.R:17-80 and
    .i3HMM_get_HMM :99-156).

    Note on the "sd trend by num cells": in the reference the bootstrap
    lm(log(sd) ~ log(num_cells)) fit and its per-subcluster sigma scaling are
    ENTIRELY commented out (i3HMM.R:28-62 and :121-132), and `num_cells`
    computed in the subcluster/sample predict loops (:285, :367) is never
    passed anywhere — the live behavior is one constant sigma from the
    normal-cell residuals with mean_delta from qnorm (:435-445) or the
    HoneyBADGER KS fit with k_cells = total normal cells (:469-493).  This
    implementation matches the live behavior exactly."""
    groups = ref_groups if len(ref_groups) > 0 else obs_groups
    idx = np.concatenate([np.asarray(g) for g in groups])
    vals = expr_cg[idx]
    mu = float(vals.mean())
    sigma = float(vals.std(ddof=1))
    if use_KS:
        delta = honeybadger_setGexpDev(sigma, alpha=i3_p_val, k_cells=idx.size)
    else:
        delta = determine_mean_delta_via_Z(sigma, p=i3_p_val)
    means = np.array([mu - delta, mu, mu + delta])
    sds = np.array([sigma, sigma, sigma])
    return HMMParams(means=means, sds=sds, t=t)


# ---------------------------------------------------------------------------
# batched Viterbi
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_states",))
def _viterbi_batched(x, mask, means, sigma, log_pi, log_delta, num_states: int):
    """Viterbi with the reference's pseudo-emission scoring.

    x: [B, L] observations (padded), mask: [B, L] validity,
    means: [S], sigma: [B] (median-collapsed per batch row),
    log_pi: [S, S], log_delta: [S].
    Returns states [B, L] (1-based as in the reference reports).
    """
    B, L = x.shape
    S = num_states

    def emission(xv, sig):
        # xv: [B], sig: [B] -> [B, S].  The reference normalizes the
        # pseudo-emission e = 1/(-logsf) over states before taking the log
        # (:1129-1133); the normalizer log(sum_s e) is CONSTANT across
        # states at each position, so the Viterbi max-product decisions
        # are identical without it — it is dropped here (and in the packed
        # XLA / Pallas implementations, identically) to keep the hot loop
        # at one transcendental per state.
        z = jnp.abs(xv[:, None] - means[None, :]) / sig[:, None]
        logp = jax.scipy.stats.norm.logsf(z)          # log upper-tail
        return -jnp.log(-logp)                        # log(1/(-logp))

    em0 = emission(x[:, 0], sigma)
    nu0 = log_delta[None, :] + em0                    # [B, S]

    def step(nu_prev, inputs):
        xv, mv = inputs                               # [B], [B] bool
        em = emission(xv, sigma)                      # [B, S]
        scores = nu_prev[:, :, None] + log_pi[None, :, :]   # [B, j, s]
        best = jnp.max(scores, axis=1)                # [B, S]
        bp = jnp.argmax(scores, axis=1)               # [B, S]
        nu_new = best + em
        nu_new = jnp.where(mv[:, None], nu_new, nu_prev)
        ident = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        bp = jnp.where(mv[:, None], bp, ident)
        return nu_new, bp

    nu_last, bps = jax.lax.scan(step, nu0, (x[:, 1:].T, mask[:, 1:].T))
    # bps: [L-1, B, S]
    y_last = jnp.argmax(nu_last, axis=1)              # [B]

    # one-hot select instead of take_along_axis: per-lane gathers serialize
    # on TPU while the S-way compare+sum stays on the VPU
    def back(y_next, bp):
        onehot = jnp.arange(S)[None, :] == y_next[:, None]
        y = jnp.sum(jnp.where(onehot, bp, 0), axis=1)
        return y, y

    _, ys = jax.lax.scan(back, y_last, bps, reverse=True)
    states = jnp.concatenate([ys, y_last[None, :]], axis=0).T  # [B, L]
    return states + 1


def pack_by_chromosome(x_bg: np.ndarray, gene_order: GeneOrder):
    """Pack [B, G] data into per-chromosome padded sequences.

    Returns (x_packed [B*n_chr, Lmax], mask [B*n_chr, Lmax], chr_ranges).
    """
    ranges = [r for r in gene_order.chr_ranges() if r[1] > r[0]]
    Lmax = max(e - b for (b, e) in ranges)
    B = x_bg.shape[0]
    n_chr = len(ranges)
    xp = np.zeros((B, n_chr, Lmax), np.float32)
    mask = np.zeros((n_chr, Lmax), bool)
    for ci, (b, e) in enumerate(ranges):
        xp[:, ci, : e - b] = x_bg[:, b:e]
        mask[ci, : e - b] = True
    return (
        xp.reshape(B * n_chr, Lmax),
        np.broadcast_to(mask[None], (B, n_chr, Lmax)).reshape(B * n_chr, Lmax).copy(),
        ranges,
    )


# jit cache for the packed-Viterbi runners: (layout id, HMM param bytes,
# backend flags) -> compiled callable.  A fresh jax.jit per call would
# re-trace every invocation; this keeps one compiled program per
# (genome, parameterization) as the reference pipeline re-enters step 17.
_PACKED_RUNNERS: dict = {}


def _packed_runner(layout, params: HMMParams, use_pallas: bool,
                   interpret: bool, unroll: int, mesh=None):
    # content keys, never id(): a freed layout/mesh address can be reused
    # by a different object and silently hit the wrong compiled program
    mesh_key = (None if mesh is None else
                (tuple(d.id for d in mesh.devices.flat), mesh.axis_names))
    key = (layout.num_genes, layout.gather.tobytes(),
           layout.valid.tobytes(), layout.boundaries.tobytes(),
           params.means.tobytes(), params.sds.tobytes(),
           params.t, use_pallas, interpret, unroll, mesh_key)
    fn = _PACKED_RUNNERS.get(key)
    if fn is None:
        from infercnv_tpu.ops.viterbi_pack import viterbi_packed

        means = jnp.asarray(params.means, jnp.float32)
        log_pi = jnp.asarray(params.log_pi(), jnp.float32)
        log_delta = jnp.asarray(np.log(params.delta()), jnp.float32)
        hmm_means = np.asarray(params.means)
        t = params.t

        def run(x, sigma_rows):
            return viterbi_packed(
                x, layout, means, sigma_rows, log_pi, log_delta,
                hmm_means, t, use_pallas=use_pallas, interpret=interpret,
                unroll=unroll)

        if mesh is not None:
            # rows are independent sequences: shard_map over the cell axis
            # (no collectives), each shard running the same fused program
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map as _shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map as _shard_map

            kw = dict(mesh=mesh, in_specs=(P("cells", None), P("cells")),
                      out_specs=P("cells", None))
            try:
                fn = jax.jit(_shard_map(run, check_vma=False, **kw))
            except TypeError:  # pre-0.7 API
                fn = jax.jit(_shard_map(run, check_rep=False, **kw))
        else:
            fn = jax.jit(run)
        if len(_PACKED_RUNNERS) > 64:
            _PACKED_RUNNERS.clear()
        _PACKED_RUNNERS[key] = fn
    return fn


def viterbi_per_group(
    x_bg: np.ndarray,
    gene_order: GeneOrder,
    params: HMMParams,
    group_sds: Optional[np.ndarray] = None,
    impl: str = "packed",
    mesh=None,
) -> np.ndarray:
    """Run Viterbi for each row of x_bg ([B, G] of per-cell or per-group mean
    expression), per chromosome.  group_sds: optional [B, S] per-row state
    sds (per-subcluster scaling); defaults to params.sds for every row.

    impl='packed' (default): the shared bin-packed implementation
    (ops/viterbi_pack.py — chromosomes first-fit packed into bins with
    chain restarts, Pallas kernel on TPU) that the streaming engine also
    runs; sequential scan length is ~sum(chr lengths) instead of the
    per-chromosome padding's n_chr * max(chr length) (~2x on a human
    genome).  impl='perchr': the independent per-chromosome-padded scan,
    kept as a cross-check (tests assert both agree).

    Returns 1-based state matrix [B, G].  Chromosomes with < 2 genes get the
    neutral state (reference Viterbi.dthmm.adj :1104-1107).
    """
    B, G = x_bg.shape
    S = params.num_states
    if group_sds is None:
        group_sds = np.broadcast_to(params.sds[None, :], (B, S))
    sigma_rows = np.median(group_sds, axis=1)  # median collapse (:1122)

    if impl == "packed":
        from infercnv_tpu.ops.viterbi_pack import default_flags, get_layout

        layout = get_layout(gene_order)
        use_pallas, interpret, unroll = default_flags()
        if mesh is not None:
            from infercnv_tpu.ops.viterbi_pack import _is_tpu_platform

            use_pallas = _is_tpu_platform(mesh.devices.flat[0].platform)
        n_dev = int(mesh.devices.size) if mesh is not None else 1
        x_in, sig_in = x_bg, sigma_rows
        if mesh is not None and B % n_dev:
            pad = n_dev - B % n_dev  # padded rows are independent sequences
            x_in = np.concatenate([x_bg, np.ones((pad, G), x_bg.dtype)])
            sig_in = np.concatenate([sigma_rows, np.ones(pad)])
        fn = _packed_runner(layout, params, use_pallas, interpret, unroll,
                            mesh=mesh)
        x_j = jnp.asarray(x_in, jnp.float32)
        sig_j = jnp.asarray(sig_in, jnp.float32)
        if mesh is not None:
            from infercnv_tpu.parallel.stats import put_cell_sharded, to_host

            x_j = put_cell_sharded(x_j, mesh)
            sig_j = put_cell_sharded(sig_j, mesh)
            return to_host(fn(x_j, sig_j)).astype(np.int32)[:B]
        states = fn(x_j, sig_j)
        return np.asarray(states, np.int32)[:B]

    xp, mask, ranges = pack_by_chromosome(x_bg, gene_order)
    n_chr = len(ranges)
    sigma = np.repeat(sigma_rows, n_chr).astype(np.float32)

    states = _viterbi_batched(
        jnp.asarray(xp), jnp.asarray(mask),
        jnp.asarray(params.means, jnp.float32), jnp.asarray(sigma),
        jnp.asarray(params.log_pi(), jnp.float32),
        jnp.asarray(np.log(params.delta()), jnp.float32),
        S,
    )
    states = np.asarray(states).reshape(B, n_chr, -1)

    out = np.full((B, G), (S - 1) // 2 + 1, np.int32)  # neutral default
    for ci, (b, e) in enumerate(ranges):
        n = e - b
        if n < 2:
            continue  # stays neutral
        out[:, b:e] = states[:, ci, :n]
    return out


# ---------------------------------------------------------------------------
# prediction drivers (cell / subcluster / sample modes)
# ---------------------------------------------------------------------------

def _group_mean_rows(expr_cg: np.ndarray, groups: Dict[str, np.ndarray]) -> Tuple[np.ndarray, List[str], List[np.ndarray]]:
    names = list(groups.keys())
    idxs = [np.asarray(groups[n]) for n in names]
    rows = np.stack([expr_cg[ix].mean(axis=0) for ix in idxs])
    return rows, names, idxs


@dataclasses.dataclass
class GroupedStates:
    """Factorized HMM state calls: one state row per group plus a cell->row
    map.  Group-mode Viterbi calls are constant across a group's cells, so
    the [C, G] matrix is pure redundancy — at 100k cells materializing it
    costs seconds of pure memory writes, and the heatmap renderer / region
    reports can consume the factorized form directly."""

    rows: np.ndarray          # [K, G] int8, 1-based states
    cell_to_row: np.ndarray   # [C] int32
    names: List[str]

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.cell_to_row.shape[0], self.rows.shape[1])

    def materialize(self) -> np.ndarray:
        """Expand to the classic [C, G] matrix (one gather)."""
        return self.rows[self.cell_to_row]


def predict_hmm_on_cells(obj: InferCNV, params: HMMParams,
                         mesh=None) -> np.ndarray:
    """Per-cell i6/i3 state matrix [C, G]
    (reference predict_CNV_via_HMM_on_indiv_cells :284-324).  With a mesh,
    cells shard over it (independent sequences, no collectives)."""
    log_info("predict_hmm_on_cells()")
    return np.asarray(
        viterbi_per_group(obj.expr, obj.gene_order, params, mesh=mesh),
        np.int8)


def predict_hmm_on_groups(
    obj: InferCNV,
    params: HMMParams,
    groups: Dict[str, np.ndarray],
    trend_fits: Optional[Dict[str, Tuple[float, float]]] = None,
    levels: Sequence[str] = I6_LEVELS,
    mesh=None,
    factorized: bool = False,
):
    """Viterbi on per-group mean expression, states written back to every
    member cell (reference predict_CNV_via_HMM_on_tumor_subclusters :345-408
    / ..._whole_tumor_samples :509-567).  With trend_fits, per-group state
    sds follow the cell-count trend (.get_state_emission_params).

    factorized=True returns the :class:`GroupedStates` form instead of the
    expanded [C, G] matrix."""
    log_info(f"predict_hmm_on_groups() over {len(groups)} groups")
    rows, names, idxs = _group_mean_rows(obj.expr, groups)
    if trend_fits is not None:
        group_sds = np.stack([
            state_emission_sds(len(ix), trend_fits, levels) for ix in idxs
        ])
    else:
        group_sds = None
    states_rows = np.asarray(
        viterbi_per_group(rows, obj.gene_order, params, group_sds, mesh=mesh),
        np.int8)
    neutral = (params.num_states - 1) // 2 + 1
    # cells outside every group (none in practice) keep the neutral row
    K = states_rows.shape[0]
    cell_to_row = np.full(obj.num_cells, K, np.int32)
    for r, ix in enumerate(idxs):
        cell_to_row[ix] = r
    if (cell_to_row == K).any():
        states_rows = np.concatenate(
            [states_rows, np.full((1, states_rows.shape[1]), neutral, np.int8)])
    gs = GroupedStates(rows=states_rows, cell_to_row=cell_to_row, names=names)
    return gs if factorized else gs.materialize()


def predict_hmm_on_subclusters_per_chr(
    obj: InferCNV,
    params: HMMParams,
    subclusters_per_chr: Dict[str, Dict[str, np.ndarray]],
    trend_fits: Optional[Dict[str, Tuple[float, float]]] = None,
    levels: Sequence[str] = I6_LEVELS,
) -> np.ndarray:
    """Per-chromosome subcluster HMM (reference
    predict_CNV_via_HMM_on_tumor_subclusters_per_chr :412-487): each
    chromosome is predicted with its own cell partition, then the top-level
    subclusters force a per-region consensus."""
    from infercnv_tpu.report.regions import get_predicted_cnv_regions

    log_info("predict_hmm_on_subclusters_per_chr()")
    S = params.num_states
    out = np.full(obj.expr.shape, (S - 1) // 2 + 1, np.int8)
    for ci, cname in enumerate(obj.gene_order.chr_names):
        if cname not in subclusters_per_chr:
            continue
        gsel = obj.gene_order.chr_gene_indices(cname)
        if gsel.size < 2:
            continue
        sub_go = GeneOrder(
            names=tuple(obj.gene_order.names[i] for i in gsel),
            chr_names=(cname,),
            chr_ids=np.zeros(gsel.size, np.int32),
            start=obj.gene_order.start[gsel],
            stop=obj.gene_order.stop[gsel],
        )
        groups = subclusters_per_chr[cname]
        idxs = [np.asarray(v) for v in groups.values()]
        rows = np.stack([obj.expr[np.ix_(ix, gsel)].mean(axis=0) for ix in idxs])
        if trend_fits is not None:
            group_sds = np.stack([
                state_emission_sds(len(ix), trend_fits, levels) for ix in idxs])
        else:
            group_sds = None
        st = viterbi_per_group(rows, sub_go, params, group_sds)
        for r, ix in enumerate(idxs):
            out[np.ix_(ix, gsel)] = st[r]
    # force consensus per top-level subcluster region (reference :469-485)
    cell_lut = {n: i for i, n in enumerate(obj.cell_names)}
    gene_lut = {n: i for i, n in enumerate(obj.gene_order.names)}
    regions = get_predicted_cnv_regions(obj, out, by="subcluster")
    for gr in regions:
        cell_idx = np.array([cell_lut[c] for c in gr.cells], np.int64)
        for r in gr.regions:
            gidx = [gene_lut[g] for g in r.genes]
            out[np.ix_(cell_idx, gidx)] = r.state
    return out


def proxy_value_lut(num_states: int = 6) -> np.ndarray:
    """LUT indexed by the 1-based state value itself (lut[state] -> proxy
    level; lut[0] unused) — lets renderers map small state blocks to proxy
    values without materializing the [C, G] float matrix."""
    table = I6_PROXY_VALUES if num_states == 6 else I3_PROXY_VALUES
    return np.concatenate([[np.nan], table]).astype(np.float32)


def assign_states_to_proxy_values(states: np.ndarray, num_states: int = 6) -> np.ndarray:
    """State index (1-based) -> CNV proxy level
    (reference assign_HMM_states_to_proxy_expr_vals :1191-1206 i6,
    i3HMM.R:405-417 i3)."""
    table = I6_PROXY_VALUES if num_states == 6 else I3_PROXY_VALUES
    s = np.asarray(states)
    if s.dtype.kind not in "iu":  # float state matrices (old checkpoints)
        s = s.astype(np.int64)
    return table[s - 1].astype(np.float32)
