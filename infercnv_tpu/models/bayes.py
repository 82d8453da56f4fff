"""Bayesian mixture-model CNV filtering — the JAGS/BUGS replacement.

reference: R/inferCNV_BayesNet.R + inst/BUGS_Mixture_Model{,_i3}.  Per
non-neutral CNV region r (from the step-17 HMM report), with cells j of the
region's cell group and genes i of the region:

    gexp[i, j] ~ N(mu[eps_j], tau[eps_j])      (tau = precision)
    eps_j      ~ Categorical(theta)
    theta      ~ Dirichlet(1, ..., 1)

(mu, tau) per state come from the hspike (i6, MeanSD :148-198) or the i3
trend.  The reference runs rjags with 6 (i3: 3) chains x (500 adapt + 200
burn-in + 1000 iterations) per region, serially over regions via mclapply.

TPU-native: this conjugate pair has an exact blocked Gibbs sweep —
eps | theta is categorical with logits log(theta_s) + LL[j, s], and
theta | eps is Dirichlet(1 + counts) — so we run the *same* MCMC as JAGS
but with every (region x chain) pair vectorized in one [R, chains, C, S]
device program under lax.scan.  Regions are padded to a common cell count
and masked.

Filtering (removeCNV :562-630): regions with posterior P(normal) >
BayesMaxPNormal are reset to the neutral state; reassignCNV (:491-540)
moves remaining regions to their argmax state.  Writes
CNV_State_Probabilities.dat.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from infercnv_tpu.core.object import InferCNV
from infercnv_tpu.models import hmm as hmm_mod
from infercnv_tpu.report.regions import get_predicted_cnv_regions
from infercnv_tpu.utils.logging import log_info

N_CHAINS_I6 = 6
N_CHAINS_I3 = 3
N_BURN = 200
N_ITER = 1000
# elements per Gumbel transient [chains, R_blk, Cmax_blk, S] (~1 GB f32);
# regions chunk into blocks under this (tests shrink it to force blocking)
_GIBBS_TRANSIENT_BUDGET = 256 * 1024 * 1024


class BayesResult:
    def __init__(self):
        self.cnv_region_names: List[str] = []
        self.cnv_state_probabilities: Optional[np.ndarray] = None  # [S, R]
        self.cell_probabilities: List[np.ndarray] = []             # per region [S, n_cells]
        self.removed_regions: List[str] = []
        self.reassigned: List[Tuple[str, int, int]] = []
        self.theta_traces: Optional[np.ndarray] = None  # [chains, T, R, S]
        self.regions: List[dict] = []  # region descriptors (modeled, pre-filter)


@functools.partial(jax.jit, static_argnames=("n_chains", "n_burn", "n_iter",
                                             "thin"))
def _gibbs_all_regions(key, loglik, cell_mask, n_chains: int, n_burn: int,
                       n_iter: int, thin: int = 1):
    """Blocked Gibbs over all regions/chains at once.

    loglik: [R, Cmax, S] per-cell per-state log-likelihood (region gene
    sums) with each region's cell group PADDED to the widest group;
    cell_mask: [R, Cmax] membership (padded slots 0).
    Returns (theta_mean [R, S], eps_freq [R, Cmax, S], traces).

    Memory design (VERDICT r2 item 4): the state assignment rides the scan
    carry as int32 draws [chains, R, Cmax] (not one-hot), and the per-cell
    frequency accumulator eps_sum [R, Cmax, S] is SHARED across chains
    (summed in-scan), so the carry is S-fold + chains-fold smaller than the
    naive per-chain one-hot [chains, R, Cmax, S] — at 100k cells x 50
    regions the old layout carried ~0.7 GB per chain, this is ~120 MB
    total.  Regions are padded to the widest CELL GROUP, not to the full
    cell count, so subcluster-mode regions cost O(group size).
    """
    R, C, S = loglik.shape
    ll = jnp.asarray(loglik, jnp.float32)
    m = jnp.asarray(cell_mask, jnp.float32)

    # thin is chosen by the CALLER from the TOTAL region count so every
    # region block yields traces with the same time axis (blocks of
    # different sizes must concatenate)
    T = n_burn + n_iter

    chain_keys = jax.random.split(key, n_chains)
    # per-chain iteration keys: identical stream structure to running one
    # scan per chain (the pre-refactor layout)
    keys_all = jax.vmap(lambda k: jax.random.split(k, T))(chain_keys)
    keys_all = jnp.swapaxes(keys_all, 0, 1)            # [T, chains, 2]
    init_states = jnp.arange(n_chains) % S             # JAGS-style dispersion

    sr = jnp.arange(S, dtype=jnp.int32)

    def sweep(carry, inputs):
        draw, theta_sum, eps_sum = carry   # [ch,R,C] i32, [ch,R,S], [R,C,S]
        keys_t, it = inputs
        split = jax.vmap(jax.random.split)(keys_t)      # [ch, 2, 2]
        k1, k2 = split[:, 0], split[:, 1]
        # state counts per chain: sum_j m[r,j] * (draw==s), no stored one-hot
        counts = jnp.einsum("rc,xrcs->xrs", m,
                            (draw[..., None] == sr).astype(jnp.float32))
        theta = jax.vmap(lambda k, c: jax.random.dirichlet(k, c + 1.0))(
            k1, counts)                                 # [ch, R, S]
        logits = jnp.log(theta)[:, :, None, :] + ll[None]   # [ch, R, C, S]
        draw_new = jax.vmap(
            lambda k, lg: jax.random.categorical(k, lg, axis=-1))(
            k2, logits).astype(jnp.int32)               # [ch, R, C]
        post = (it >= n_burn).astype(jnp.float32)
        # shared per-cell frequency: sum over chains, transient [ch,R,C,S]
        # reduced immediately by the einsum (never carried)
        freq = jnp.einsum("xrcs->rcs",
                          (draw_new[..., None] == sr).astype(jnp.float32))
        return ((draw_new, theta_sum + post * theta, eps_sum + post * freq),
                theta)

    draw0 = jnp.broadcast_to(init_states[:, None, None].astype(jnp.int32),
                             (n_chains, R, C))
    carry0 = (draw0, jnp.zeros((n_chains, R, S)), jnp.zeros((R, C, S)))
    its = jnp.arange(T)
    (_draw_f, theta_sum, eps_sum), thetas_all = jax.lax.scan(
        sweep, carry0, (keys_all, its))                 # thetas_all [T, ch, R, S]
    idx = n_burn + thin * jnp.arange(n_iter // thin)
    traces = jnp.swapaxes(thetas_all[idx], 0, 1)        # [chains, T/thin, R, S]
    theta_mean = jnp.mean(theta_sum / n_iter, axis=0)   # [R, S]
    eps_freq = eps_sum / (n_iter * n_chains)            # [R, Cmax, S]
    return theta_mean, eps_freq, traces


def region_loglik(expr_cg: np.ndarray, regions: List[dict],
                  mu: np.ndarray, tau: np.ndarray,
                  chunk: int = 16384) -> Tuple[np.ndarray, np.ndarray]:
    """Per-region, per-cell, per-state Gaussian log-likelihood summed over
    each region's genes, in the PADDED-GROUP layout.

    The sum over a region's genes collapses to sufficient statistics:

        ll[r, c, s] = -tau_s/2 (X2[c,r] - 2 mu_s X1[c,r] + n_r mu_s^2)
                      + n_r const_s

    with X1 = x @ RG^T and X2 = x^2 @ RG^T — two MXU matmuls streamed over
    cell chunks instead of materializing a [C, G] per-state term (3.4 GB
    per state at 100k cells).  Each region's cell group is padded to the
    widest group, so compute scales with O(R * max group size), not
    O(R * total cells).

    Returns (ll [R, Cmax, S], cell_mask [R, Cmax])."""
    R = len(regions)
    C, G = expr_cg.shape
    RG = np.zeros((R, G), np.float32)
    for ri, r in enumerate(regions):
        RG[ri, r["gene_idx"]] = 1.0
    n_genes_r = RG.sum(axis=1)                                     # [R]
    RGT = jnp.asarray(RG.T)                                        # [G, R]
    # only the rows this region block actually reads are shipped/multiplied
    # — a block of small subcluster regions covers a fraction of the cells,
    # and the full-matrix upload per block dominated the Bayes step at
    # 100k cells (one full 3.4 GB link pass per block)
    union = np.unique(np.concatenate([r["cell_idx"] for r in regions]))
    # cap the host subset copy at ~6 GB: at 1M cells a block union can
    # cover most of the matrix, and the [union, G] f32 copy (21+ GB)
    # OOM-killed the round-5 1M run — beyond the cap, stream the full
    # (possibly memmap-backed) matrix chunk-by-chunk instead
    use_subset = (union.size <= int(0.6 * C)
                  and union.size * G * 4 < 6e9)
    if use_subset:
        pos = np.full(C, -1, np.int64)
        pos[union] = np.arange(union.size)
        x_src = expr_cg[union]
    else:
        pos = None
        x_src = expr_cg
    # moments STAY on device: only the [R, Cmax, S] padded log-likelihood
    # ever exists, and it feeds the (device) Gibbs directly — the [C, R]
    # moment matrices (~1 GB at 100k cells x 1000 regions) never ride the
    # host link
    parts1, parts2 = [], []
    for b in range(0, x_src.shape[0], chunk):
        xc = jnp.asarray(x_src[b:b + chunk], jnp.float32)
        parts1.append(xc @ RGT)
        parts2.append((xc * xc) @ RGT)
    X1 = jnp.concatenate(parts1) if len(parts1) > 1 else parts1[0]  # [C', R]
    X2 = jnp.concatenate(parts2) if len(parts2) > 1 else parts2[0]

    Cmax = max(r["cell_idx"].size for r in regions)
    pad_idx = np.zeros((R, Cmax), np.int64)
    cell_mask = np.zeros((R, Cmax), np.float32)
    for ri, r in enumerate(regions):
        nc = r["cell_idx"].size
        src_rows = pos[r["cell_idx"]] if use_subset else r["cell_idx"]
        pad_idx[ri, :nc] = src_rows
        cell_mask[ri, :nc] = 1.0
    rr = jnp.arange(R)[:, None]
    pj = jnp.asarray(pad_idx)
    X1p = X1[pj, rr]                                               # [R, Cmax]
    X2p = X2[pj, rr]
    muj = jnp.asarray(mu, jnp.float32)
    tauj = jnp.asarray(tau, jnp.float32)
    const = 0.5 * jnp.log(tauj / (2.0 * np.pi))
    ng = jnp.asarray(n_genes_r)[:, None, None]
    ll = (-0.5 * tauj[None, None, :]
          * (X2p[..., None] - 2.0 * muj[None, None, :] * X1p[..., None]
             + ng * muj[None, None, :] ** 2)
          + ng * const[None, None, :])                             # [R, Cmax, S]
    # padded slots must not influence the theta counts
    return ll * jnp.asarray(cell_mask)[..., None], cell_mask


def run_bayesian_mixture(
    obj: InferCNV,
    hmm_states: np.ndarray,
    hmm_type: str,
    hspike: Optional[InferCNV],
    report_by: str = "subcluster",
    seed: int = 12345,
) -> Tuple[BayesResult, List[dict]]:
    """Compute posterior state probabilities for every non-neutral CNV region.

    Returns (BayesResult, region descriptors [{name, gene_idx, cell_idx, state}]).
    """
    S = 6 if hmm_type == "i6" else 3
    neutral = hmm_mod.NEUTRAL_STATE_I6 if hmm_type == "i6" else hmm_mod.NEUTRAL_STATE_I3

    # (mu, tau) per state (reference MeanSD :148-198)
    if hmm_type == "i6":
        if hspike is None:
            raise ValueError("i6 Bayes filtering requires the hspike object")
        cnv_mean_sd = hmm_mod.get_spike_dists(hspike)
        mu = np.array([cnv_mean_sd[lvl][0] for lvl in hmm_mod.I6_LEVELS])
        sd = np.array([cnv_mean_sd[lvl][1] for lvl in hmm_mod.I6_LEVELS])
    else:
        params = hmm_mod.i3_hmm_params(
            obj.expr, list(obj.ref_groups.values()), list(obj.obs_groups.values()))
        mu, sd = params.means, params.sds
    tau = 1.0 / sd**2

    # region structures from the HMM state matrix (reference reads the
    # step-17 report files; neutral regions are excluded there)
    group_regions = get_predicted_cnv_regions(obj, hmm_states, by=report_by)
    name_to_gene_idx = {n: i for i, n in enumerate(obj.gene_order.names)}
    regions: List[dict] = []
    name_to_cell_idx = {n: i for i, n in enumerate(obj.cell_names)}
    for gr in group_regions:
        cidx = np.array([name_to_cell_idx[c] for c in gr.cells], np.int64)
        for r in gr.regions:
            if r.state == neutral:
                continue
            gidx = np.array([name_to_gene_idx[g] for g in r.genes], np.int64)
            regions.append({
                "name": r.name, "gene_idx": gidx, "cell_idx": cidx,
                "state": r.state, "group": gr.group_name,
            })

    result = BayesResult()
    result.regions = regions
    if not regions:
        return result, regions
    R = len(regions)
    C = obj.num_cells
    log_info(f"Bayesian mixture model over {R} CNV regions ({S} states)")

    n_chains = N_CHAINS_I6 if hmm_type == "i6" else N_CHAINS_I3

    # Region blocks: the Gumbel-sampling transient inside the Gibbs sweep
    # is [chains, R_blk, Cmax_blk, S]; chunk the regions (sorted by group
    # size, so each block pads to ITS widest group) to keep that under a
    # fixed budget regardless of region count — the reference bounds this
    # with mclapply over regions (inferCNV_BayesNet.R:407-430).
    BUDGET = _GIBBS_TRANSIENT_BUDGET
    order = sorted(range(R), key=lambda ri: -regions[ri]["cell_idx"].size)
    blocks: List[List[int]] = []
    cur: List[int] = []
    cur_cmax = 0
    for ri in order:
        cmax = max(cur_cmax, regions[ri]["cell_idx"].size)
        if cur and n_chains * (len(cur) + 1) * cmax * S > BUDGET:
            blocks.append(cur)
            cur, cur_cmax = [ri], regions[ri]["cell_idx"].size
        else:
            cur.append(ri)
            cur_cmax = cmax
    if cur:
        blocks.append(cur)
    if len(blocks) > 1:
        log_info(f"-sampling in {len(blocks)} region blocks (memory budget)")

    # diagnostics traces: FULL post-burn-in theta draws (reference
    # mcmcDiagnosticPlots runs on the full chains, inferCNV_BayesNet.R:
    # 866-990); thin only if the host-side trace tensor would exceed
    # ~256 MB.  Computed from the TOTAL region count so every block's
    # traces share a time axis.
    full_bytes = N_ITER * n_chains * R * S * 4
    thin = int(max(1, -(-full_bytes // (256 * 1024 * 1024))))
    if thin > 1:
        log_info(f"-theta diagnostics traces thinned 1-in-{thin} "
                 f"({R} regions; full traces would be {full_bytes/1e6:.0f} MB)")

    theta_mean = np.zeros((R, S), np.float64)
    cell_probs: List[Optional[np.ndarray]] = [None] * R
    trace_list: List[np.ndarray] = []
    for bi, blk in enumerate(blocks):
        blk_regions = [regions[ri] for ri in blk]
        ll, cell_mask = region_loglik(obj.expr, blk_regions, mu, tau)
        th, ef, tr = _gibbs_all_regions(
            jax.random.fold_in(jax.random.PRNGKey(seed), bi),
            jnp.asarray(ll, jnp.float32), jnp.asarray(cell_mask),
            n_chains, N_BURN, N_ITER, thin=thin)
        th = np.asarray(th)
        ef = np.asarray(ef)
        for j, ri in enumerate(blk):
            theta_mean[ri] = th[j]
            cell_probs[ri] = ef[j, : regions[ri]["cell_idx"].size, :].T
        trace_list.append(np.asarray(tr))
    # traces back in original region order: [chains, T, R, S]
    flat = np.concatenate(trace_list, axis=2)
    inv = np.empty(R, np.int64)
    inv[[ri for blk in blocks for ri in blk]] = np.arange(R)
    result.theta_traces = flat[:, :, inv, :]

    result.cnv_region_names = [r["name"] for r in regions]
    result.cnv_state_probabilities = theta_mean.T                  # [S, R]
    result.cell_probabilities = cell_probs

    # convergence check on the theta chains (the reference computes Gelman
    # plots but never inspects them; here poor mixing is surfaced loudly)
    try:
        from infercnv_tpu.viz.bayes_plots import gelman_rubin

        rhat = gelman_rubin(result.theta_traces)                   # [R, S]
        worst = float(np.nanmax(rhat))
        if worst > 1.1:
            bad = [result.cnv_region_names[i]
                   for i in np.nonzero(np.nanmax(rhat, axis=-1) > 1.1)[0][:5]]
            from infercnv_tpu.utils.logging import log_warn

            log_warn(f"Gibbs chains poorly mixed (max R-hat {worst:.3f} > 1.1) "
                     f"for region(s) {bad}; posterior filtering decisions for "
                     "these regions may be unstable")
    except Exception:  # diagnostics must never fail an analysis
        pass
    return result, regions


def remove_cells_filter(
    obj: InferCNV,
    hmm_states: np.ndarray,
    hmm_type: str,
    BayesMaxPNormal: float,
    hspike: Optional[InferCNV],
    report_by: str = "subcluster",
    seed: int = 12345,
    max_rounds: int = 5,
) -> Tuple[np.ndarray, BayesResult]:
    """Alternative postMcmcMethod='removeCells' (reference removeCells
    :650-685): per region, cells whose posterior P(eps = normal) exceeds the
    threshold get the region reset to neutral for *those cells only*; the
    sampler re-runs recursively until no such cells remain."""
    neutral = hmm_mod.NEUTRAL_STATE_I6 if hmm_type == "i6" else hmm_mod.NEUTRAL_STATE_I3
    states = (hmm_states.materialize() if hasattr(hmm_states, "materialize")
              else np.array(hmm_states))
    result = BayesResult()
    for round_i in range(max_rounds):
        result, regions = run_bayesian_mixture(
            obj, states, hmm_type, hspike, report_by=report_by, seed=seed + round_i)
        if not regions:
            return states, result
        changed = 0
        for ri, r in enumerate(regions):
            cell_p = result.cell_probabilities[ri]  # [S, n_cells]
            bad = np.nonzero(cell_p[neutral - 1] > BayesMaxPNormal)[0]
            if bad.size:
                states[np.ix_(r["cell_idx"][bad], r["gene_idx"])] = neutral
                changed += bad.size
        log_info(f"removeCells round {round_i}: reset {changed} cell-regions")
        if changed == 0:
            break
    return states, result


def bayesian_filter_states(
    obj: InferCNV,
    hmm_states: np.ndarray,
    hmm_type: str,
    BayesMaxPNormal: float,
    hspike: Optional[InferCNV],
    reassign: bool = True,
    out_dir: Optional[str] = None,
    report_by: str = "subcluster",
    seed: int = 12345,
    post_mcmc_method: str = "removeCNV",
) -> Tuple[np.ndarray, BayesResult]:
    """removeCNV + reassignCNV (reference filterHighPNormals :1394-1440).

    Returns (filtered state matrix, BayesResult)."""
    neutral = hmm_mod.NEUTRAL_STATE_I6 if hmm_type == "i6" else hmm_mod.NEUTRAL_STATE_I3
    if post_mcmc_method == "removeCells":
        states, result = remove_cells_filter(
            obj, hmm_states, hmm_type, BayesMaxPNormal, hspike,
            report_by=report_by, seed=seed)
        # the reference runs reassignCNV after removeCells too
        # (inferCNV_BayesNet.R:1416-1421)
        if reassign and result.regions:
            probs = result.cnv_state_probabilities
            for ri, r in enumerate(result.regions):
                best = int(np.argmax(probs[:, ri])) + 1
                if best != r["state"]:
                    result.reassigned.append((r["name"], r["state"], best))
                states[np.ix_(r["cell_idx"], r["gene_idx"])] = best
            if result.reassigned:
                log_info(f"Reassigned {len(result.reassigned)} CNV region(s) "
                         "to their argmax posterior state (post removeCells)")
        if out_dir is not None and result.cnv_state_probabilities is not None:
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, "CNV_State_Probabilities.dat")
            probs = result.cnv_state_probabilities
            with open(path, "w") as f:
                f.write("\t".join(result.cnv_region_names) + "\n")
                for s in range(probs.shape[0]):
                    f.write(f"State:{s+1}\t" +
                            "\t".join(f"{v:.6g}" for v in probs[s]) + "\n")
            log_info(f"-wrote {path}")
        return states, result
    result, regions = run_bayesian_mixture(
        obj, hmm_states, hmm_type, hspike, report_by=report_by, seed=seed)
    # region descriptors come from the factorized form when given; the
    # per-region rewrites below need the expanded matrix
    states = (hmm_states.materialize() if hasattr(hmm_states, "materialize")
              else np.array(hmm_states))
    if not regions:
        return states, result

    probs = result.cnv_state_probabilities  # [S, R]
    p_normal = probs[neutral - 1]
    keep: List[int] = []
    for ri, r in enumerate(regions):
        if p_normal[ri] > BayesMaxPNormal:
            states[np.ix_(r["cell_idx"], r["gene_idx"])] = neutral
            result.removed_regions.append(r["name"])
        else:
            keep.append(ri)
    log_info(f"Removed {len(result.removed_regions)} CNV region(s) with "
             f"P(normal) > {BayesMaxPNormal}")

    if reassign:
        for ri in keep:
            r = regions[ri]
            best = int(np.argmax(probs[:, ri])) + 1
            if best != r["state"]:
                result.reassigned.append((r["name"], r["state"], best))
            states[np.ix_(r["cell_idx"], r["gene_idx"])] = best
        if result.reassigned:
            log_info(f"Reassigned {len(result.reassigned)} CNV region(s) to "
                     "their argmax posterior state")

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "CNV_State_Probabilities.dat")
        kept_names = [regions[ri]["name"] for ri in keep]
        kept_probs = probs[:, keep] if keep else np.zeros((probs.shape[0], 0))
        with open(path, "w") as f:
            f.write("\t".join(kept_names) + "\n")
            for s in range(probs.shape[0]):
                f.write(f"State:{s+1}\t" + "\t".join(f"{v:.6g}" for v in kept_probs[s]) + "\n")
        log_info(f"-wrote {path}")
    return states, result


# ---------------------------------------------------------------------------
# API-parity aliases (reference exported names: inferCNVBayesNet
# R/inferCNV_BayesNet.R:1237, filterHighPNormals :1394)
# ---------------------------------------------------------------------------

def inferCNVBayesNet(infercnv_obj: InferCNV, HMM_states: np.ndarray,
                     HMM_type: str = "i6", report_by: str = "subcluster",
                     seed: int = 12345):
    """Run the Bayesian mixture model; returns a BayesResult (the MCMC_inferCNV
    analogue) plus the modeled region descriptors."""
    return run_bayesian_mixture(infercnv_obj, HMM_states, HMM_type,
                                infercnv_obj.hspike, report_by=report_by,
                                seed=seed)


def filterHighPNormals(infercnv_obj: InferCNV, HMM_states: np.ndarray,
                       BayesMaxPNormal: float = 0.5, HMM_type: str = "i6",
                       reassignCNVs: bool = True,
                       postMcmcMethod: str = "removeCNV",
                       out_dir=None, report_by: str = "subcluster",
                       seed: int = 12345):
    """Posterior filtering of HMM CNV calls; returns (states, BayesResult)."""
    return bayesian_filter_states(
        infercnv_obj, HMM_states, HMM_type, BayesMaxPNormal,
        infercnv_obj.hspike, reassign=reassignCNVs, out_dir=out_dir,
        report_by=report_by, seed=seed, post_mcmc_method=postMcmcMethod)
