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


class BayesResult:
    def __init__(self):
        self.cnv_region_names: List[str] = []
        self.cnv_state_probabilities: Optional[np.ndarray] = None  # [S, R]
        self.cell_probabilities: List[np.ndarray] = []             # per region [S, n_cells]
        self.removed_regions: List[str] = []
        self.reassigned: List[Tuple[str, int, int]] = []
        self.theta_traces: Optional[np.ndarray] = None  # [chains, T, R, S]
        self.regions: List[dict] = []  # region descriptors (modeled, pre-filter)


def _gibbs_all_regions(key, loglik, cell_mask, n_chains: int, n_burn: int, n_iter: int):
    """Blocked Gibbs over all regions/chains at once.

    loglik: [R, C, S] per-cell per-state log-likelihood (region gene sums);
    cell_mask: [R, C] membership of cells in the region's group.
    Returns (theta_mean [R, S], eps_freq [R, C, S]).
    """
    R, C, S = loglik.shape
    ll = jnp.asarray(loglik, jnp.float32)
    m = jnp.asarray(cell_mask, jnp.float32)

    thin = 10  # keep every 10th post-burn-in theta draw for diagnostics

    def one_chain(chain_key, init_state):
        def sweep(carry, inputs):
            eps, theta_sum, eps_sum = carry
            k, it = inputs
            k1, k2 = jax.random.split(k)
            counts = jnp.einsum("rc,rcs->rs", m, eps)          # [R, S]
            theta = jax.random.dirichlet(k1, counts + 1.0)     # [R, S]
            logits = jnp.log(theta)[:, None, :] + ll           # [R, C, S]
            draw = jax.random.categorical(k2, logits, axis=-1)  # [R, C]
            eps_new = jax.nn.one_hot(draw, S)
            post = (it >= n_burn).astype(jnp.float32)
            return ((eps_new, theta_sum + post * theta, eps_sum + post * eps_new),
                    theta)

        eps0 = jax.nn.one_hot(jnp.full((R, C), init_state), S)
        keys = jax.random.split(chain_key, n_burn + n_iter)
        its = jnp.arange(n_burn + n_iter)
        (eps_f, theta_sum, eps_sum), thetas_all = jax.lax.scan(
            sweep, (eps0, jnp.zeros((R, S)), jnp.zeros((R, C, S))), (keys, its))
        # gather the thinned trace ([n_iter/thin, R, S])
        idx = n_burn + thin * jnp.arange(n_iter // thin)
        trace = thetas_all[idx]
        return theta_sum / n_iter, eps_sum / n_iter, trace

    chain_keys = jax.random.split(key, n_chains)
    init_states = jnp.arange(n_chains) % loglik.shape[-1]
    thetas, epss, traces = jax.vmap(one_chain)(chain_keys, init_states)
    theta_mean = jnp.mean(thetas, axis=0)                       # [R, S]
    eps_freq = jnp.mean(epss, axis=0)                           # [R, C, S]
    return theta_mean, eps_freq, traces                         # [chains, T, R, S]


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

    # per-gene per-state log-likelihood summed over each region's genes
    x = jnp.asarray(obj.expr, jnp.float32)                      # [C, G]
    muj = jnp.asarray(mu, jnp.float32)
    tauj = jnp.asarray(tau, jnp.float32)
    const = 0.5 * jnp.log(tauj / (2.0 * jnp.pi))
    # region x gene membership as one-hot for a single MXU contraction
    RG = np.zeros((R, obj.num_genes), np.float32)
    cell_mask = np.zeros((R, C), np.float32)
    for ri, r in enumerate(regions):
        RG[ri, r["gene_idx"]] = 1.0
        cell_mask[ri, r["cell_idx"]] = 1.0

    def loglik_state(s):
        per_gene = -0.5 * tauj[s] * (x - muj[s]) ** 2 + const[s]   # [C, G]
        return jnp.einsum("rg,cg->rc", jnp.asarray(RG), per_gene)  # [R, C]

    ll = jnp.stack([loglik_state(s) for s in range(S)], axis=-1)   # [R, C, S]
    # inactive cells must not influence counts; zero their loglik too
    ll = ll * jnp.asarray(cell_mask)[:, :, None]

    n_chains = N_CHAINS_I6 if hmm_type == "i6" else N_CHAINS_I3
    theta_mean, eps_freq, traces = _gibbs_all_regions(
        jax.random.PRNGKey(seed), ll, cell_mask, n_chains, N_BURN, N_ITER)
    theta_mean = np.asarray(theta_mean)                            # [R, S]
    eps_freq = np.asarray(eps_freq)                                # [R, C, S]
    result.theta_traces = np.asarray(traces)                       # [chains, T, R, S]

    result.cnv_region_names = [r["name"] for r in regions]
    result.cnv_state_probabilities = theta_mean.T                  # [S, R]
    result.cell_probabilities = [
        eps_freq[ri, regions[ri]["cell_idx"], :].T for ri in range(R)
    ]

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
    states = np.array(hmm_states)
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
        return remove_cells_filter(obj, hmm_states, hmm_type, BayesMaxPNormal,
                                   hspike, report_by=report_by, seed=seed)
    result, regions = run_bayesian_mixture(
        obj, hmm_states, hmm_type, hspike, report_by=report_by, seed=seed)
    states = np.array(hmm_states)
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
