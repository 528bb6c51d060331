"""rjMCMC species-delimitation moves (A10/A11): split and join.

Re-derivation of ``prop_split``/``prop_join`` (src/prop_rj.c:380/920,
Yang & Rannala 2010) on the derived-population representation: a
delimitation IS the tau vector (tau == 0 collapses a node, merging its
subtree's populations through the age-lift), so no seqin/coalevent
bookkeeping exists to patch — the moves only

  1. pick a feasible node h (split: tau==0 with split-or-root parent;
     join: tau>0 with tip-or-collapsed children), uniformly;
  2. draw tau_new = tau_upper * Beta(2, 8) (split) or zero it (join),
     where tau_upper = parent tau, or 0.6 * initial root age for the
     root (prop_rj.c:431-435);
  3. map the two child thetas from the parent's (epsilon-window
     'algorithm 0' or Gamma 'algorithm 1', prop_rj.c:456-469) with the
     matching rjMCMC dimension factors;
  4. rubber-band the gene trees (``rubber_proportional`` prop_rj.c:205):
     "mixed" coalescences in pop h (descendants from BOTH children)
     map affinely between [tau_old, tau_upper] and [tau_new, tau_upper];
     each maximal pure subtree hanging below a mixed node scales
     proportionally with its governing mixed ancestor, contributing
     per-inner-node log-ratio Jacobian terms;
  5. recompute logl + MSC density in full batch, psum, one decision.

The species-model prior ratio is 0 under the default uniform-labeled-
histories prior (speciesmodelprior = 1, delimit.c lnprior_species_model).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BppConfig, PriorDist
from ..trees.gtree import assign_populations, inner_order, topo_scan
from . import rng
from .state import Ctx, McmcState, make_logl_fn, make_logpr_fn

NEG = -1e30


def _log_pdf_beta_scaled(x, p, q, scale):
    z = x / scale
    return (jax.lax.lgamma(p + q) - jax.lax.lgamma(p) - jax.lax.lgamma(q)
            + (p - 1.0) * jnp.log(z) + (q - 1.0) * jnp.log1p(-z)
            - jnp.log(scale))


def _pick_uniform(key, mask):
    logits = jnp.where(mask, 0.0, NEG)
    idx = jax.random.categorical(key, logits)
    return idx.astype(jnp.int32), mask.sum()


def _rubber_band(ctx: Ctx, state: McmcState, h, tau_from, tau_to, tau_upper,
                 pops=None):
    """Age remap for split/join at node h; returns (age_new, lnterms [L]).

    ``pops``: precomputed population assignment (the migration-aware
    one under MSC-M); defaults to the plain ancestry lift."""
    gt, sp = state.gt, state.sp
    L, N, T = gt.n_loci, gt.n_nodes, gt.n_tips
    lidx = jnp.arange(L)
    nodes_idx = jnp.arange(N)[None, :]
    dtype = gt.age.dtype

    if pops is None:
        pops = assign_populations(gt, sp, ctx.tip_pop)
    age = gt.age
    valid_inner = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)

    tip_under_l = sp.pptable[ctx.tip_pop, sp.left[h]]
    tip_under_r = sp.pptable[ctx.tip_pop, sp.right[h]]
    hasL = topo_scan(gt, tip_under_l, jnp.logical_or)
    hasR = topo_scan(gt, tip_under_r, jnp.logical_or)
    mixed = hasL & hasR & (pops == h) & valid_inner

    rubber = (tau_upper - tau_to) / (tau_upper - tau_from)
    affine = tau_upper - rubber * (tau_upper - age)
    ratio = jnp.where(age > 0, affine / jnp.maximum(age, 1e-300), 1.0)

    # governing scale for pure subtrees: nearest mixed ancestor's ratio,
    # broken (=1) at mixed nodes not in pop h (rubber_update recursion)
    order = inner_order(gt)                          # youngest..oldest
    gov = jnp.ones((L, N), dtype)

    def step(gov, k):
        node = order[:, T - 2 - k]                   # oldest first
        par = gt.parent[lidx, node]
        par_s = jnp.maximum(par, 0)
        own = mixed[lidx, node]
        g = jnp.where(own, jnp.asarray(1.0, dtype), gov[lidx, par_s])
        pg = jnp.where(mixed[lidx, par_s] & (par >= 0),
                       jnp.where(mixed[lidx, node], 1.0,
                                 ratio[lidx, par_s]), g)
        # pg: if parent is a remapped mixed node and this node is pure,
        # inherit the parent's ratio; else inherit the parent's gov
        gov = gov.at[lidx, node].set(jnp.where(valid_inner[lidx, node],
                                               pg, 1.0))
        return gov, None

    gov, _ = jax.lax.scan(step, gov, jnp.arange(T - 1))

    age_new = jnp.where(mixed, affine, age * gov)
    # tips stay 0 (0 * gov == 0)

    n_mixed = jnp.where(ctx.locus_mask, mixed.sum(1), 0)
    scaled = valid_inner & ~mixed & (jnp.abs(gov - 1.0) > 0)
    lnterms = jnp.where(
        ctx.locus_mask,
        n_mixed * jnp.log(rubber)
        + jnp.sum(jnp.where(scaled, jnp.log(gov), 0.0), axis=1),
        0.0)
    return age_new, lnterms


def _remap_event_times(gt, age_new, mig, locus_mask):
    """Per-edge linear remap of migration-event times after an age
    remap; returns (mig_new, per-locus log-Jacobian [L]).

    An event at time t on edge u -> parent(u) maps affinely between
    the edge's old and new endpoint ages — the bijection that keeps
    every event inside its (possibly rescaled) edge, one log-slope
    Jacobian term per event.  The reference leaves event times
    untouched in the rj move (``rubber_proportional`` prop_rj.c:205
    remaps only coalescence ages), which can strand events outside
    their moved edges; the affine remap keeps support and is exactly
    invertible for the reverse move because the age maps are."""
    from ..trees.gtree import BIG_AGE, gather_rows

    live = mig.node >= 0
    nd = jnp.maximum(mig.node, 0)
    par = gather_rows(gt.parent, nd)
    par_s = jnp.maximum(par, 0)
    lo_o = gather_rows(gt.age, nd)
    hi_o = jnp.where(par >= 0, gather_rows(gt.age, par_s), BIG_AGE)
    lo_n = gather_rows(age_new, nd)
    hi_n = jnp.where(par >= 0, gather_rows(age_new, par_s), BIG_AGE)
    span_o = hi_o - lo_o
    moved = live & ((lo_n != lo_o) | (hi_n != hi_o))
    slope = jnp.where(moved & (span_o > 0.0),
                      (hi_n - lo_n) / jnp.where(span_o > 0.0, span_o, 1.0),
                      1.0)
    t_new = jnp.where(moved, lo_n + (mig.time - lo_o) * slope, mig.time)
    ljac = jnp.where(moved & locus_mask[:, None],
                     jnp.log(jnp.maximum(slope, 1e-300)), 0.0)
    return mig._replace(time=t_new), ljac.sum(axis=1)


def _theta_prior_logpdf(cfg: BppConfig, x):
    a, b = cfg.thetaprior.alpha, cfg.thetaprior.beta
    if cfg.thetaprior.dist == PriorDist.GAMMA:
        return rng.log_pdf_gamma(x, a, b)
    return rng.log_pdf_invgamma(x, a, b)


def _tau_prior_logpdf(cfg: BppConfig, x):
    a, b = cfg.tauprior.alpha, cfg.tauprior.beta
    if cfg.tauprior.dist == PriorDist.GAMMA:
        return rng.log_pdf_gamma(x, a, b)
    return rng.log_pdf_invgamma(x, a, b)


def _child_theta_split(cfg: BppConfig, key, theta_h):
    """Draw one child theta; returns (theta_c, log_thetafactor)."""
    if cfg.rjmcmc_method == 0:
        u = jax.random.uniform(key, dtype=theta_h.dtype)
        th = theta_h * jnp.exp(cfg.rjmcmc_epsilon * (u - 0.5))
        return th, jnp.log(cfg.rjmcmc_epsilon * th)
    a = cfg.rjmcmc_alpha
    b = a / (cfg.rjmcmc_mean * theta_h)
    th = jax.random.gamma(key, a, dtype=theta_h.dtype) / b
    return th, -rng.log_pdf_gamma(th, a, b)


def _child_theta_join(cfg: BppConfig, theta_c, theta_h):
    """Reverse-direction factor; returns (log_thetafactor, disallowed)."""
    if cfg.rjmcmc_method == 0:
        y = jnp.exp(cfg.rjmcmc_epsilon * 0.5)
        bad = (theta_c < theta_h / y) | (theta_c > theta_h * y)
        return -jnp.log(cfg.rjmcmc_epsilon * theta_c), bad
    a = cfg.rjmcmc_alpha
    b = a / (cfg.rjmcmc_mean * theta_h)
    return rng.log_pdf_gamma(theta_c, a, b), jnp.zeros((), bool)


def rj_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key, root_age0,
            debug=False, routes=None):
    """One rjMCMC step: split or join with probability 1/2 each
    (method.c:5420-5435, pr_split = 0.5 so the move-type term is 0).

    ``routes`` switches on the MSC-M (IM) variant — the reference's
    migration-aware split/join (prop_rj.c:599-656 and :1140-1222 call
    ``gtree_update_logprob_contrib_mig`` for the affected populations):
    populations are assigned through the migration events, event times
    ride the rubber band per-edge (:func:`_remap_event_times`), and the
    acceptance uses the full structured-coalescent density, whose
    validity indicator rejects proposals that strand an event in a
    collapsed population's empty window (a join is only accepted once
    gene flow among the merged populations' lineages has been removed
    by the sim-SPR move — physically, merging species that still
    exchange migrants is a zero-density state)."""
    sp = state.sp
    H = sp.n_nodes
    NS = (H + 1) // 2
    hidx = jnp.arange(H)
    dtype = sp.tau.dtype
    logl_fn = make_logl_fn(ctx, cfg)
    pops_rb = None
    if routes is None:
        logpr_fn = make_logpr_fn(ctx)
    else:
        from ..trees import migration as mg
        from .mig_moves import make_logpr_fn_mig
        assert not cfg.theta_integrated  # blocked under migration
        logpr_fn_mig = make_logpr_fn_mig(ctx, routes)
        pops_rb = mg.assign_populations_mig(state.gt, sp, ctx.tip_pop,
                                            state.mig, ctx.n_seq)

    k_dir, k_pick, k_tau, k_thl, k_thr, k_acc = jax.random.split(key, 6)
    do_split = jax.random.bernoulli(k_dir)

    is_inner = hidx >= NS
    is_root = sp.parent < 0
    partau = jnp.where(is_root, jnp.inf, sp.tau[jnp.maximum(sp.parent, 0)])
    l_ok = (sp.left < NS) | (sp.tau[jnp.maximum(sp.left, 0)] == 0)
    r_ok = (sp.right < NS) | (sp.tau[jnp.maximum(sp.right, 0)] == 0)

    feas_split = is_inner & (sp.tau == 0) & (is_root | (partau > 0))
    feas_join = is_inner & (sp.tau > 0) & l_ok & r_ok
    tau_count = (sp.tau[NS:] > 0).sum()
    root = jnp.argmax(is_root).astype(jnp.int32)
    root_tau = sp.tau[root]

    def split_branch(_):
        h, fsplit = _pick_uniform(k_pick, feas_split)
        h_is_root = sp.parent[h] < 0
        tau_upper = jnp.where(h_is_root, root_age0 * 0.6,
                              sp.tau[jnp.maximum(sp.parent[h], 0)])
        beta = jax.random.beta(k_tau, 2.0, 8.0, dtype=dtype)
        tau_new = tau_upper * beta
        lnacc = -_log_pdf_beta_scaled(tau_new, 2.0, 8.0, tau_upper)

        if cfg.theta_integrated:
            # no thetas exist under the integrated-out path: the rj
            # dimension change involves tau only (prop_rj.c:447 gates
            # all theta mapping on opt_est_theta)
            theta2 = sp.theta
        else:
            th_h = sp.theta[h]
            lc, rc = sp.left[h], sp.right[h]
            th_l, f_l = _child_theta_split(cfg, k_thl, th_h)
            th_r, f_r = _child_theta_split(cfg, k_thr, th_h)
            fac_l = _theta_prior_logpdf(cfg, th_l) + f_l
            fac_r = _theta_prior_logpdf(cfg, th_r) + f_r
            if ctx.theta_link is not None:
                # linked children carry no theta parameter of their
                # own: they take the owner's value, with no prior or
                # proposal factor (prop_rj.c:606 master indirection)
                link = ctx.theta_link
                linked_l = link[lc] != lc
                linked_r = link[rc] != rc
                th_l = jnp.where(linked_l, sp.theta[link[lc]], th_l)
                th_r = jnp.where(linked_r, sp.theta[link[rc]], th_r)
                fac_l = jnp.where(linked_l, 0.0, fac_l)
                fac_r = jnp.where(linked_r, 0.0, fac_r)
            lnacc += fac_l + fac_r
            theta2 = sp.theta.at[lc].set(th_l).at[rc].set(th_r)

        lnacc += jnp.where(
            h_is_root, _tau_prior_logpdf(cfg, tau_new),
            jnp.log(tau_count.astype(dtype) / root_tau))  # Eq 2 YR2010

        tau2 = sp.tau.at[h].set(tau_new)
        # feasible joins AFTER the split, on the updated taus
        l_ok2 = (sp.left < NS) | (tau2[jnp.maximum(sp.left, 0)] == 0)
        r_ok2 = (sp.right < NS) | (tau2[jnp.maximum(sp.right, 0)] == 0)
        fjoin2 = (is_inner & (tau2 > 0) & l_ok2 & r_ok2).sum()
        lnacc += jnp.log(fsplit.astype(dtype) / fjoin2.astype(dtype))

        age_new, lnterms = _rubber_band(ctx, state, h,
                                        jnp.asarray(0.0, dtype), tau_new,
                                        tau_upper, pops=pops_rb)
        bad = fsplit == 0
        return h, tau2, theta2, age_new, lnacc, lnterms, bad

    def join_branch(_):
        h, fjoin = _pick_uniform(k_pick, feas_join)
        h_is_root = sp.parent[h] < 0
        tau_upper = jnp.where(h_is_root, root_age0 * 0.6,
                              sp.tau[jnp.maximum(sp.parent[h], 0)])
        tau_old = sp.tau[h]
        lnacc = _log_pdf_beta_scaled(tau_old, 2.0, 8.0, tau_upper)

        if cfg.theta_integrated:
            bad_l = bad_r = jnp.zeros((), bool)
        else:
            th_h = sp.theta[h]
            lc, rc = sp.left[h], sp.right[h]
            f_l, bad_l = _child_theta_join(cfg, sp.theta[lc], th_h)
            f_r, bad_r = _child_theta_join(cfg, sp.theta[rc], th_h)
            fac_l = f_l - _theta_prior_logpdf(cfg, sp.theta[lc])
            fac_r = f_r - _theta_prior_logpdf(cfg, sp.theta[rc])
            if ctx.theta_link is not None:
                link = ctx.theta_link
                linked_l = link[lc] != lc
                linked_r = link[rc] != rc
                fac_l = jnp.where(linked_l, 0.0, fac_l)
                fac_r = jnp.where(linked_r, 0.0, fac_r)
                bad_l = bad_l & ~linked_l
                bad_r = bad_r & ~linked_r
            lnacc += fac_l + fac_r

        lnacc -= jnp.where(
            h_is_root, _tau_prior_logpdf(cfg, tau_old),
            jnp.log((tau_count - 1).astype(dtype) / root_tau))

        tau2 = sp.tau.at[h].set(0.0)
        fsplit2 = (is_inner & (tau2 == 0)
                   & (is_root | (jnp.where(
                       is_root, jnp.inf,
                       tau2[jnp.maximum(sp.parent, 0)]) > 0))).sum()
        lnacc += jnp.log(fjoin.astype(dtype) / fsplit2.astype(dtype))

        age_new, lnterms = _rubber_band(ctx, state, h, tau_old,
                                        jnp.asarray(0.0, dtype), tau_upper,
                                        pops=pops_rb)
        bad = (fjoin == 0) | bad_l | bad_r | (tau_old >= tau_upper)
        return h, tau2, sp.theta, age_new, lnacc, lnterms, bad

    h, tau2, theta2, age_new, lnacc, lnterms, bad = jax.lax.cond(
        do_split, split_branch, join_branch, None)

    sp_new = sp._replace(tau=tau2, theta=theta2)
    gt_new = state.gt._replace(age=age_new)
    if routes is not None:
        mig_new, jac_e = _remap_event_times(state.gt, age_new, state.mig,
                                            ctx.locus_mask)
        lnterms = lnterms + jac_e
        logl_new = logl_fn(gt_new, state.subst, sp_new, state.clock,
                           mig=mig_new)
        logpr_new, *_ = logpr_fn_mig(gt_new, sp_new, mig_new,
                                     state.subst.heredity)
        c_new = t2_new = None
    else:
        logl_new = logl_fn(gt_new, state.subst, sp_new, state.clock)
        logpr_new, c_new, t2_new = logpr_fn(gt_new, sp_new,
                                            state.subst.heredity)

    if cfg.theta_integrated:
        # integrated-out density couples loci; acceptance uses the
        # total notheta_logpr delta (prop_rj.c:539 "logpr =
        # stree->notheta_logpr" path)
        from . import notheta
        dpr = (notheta.total_integrated(cfg, c_new, t2_new,
                                        state.subst.heredity, ctx.locus_mask)
               - notheta.total_integrated(cfg, state.coal, state.t2h,
                                          state.subst.heredity,
                                          ctx.locus_mask))
        lnacc = lnacc + dpr + jnp.sum(jnp.where(
            ctx.locus_mask, lnterms + (logl_new - state.logl), 0.0))
        logpr_new = state.logpr  # per-locus cache unused in this mode
    else:
        lnacc = lnacc + jnp.sum(jnp.where(
            ctx.locus_mask,
            lnterms + (logl_new - state.logl) + (logpr_new - state.logpr),
            0.0))
    # species-model prior ratio (prop_rj.c:510 lnprior_species_model)
    from .stree_moves import log_species_model_prior
    lnacc = lnacc + (
        log_species_model_prior(cfg, sp_new, ctx.prior_a11_log)
        - log_species_model_prior(cfg, sp, ctx.prior_a11_log)).astype(dtype)
    # morphological traits re-scored at the split/joined taus
    # (prop_rj.c:727-774 subtracts trait_old_logl and adds
    # loglikelihood_trait inside split/join); under A11 the current
    # sampled topology rides through the topology-parameterized trait
    # function (the rj move itself never changes the topology — the
    # species SPR/SNL moves do, and re-score traits there)
    tl_new = None
    if ctx.trait_fn is not None:
        tl_new = ctx.trait_fn(tau2, state.trait.brate)
    elif ctx.trait_fn_topo is not None:
        tl_new = ctx.trait_fn_topo(sp.left, sp.right, sp.parent, tau2,
                                   state.trait.brate)
    if tl_new is not None:
        lnacc = lnacc + jnp.sum(tl_new - state.trait.logl)
    lnacc = jnp.where(bad, -jnp.inf, lnacc)
    accept = rng.mh_accept(k_acc, lnacc)

    new_state = state._replace(
        gt=jax.tree.map(lambda n, o: jnp.where(accept, n, o), gt_new,
                        state.gt),
        sp=jax.tree.map(lambda n, o: jnp.where(accept, n, o), sp_new, sp),
        logl=jnp.where(accept, logl_new, state.logl),
        logpr=jnp.where(accept, logpr_new, state.logpr))
    if routes is not None:
        new_state = new_state._replace(mig=jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), mig_new, state.mig))
    if cfg.theta_integrated:
        new_state = new_state._replace(
            coal=jnp.where(accept, c_new, state.coal),
            t2h=jnp.where(accept, t2_new, state.t2h))
    if tl_new is not None:
        new_state = new_state._replace(trait=state.trait._replace(
            logl=jnp.where(accept, tl_new, state.trait.logl)))
    if debug:
        return new_state, (jnp.ones((), jnp.int32),
                           accept.astype(jnp.int32)), {
            "do_split": do_split, "h": h, "lnacc": lnacc, "bad": bad,
            "lnterms": jnp.sum(jnp.where(ctx.locus_mask, lnterms, 0.0)),
            "dlogpr": jnp.sum(jnp.where(ctx.locus_mask,
                                        logpr_new - state.logpr, 0.0))}
    return new_state, (jnp.ones((), jnp.int32), accept.astype(jnp.int32))
