"""MCMC moves, batched over loci.

Each move re-derives the reference's proposal math (SURVEY.md §2.3) as
a pure jitted function over the fixed-shape state:

  * gene-node ages    — gtree.c:4585 ``propose_ages``
  * gene-tree SPR     — gtree.c:6531 ``propose_spr``
  * theta slide/Gibbs — stree.c:3826/3645
  * tau rubber band   — stree.c:5512 ``propose_tau`` +
                        stree.c:4338 ``propose_tau_update_gtrees``
  * mixing            — prop_mixing.c:275 ``proposal_mixing``

Per-locus moves take independent accept decisions per locus; global
moves (theta/tau/mixing) sum per-locus terms (the quantities the
reference's thread pool reduces, threads.c:525-594) and take one
decision.  Under a sharded locus axis those sums become psums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BppConfig, PriorDist
from ..trees import coalescent as coalmod
from ..trees.gtree import (
    BIG_AGE, GTrees, SpeciesArrays, assign_populations, gather_rows,
    lift_population, lift_population_net, lookup2d, mrca_species,
    table_rows, topo_scan,
)
from . import rng
from .gibbs import gamma_conditional_approx
from .state import (
    Ctx, FT_GTAGE, FT_GTSPR, FT_MIX, FT_TAU, FT_THETA, McmcState,
    make_logl_fn, make_logpr_fn,
)

MAXAGE_CAP = 999.0  # reference's "999 for compatibility" upper bound


def _trait_eval(ctx, sp, tau, brate):
    """Trait log-likelihood via whichever closure the run carries
    (fixed-topology trait_fn for A00/A10; trait_fn_topo for A01)."""
    if ctx.trait_fn is not None:
        return ctx.trait_fn(tau, brate)
    return ctx.trait_fn_topo(sp.left, sp.right, sp.parent, tau, brate)




def _psum_if_sharded(x):
    """Cross-shard reduction hook; identity for single-process jit (XLA
    computes global sums across sharded axes automatically under jit)."""
    return x


# --------------------------------------------------------------------------
# theta moves (stree.c:3957 propose_theta -> slide:3826 / gibbs:3645)
# --------------------------------------------------------------------------


def theta_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Update every population's theta (slide or Metropolized Gibbs).

    Per-population conditionals are independent given the gene trees, so
    all populations update in parallel.
    """
    sp = state.sp
    H = sp.n_nodes
    logpr_fn = make_logpr_fn(ctx)
    _, c, t2 = logpr_fn(state.gt, sp, state.subst.heredity)
    mask_l = ctx.locus_mask[:, None]
    ksum = _psum_if_sharded(
        jnp.sum(jnp.where(mask_l, c, 0), axis=0)).astype(t2.dtype)
    csum = _psum_if_sharded(jnp.sum(
        jnp.where(mask_l, t2 / state.subst.heredity[:, None], 0.0), axis=0))
    # linked thetas (thetamodel; init_theta_linkage stree.c:2427): one
    # parameter per owner group — pool the sufficient statistics over
    # the group and make every member take the owner's draw/decision
    link = ctx.theta_link
    if link is not None:
        ksum = jnp.zeros_like(ksum).at[link].add(ksum)[link]
        csum = jnp.zeros_like(csum).at[link].add(csum)[link]

    a = cfg.thetaprior.alpha
    b = cfg.thetaprior.beta
    gamma_prior = cfg.thetaprior.dist == PriorDist.GAMMA
    eps = state.finetune[FT_THETA]
    theta = sp.theta

    k_sel, k_sl, k_gb, k_acc = jax.random.split(key, 4)
    use_slide = jax.random.uniform(k_sel, (H,)) < cfg.theta_slide_prob

    # --- slide proposal ------------------------------------------------------
    th_slide = jnp.abs(theta + eps * rng.bactrian(k_sl, (H,), dtype=eps.dtype))
    th_slide = jnp.maximum(th_slide, 1e-300)

    # --- Gibbs proposal (inverse-gamma approx conditional) -------------------
    if gamma_prior:
        a1, b1 = gamma_conditional_approx(a, b, ksum, csum,
                                          invgamma_proposal=True)
    else:
        a1 = a + ksum
        b1 = b + csum
    th_gibbs = b1 / jax.random.gamma(k_gb, a1, dtype=a1.dtype)

    th_new = jnp.where(use_slide, th_slide, th_gibbs)
    if link is not None:
        # every group member takes the owner's proposal; stats/ratios
        # are already pooled so each node's lnacc is the group's
        use_slide = use_slide[link]
        th_new = th_new[link]

    # posterior-ratio pieces: Delta logpr = ksum*log(old/new) + csum*(1/old-1/new)
    dlogpr = ksum * jnp.log(theta / th_new) + csum * (1.0 / theta - 1.0 / th_new)
    if gamma_prior:
        prior_ratio = (a - 1.0) * jnp.log(th_new / theta) - b * (th_new - theta)
    else:
        prior_ratio = (-a - 1.0) * jnp.log(th_new / theta) - b * (
            1.0 / th_new - 1.0 / theta)
    # proposal ratio: slide is symmetric; Gibbs: q(old)/q(new) under InvG(a1,b1)
    prop_ratio = jnp.where(
        use_slide, 0.0,
        (-a1 - 1.0) * jnp.log(theta / th_new) - b1 * (1.0 / theta - 1.0 / th_new))
    lnacc = dlogpr + prior_ratio + prop_ratio
    if not gamma_prior:
        # exact conjugate Gibbs: always accept the Gibbs draws
        lnacc = jnp.where(use_slide, lnacc, jnp.inf)

    accept = rng.mh_accept(k_acc, lnacc)
    if link is not None:
        accept = accept[link]            # common decision per group
    th_fin = jnp.where(accept, th_new, theta)

    # recompute the cached per-locus logpr exactly: a float32 delta
    # update (c*log(th/th') + ...) random-walks away from the truth over
    # hundreds of iterations
    new_sp = sp._replace(theta=th_fin)
    logpr, _, _ = logpr_fn(state.gt, new_sp, state.subst.heredity)
    new_state = state._replace(sp=new_sp, logpr=logpr)
    return new_state, (jnp.asarray(H, jnp.int32), accept.sum().astype(jnp.int32))


# --------------------------------------------------------------------------
# tau rubber-band move (stree.c:5512 + 4338)
# --------------------------------------------------------------------------


def tau_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Blocked tau rubber-band move (stree.c:5512 + 4338), TPU-first.

    Species inner nodes at even/odd depth form independent sets: a
    node's window is [max(tau_children), tau_parent], all of the other
    parity, and the affected gene-node sets {h, left(h), right(h)} of
    same-parity nodes are disjoint.  So the NS-1 per-node passes of the
    reference collapse into TWO jointly-proposed phases with one
    likelihood pass each (the products of the independent per-node
    Jacobians and proposal ratios simply add in log space).
    """
    sp0 = state.sp
    H = sp0.n_nodes
    NS = sp0.n_tips
    if NS == 1:
        return state, (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    L = state.gt.n_loci
    T = state.gt.n_tips
    N = state.gt.n_nodes
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn(ctx)
    gamma_tau = cfg.tauprior.dist == PriorDist.GAMMA
    a, b = cfg.tauprior.alpha, cfg.tauprior.beta
    eps = state.finetune[FT_TAU]
    nodes_idx = jnp.arange(N)[None, :]
    hidx = jnp.arange(H)
    # correlated-LN branch-rate prior depends on the taus (branch
    # midpoints): include its delta like stree.c:4763-4768
    from ..config import Clock
    corr_ln = (state.clock is not None and cfg.clock == Clock.CORRELATED
               and cfg.clock_rate_prior == 0)
    integ = cfg.theta_integrated
    if integ:
        from . import notheta
    has_trait = (ctx.trait_fn is not None
                 or ctx.trait_fn_topo is not None)
    # gene-tree topology is fixed across the whole move: one species-MRCA
    # pass replaces per-phase assign_populations
    msp = mrca_species(state.gt, sp0, ctx.tip_pop)
    # depth parity from the ancestry table (pptable row-sum = depth + 1)
    parity = (sp0.pptable.sum(1).astype(jnp.int32) + 1) % 2
    is_inner_sp = hidx >= NS
    is_inner_g = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)
    gmask = is_inner_g & ctx.locus_mask[:, None]

    age, tau = state.gt.age, sp0.tau
    logl, logpr = state.logl, state.logpr
    lnrates = (state.clock.lnrates if state.clock is not None
               else jnp.zeros_like(state.logl))
    coal_c, t2_c = state.coal, state.t2h
    tlogl = (state.trait.logl if has_trait
             else jnp.zeros((), state.logl.dtype))
    nprop = jnp.zeros((), jnp.int32)
    nacc = jnp.zeros((), jnp.int32)

    n_phases = 1 if NS == 2 else 2
    for phase in range(n_phases):
        key, k1, k2 = jax.random.split(key, 3)
        prop = is_inner_sp & (parity == phase) & (tau > 0.0)

        lh = jnp.maximum(sp0.left, 0)
        rh = jnp.maximum(sp0.right, 0)
        minage = jnp.maximum(tau[lh], tau[rh])
        if ctx.date_lmax is not None:
            # tip dating: tau must stay above the oldest dated sample
            # below this node (stree.c:5619 l_constraint check)
            minage = jnp.maximum(minage, ctx.date_lmax * state.mubar)
        maxage = jnp.where(sp0.parent >= 0,
                           tau[jnp.maximum(sp0.parent, 0)], MAXAGE_CAP)
        # a degenerate window (parent tau == child tau from float
        # rounding) would make reflect() divide by zero; skip the node
        prop = prop & (maxage > minage)
        tnew = rng.reflect(tau + eps * rng.bactrian(k1, (H,),
                                                    dtype=eps.dtype),
                           minage, maxage)
        tnew = jnp.where(prop, tnew, tau)
        # delta-form rubber band: "maxage + maxf*(age-maxage)" cancels
        # catastrophically in float32 when maxage is the 999 cap
        dt = tnew - tau
        tau_new = jnp.where(prop, tnew, tau)
        sp_cur = sp0._replace(tau=tau)
        sp_new = sp0._replace(tau=tau_new)

        # governing proposed node per population: itself, or its parent
        # (children of a proposing node are the other parity, so the
        # assignment is unique)
        par_s = jnp.maximum(sp0.parent, 0)
        gov = jnp.where(prop, hidx,
                        jnp.where((sp0.parent >= 0) & prop[par_s],
                                  par_s, -1))
        # per-gene-node rubber-band parameters, gathered via one-hot
        # over the (tiny) population axis
        pops = lift_population(sp_cur, msp, jnp.clip(age, 0.0, BIG_AGE * 0.5))
        gov_ok = gov >= 0
        gov_s = jnp.maximum(gov, 0)
        # log min/max rubber factors per species node (stable log1p form)
        ln_maxf = jnp.log1p(dt / jnp.where(prop, tau - maxage, 1.0))
        ln_minf = jnp.log1p(dt / jnp.where(prop, tau - minage, 1.0))
        params = jnp.stack([
            jnp.where(gov_ok, minage[gov_s], 0.0),
            jnp.where(gov_ok, maxage[gov_s], 1.0),
            jnp.where(gov_ok, tau[gov_s], 0.5),
            jnp.where(gov_ok, dt[gov_s], 0.0),
            gov_ok.astype(tau.dtype),
            jnp.where(gov_ok, ln_maxf[gov_s], 0.0),
            jnp.where(gov_ok, ln_minf[gov_s], 0.0),
        ], axis=-1)                                        # [H, 7]
        oh = (pops[..., None] == hidx).astype(tau.dtype)   # [L, N, H]
        gp = jnp.einsum("lnh,hp->lnp", oh, params)         # [L, N, 7]
        g_min, g_max, g_told, g_dt, g_gov, g_lmaxf, g_lminf = (
            gp[..., i] for i in range(7))

        cond = gmask & (g_gov > 0.5) & (age > g_min) & (age < g_max)
        above = cond & (age >= g_told)
        below = cond & (age < g_told)
        age_new = jnp.where(
            above, age + g_dt * (g_max - age) / (g_max - g_told),
            jnp.where(below,
                      age + g_dt * (age - g_min) / (g_told - g_min), age))
        # Jacobian: sum over moved gene nodes of their governing node's
        # log min/max factor (= count_above*log maxf + count_below*log
        # minf per species node, threads.c:544-582 reduction)
        jac = _psum_if_sharded(jnp.sum(
            jnp.where(above, g_lmaxf, 0.0)
            + jnp.where(below, g_lminf, 0.0)))

        gtn = state.gt._replace(age=age_new)
        logl_new = logl_fn(gtn, state.subst, sp_new, state.clock)
        logpr_new, c_new, t2_new = logpr_fn(gtn, sp_new,
                                            state.subst.heredity, msp=msp)
        if integ:
            lpg_new = notheta.total_integrated(
                cfg, c_new, t2_new, state.subst.heredity, ctx.locus_mask)
            lpg_old = notheta.total_integrated(
                cfg, coal_c, t2_c, state.subst.heredity, ctx.locus_mask)
            # logpr carries the theta-free per-locus part (MSC-I phi
            # terms; zeros for trees)
            dpr = (lpg_new - lpg_old
                   + _psum_if_sharded(jnp.sum(logpr_new - logpr)))
        else:
            dpr = _psum_if_sharded(jnp.sum(logpr_new - logpr))

        lnacc = jac + _psum_if_sharded(jnp.sum(logl_new - logl)) + dpr
        # root-tau prior term (only when the root proposes this phase)
        root = sp0.root
        cand = jnp.sum(tau[NS:] > 0).astype(tau.dtype)
        t_r, tn_r = tau[root], tau_new[root]
        t_rs = jnp.maximum(t_r, 1e-300)
        tn_rs = jnp.maximum(tn_r, 1e-300)
        if gamma_tau:
            root_term = (a - 1.0 - cand + 1.0) * jnp.log(tn_rs / t_rs) \
                - b * (tn_r - t_r)
        else:
            root_term = (-a - 1.0 - cand + 1.0) * jnp.log(tn_rs / t_rs) \
                - b * (1.0 / tn_rs - 1.0 / t_rs)
        lnacc = lnacc + jnp.where(prop[root], root_term, 0.0)

        if corr_ln:
            from .clock_moves import lnprior_rates
            lnr_new = lnprior_rates(cfg, sp_new, state.subst.mu, state.clock)
            lnacc = lnacc + _psum_if_sharded(jnp.sum(lnr_new - lnrates))
        else:
            lnr_new = lnrates

        if has_trait:
            tl_new = _trait_eval(ctx, sp0, tau_new, state.trait.brate)
            lnacc = lnacc + jnp.sum(tl_new - tlogl)
        else:
            tl_new = tlogl

        any_prop = prop.any()
        accept = rng.mh_accept(k2, lnacc) & any_prop
        age = jnp.where(accept, age_new, age)
        tau = jnp.where(accept, tau_new, tau)
        logl = jnp.where(accept, logl_new, logl)
        logpr = jnp.where(accept, logpr_new, logpr)
        lnrates = jnp.where(accept, lnr_new, lnrates)
        tlogl = jnp.where(accept, tl_new, tlogl)
        if integ:
            coal_c = jnp.where(accept, c_new, coal_c)
            t2_c = jnp.where(accept, t2_new, t2_c)
        np_ = prop.sum(dtype=jnp.int32)
        nprop = nprop + np_
        nacc = nacc + jnp.where(accept, np_, 0)

    new_state = state._replace(
        gt=state.gt._replace(age=age), sp=sp0._replace(tau=tau),
        logl=logl, logpr=logpr)
    if integ:
        new_state = new_state._replace(coal=coal_c, t2h=t2_c)
    if corr_ln:
        new_state = new_state._replace(
            clock=state.clock._replace(lnrates=lnrates))
    if has_trait:
        new_state = new_state._replace(
            trait=state.trait._replace(logl=tlogl))
    return new_state, (nprop, nacc)


# --------------------------------------------------------------------------
# mixing move (prop_mixing.c:275)
# --------------------------------------------------------------------------


def mixing_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    gt, sp = state.gt, state.sp
    L, N, T = gt.n_loci, gt.n_nodes, gt.n_tips
    H = sp.n_nodes
    NS = sp.n_tips
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn(ctx)
    nodes_idx = jnp.arange(N)[None, :]
    a, b = cfg.thetaprior.alpha, cfg.thetaprior.beta
    gamma_prior = cfg.thetaprior.dist == PriorDist.GAMMA
    ta, tb = cfg.tauprior.alpha, cfg.tauprior.beta
    gamma_tau = cfg.tauprior.dist == PriorDist.GAMMA
    eps = state.finetune[FT_MIX]

    k1, k2, k3 = jax.random.split(key, 3)
    lnc = eps * rng.bactrian(k1, dtype=eps.dtype)
    c = jnp.exp(lnc)
    # topology-only mrca: shared by the two density evaluations below
    msp = None if sp.is_network else mrca_species(gt, sp, ctx.tip_pop)

    if sp.is_network:
        # only FREE taus count as dimensions (mirrors and htau==0-tied
        # parents shadow the hybridization tau; prop_mixing.c tau_count
        # via prop_tau flags)
        tau_count = jnp.sum((sp.tau > 0) & sp.tau_free)
    elif NS > 1:
        tau_count = jnp.sum(sp.tau[NS:] > 0)
    else:
        tau_count = jnp.zeros((), jnp.int32)
    inner_count = _psum_if_sharded(
        jnp.sum(jnp.where(ctx.locus_mask, ctx.n_seq - 1, 0)))
    lnacc = (tau_count + inner_count) * lnc

    # scale gene-node inner ages and taus
    is_inner = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)
    age_new = jnp.where(is_inner, gt.age * c, gt.age)
    tau_new = jnp.where(sp.tau > 0, sp.tau * c, sp.tau)

    # root-tau prior ratio (prop_mixing.c:520-540); absent when the root
    # is collapsed (A10 one-species state: no tau exists to re-prior)
    if NS > 1:
        rt_old = sp.tau[sp.root]
        rt_new = tau_new[sp.root]
        rts = jnp.maximum(rt_old, 1e-300)
        rtn = jnp.maximum(rt_new, 1e-300)
        if gamma_tau:
            root_term = (ta - 1.0 - tau_count + 1.0) * lnc - tb * (rt_new - rt_old)
        else:
            root_term = (-ta - 1.0 - tau_count + 1.0) * lnc \
                - tb * (1.0 / rtn - 1.0 / rts)
        lnacc = lnacc + jnp.where(rt_old > 0, root_term, 0.0)

    if cfg.theta_integrated:
        # no thetas to refresh (prop_mixing.c:339 gated on opt_est_theta)
        th_new = sp.theta
    else:
        # Gibbs-style theta refresh at the scaled waiting times
        _, cc, t2 = logpr_fn(gt, sp, state.subst.heredity, msp=msp)
        mask_l = ctx.locus_mask[:, None]
        ksum = _psum_if_sharded(
            jnp.sum(jnp.where(mask_l, cc, 0), axis=0)).astype(t2.dtype)
        csum = _psum_if_sharded(jnp.sum(
            jnp.where(mask_l, t2 / state.subst.heredity[:, None], 0.0),
            axis=0))
        link = ctx.theta_link
        Hh = ksum.shape[0]
        if link is not None:
            # linked thetas: pooled stats, owner-only density terms
            ksum = jnp.zeros_like(ksum).at[link].add(ksum)[link]
            csum = jnp.zeros_like(csum).at[link].add(csum)[link]
        owner = (jnp.ones(Hh, bool) if link is None
                 else jnp.arange(Hh) == link)
        cstar = csum * c
        if gamma_prior:
            a1, b1 = gamma_conditional_approx(a, b, ksum, cstar, True)
            a1o, b1o = gamma_conditional_approx(a, b, ksum, csum, True)
        else:
            a1, b1 = a + ksum, b + cstar
            a1o, b1o = a + ksum, b + csum
        th_new = b1 / jax.random.gamma(k2, a1, dtype=a1.dtype)
        if link is not None:
            th_new = th_new[link]
        th_old = sp.theta
        # proposal ratio (InvG pdfs) + prior ratio
        lnacc = lnacc + jnp.sum(jnp.where(
            owner,
            rng.log_pdf_invgamma(th_old, a1o, b1o)
            - rng.log_pdf_invgamma(th_new, a1, b1), 0.0))
        if gamma_prior:
            lnacc = lnacc + jnp.sum(jnp.where(
                owner,
                (a - 1.0) * jnp.log(th_new / th_old) - b * (th_new - th_old),
                0.0))
        else:
            lnacc = lnacc + jnp.sum(jnp.where(
                owner,
                (-a - 1.0) * jnp.log(th_new / th_old)
                - b * (1.0 / th_new - 1.0 / th_old), 0.0))

    gtn = gt._replace(age=age_new)
    spn = sp._replace(tau=tau_new, theta=th_new)
    logl_new = logl_fn(gtn, state.subst, spn, state.clock)
    logpr_new, c_new, t2_new = logpr_fn(gtn, spn, state.subst.heredity,
                                        msp=msp)
    lnacc = lnacc + _psum_if_sharded(jnp.sum(logl_new - state.logl))
    if cfg.theta_integrated:
        from . import notheta
        # per-locus theta-free part (MSC-I phi terms) + coupled part
        lnacc = lnacc + _psum_if_sharded(jnp.sum(logpr_new - state.logpr))
        lnacc = lnacc + (
            notheta.total_integrated(cfg, c_new, t2_new,
                                     state.subst.heredity, ctx.locus_mask)
            - notheta.total_integrated(cfg, state.coal, state.t2h,
                                       state.subst.heredity, ctx.locus_mask))
    else:
        lnacc = lnacc + _psum_if_sharded(jnp.sum(logpr_new - state.logpr))

    # morphological traits: taus scaled => trait branch lengths scale
    # (prop_mixing.c:642-647)
    has_trait_mix = (ctx.trait_fn is not None
                     or ctx.trait_fn_topo is not None)
    if has_trait_mix:
        tl_new = _trait_eval(ctx, state.sp, tau_new, state.trait.brate)
        lnacc = lnacc + jnp.sum(tl_new - state.trait.logl)

    # correlated-LN branch-rate prior depends on the scaled taus
    # (prop_mixing.c:189-194)
    from ..config import Clock
    cand = state._replace(gt=gtn, sp=spn, logl=logl_new, logpr=logpr_new)
    if has_trait_mix:
        cand = cand._replace(trait=state.trait._replace(logl=tl_new))
    if cfg.theta_integrated:
        cand = cand._replace(coal=c_new, t2h=t2_new)
    if (state.clock is not None and cfg.clock == Clock.CORRELATED
            and cfg.clock_rate_prior == 0):
        from .clock_moves import lnprior_rates
        lnr_new = lnprior_rates(cfg, spn, state.subst.mu, state.clock)
        lnacc = lnacc + _psum_if_sharded(
            jnp.sum(lnr_new - state.clock.lnrates))
        cand = cand._replace(clock=state.clock._replace(lnrates=lnr_new))

    accept = rng.mh_accept(k3, lnacc)
    new_state = jax.tree.map(
        lambda n, o: jnp.where(accept, n, o), cand, state)
    return new_state, (jnp.ones((), jnp.int32), accept.astype(jnp.int32))


# --------------------------------------------------------------------------
# blocked full-recompute variants of the gene-tree moves
#
# TPU-first redesign: the incremental stale-walk path costs more per
# node-step than a FULL batched Felsenstein pass (per-op overhead, not
# FLOPs, dominates at 4 states), so instead of the reference's
# node-by-node serial sweep (gtree.c:4620) these moves propose whole
# independent sets jointly and take one accept decision per locus:
#
#   * ages: nodes at even/odd topological depth form independent sets
#     (each node's [min, max] window depends only on its parent and
#     children, which are the other parity), so two jointly-proposed
#     phases cover every node — 2 likelihood passes instead of T-1.
#   * SPR: R rounds of one uniformly-chosen pruned node per locus —
#     R likelihood passes instead of T-1.
#
# Block acceptance is exact MH (windows are computed from the
# out-of-block state, identical under the reverse move); finetune
# adapts eps to the block-level pjump.
# --------------------------------------------------------------------------


def age_block_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    from ..trees.gtree import node_depths

    gt, sp = state.gt, state.sp
    L, N, T = gt.n_loci, gt.n_nodes, gt.n_tips
    lidx = jnp.arange(L)
    nodes_idx = jnp.arange(N)[None, :]
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn(ctx)
    eps = state.finetune[FT_GTAGE]
    msp = None if sp.is_network else mrca_species(gt, sp, ctx.tip_pop)
    depths = node_depths(gt)
    inner_valid = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)

    age = gt.age
    logl, logpr = state.logl, state.logpr
    integ = cfg.theta_integrated
    coal_c, t2_c = state.coal, state.t2h
    hered = state.subst.heredity
    nprop = jnp.zeros((), jnp.int32)
    nacc = jnp.zeros((), jnp.int32)
    lc = jnp.maximum(gt.left, 0)
    rc = jnp.maximum(gt.right, 0)

    for phase in (0, 1):
        key, k1, k2 = jax.random.split(key, 3)
        mask = inner_valid & (depths % 2 == phase) & ctx.locus_mask[:, None]

        la = gather_rows(age, lc)
        ra = gather_rows(age, rc)
        if sp.is_network:
            # no species-MRCA lower bound on a network: an age crossing
            # below the children's convergence population simply breaks
            # route consistency and is rejected by the -inf indicator
            minage = jnp.maximum(la, ra)
        else:
            pop_lc = lift_population(sp, msp[lidx[:, None], lc], la)
            pop_rc = lift_population(sp, msp[lidx[:, None], rc], ra)
            from ..trees.gtree import lookup2d
            mrca_pop = lookup2d(sp.mrca, pop_lc, pop_rc)
            minage = jnp.maximum(jnp.maximum(la, ra), sp.tau[mrca_pop])
        par_s = jnp.maximum(gt.parent, 0)
        maxage = jnp.where(gt.parent >= 0,
                           gather_rows(age, par_s), MAXAGE_CAP)

        # degenerate window (float32 parent==child tie): reflect() would
        # divide by zero; skip such nodes this round (their parent's or
        # children's proposals re-open the window)
        mask = mask & (maxage > minage)
        tnew = rng.reflect(age + eps * rng.bactrian(k1, (L, N),
                                                    dtype=eps.dtype),
                           minage, maxage)
        age_new = jnp.where(mask, tnew, age)
        gtn = gt._replace(age=age_new)
        logl_new = logl_fn(gtn, state.subst, sp, state.clock)
        logpr_new, c_new, t2_new = logpr_fn(gtn, sp, hered, msp=msp)
        amask = ctx.locus_mask & mask.any(1)
        if integ:
            from . import notheta
            # logpr holds the theta-free part (MSC-I phi terms / route
            # validity; zeros on trees) — it factorizes over loci
            accept = notheta.scan_accept(
                k2, cfg, (logl_new - logl) + (logpr_new - logpr),
                coal_c, t2_c, hered,
                c_new, t2_new, hered, amask, ctx.locus_mask)
            coal_c = jnp.where(accept[:, None], c_new, coal_c)
            t2_c = jnp.where(accept[:, None], t2_new, t2_c)
        else:
            lnacc = (logl_new - logl) + (logpr_new - logpr)
            accept = rng.mh_accept(k2, lnacc) & amask
        logpr = jnp.where(accept, logpr_new, logpr)
        age = jnp.where(accept[:, None], age_new, age)
        logl = jnp.where(accept, logl_new, logl)
        nprop = nprop + amask.sum(dtype=jnp.int32)
        nacc = nacc + accept.sum(dtype=jnp.int32)

    new_state = state._replace(gt=gt._replace(age=age), logl=logl,
                               logpr=logpr)
    if integ:
        new_state = new_state._replace(coal=coal_c, t2h=t2_c)
    return new_state, (nprop, nacc)


def _select_uniform(key, mask):
    """Uniformly select one True index per row of mask [L, N]."""
    L = mask.shape[0]
    count = mask.sum(axis=1)
    r = jax.random.uniform(key, (L,))
    sel_rank = jnp.floor(r * count).astype(jnp.int32)
    sel_rank = jnp.minimum(sel_rank, jnp.maximum(count - 1, 0))
    cum = jnp.cumsum(mask, axis=1) - mask  # rank of each True element
    hit = mask & (cum == sel_rank[:, None])
    return jnp.argmax(hit, axis=1).astype(jnp.int32), count


def spr_round_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """One SPR proposal per locus (pruned node chosen uniformly among
    non-root nodes), full-batch evaluation, per-locus accept."""
    from ..trees.gtree import leaf_counts

    gt0, sp = state.gt, state.sp
    L, N, T = gt0.n_loci, gt0.n_nodes, gt0.n_tips
    lidx = jnp.arange(L)
    nodes_idx = jnp.arange(N)[None, :]
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn(ctx)
    eps = state.finetune[FT_GTSPR]

    left, right, parent, age = gt0.left, gt0.right, gt0.parent, gt0.age
    logl, logpr = state.logl, state.logpr

    tipmask = nodes_idx[:, :T] < ctx.n_seq[:, None]
    glv = (sp.pptable[ctx.tip_pop] & tipmask[..., None]).sum(1)   # [L, H]
    depth = sp.pptable.sum(-1).astype(jnp.int32)                  # [H]
    valid_nodes = (nodes_idx < ctx.n_seq[:, None]) | (
        (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1))

    ksel, k1, k2, k3 = jax.random.split(key, 4)
    cand_mask = valid_nodes & (parent >= 0)
    sel, _ = _select_uniform(ksel, cand_mask)
    i = sel                                                       # [L]

    from ..trees.gtree import assign_populations, edge_passes, mrca_and_leaves
    if sp.is_network:
        leaves = leaf_counts(gt0, ctx.n_seq)
        pops = assign_populations(gt0, sp, ctx.tip_pop)
        passes = edge_passes(gt0, sp, pops)                   # [L, N, H]
    else:
        msp, leaves = mrca_and_leaves(gt0, sp, ctx.tip_pop, ctx.n_seq)
        pops = lift_population(sp, msp, jnp.clip(age, 0.0, BIG_AGE * 0.5))

    father = parent[lidx, i]
    is_valid = (father >= 0) & ctx.locus_mask
    father_s = jnp.maximum(father, 0)
    fleft = left[lidx, father_s]
    sibling = jnp.where(fleft == i, right[lidx, father_s], fleft)

    cur_pop = pops[lidx, i]
    i_leaves = leaves[lidx, i]
    if sp.is_network:
        # minage = pruned node's own age; infeasible reattach heights
        # reject via tcount == 0 / the route-consistency indicator
        minage = age[lidx, i]
    else:
        cand = table_rows(sp.pptable, cur_pop) & (glv > i_leaves[:, None])
        score = jnp.where(cand, depth[None, :], -1)
        pop_min = jnp.argmax(score, axis=1)
        minage = jnp.maximum(age[lidx, i], sp.tau[pop_min])

    f_age = age[lidx, father_s]
    tnew = rng.reflect(f_age + eps * rng.bactrian(k1, (L,), dtype=eps.dtype),
                       minage, MAXAGE_CAP)
    if sp.is_network:
        pop_target = lift_population_net(sp, cur_pop, tnew,
                                         gt0.hpath[lidx, i])
    else:
        pop_target = lift_population(sp, cur_pop, tnew)

    page = jnp.where(parent >= 0,
                     gather_rows(age, jnp.maximum(parent, 0)),
                     -jnp.inf)
    order_root = jnp.argmax(
        jnp.where(valid_nodes & (nodes_idx >= T), age, -jnp.inf),
        axis=1).astype(jnp.int32)
    root_age = age[lidx, order_root]
    spans = (age <= tnew[:, None]) & (tnew[:, None] < page)
    if sp.is_network:
        in_pop = jnp.take_along_axis(
            passes, pop_target[:, None, None], axis=2)[..., 0]
    else:
        in_pop = lookup2d(sp.pptable, pops,
                          jnp.broadcast_to(pop_target[:, None], pops.shape))
    tmask = (valid_nodes & spans & in_pop
             & (nodes_idx != i[:, None])
             & (nodes_idx != order_root[:, None]))
    above_root = tnew >= root_age
    tsel, tcount = _select_uniform(k2, tmask)
    target = jnp.where(above_root, order_root, tsel)
    tcount = jnp.where(above_root, 1, tcount)
    target = jnp.where(target == father, sibling, target)

    f_pop = pops[lidx, father_s]
    sspans = (age <= f_age[:, None]) & (f_age[:, None] < page)
    if sp.is_network:
        s_in_pop = jnp.take_along_axis(
            passes, f_pop[:, None, None], axis=2)[..., 0]
    else:
        s_in_pop = lookup2d(sp.pptable, pops,
                            jnp.broadcast_to(f_pop[:, None], pops.shape))
    smask = (valid_nodes & sspans & s_in_pop
             & (nodes_idx != i[:, None]) & (nodes_idx != order_root[:, None])
             & (nodes_idx != sibling[:, None])
             & (nodes_idx != father_s[:, None]))
    father_is_root = father_s == order_root
    scount = 1 + jnp.where(father_is_root, 0, smask.sum(axis=1))

    ok = is_valid & (tcount > 0)
    do_topo = ok & (target != sibling) & (target != father_s)

    def write(arr, row_ok, col, val):
        from ..trees.gtree import scatter_rows
        return scatter_rows(arr, row_ok, col, val)

    grandpa = parent[lidx, father_s]
    has_gp = grandpa >= 0
    gp_s = jnp.maximum(grandpa, 0)

    nl, nr, np_, na = left, right, parent, age
    repl_l = do_topo & has_gp & (left[lidx, gp_s] == father_s)
    repl_r = do_topo & has_gp & (right[lidx, gp_s] == father_s)
    nl = write(nl, repl_l, gp_s, sibling)
    nr = write(nr, repl_r, gp_s, sibling)
    np_ = write(np_, do_topo, sibling, grandpa)
    tpar = parent[lidx, jnp.where(do_topo, target, 0)]
    tpar = jnp.where(do_topo, tpar, 0)
    tpar_s = jnp.maximum(tpar, 0)
    repl_tl = do_topo & (tpar >= 0) & (nl[lidx, tpar_s] == target)
    repl_tr = do_topo & (tpar >= 0) & (nr[lidx, tpar_s] == target)
    nl = write(nl, repl_tl, tpar_s, father_s)
    nr = write(nr, repl_tr, tpar_s, father_s)
    np_ = write(np_, do_topo, father_s, tpar)
    # father's sibling slot takes the target
    fl = nl[lidx, father_s]
    new_fl = jnp.where(fl == i, fl, target)
    fr = nr[lidx, father_s]
    new_fr = jnp.where(fl == i, target, fr)
    nl = write(nl, do_topo, father_s, new_fl)
    nr = write(nr, do_topo, father_s, new_fr)
    np_ = write(np_, do_topo, jnp.where(do_topo, target, 0), father_s)
    # father age update (also for the no-topology-change case)
    na = write(na, ok, father_s, tnew)

    gtn = GTrees(nl, nr, np_, na, state.gt.hpath)
    logl_new = logl_fn(gtn, state.subst, sp, state.clock)
    logpr_new, c_new, t2_new = logpr_fn(gtn, sp, state.subst.heredity)
    dprop = jnp.log(jnp.maximum(tcount, 1) / jnp.maximum(scount, 1))
    new_state = state
    if cfg.theta_integrated:
        from . import notheta
        hered = state.subst.heredity
        accept = notheta.scan_accept(
            k3, cfg, (logl_new - logl) + (logpr_new - logpr) + dprop,
            state.coal, state.t2h,
            hered, c_new, t2_new, hered, ok, ctx.locus_mask)
        new_state = new_state._replace(
            coal=jnp.where(accept[:, None], c_new, state.coal),
            t2h=jnp.where(accept[:, None], t2_new, state.t2h))
    else:
        lnacc = (logl_new - logl) + (logpr_new - logpr) + dprop
        accept = rng.mh_accept(k3, lnacc) & ok
    logpr = jnp.where(accept, logpr_new, logpr)
    am = accept[:, None]
    left = jnp.where(am, nl, left)
    right = jnp.where(am, nr, right)
    parent = jnp.where(am, np_, parent)
    age = jnp.where(am, na, age)
    logl = jnp.where(accept, logl_new, logl)

    new_state = new_state._replace(
        gt=GTrees(left, right, parent, age, state.gt.hpath), logl=logl,
        logpr=logpr)
    return new_state, (ok.sum(dtype=jnp.int32), accept.sum(dtype=jnp.int32))
