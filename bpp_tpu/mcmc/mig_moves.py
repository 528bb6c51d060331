"""MSC-M (isolation-with-migration) MCMC moves, batched over loci.

Reference counterparts (SURVEY.md section 2.3):
  * theta Gibbs/slide under migration     stree.c:3464 propose_theta_gibbs_im
  * migration-rate W Gibbs / slide        stree.c:11627 migrate_gibbs,
                                          11938 prop_migrates
  * migration-event age slide             gtree.c:5766 propose_migevent_ages
  * gene-node ages with event clamps      gtree.c:4585 (opt_migration paths)
  * simulation-based SPR                  gtree.c:9090 propose_spr_sim +
                                          8742 simulate_coalescent_mig
  * tau under migration                   stree.c:6725 propose_tau_mig
  * mixing incl. event times              prop_mixing.c:275

Design notes.  The likelihood never depends on migration events under
the global clock (branch lengths are age differences), so event-only
moves accept on the density delta alone.  The sim-SPR proposal draws
the pruned lineage's path from the structured-coalescent prior
conditional on the rest of the gene tree, so its acceptance is the
likelihood ratio only (prior and proposal cancel; gtree.c:9368).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BppConfig, PriorDist
from ..trees import migration as mg
from ..trees.gtree import BIG_AGE, GTrees, lift_population
from . import rng
from .gibbs import gamma_conditional_approx
from .state import (
    Ctx, FT_GTAGE, FT_MIG_AGES, FT_MIX, FT_TAU, McmcState, make_logl_fn,
)
from .moves import MAXAGE_CAP, _psum_if_sharded, _select_uniform

_INF = jnp.inf


def make_logpr_fn_mig(ctx: Ctx, routes: mg.MigRoutes):
    """Returns logpr(gt, sp, mig, heredity) ->
    (lp [L], coal [L,H], C2 [L,H], W [L,K], mc [L,K], pops [L,N])."""
    si, ti = routes.si, routes.ti

    def fn(gt: GTrees, sp, mig: mg.MigState, heredity):
        pops = mg.assign_populations_mig(gt, sp, ctx.tip_pop, mig, ctx.n_seq)
        coal, C2, W, mc, _ = mg.mig_stats(gt, sp, pops, mig, si, ti,
                                          ctx.n_seq)
        lp = mg.msc_logprob_mig(coal, C2, W, mc, sp.theta, heredity,
                                mg.eff_rates(routes, mig), on=mig.on)
        ok = mg.route_consistent_mig(gt, sp, mig, pops, ctx.n_seq)
        lp = jnp.where(ok & ctx.locus_mask, lp, jnp.where(
            ctx.locus_mask, -_INF, 0.0))
        return lp, coal, C2, W, mc, pops

    return fn


# --------------------------------------------------------------------------
# theta under migration: same conjugacy, stats from the migration sweep
# --------------------------------------------------------------------------


def theta_move_mig(ctx: Ctx, cfg: BppConfig, routes, state: McmcState, key):
    sp = state.sp
    H = sp.n_nodes
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    _, c, t2, _, _, _ = logpr_fn(state.gt, sp, state.mig,
                                 state.subst.heredity)
    mask_l = ctx.locus_mask[:, None]
    ksum = _psum_if_sharded(
        jnp.sum(jnp.where(mask_l, c, 0), axis=0)).astype(t2.dtype)
    csum = _psum_if_sharded(jnp.sum(
        jnp.where(mask_l, t2 / state.subst.heredity[:, None], 0.0), axis=0))

    a, b = cfg.thetaprior.alpha, cfg.thetaprior.beta
    gamma_prior = cfg.thetaprior.dist == PriorDist.GAMMA
    k_gb, k_acc = jax.random.split(key)
    theta = sp.theta
    if gamma_prior:
        a1, b1 = gamma_conditional_approx(a, b, ksum, csum, True)
    else:
        a1, b1 = a + ksum, b + csum
    th_new = b1 / jax.random.gamma(k_gb, a1, dtype=a1.dtype)
    dlogpr = ksum * jnp.log(theta / th_new) + csum * (1.0 / theta
                                                      - 1.0 / th_new)
    if gamma_prior:
        prior_r = (a - 1.0) * jnp.log(th_new / theta) - b * (th_new - theta)
        prop_r = (-a1 - 1.0) * jnp.log(theta / th_new) \
            - b1 * (1.0 / theta - 1.0 / th_new)
        lnacc = dlogpr + prior_r + prop_r
        accept = rng.mh_accept(k_acc, lnacc)
    else:
        accept = jnp.ones((H,), bool)
    th_fin = jnp.where(accept, th_new, theta)
    new_sp = sp._replace(theta=th_fin)
    logpr, *_ = logpr_fn(state.gt, new_sp, state.mig, state.subst.heredity)
    return (state._replace(sp=new_sp, logpr=logpr),
            (jnp.asarray(H, jnp.int32), accept.sum().astype(jnp.int32)))


# --------------------------------------------------------------------------
# migration rates: conjugate Gibbs (stree.c:11627)
# --------------------------------------------------------------------------


def migrate_move(ctx: Ctx, cfg: BppConfig, routes, state: McmcState, key):
    """M_k | rest ~ Gamma(alpha + sum_l mc_lk, beta + sum_l W_lk).

    Routes with a variable-rates shape (am > 0) are excluded — their
    mean rate Mbar moves via :func:`mig_mbar_move` and the per-locus
    Mi via :func:`mig_vrates_move` (migrate_gibbs asserts !spec->am,
    stree.c:11636)."""
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    _, _, _, W, mc, _ = logpr_fn(state.gt, state.sp, state.mig,
                                 state.subst.heredity)
    mask_l = ctx.locus_mask[:, None]
    csum = _psum_if_sharded(jnp.sum(jnp.where(mask_l, mc, 0), axis=0))
    wsum = _psum_if_sharded(jnp.sum(jnp.where(mask_l, W, 0.0), axis=0))
    if state.mig.on is not None:
        # geneflow: inactive routes take a PRIOR draw (zeroed stats) -
        # the Carlin-Chib pseudo-prior that makes route toggling a
        # plain within-space MH move (prior/proposal terms cancel)
        csum = jnp.where(state.mig.on, csum, 0)
        wsum = jnp.where(state.mig.on, wsum, 0.0)
    a1 = jnp.asarray(routes.alpha, W.dtype) + csum
    b1 = jnp.asarray(routes.beta, W.dtype) + wsum
    M_new = jax.random.gamma(key, a1, dtype=W.dtype) / b1
    M_new = jnp.maximum(M_new, 1e-30)
    has_am = jnp.asarray(routes.am > 0)
    M_new = jnp.where(has_am, state.mig.M, M_new)
    mig_new = state.mig._replace(M=M_new)
    logpr, *_ = logpr_fn(state.gt, state.sp, mig_new, state.subst.heredity)
    K = M_new.shape[0]
    return (state._replace(mig=mig_new, logpr=logpr),
            (jnp.asarray(K, jnp.int32), jnp.asarray(K, jnp.int32)))


def mig_mbar_move(ctx: Ctx, cfg: BppConfig, routes, state: McmcState, key):
    """Mean-rate slide for variable-rate routes (migrate_mbar_slide
    stree.c:11676): Mbar_k ~ Gamma(alpha, beta) prior, conditional on
    Mi[l,k] ~ Gamma(am, am/Mbar_k) iid over loci.  No MSC-M density
    term — the density consults Mi only."""
    mig = state.mig
    dtype = mig.M.dtype
    K = mig.M.shape[0]
    k1, k2 = jax.random.split(key)
    eps = state.finetune[FT_MIGRATES]
    lnc = eps * rng.bactrian(k1, (K,), dtype)
    mbar_new = mig.M * jnp.exp(lnc)
    alpha = jnp.asarray(routes.alpha, dtype)
    beta = jnp.asarray(routes.beta, dtype)
    am = jnp.asarray(routes.am, dtype)
    lnacc = lnc + lnc * (alpha - 1.0) - (mbar_new - mig.M) * beta
    bnew = am / mbar_new
    bold = am / mig.M
    n_real = _psum_if_sharded(
        jnp.sum(ctx.locus_mask.astype(dtype)))
    misum = _psum_if_sharded(jnp.sum(
        jnp.where(ctx.locus_mask[:, None], mig.Mi, 0.0), axis=0))
    lnacc = lnacc + n_real * am * jnp.log(bnew / bold) \
        - (bnew - bold) * misum
    has_am = jnp.asarray(routes.am > 0)
    accept = rng.mh_accept(k2, jnp.where(has_am, lnacc, -jnp.inf))
    M_fin = jnp.where(accept, mbar_new, mig.M)
    return (state._replace(mig=mig._replace(M=M_fin)),
            (has_am.sum().astype(jnp.int32),
             accept.sum().astype(jnp.int32)))


def mig_vrates_move(ctx: Ctx, cfg: BppConfig, routes, state: McmcState,
                    key):
    """Per-locus migration-rate slide (prop_mig_vrates_slide
    stree.c:11822): Mi[l,k] *= e^(eps*z) with prior Gamma(am, am/Mbar_k)
    and the per-(locus,route) separable density delta
    mc*dlog(Mi) - dMi*W (the coal terms don't involve rates, so all
    (l,k) coordinates update simultaneously)."""
    mig = state.mig
    dtype = mig.Mi.dtype
    L, K = mig.Mi.shape
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    _, _, _, W, mc, _ = logpr_fn(state.gt, state.sp, mig,
                                 state.subst.heredity)
    k1, k2 = jax.random.split(key)
    eps = state.finetune[FT_MIGRATES]
    lnc = eps * rng.bactrian(k1, (L, K), dtype)
    mi_new = mig.Mi * jnp.exp(lnc)
    am = jnp.asarray(routes.am, dtype)[None, :]
    beta = am / jnp.maximum(mig.M, 1e-300)[None, :]
    lnacc = lnc + lnc * (am - 1.0) - (mi_new - mig.Mi) * beta
    lnacc = lnacc + mc * jnp.log(mi_new / mig.Mi) - (mi_new - mig.Mi) * W
    has_am = jnp.asarray(routes.am > 0)[None, :] & ctx.locus_mask[:, None]
    accept = rng.mh_accept(k2, jnp.where(has_am, lnacc, -jnp.inf))
    mi_fin = jnp.where(accept, mi_new, mig.Mi)
    mig_new = mig._replace(Mi=mi_fin)
    logpr, *_ = logpr_fn(state.gt, state.sp, mig_new, state.subst.heredity)
    return (state._replace(mig=mig_new, logpr=logpr),
            (has_am.sum().astype(jnp.int32),
             accept.sum().astype(jnp.int32)))


# --------------------------------------------------------------------------
# migration-event age slide (gtree.c:5766)
# --------------------------------------------------------------------------


def migevent_age_move(ctx: Ctx, cfg: BppConfig, routes, state: McmcState,
                      key):
    """Sweep event slots; each live event slides within the window
    bounded by its edge span, neighboring events on the same edge, and
    both populations' lifetimes.  Likelihood is unchanged under the
    strict clock; under a relaxed clock the event time moves the
    boundary between two differently-rated sub-pieces of the edge, so
    the likelihood delta is included."""
    from ..config import Clock
    gt, sp, mig = state.gt, state.sp, state.mig
    L, ME = mig.time.shape
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    relaxed = cfg.clock != Clock.GLOBAL
    logl_fn = make_logl_fn(ctx, cfg) if relaxed else None
    eps = state.finetune[FT_MIG_AGES]
    lidx = jnp.arange(L)
    tau = sp.tau
    partau = jnp.where(sp.parent >= 0, tau[jnp.maximum(sp.parent, 0)],
                       MAXAGE_CAP)

    def body(m, carry):
        mig, logpr, logl, kkey, nprop, nacc = carry
        kkey, k1, k2 = jax.random.split(kkey, 3)
        live = mig.node[:, m] >= 0
        nd = jnp.maximum(mig.node[:, m], 0)
        t = mig.time[:, m]
        e_lo = gt.age[lidx, nd]
        par = gt.parent[lidx, nd]
        e_hi = jnp.where(par >= 0, gt.age[lidx, jnp.maximum(par, 0)],
                         MAXAGE_CAP)
        same = (mig.node == mig.node[:, m][:, None]) & (mig.node >= 0)
        below = same & (mig.time < t[:, None])
        above = same & (mig.time > t[:, None])
        prev = jnp.max(jnp.where(below, mig.time, -_INF), axis=1)
        nxt = jnp.min(jnp.where(above, mig.time, _INF), axis=1)
        s, d = mig.src[:, m], mig.dst[:, m]
        lo = jnp.maximum(jnp.maximum(e_lo, prev),
                         jnp.maximum(tau[s], tau[d]))
        hi = jnp.minimum(jnp.minimum(e_hi, nxt),
                         jnp.minimum(partau[s], partau[d]))
        ok = live & (hi > lo) & ctx.locus_mask
        tnew = rng.reflect(t + eps * rng.bactrian(k1, (L,), dtype=eps.dtype),
                           lo, jnp.maximum(hi, lo + 1e-300))
        tnew = jnp.where(ok, tnew, t)
        mign = mig._replace(time=mig.time.at[:, m].set(tnew))
        logpr_new, *_ = logpr_fn(gt, sp, mign, state.subst.heredity)
        lnacc = logpr_new - logpr
        if relaxed:
            logl_new = logl_fn(gt, state.subst, sp, state.clock, mig=mign)
            lnacc = lnacc + (logl_new - logl)
        accept = rng.mh_accept(k2, lnacc) & ok
        mig = mig._replace(
            time=jnp.where(accept[:, None], mign.time, mig.time))
        logpr = jnp.where(accept, logpr_new, logpr)
        if relaxed:
            logl = jnp.where(accept, logl_new, logl)
        nprop = nprop + ok.sum(dtype=jnp.int32)
        nacc = nacc + accept.sum(dtype=jnp.int32)
        return (mig, logpr, logl, kkey, nprop, nacc)

    init = (mig, state.logpr, state.logl, key,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    mig, logpr, logl, _, nprop, nacc = jax.lax.fori_loop(0, ME, body, init)
    return (state._replace(mig=mig, logpr=logpr, logl=logl),
            (nprop, nacc))


# --------------------------------------------------------------------------
# gene-node age phases with migration-event clamps
# --------------------------------------------------------------------------


def age_block_mig(ctx: Ctx, cfg: BppConfig, routes, state: McmcState, key):
    from ..trees.gtree import node_depths

    gt, sp, mig = state.gt, state.sp, state.mig
    L, N, T = gt.n_loci, gt.n_nodes, gt.n_tips
    lidx = jnp.arange(L)
    nodes_idx = jnp.arange(N)[None, :]
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    eps = state.finetune[FT_GTAGE]
    depths = node_depths(gt)
    inner_valid = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)
    lc = jnp.maximum(gt.left, 0)
    rc = jnp.maximum(gt.right, 0)

    age = gt.age
    logl, logpr = state.logl, state.logpr
    nprop = jnp.zeros((), jnp.int32)
    nacc = jnp.zeros((), jnp.int32)

    live = mig.node >= 0
    # last event time per edge [L, N] (-inf if none) and its dst pop
    on = live[:, None, :] & (mig.node[:, None, :] == nodes_idx[:, :, None])
    ev_t = jnp.where(on, mig.time[:, None, :], -_INF)
    last_t = jnp.max(ev_t, axis=2)                         # [L, N]
    last_i = jnp.argmax(ev_t, axis=2)
    has_ev = last_t > -_INF
    last_dst = jnp.where(has_ev,
                         jnp.take_along_axis(mig.dst, last_i, 1), 0)
    first_t = jnp.min(jnp.where(on, mig.time[:, None, :], _INF), axis=2)

    pops0 = mg.assign_populations_mig(gt, sp, ctx.tip_pop, mig, ctx.n_seq)
    base_pop = jnp.where(has_ev, last_dst, pops0)          # pop after last ev

    for phase in (0, 1):
        key, k1, k2 = jax.random.split(key, 3)
        mask = inner_valid & (depths % 2 == phase) & ctx.locus_mask[:, None]

        la = jnp.take_along_axis(age, lc, 1)
        ra = jnp.take_along_axis(age, rc, 1)
        # lower clamps: child ages, last events on child edges, and the
        # species-MRCA of the post-event base populations
        ev_l = jnp.take_along_axis(last_t, lc, 1)
        ev_r = jnp.take_along_axis(last_t, rc, 1)
        bl = jnp.take_along_axis(base_pop, lc, 1)
        br = jnp.take_along_axis(base_pop, rc, 1)
        low_ev = jnp.maximum(jnp.maximum(la, ra),
                             jnp.maximum(ev_l, ev_r))
        pl = lift_population(sp, bl, jnp.maximum(low_ev, 0.0))
        pr = lift_population(sp, br, jnp.maximum(low_ev, 0.0))
        mrca_pop = sp.mrca[pl, pr]
        minage = jnp.maximum(low_ev, sp.tau[mrca_pop])
        # upper clamps: parent age and first event on the own edge
        par_s = jnp.maximum(gt.parent, 0)
        maxage = jnp.where(gt.parent >= 0,
                           jnp.take_along_axis(age, par_s, 1), MAXAGE_CAP)
        maxage = jnp.minimum(maxage, first_t)

        tnew = rng.reflect(
            age + eps * rng.bactrian(k1, (L, N), dtype=eps.dtype),
            minage, jnp.maximum(maxage, minage + 1e-300))
        mask_ok = mask & (maxage > minage)
        age_new = jnp.where(mask_ok, tnew, age)
        gtn = gt._replace(age=age_new)
        logl_new = logl_fn(gtn, state.subst, sp, state.clock, mig=mig)
        logpr_new, *_ = logpr_fn(gtn, sp, mig, state.subst.heredity)
        lnacc = (logl_new - logl) + (logpr_new - logpr)
        amask = ctx.locus_mask & mask_ok.any(1)
        accept = rng.mh_accept(k2, lnacc) & amask
        age = jnp.where(accept[:, None], age_new, age)
        logl = jnp.where(accept, logl_new, logl)
        logpr = jnp.where(accept, logpr_new, logpr)
        nprop = nprop + amask.sum(dtype=jnp.int32)
        nacc = nacc + accept.sum(dtype=jnp.int32)

    return (state._replace(gt=gt._replace(age=age), logl=logl, logpr=logpr),
            (nprop, nacc))


# --------------------------------------------------------------------------
# tau slide under migration (validity enforced by the density indicator)
# --------------------------------------------------------------------------


def tau_move_mig(ctx: Ctx, cfg: BppConfig, routes, state: McmcState, key):
    """Blocked tau rubber-band under migration (the IM-rubberband
    analog, stree.c:6725 propose_tau_mig + rb_bounds :6568, TPU-first).

    Same parity-blocked piecewise-linear remap as the plain tau_move
    (moves.py), extended to migration-event times: every gene-node age
    AND event time inside a governed population's (minage, maxage)
    window moves with the window's map (events use their SOURCE
    population — the population the migrating lineage occupies below
    the event; for sibling-tip routes both choices give the same map).
    The map is a deterministic bijection, so MH needs only the summed
    log-slopes (Jacobian); configurations the remap strands (an event
    or coalescence outside its population) reject through the density
    indicator instead of the reference's per-locus linkage-matrix
    bounds machinery.

    Round-3 note: the earlier plain slide (ages/events untouched) was
    exact but mixed catastrophically slowly — with migration events
    present, tau could not cross any event/coalescent time, giving a
    too-narrow tau marginal (prior sd 0.008 vs the exact 0.02 on the
    2-species InvG(3, 0.04) check; the rubber-band restores it).
    """
    from ..config import Clock
    from ..trees.gtree import BIG_AGE
    sp0 = state.sp
    H = sp0.n_nodes
    NS = sp0.n_tips
    if NS == 1:
        return state, (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    T = state.gt.n_tips
    N = state.gt.n_nodes
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    logl_fn = make_logl_fn(ctx, cfg)
    gamma_tau = cfg.tauprior.dist == PriorDist.GAMMA
    a, b = cfg.tauprior.alpha, cfg.tauprior.beta
    eps = state.finetune[FT_TAU]
    nodes_idx = jnp.arange(N)[None, :]
    hidx = jnp.arange(H)
    parity = (sp0.pptable.sum(1).astype(jnp.int32) + 1) % 2
    is_inner_sp = hidx >= NS
    is_inner_g = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)
    gmask = is_inner_g & ctx.locus_mask[:, None]
    ev_live0 = (state.mig.node >= 0) & ctx.locus_mask[:, None]

    age, tau, ev_time = state.gt.age, sp0.tau, state.mig.time
    logl, logpr = state.logl, state.logpr
    has_trait = ctx.trait_fn is not None
    tlogl = state.trait.logl if has_trait else None
    nprop = jnp.zeros((), jnp.int32)
    nacc = jnp.zeros((), jnp.int32)

    n_phases = 1 if NS == 2 else 2
    for phase in range(n_phases):
        key, k1, k2 = jax.random.split(key, 3)
        prop = is_inner_sp & (parity == phase) & (tau > 0.0)

        lh = jnp.maximum(sp0.left, 0)
        rh = jnp.maximum(sp0.right, 0)
        minage = jnp.maximum(tau[lh], tau[rh])
        maxage = jnp.where(sp0.parent >= 0,
                           tau[jnp.maximum(sp0.parent, 0)], MAXAGE_CAP)
        prop = prop & (maxage > minage)
        tnew = rng.reflect(tau + eps * rng.bactrian(k1, (H,),
                                                    dtype=eps.dtype),
                           minage, maxage)
        tnew = jnp.where(prop, tnew, tau)
        dt = tnew - tau
        tau_new = tnew
        sp_cur = sp0._replace(tau=tau)
        sp_new = sp0._replace(tau=tau_new)

        par_s = jnp.maximum(sp0.parent, 0)
        gov = jnp.where(prop, hidx,
                        jnp.where((sp0.parent >= 0) & prop[par_s],
                                  par_s, -1))
        mig_cur = state.mig._replace(time=ev_time)
        pops = mg.assign_populations_mig(state.gt._replace(age=age),
                                         sp_cur, ctx.tip_pop, mig_cur,
                                         ctx.n_seq)
        gov_ok = gov >= 0
        gov_s = jnp.maximum(gov, 0)
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

        def remap(times, popidx, live):
            """piecewise rubber map + per-item log-slope [*, 2]."""
            oh = (popidx[..., None] == hidx).astype(tau.dtype)
            gp = jnp.einsum("lnh,hp->lnp", oh, params)
            g_min, g_max, g_told, g_dt, g_gov, g_lmaxf, g_lminf = (
                gp[..., i] for i in range(7))
            cond = live & (g_gov > 0.5) & (times > g_min) & (times < g_max)
            above = cond & (times >= g_told)
            below = cond & (times < g_told)
            t_new = jnp.where(
                above, times + g_dt * (g_max - times) / (g_max - g_told),
                jnp.where(below,
                          times + g_dt * (times - g_min) / (g_told - g_min),
                          times))
            ljac = jnp.where(above, g_lmaxf, 0.0) \
                + jnp.where(below, g_lminf, 0.0)
            return t_new, ljac

        age_new, jac_a = remap(age, pops, gmask)
        # events: map by the SOURCE population (the lineage's population
        # below the event); padding slots (node < 0) carry BIG_AGE times
        # outside every window and pop 0 -- masked by ev_live0
        ev_new, jac_e = remap(ev_time, state.mig.src, ev_live0)
        jac = _psum_if_sharded(jnp.sum(jac_a) + jnp.sum(jac_e))

        gtn = state.gt._replace(age=age_new)
        mign = state.mig._replace(time=ev_new)
        logpr_new, *_ = logpr_fn(gtn, sp_new, mign, state.subst.heredity)
        logl_new = logl_fn(gtn, state.subst, sp_new, state.clock, mig=mign)
        lnacc = jac \
            + _psum_if_sharded(jnp.sum(logpr_new - logpr)) \
            + _psum_if_sharded(jnp.sum(logl_new - logl))
        if has_trait:
            # trait likelihood depends on the species taus only
            # (stree.c:5675 analog): same delta as the plain tau move
            tl_new = ctx.trait_fn(tau_new, state.trait.brate)
            lnacc = lnacc + jnp.sum(tl_new - tlogl)

        root = sp0.root
        cand = jnp.sum(tau[NS:] > 0).astype(tau.dtype)
        t_r = jnp.maximum(tau[root], 1e-300)
        tn_r = jnp.maximum(tau_new[root], 1e-300)
        if gamma_tau:
            root_term = (a - 1.0 - cand + 1.0) * jnp.log(tn_r / t_r) \
                - b * (tau_new[root] - tau[root])
        else:
            root_term = (-a - 1.0 - cand + 1.0) * jnp.log(tn_r / t_r) \
                - b * (1.0 / tn_r - 1.0 / t_r)
        lnacc = lnacc + jnp.where(prop[root], root_term, 0.0)

        accept = rng.mh_accept(k2, lnacc) & prop.any()
        age = jnp.where(accept, age_new, age)
        ev_time = jnp.where(accept, ev_new, ev_time)
        tau = jnp.where(accept, tau_new, tau)
        logl = jnp.where(accept, logl_new, logl)
        logpr = jnp.where(accept, logpr_new, logpr)
        if has_trait:
            tlogl = jnp.where(accept, tl_new, tlogl)
        np_ = prop.sum(dtype=jnp.int32)
        nprop = nprop + np_
        nacc = nacc + jnp.where(accept, np_, 0)

    out = state._replace(gt=state.gt._replace(age=age),
                         sp=sp0._replace(tau=tau),
                         mig=state.mig._replace(time=ev_time),
                         logl=logl, logpr=logpr)
    if has_trait:
        out = out._replace(trait=state.trait._replace(logl=tlogl))
    return out, (nprop, nacc)


# --------------------------------------------------------------------------
# mixing with event times (prop_mixing.c:275, migration Jacobian :319-327)
# --------------------------------------------------------------------------


def mixing_mig(ctx: Ctx, cfg: BppConfig, routes, state: McmcState, key):
    gt, sp, mig = state.gt, state.sp, state.mig
    L, N, T = gt.n_loci, gt.n_nodes, gt.n_tips
    NS = sp.n_tips
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    nodes_idx = jnp.arange(N)[None, :]
    ta, tb = cfg.tauprior.alpha, cfg.tauprior.beta
    gamma_tau = cfg.tauprior.dist == PriorDist.GAMMA
    eps = state.finetune[FT_MIX]

    k1, k3 = jax.random.split(key)
    lnc = eps * rng.bactrian(k1, dtype=eps.dtype)
    c = jnp.exp(lnc)

    tau_count = jnp.sum(sp.tau[NS:] > 0)
    inner_count = _psum_if_sharded(
        jnp.sum(jnp.where(ctx.locus_mask, ctx.n_seq - 1, 0)))
    ev_count = _psum_if_sharded(jnp.sum(
        jnp.where(ctx.locus_mask[:, None], (mig.node >= 0), False)))
    lnacc = (tau_count + inner_count + ev_count) * lnc

    is_inner = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)
    age_new = jnp.where(is_inner, gt.age * c, gt.age)
    tau_new = jnp.where(sp.tau > 0, sp.tau * c, sp.tau)
    time_new = jnp.where(mig.node >= 0, mig.time * c, mig.time)

    rt_old = sp.tau[sp.root]
    rt_new = tau_new[sp.root]
    if gamma_tau:
        root_term = (ta - 1.0 - tau_count + 1.0) * lnc - tb * (rt_new - rt_old)
    else:
        root_term = (-ta - 1.0 - tau_count + 1.0) * lnc \
            - tb * (1.0 / jnp.maximum(rt_new, 1e-300)
                    - 1.0 / jnp.maximum(rt_old, 1e-300))
    lnacc = lnacc + jnp.where(rt_old > 0, root_term, 0.0)

    gtn = gt._replace(age=age_new)
    mign = mig._replace(time=time_new)
    spn = sp._replace(tau=tau_new)
    logl_new = logl_fn(gtn, state.subst, spn, state.clock, mig=mign)
    logpr_new, *_ = logpr_fn(gtn, spn, mign, state.subst.heredity)
    lnacc = lnacc + _psum_if_sharded(jnp.sum(logl_new - state.logl)) \
        + _psum_if_sharded(jnp.sum(logpr_new - state.logpr))

    # morphological traits: taus scaled => trait branch lengths scale
    # (prop_mixing.c analog; trait logl depends on the species taus
    # only, so it composes with migration exactly as without)
    has_trait = ctx.trait_fn is not None
    if has_trait:
        tl_new = ctx.trait_fn(tau_new, state.trait.brate)
        lnacc = lnacc + jnp.sum(tl_new - state.trait.logl)

    accept = rng.mh_accept(k3, lnacc)
    cand = state._replace(gt=gtn, sp=spn, mig=mign, logl=logl_new,
                          logpr=logpr_new)
    if has_trait:
        cand = cand._replace(trait=state.trait._replace(logl=tl_new))
    new_state = jax.tree.map(lambda n, o: jnp.where(accept, n, o), cand,
                             state)
    return new_state, (jnp.ones((), jnp.int32), accept.astype(jnp.int32))


# --------------------------------------------------------------------------
# simulation-based SPR (gtree.c:9090 propose_spr_sim +
# 8742 simulate_coalescent_mig): prune one lineage per locus, discard
# its migration events, resimulate its path under the structured
# coalescent conditional on the rest of the gene tree, reattach to a
# uniformly-chosen contemporary lineage.  The proposal density equals
# the MSC-M prior of the resimulated path, so lnacceptance = dlogl.
# --------------------------------------------------------------------------


def spr_sim_move(ctx: Ctx, cfg: BppConfig, routes, state: McmcState, key,
                 max_steps: int | None = None):
    gt0, sp, mig0 = state.gt, state.sp, state.mig
    L, N, T = gt0.n_loci, gt0.n_nodes, gt0.n_tips
    H = sp.n_nodes
    ME = mig0.cap
    E = N + ME
    K = mig0.M.shape[0]
    dtype = gt0.age.dtype
    lidx = jnp.arange(L)
    nodes_idx = jnp.arange(N)[None, :]
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    si = jnp.asarray(routes.si)
    ti = jnp.asarray(routes.ti)
    tau = sp.tau
    partau_f = jnp.where(sp.parent >= 0, tau[jnp.maximum(sp.parent, 0)],
                         jnp.asarray(mg._FINITE_BIG, dtype))
    if max_steps is None:
        max_steps = 2 * E + 2 * H + 2 * K + 8

    # --- select pruned node per locus --------------------------------------
    ksel, ksim, ktgt, kacc = jax.random.split(key, 4)
    valid_nodes = (nodes_idx < ctx.n_seq[:, None]) | (
        (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1))
    cand_mask = valid_nodes & (gt0.parent >= 0)
    i, _ = _select_uniform(ksel, cand_mask)
    is_valid = (gt0.parent[lidx, i] >= 0) & ctx.locus_mask

    father = jnp.maximum(gt0.parent[lidx, i], 0)
    fleft = gt0.left[lidx, father]
    sibling = jnp.where(fleft == i, gt0.right[lidx, father], fleft)
    grandpa = gt0.parent[lidx, father]
    has_gp = grandpa >= 0
    gp_s = jnp.maximum(grandpa, 0)

    # --- prune -------------------------------------------------------------
    def write(arr, row_ok, col, val):
        col_s = jnp.where(row_ok, col, 0)
        old = arr[lidx, col_s]
        return arr.at[lidx, col_s].set(jnp.where(row_ok, val, old))

    pl, pr, pp = gt0.left, gt0.right, gt0.parent
    repl_l = is_valid & has_gp & (pl[lidx, gp_s] == father)
    repl_r = is_valid & has_gp & (pr[lidx, gp_s] == father)
    pl = write(pl, repl_l, gp_s, sibling)
    pr = write(pr, repl_r, gp_s, sibling)
    pp = write(pp, is_valid, sibling, grandpa)     # -1 when father was root
    pp = write(pp, is_valid, father, jnp.full((L,), -1, pp.dtype))
    gt_p = GTrees(pl, pr, pp, gt0.age, gt0.hpath)

    # events: father's edge -> sibling; pruned edge i -> deleted
    on_father = (mig0.node == father[:, None]) & is_valid[:, None]
    on_i = (mig0.node == i[:, None]) & is_valid[:, None]
    node_p = jnp.where(on_father, sibling[:, None], mig0.node)
    node_p = jnp.where(on_i, -1, node_p)
    time_p = jnp.where(on_i, BIG_AGE, mig0.time)
    mig_p = mig0._replace(node=node_p, time=time_p)

    # start population of the pruned lineage: node i's own population
    pops_p = mg.assign_populations_mig(gt_p, sp, ctx.tip_pop, mig_p,
                                       ctx.n_seq)
    start_pop = pops_p[lidx, i]
    t0 = gt0.age[lidx, i]

    # --- rest-of-tree sub-edges (exclude i's and father's edges) -----------
    excl = jnp.stack([i, father], axis=1)
    t_lo, t_hi, pop_lo, live_e = mg._subedges(
        gt_p, mig_p, pops_p, ctx.n_seq, exclude=excl, include_root_edge=True)
    anc_e = sp.pptable[pop_lo]                              # [L, E, H]
    heredity = state.subst.heredity

    route_M = mg.eff_rates(routes, mig0)                    # [L, K]

    def n_and_bounds(t, p):
        """lineages in pop p at t, and next boundary time (> t)."""
        ph = jnp.take_along_axis(anc_e, p[:, None, None], 2)[..., 0]
        lo = jnp.maximum(t_lo, tau[p][:, None])
        hi = jnp.minimum(t_hi, partau_f[p][:, None])
        inside = ph & live_e & (lo <= t[:, None]) & (t[:, None] < hi)
        n = inside.sum(axis=1)
        pts = jnp.concatenate([lo, hi], axis=1)             # [L, 2E]
        pm = jnp.concatenate([ph & live_e] * 2, axis=1)
        pts = jnp.where(pm & (pts > t[:, None]), pts, mg._FINITE_BIG)
        nb = jnp.min(pts, axis=1)
        nb = jnp.minimum(nb, partau_f[p])
        # donor lifetimes change the migration rate
        don = (ti[None, :] == p[:, None])                   # [L, K]
        dpts = jnp.stack([jnp.broadcast_to(tau[si], don.shape),
                          jnp.broadcast_to(partau_f[si], don.shape)], 2)
        dpts = jnp.where(don[..., None] & (dpts > t[:, None, None]),
                         dpts, mg._FINITE_BIG)
        nb = jnp.minimum(nb, jnp.min(dpts, axis=(1, 2)))
        return n, nb

    def mrsum_of(t, p):
        alive = (tau[si] <= t[:, None]) & (t[:, None] < partau_f[si])
        ok = (ti[None, :] == p[:, None]) & alive
        return jnp.sum(jnp.where(ok, route_M, 0.0), axis=1), ok

    CAP_NEW = ME

    def sim_cond(carry):
        t, p, kk, done, fail, nt, ns, nd, nn, steps = carry
        return (steps < max_steps) & jnp.any(~done & ~fail & is_valid)

    def sim_body(carry):
        t, p, kk, done, fail, nt, ns, nd, nn, steps = carry
        kk, k1, k2, k3 = jax.random.split(kk, 4)
        act = ~done & ~fail & is_valid
        n, nb = n_and_bounds(t, p)
        mrs, route_ok = mrsum_of(t, p)
        th = jnp.maximum(tau.dtype.type(0.0) + sp.theta[p] * heredity,
                         1e-300)
        crate = 2.0 * n.astype(dtype) / th
        rate = crate + mrs
        delta = jnp.where(rate > 0,
                          jax.random.exponential(k1, (L,), dtype) / rate,
                          jnp.asarray(jnp.inf, dtype))
        t_ev = t + delta
        hit = t_ev < nb
        # coalescence vs migration
        u = jax.random.uniform(k2, (L,), dtype) * rate
        is_coal = hit & (u >= mrs)
        is_mig = hit & (u < mrs)
        # pick donor route: categorical over route_ok weights
        w = jnp.where(route_ok, route_M, 0.0)
        cum = jnp.cumsum(w, axis=1)
        r = jax.random.uniform(k3, (L,), dtype) * jnp.maximum(
            cum[:, -1], 1e-300)
        kpick = jnp.argmax(cum > r[:, None], axis=1)
        dpick = si[kpick]
        # record migration event
        can_rec = is_mig & act & (nn < CAP_NEW)
        overflow = is_mig & act & (nn >= CAP_NEW)
        slot = jnp.minimum(nn, CAP_NEW - 1)
        nt = nt.at[lidx, slot].set(jnp.where(can_rec, t_ev, nt[lidx, slot]))
        ns = ns.at[lidx, slot].set(
            jnp.where(can_rec, p, ns[lidx, slot]))
        nd = nd.at[lidx, slot].set(
            jnp.where(can_rec, dpick, nd[lidx, slot]))
        nn = nn + can_rec.astype(jnp.int32)
        fail = fail | overflow
        # state updates
        p_next = jnp.where(is_mig & act, dpick, p)
        # boundary crossing: lift to parent pop at pop end
        at_end = ~hit & (nb >= partau_f[p]) & act
        p_next = jnp.where(at_end, jnp.maximum(sp.parent[p], 0), p_next)
        t_next = jnp.where(act, jnp.where(hit, t_ev, nb), t)
        done = done | (is_coal & act)
        t = jnp.where(act, t_next, t)
        p = jnp.where(act, p_next, p)
        return (t, p, kk, done, fail, nt, ns, nd, nn, steps + 1)

    init = (t0, start_pop, ksim,
            jnp.zeros((L,), bool), jnp.zeros((L,), bool),
            jnp.full((L, CAP_NEW), BIG_AGE, dtype),
            jnp.zeros((L, CAP_NEW), jnp.int32),
            jnp.zeros((L, CAP_NEW), jnp.int32),
            jnp.zeros((L,), jnp.int32), jnp.zeros((), jnp.int32))
    t_new, coal_pop, _, done, fail, nt, ns, nd, nn, _ = jax.lax.while_loop(
        sim_cond, sim_body, init)
    fail = fail | ~done

    # --- target selection ---------------------------------------------------
    ph = jnp.take_along_axis(anc_e, coal_pop[:, None, None], 2)[..., 0]
    lo = jnp.maximum(t_lo, tau[coal_pop][:, None])
    hi = jnp.minimum(t_hi, partau_f[coal_pop][:, None])
    inside = ph & live_e & (lo <= t_new[:, None]) & (t_new[:, None] < hi)
    esel, ecount = _select_uniform(ktgt, inside)
    fail = fail | (ecount < 1)
    target = jnp.where(esel < N, esel,
                       mig_p.node[lidx, jnp.maximum(esel - N, 0)])
    target = jnp.maximum(target, 0)

    # --- regraft -------------------------------------------------------------
    ok = is_valid & ~fail
    nl, nr, np_, na = gt_p.left, gt_p.right, gt_p.parent, gt0.age
    tpar = np_[lidx, target]
    tpar_s = jnp.maximum(tpar, 0)
    repl_tl = ok & (tpar >= 0) & (nl[lidx, tpar_s] == target)
    repl_tr = ok & (tpar >= 0) & (nr[lidx, tpar_s] == target)
    nl = write(nl, repl_tl, tpar_s, father)
    nr = write(nr, repl_tr, tpar_s, father)
    np_ = write(np_, ok, father, tpar)
    nl = write(nl, ok, father, i)
    nr = write(nr, ok, father, target)
    np_ = write(np_, ok, target, father)
    np_ = write(np_, ok, i, father)
    na = write(na, ok, father, t_new)
    gt_n = GTrees(nl, nr, np_, na, gt0.hpath)

    # events on target's edge above t_new move to father's edge
    on_tgt = (mig_p.node == target[:, None]) & ok[:, None] & (
        mig_p.time > t_new[:, None])
    node_n = jnp.where(on_tgt, father[:, None], mig_p.node)
    mig_n = mig_p._replace(node=node_n)
    # append the resimulated events to the pruned edge i in free slots
    free_order = jnp.argsort(
        (mig_n.node >= 0).astype(jnp.int32), axis=1)        # free first
    free_cnt = jnp.sum(mig_n.node < 0, axis=1)
    fail_cap = nn > free_cnt
    ok = ok & ~fail_cap
    mtime, mnode = mig_n.time, mig_n.node
    msrc, mdst = mig_n.src, mig_n.dst
    for j in range(CAP_NEW):
        slot = free_order[:, j]
        put = ok & (j < nn)
        mtime = write(mtime, put, slot, nt[:, j])
        mnode = write(mnode, put, slot,
                      jnp.where(put, i, 0).astype(mnode.dtype))
        msrc = write(msrc, put, slot, ns[:, j])
        mdst = write(mdst, put, slot, nd[:, j])
    mig_n = mig_n._replace(time=mtime, node=mnode, src=msrc, dst=mdst)

    # --- accept (dlogl only; prior == proposal) ------------------------------
    logl_new = logl_fn(gt_n, state.subst, sp, state.clock, mig=mig_n)
    logpr_new, *_ = logpr_fn(gt_n, sp, mig_n, heredity)
    ok = ok & jnp.isfinite(logpr_new)
    accept = rng.mh_accept(kacc, logl_new - state.logl) & ok
    am = accept[:, None]
    gt_f = GTrees(
        jnp.where(am, gt_n.left, gt0.left),
        jnp.where(am, gt_n.right, gt0.right),
        jnp.where(am, gt_n.parent, gt0.parent),
        jnp.where(am, gt_n.age, gt0.age), gt0.hpath)
    mig_f = mig0._replace(
        time=jnp.where(am, mig_n.time, mig0.time),
        node=jnp.where(am, mig_n.node, mig0.node),
        src=jnp.where(am, mig_n.src, mig0.src),
        dst=jnp.where(am, mig_n.dst, mig0.dst))
    new_state = state._replace(
        gt=gt_f, mig=mig_f,
        logl=jnp.where(accept, logl_new, state.logl),
        logpr=jnp.where(accept, logpr_new, state.logpr))
    return new_state, (is_valid.sum(dtype=jnp.int32),
                       accept.sum(dtype=jnp.int32))


# --------------------------------------------------------------------------
# geneflow rjMCMC: migration-route add/remove + direction flip
# (stree_migration_rj stree.c:15419, flip wrapper :15204, dispatched
# method.c:5658-5695)
# --------------------------------------------------------------------------
#
# TPU-first redesign.  The reference jumps dimensions: append draws a
# fresh rate M ~ Gamma(a, b) (= its prior, so prior/proposal cancel,
# stree.c:14229-14233) and re-simulates the gene-tree lineages crossing
# the affected population band (mig_dissolve_and_sim stree.c:13669 -
# a per-lineage sequential pruning/resimulation that has no fixed-shape
# formulation).  Here the parameter space is SATURATED instead
# (Carlin & Chib): every candidate route keeps an M value; inactive
# routes' rates follow their prior (the W Gibbs draws them with zeroed
# stats - migrate_move), so toggling a route's activation is a plain
# within-space MH move whose pseudo-prior terms cancel, exactly like
# the reference's prior-matched rj draw.  Gene trees are NOT modified:
# a route with migration events on it cannot be removed or flipped
# (density -inf -> structural rejection); the event content adapts
# through the sim-SPR and migevent moves once a route is active.  The
# count Hastings uses the EXACT per-state feasible-pair counts where
# the reference uses the constant NS(NS+1)(NS-1)/3 approximation
# (stree.c:14238; see trees.migration.build_routes_geneflow).


def _route_overlap(routes, sp):
    """[K] bool: source/target population time intervals overlap
    (select_migpair stree.c:15275 criterion)."""
    tau = sp.tau
    partau = jnp.where(sp.parent >= 0,
                       tau[jnp.maximum(sp.parent, 0)], jnp.inf)
    si = jnp.asarray(routes.si)
    ti = jnp.asarray(routes.ti)
    return (jnp.maximum(tau[si], tau[ti])
            < jnp.minimum(partau[si], partau[ti]))


def _pick(key, mask):
    """(index, count): uniform choice among True entries of mask [K]."""
    count = mask.sum()
    logits = jnp.where(mask, 0.0, -1e30)
    idx = jax.random.categorical(key, logits)
    return idx.astype(jnp.int32), count


def geneflow_rj_move(ctx: Ctx, cfg: BppConfig, routes, state: McmcState,
                     key):
    """Toggle one route's activation (append/remove, coin-tossed)."""
    mig = state.mig
    sp = state.sp
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    _, _, _, W, mc, _ = logpr_fn(state.gt, sp, mig, state.subst.heredity)
    mask_l = ctx.locus_mask[:, None]
    wsum = _psum_if_sharded(jnp.sum(jnp.where(mask_l, W, 0.0), axis=0))
    mcsum = _psum_if_sharded(jnp.sum(jnp.where(mask_l, mc, 0), axis=0))

    on = mig.on
    ov = _route_overlap(routes, sp)
    kc, ks, ka = jax.random.split(key, 3)
    do_append = jax.random.uniform(kc) < 0.5

    avail = ov & ~on                       # appendable candidates
    k_app, n_avail = _pick(ks, avail)
    k_rem, n_act = _pick(ks, on)
    k = jnp.where(do_append, k_app, k_rem)

    # density delta: +- M_k * sum_l W_lk (activating adds the -M W
    # exposure term; mc_k == 0 by invariant when activating, and
    # removal with events on the route is impossible)
    Mk = mig.M[k]
    dW = Mk * wsum[k]
    lnacc = jnp.where(do_append, -dW, dW)

    # exact count Hastings: append pick 1/n_avail, reverse remove pick
    # 1/(n_act+1); remove pick 1/n_act, reverse append 1/n_avail_after
    n_avail_after = n_avail + jnp.where(ov[k], 1, 0)
    lnacc = lnacc + jnp.where(
        do_append,
        jnp.log(jnp.maximum(n_avail, 1) / (n_act + 1.0)),
        jnp.log(jnp.maximum(n_act, 1) / jnp.maximum(n_avail_after, 1.0)))

    feasible = jnp.where(
        do_append, n_avail > 0,
        (n_act > 0) & (mcsum[k] == 0) & ov[k])
    # variable-rates routes exchange no prior mass with the pseudo
    # (their Mi hierarchy is active-only machinery): freeze them
    feasible = feasible & (jnp.asarray(routes.am)[k] == 0)

    accept = rng.mh_accept(ka, jnp.where(feasible, lnacc, -jnp.inf))
    on_new = on.at[k].set(jnp.where(accept, do_append, on[k]))
    mig_new = mig._replace(on=on_new)
    logpr_new, *_ = logpr_fn(state.gt, sp, mig_new, state.subst.heredity)
    new_state = state._replace(
        mig=mig_new,
        logpr=jnp.where(accept, logpr_new, state.logpr))
    return new_state, (jnp.ones((), jnp.int32),
                       accept.astype(jnp.int32))


def geneflow_flip_move(ctx: Ctx, cfg: BppConfig, routes, state: McmcState,
                       key):
    """Flip one route's direction s->t to t->s, carrying its rate over
    (stree_migration_flip_wrapper stree.c:15204; candidates are active
    routes whose reverse is inactive, the XOR scan :15225-15232)."""
    mig = state.mig
    sp = state.sp
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    _, _, _, W, mc, _ = logpr_fn(state.gt, sp, mig, state.subst.heredity)
    mask_l = ctx.locus_mask[:, None]
    wsum = _psum_if_sharded(jnp.sum(jnp.where(mask_l, W, 0.0), axis=0))
    mcsum = _psum_if_sharded(jnp.sum(jnp.where(mask_l, mc, 0), axis=0))

    on = mig.on
    # rev[k]: index of the opposite-direction candidate
    rev = jnp.asarray(routes.index)[jnp.asarray(routes.ti),
                                    jnp.asarray(routes.si)]
    has_rev = rev >= 0
    rev_s = jnp.maximum(rev, 0)
    am0 = jnp.asarray(routes.am) == 0
    flippable = on & has_rev & ~on[rev_s] & am0 & am0[rev_s]

    ks, ka = jax.random.split(key)
    k, n_flip = _pick(ks, flippable)
    r = rev_s[k]
    Mk = mig.M[k]
    Mr = mig.M[r]

    # propose: deactivate k, activate r, SWAP the rate slots so the
    # active rate value carries over (migspec_flip keeps spec->M)
    on_new = on.at[k].set(False).at[r].set(True)
    M_new = mig.M.at[k].set(Mr).at[r].set(Mk)

    # density delta: k's exposure leaves, r's (with rate Mk) enters
    lnacc = Mk * wsum[k] - Mk * wsum[r]
    # pseudo-prior/prior bookkeeping for the swapped values (slots may
    # carry different configured priors)
    al = jnp.asarray(routes.alpha, wsum.dtype)
    be = jnp.asarray(routes.beta, wsum.dtype)
    lnacc = lnacc + (rng.log_pdf_gamma(Mk, al[r], be[r])
                     + rng.log_pdf_gamma(Mr, al[k], be[k])
                     - rng.log_pdf_gamma(Mk, al[k], be[k])
                     - rng.log_pdf_gamma(Mr, al[r], be[r]))

    # reverse selection count: flippable set after the flip
    flip_after = on_new & has_rev & ~on_new[rev_s] & am0 & am0[rev_s]
    n_after = flip_after.sum()
    lnacc = lnacc + jnp.log(jnp.maximum(n_flip, 1)
                            / jnp.maximum(n_after, 1).astype(wsum.dtype))

    feasible = (n_flip > 0) & (mcsum[k] == 0)
    accept = rng.mh_accept(ka, jnp.where(feasible, lnacc, -jnp.inf))
    mig_new = mig._replace(
        on=jnp.where(accept, on_new, on),
        M=jnp.where(accept, M_new, mig.M))
    logpr_new, *_ = logpr_fn(state.gt, sp, mig_new, state.subst.heredity)
    new_state = state._replace(
        mig=mig_new,
        logpr=jnp.where(accept, logpr_new, state.logpr))
    return new_state, (jnp.ones((), jnp.int32), accept.astype(jnp.int32))


def heredity_move_mig(ctx: Ctx, cfg: BppConfig, routes, state: McmcState,
                      key):
    """Per-locus heredity-scalar slide under migration (prop_heredity
    gtree.c:8214; the MSC-M density scales every theta by h_l)."""
    from .state import FT_LRHT
    L = state.gt.n_loci
    eps = state.finetune[FT_LRHT]
    ks, ka = jax.random.split(key)
    h = state.subst.heredity
    h_new = jnp.abs(h + eps * rng.bactrian(ks, (L,), dtype=eps.dtype))
    h_new = jnp.maximum(h_new, 1e-300)
    h_new = jnp.where(ctx.locus_mask, h_new, h)
    dprior = (cfg.heredity_alpha - 1.0) * jnp.log(h_new / h) \
        - cfg.heredity_beta * (h_new - h)
    logpr_fn = make_logpr_fn_mig(ctx, routes)
    logpr_new, *_ = logpr_fn(state.gt, state.sp, state.mig, h_new)
    lnacc = dprior + (logpr_new - state.logpr)
    accept = rng.mh_accept(ka, lnacc) & ctx.locus_mask
    h_fin = jnp.where(accept, h_new, h)
    logpr = jnp.where(accept, logpr_new, state.logpr)
    return (state._replace(subst=state.subst._replace(heredity=h_fin),
                           logpr=logpr),
            (ctx.locus_mask.sum(dtype=jnp.int32),
             accept.sum(dtype=jnp.int32)))
