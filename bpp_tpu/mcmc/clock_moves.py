"""Relaxed-clock and hierarchical locus-rate moves (moves #8/#14 of
SURVEY.md §2.3; reference src/stree.c:9052-10468).

State: ClockState.brate [L, H] per-(locus, species-branch) rates, nu
[L] per-locus rate variances, hierarchical means mubar/nubar, cached
per-locus branch-rate prior lnrates.

All proposals are log-scale Bactrian slides reflected into [-99, 99]
like the reference; the serial cross-locus coupling of the
Gamma-Dirichlet prior (running sum_mui) is kept exact by precomputing
batched per-locus likelihood/prior deltas (valid: both factorize per
locus) and scanning the accept chain over loci.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BppConfig, Clock
from ..core import felsenstein as fe
from . import rng
from .moves import _psum_if_sharded
from .state import (
    Ctx, FT_BRATE, FT_MUBAR, FT_MUI, FT_NUBAR, FT_NUI, ClockState,
    McmcState, make_logl_fn,
)

LOG_BOUND = 99.0


# --------------------------------------------------------------------------
# branch-rate prior density (lnprior_rates, stree.c:8880-9050)
# --------------------------------------------------------------------------


def lnprior_rates(cfg: BppConfig, sp, mu, clock: ClockState):
    """Per-locus branch-rate log prior [L] (gtree->lnprior_rates).

    clock=2 IID: every species node (root included) carries an iid rate
    r ~ Gamma(mu^2/nu, mu/nu) or LogNormal(log mu - nu/2, nu).
    clock=3 CORR: brate[root] == mu; Gamma: each inner node's two
    children rates ~ Gamma(m^2/nu, m/nu) given the node's rate m;
    LogNormal: the bivariate geometric-Brownian correction with branch
    midpoints (stree.c:8929-8960).
    """
    H = sp.n_nodes
    r = clock.brate                                   # [L, H]
    if cfg.clock == Clock.GLOBAL:
        # strict clock with hierarchical mu_i only: no branch-rate prior
        return jnp.zeros((r.shape[0],), r.dtype)
    nu = clock.nu[:, None]                            # [L, 1]
    m = mu[:, None]
    # MSC-I networks: zero-length hybridization segments and BDI
    # mirrors carry no rate (prop_branch_rates skips, stree.c:10293)
    rmask = (jnp.ones((H,), bool) if sp.rate_nodes is None
             else sp.rate_nodes)
    n_rate = rmask.sum()
    if cfg.clock == Clock.IID:
        if cfg.clock_rate_prior == 1:                 # gamma
            alpha = m * m / nu
            beta = m / nu
            per = -beta * r + (alpha - 1.0) * jnp.log(r)
            const = alpha * jnp.log(beta) - jax.lax.lgamma(alpha)
            return jnp.sum(jnp.where(rmask[None, :], per + const, 0.0),
                           axis=1)
        z = jnp.log(r) - jnp.log(m) + nu / 2.0        # lognormal
        per = -(z * z) / (2.0 * nu) - jnp.log(r)
        return jnp.sum(jnp.where(rmask[None, :], per, 0.0), axis=1) \
            - 0.5 * jnp.log(2.0 * jnp.pi * clock.nu) * n_rate
    if cfg.clock == Clock.CORRELATED:
        NS = sp.n_tips
        inner = jnp.arange(NS, H)
        lc, rc = sp.left[inner], sp.right[inner]
        mm = r[:, inner]                              # parent rates [L, NI]
        r1, r2 = r[:, lc], r[:, rc]
        if cfg.clock_rate_prior == 1:                 # gamma (stree.c:8904)
            alpha = mm * mm / nu
            beta = alpha / mm
            per = (-2.0 * jax.lax.lgamma(alpha) + 2.0 * alpha * jnp.log(beta)
                   - beta * (r1 + r2) + (alpha - 1.0) * jnp.log(r1 * r2))
            return jnp.sum(per, axis=1)
        # lognormal geometric Brownian motion (stree.c:8929)
        par = sp.parent[inner]
        tA = jnp.where(par >= 0,
                       (sp.tau[jnp.maximum(par, 0)] - sp.tau[inner]) / 2.0,
                       0.0)
        t1 = (sp.tau[inner] - sp.tau[lc]) / 2.0
        t2 = (sp.tau[inner] - sp.tau[rc]) / 2.0
        detT = t1 * t2 + tA * (t1 + t2)
        Ti00 = (tA + t2) / detT
        Ti01 = -tA / detT
        Ti11 = (tA + t1) / detT
        rA = jnp.where(par >= 0, mm, m)
        y1 = jnp.log(r1 / rA) + (tA + t1) * nu / 2.0
        y2 = jnp.log(r2 / rA) + (tA + t2) * nu / 2.0
        zz = y1 * y1 * Ti00 + 2.0 * y1 * y2 * Ti01 + y2 * y2 * Ti11
        per = -(zz / (2.0 * nu) + jnp.log(detT * nu * nu) / 2.0
                + jnp.log(r1 * r2))
        n_inner = H - NS
        return jnp.sum(per, axis=1) \
            - 0.5 * jnp.log(2.0 * jnp.pi) * n_inner * 2
    if cfg.clock == Clock.SIMPLE:
        a = cfg.clock_alpha
        per = a * jnp.log(a) - jax.lax.lgamma(jnp.asarray(a, r.dtype)) \
            + (a - 1.0) * jnp.log(r) - a * r
        return jnp.sum(jnp.where(rmask[None, :], per, 0.0), axis=1)  # [1]
    raise ValueError(cfg.clock)


def init_clock_state(cfg: BppConfig, sp, mu, rng_np, L, dtype) -> ClockState:
    """Starting rates jittered around the hierarchical means
    (method.c:4212-4253)."""
    import numpy as np
    H = sp.n_nodes
    if cfg.clock == Clock.SIMPLE:
        brate = np.ones((1, H)) * (0.9 + 0.2 * rng_np.random((1, H)))
        nu = np.ones(L)
        mubar = nubar = 1.0
    else:
        nubar = (cfg.clock_vbar_a / cfg.clock_vbar_b
                 if cfg.clock_vbar_b > 0 else 1.0)
        mubar = (cfg.locusrate_mubar_a / cfg.locusrate_mubar_b
                 if cfg.locusrate_mubar_b > 0 else cfg.locusrate_mubar)
        nu = nubar * (0.9 + 0.2 * rng_np.random(L))
        mun = np.asarray(mu)
        brate = mun[:, None] * (0.9 + 0.2 * rng_np.random((L, H)))
        if cfg.clock == Clock.CORRELATED:
            brate[:, int(sp.root)] = mun
    cl = ClockState(
        brate=jnp.asarray(brate, dtype), nu=jnp.asarray(nu, dtype),
        mubar=jnp.asarray(mubar, dtype), nubar=jnp.asarray(nubar, dtype),
        lnrates=jnp.zeros((brate.shape[0],), dtype))
    return cl._replace(lnrates=lnprior_rates(cfg, sp, jnp.asarray(mu, dtype),
                                             cl))


def _logslide(key, x, eps):
    """log-scale Bactrian slide reflected into [-99, 99] (stree.c:9290)."""
    lx = jnp.log(x)
    lnew = rng.reflect(lx + eps * rng.bactrian(key, dtype=eps.dtype),
                       -LOG_BOUND, LOG_BOUND)
    return jnp.exp(lnew), lnew - lx


# --------------------------------------------------------------------------
# mu_i move (prop_locusrate_mui, stree.c:9225)
# --------------------------------------------------------------------------


def mui_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Locus-rate mu_i under the GammaDir (prior 0) or hierarchical
    conditional-iid (prior 1) prior.  GLOBAL/CORR/SIMPLE clocks change
    the likelihood; IID/CORR change the branch-rate prior."""
    L = state.gt.n_loci
    logl_fn = make_logl_fn(ctx, cfg)
    eps = state.finetune[FT_MUI]
    k1, k2 = jax.random.split(key)
    mu = state.subst.mu
    mu_new, dlog = jax.vmap(_logslide, in_axes=(0, 0, None))(
        jax.random.split(k1, L), mu, eps)
    mu_new = jnp.where(ctx.locus_mask, mu_new, mu)

    subst_new = state.subst._replace(mu=mu_new)
    likelihood_changes = cfg.clock in (Clock.GLOBAL, Clock.CORRELATED,
                                       Clock.SIMPLE)
    clock_new = state.clock
    if cfg.clock == Clock.CORRELATED:
        clock_new = state.clock._replace(
            brate=state.clock.brate.at[:, state.sp.root].set(mu_new))
    if likelihood_changes:
        logl_new = logl_fn(state.gt, subst_new, state.sp, clock_new,
                           mig=state.mig)
        dlogl = logl_new - state.logl
    else:
        logl_new = state.logl
        dlogl = jnp.zeros_like(state.logl)
    if cfg.clock in (Clock.IID, Clock.CORRELATED):
        lnr_new = lnprior_rates(cfg, state.sp, mu_new, clock_new)
        dlnr = lnr_new - state.clock.lnrates
    else:
        lnr_new = None
        dlnr = jnp.zeros_like(mu)

    a_mui = cfg.locusrate_alpha
    us = jax.random.uniform(k2, (L,))
    if cfg.locusrate_prior == 1:
        # iid Gamma(a_mui, a_mui / mubar): no cross-locus coupling
        beta = a_mui / state.clock.mubar
        lnacc = (dlog + (a_mui - 1.0) * jnp.log(mu_new / mu)
                 - beta * (mu_new - mu) + dlogl + dlnr)
        accept = (jnp.log(us) < lnacc) & ctx.locus_mask
    else:
        # Gamma-Dirichlet: serial accept chain with running sum_mui
        # (stree.c:9299-9303); the batched dlogl/dlnr deltas are exact
        # because likelihood and rate prior factorize per locus
        nl = ctx.locus_mask.sum().astype(mu.dtype)
        terma = a_mui * nl
        termb = cfg.locusrate_mubar_b / nl
        a_mubar = cfg.locusrate_mubar_a

        def body(sum_mu, inp):
            mo, mn, dl, dlo, dlr, u, mask = inp
            sum_new = sum_mu + mn - mo
            lnacc = (dl + (a_mubar - terma) * jnp.log(sum_new / sum_mu)
                     - termb * (sum_new - sum_mu)
                     + (a_mui - 1.0) * jnp.log(mn / mo) + dlo + dlr)
            acc = (jnp.log(u) < lnacc) & mask
            return jnp.where(acc, sum_new, sum_mu), acc

        sum0 = jnp.sum(jnp.where(ctx.locus_mask, mu, 0.0))
        _, accept = jax.lax.scan(
            body, sum0,
            (mu, mu_new, dlog, dlogl, dlnr, us, ctx.locus_mask))

    mu_fin = jnp.where(accept, mu_new, mu)
    new = state._replace(
        subst=state.subst._replace(mu=mu_fin),
        logl=jnp.where(accept, logl_new, state.logl) if likelihood_changes
        else state.logl)
    if cfg.clock == Clock.CORRELATED:
        new = new._replace(clock=new.clock._replace(
            brate=state.clock.brate.at[:, state.sp.root].set(mu_fin)))
    if lnr_new is not None:
        new = new._replace(clock=new.clock._replace(
            lnrates=jnp.where(accept, lnr_new, state.clock.lnrates)))
    nprop = ctx.locus_mask.sum().astype(jnp.int32)
    nacc = accept.sum().astype(jnp.int32)
    return new, (nprop, nacc)


# --------------------------------------------------------------------------
# mubar move (prop_locusrate_mubar, stree.c:9770)
# --------------------------------------------------------------------------


def mubar_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    k1, k2 = jax.random.split(key)
    eps = state.finetune[FT_MUBAR]
    old = state.clock.mubar
    new, dlog = _logslide(k1, old, eps)
    a, b = cfg.locusrate_mubar_a, cfg.locusrate_mubar_b
    am = cfg.locusrate_alpha
    bnew, bold = am / new, am / old
    summu = _psum_if_sharded(
        jnp.sum(jnp.where(ctx.locus_mask, state.subst.mu, 0.0)))
    nl = _psum_if_sharded(ctx.locus_mask.sum())
    lnacc = (dlog + (a - 1.0) * jnp.log(new / old) - b * (new - old)
             + nl * am * jnp.log(bnew / bold) - (bnew - bold) * summu)
    accept = rng.mh_accept(k2, lnacc)
    mubar = jnp.where(accept, new, old)
    return state._replace(clock=state.clock._replace(mubar=mubar)), \
        (jnp.ones((), jnp.int32), accept.astype(jnp.int32))


# --------------------------------------------------------------------------
# nu_i move (prop_locusrate_nui, stree.c:9052)
# --------------------------------------------------------------------------


def nui_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    L = state.gt.n_loci
    eps = state.finetune[FT_NUI]
    k1, k2 = jax.random.split(key)
    nu = state.clock.nu
    nu_new, dlog = jax.vmap(_logslide, in_axes=(0, 0, None))(
        jax.random.split(k1, L), nu, eps)
    nu_new = jnp.where(ctx.locus_mask, nu_new, nu)
    clock_new = state.clock._replace(nu=nu_new)
    lnr_new = lnprior_rates(cfg, state.sp, state.subst.mu, clock_new)
    dlnr = lnr_new - state.clock.lnrates

    a_vi = cfg.clock_vi_alpha
    us = jax.random.uniform(k2, (L,))
    if cfg.locusrate_prior == 1:
        beta = a_vi / state.clock.nubar
        lnacc = (dlog + (a_vi - 1.0) * jnp.log(nu_new / nu)
                 - beta * (nu_new - nu) + dlnr)
        accept = (jnp.log(us) < lnacc) & ctx.locus_mask
    else:
        nl = ctx.locus_mask.sum().astype(nu.dtype)
        terma = a_vi * nl
        termb = cfg.clock_vbar_b / nl
        a_vbar = cfg.clock_vbar_a

        def body(sum_nu, inp):
            no, nn, dl, dlr, u, mask = inp
            sum_new = sum_nu + nn - no
            lnacc = (dl + (a_vbar - terma) * jnp.log(sum_new / sum_nu)
                     - termb * (sum_new - sum_nu)
                     + (a_vi - 1.0) * jnp.log(nn / no) + dlr)
            acc = (jnp.log(u) < lnacc) & mask
            return jnp.where(acc, sum_new, sum_nu), acc

        sum0 = jnp.sum(jnp.where(ctx.locus_mask, nu, 0.0))
        _, accept = jax.lax.scan(
            body, sum0, (nu, nu_new, dlog, dlnr, us, ctx.locus_mask))

    new = state._replace(clock=state.clock._replace(
        nu=jnp.where(accept, nu_new, nu),
        lnrates=jnp.where(accept, lnr_new, state.clock.lnrates)))
    return new, (ctx.locus_mask.sum().astype(jnp.int32),
                 accept.sum().astype(jnp.int32))


# --------------------------------------------------------------------------
# nubar move (prop_locusrate_nubar, stree.c:9814)
# --------------------------------------------------------------------------


def nubar_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    k1, k2 = jax.random.split(key)
    eps = state.finetune[FT_NUBAR]
    old = state.clock.nubar
    new, dlog = _logslide(k1, old, eps)
    a, b = cfg.clock_vbar_a, cfg.clock_vbar_b
    av = cfg.clock_vi_alpha
    bnew, bold = av / new, av / old
    sumnu = _psum_if_sharded(
        jnp.sum(jnp.where(ctx.locus_mask, state.clock.nu, 0.0)))
    nl = _psum_if_sharded(ctx.locus_mask.sum())
    lnacc = (dlog + (a - 1.0) * dlog - b * (new - old)
             + nl * av * jnp.log(bnew / bold) - (bnew - bold) * sumnu)
    accept = rng.mh_accept(k2, lnacc)
    nubar = jnp.where(accept, new, old)
    return state._replace(clock=state.clock._replace(nubar=nubar)), \
        (jnp.ones((), jnp.int32), accept.astype(jnp.int32))


# --------------------------------------------------------------------------
# branch-rate sweep (prop_branch_rates, stree.c:10264)
# --------------------------------------------------------------------------


def brate_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Sweep every species-tree branch h; per-locus independent
    accept (each locus's rates are a priori independent)."""
    H = state.sp.n_nodes
    L = state.gt.n_loci
    logl_fn = make_logl_fn(ctx, cfg)
    eps = state.finetune[FT_BRATE]
    skip_root = cfg.clock == Clock.CORRELATED
    root = state.sp.root

    def body(h, carry):
        brate, lnrates, logl, kkey, nprop, nacc = carry
        kkey, k1, k2 = jax.random.split(kkey, 3)
        r = brate[:, h]
        r_new, dlog = jax.vmap(_logslide, in_axes=(0, 0, None))(
            jax.random.split(k1, L), r, eps)
        active = ctx.locus_mask
        if skip_root:
            active = active & (h != root)
        if state.sp.rate_nodes is not None:
            active = active & state.sp.rate_nodes[h]
        r_new = jnp.where(active, r_new, r)
        brate_new = brate.at[:, h].set(r_new)
        clock_new = state.clock._replace(brate=brate_new)
        logl_new = logl_fn(state.gt, state.subst, state.sp, clock_new,
                           mig=state.mig)
        lnr_new = lnprior_rates(cfg, state.sp, state.subst.mu, clock_new)
        lnacc = dlog + (logl_new - logl) + (lnr_new - lnrates)
        accept = (jnp.log(jax.random.uniform(k2, (L,))) < lnacc) & active
        brate = jnp.where(accept[:, None], brate_new, brate)
        lnrates = jnp.where(accept, lnr_new, lnrates)
        logl = jnp.where(accept, logl_new, logl)
        nprop = nprop + active.sum().astype(jnp.int32)
        nacc = nacc + accept.sum().astype(jnp.int32)
        return (brate, lnrates, logl, kkey, nprop, nacc)

    init = (state.clock.brate, state.clock.lnrates, state.logl, key,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    brate, lnrates, logl, _, nprop, nacc = jax.lax.fori_loop(
        0, H, body, init)
    new = state._replace(
        clock=state.clock._replace(brate=brate, lnrates=lnrates), logl=logl)
    return new, (nprop, nacc)


def brate_simple_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """SIMPLE clock (clock = 4): one shared rate per species branch
    scaled by mu_i; Gamma(a, a) iid prior (prop_branch_rates_simple,
    stree.c:10088)."""
    H = state.sp.n_nodes
    logl_fn = make_logl_fn(ctx, cfg)
    eps = state.finetune[FT_BRATE]
    a = cfg.clock_alpha

    rmask = state.sp.rate_nodes

    def body(h, carry):
        brate, logl, kkey, nprop, nacc = carry
        kkey, k1, k2 = jax.random.split(kkey, 3)
        r = brate[0, h]
        r_new, dlog = _logslide(k1, r, eps)
        if rmask is not None:
            r_new = jnp.where(rmask[h], r_new, r)
        brate_new = brate.at[0, h].set(r_new)
        clock_new = state.clock._replace(brate=brate_new)
        logl_new = logl_fn(state.gt, state.subst, state.sp, clock_new,
                           mig=state.mig)
        lnacc = (dlog + (a - 1.0) * jnp.log(r_new / r) - a * (r_new - r)
                 + _psum_if_sharded(jnp.sum(logl_new - logl)))
        accept = rng.mh_accept(k2, lnacc)
        brate = jnp.where(accept, brate_new, brate)
        logl = jnp.where(accept, logl_new, logl)
        return (brate, logl, kkey, nprop + 1, nacc + accept.astype(jnp.int32))

    init = (state.clock.brate, state.logl, key,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    brate, logl, _, nprop, nacc = jax.lax.fori_loop(0, H, body, init)
    clock_new = state.clock._replace(brate=brate)
    clock_new = clock_new._replace(
        lnrates=lnprior_rates(cfg, state.sp, state.subst.mu, clock_new))
    return state._replace(clock=clock_new, logl=logl), (nprop, nacc)


# --------------------------------------------------------------------------
# tip-dating overall mutation rate (prop_tipDate_muGtree, stree.c:9419)
# --------------------------------------------------------------------------


def tipdate_mubar_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Serial-sampling mutation-rate move (prop_tipDate_muGtree,
    stree.c:9419).

    ``state.mubar`` converts calendar sample dates into substitution
    units: tip ages are ``date * mubar``.  The proposal slides
    log(mubar) (bounded above so every dated constraint stays below its
    tau, find_maxMuGtree stree.c:9744), rescales every dated tip age to
    ``date * mubar'``, and affinely squashes each gene node inside a
    TIP population so the population's upper boundary (parent tau)
    stays fixed (prop_mu_updateCoal_recursive, stree.c:9698): with
    b = oldest descendant sample age and c = mubar'/mubar,

        h = (tau - b*c) / (tau - b),   t' = tau - h * (tau - t),

    each remapped node contributing log h to the Hastings ratio.  Gene
    nodes in ancestral populations and all taus are untouched; the move
    is rejected outright if the remap breaks parent>child ordering
    (stree.c:9506-9513).
    """
    from ..trees.gtree import assign_populations, topo_scan
    from .state import make_logpr_fn
    gt, sp = state.gt, state.sp
    L, N, T = gt.n_loci, gt.n_nodes, gt.n_tips
    NS = sp.n_tips
    dtype = sp.tau.dtype
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn(ctx)
    eps = state.finetune[FT_MUBAR]
    old = state.mubar
    k1, k2 = jax.random.split(key)

    # upper bound (find_maxMuGtree): mu' < min_h tau_h / date_lmax_h
    lmax = ctx.date_lmax
    ratio = jnp.where((lmax > 0) & (sp.tau > 0),
                      sp.tau / jnp.maximum(lmax, 1e-300), jnp.inf)
    bound = jnp.min(ratio)
    lbound = jnp.where(jnp.isfinite(bound), jnp.log(bound), LOG_BOUND)
    lold = jnp.log(old)
    lnew = rng.reflect(lold + eps * rng.bactrian(k1, dtype=eps.dtype),
                       -LOG_BOUND, lbound)
    new = jnp.exp(lnew)
    c = new / old

    pops = assign_populations(gt, sp, ctx.tip_pop)
    node_idx = jnp.arange(N)[None, :]
    is_tip = node_idx < ctx.n_seq[:, None]
    is_inner = (node_idx >= T) & (node_idx < T + ctx.n_seq[:, None] - 1)
    bmax = topo_scan(gt, gt.age[:, :T], jnp.maximum)            # [L, N]
    in_tip_pop = pops < NS
    ptau = sp.tau[jnp.maximum(sp.parent[pops], 0)]              # [L, N]
    squash = is_inner & in_tip_pop & (bmax > 0)
    h = jnp.where(squash, (ptau - bmax * c)
                  / jnp.maximum(ptau - bmax, 1e-300), 1.0)
    age_new = jnp.where(squash, ptau - h * (ptau - gt.age), gt.age)
    tip_new = jnp.where(is_tip[:, :T], ctx.tip_dates * new, 0.0)
    age_new = age_new.at[:, :T].set(tip_new.astype(dtype))
    jac = jnp.sum(jnp.where(squash & ctx.locus_mask[:, None],
                            jnp.log(jnp.maximum(h, 1e-300)), 0.0))

    # ordering check (stree.c:9506): reject if any child got older than
    # its parent under the per-node squash factors
    page_new = jnp.where(
        gt.parent >= 0,
        jnp.take_along_axis(age_new, jnp.maximum(gt.parent, 0), 1), jnp.inf)
    bad = jnp.any((is_tip | is_inner) & ctx.locus_mask[:, None]
                  & (gt.parent >= 0) & (age_new > page_new))
    bad = bad | jnp.any(jnp.where(squash, h, 1.0) <= 0.0)

    a_mu, b_mu = cfg.locusrate_mubar_a, cfg.locusrate_mubar_b
    lnacc = (lnew - lold
             + (a_mu - 1.0) * jnp.log(new / old) - b_mu * (new - old)
             + _psum_if_sharded(jac))

    gtn = gt._replace(age=age_new)
    logl_new = logl_fn(gtn, state.subst, sp, state.clock)
    logpr_new, c_new, t2_new = logpr_fn(gtn, sp, state.subst.heredity)
    lnacc = lnacc + _psum_if_sharded(jnp.sum(logl_new - state.logl))
    if cfg.theta_integrated:
        from . import notheta
        lnacc = lnacc + (
            notheta.total_integrated(cfg, c_new, t2_new,
                                     state.subst.heredity, ctx.locus_mask)
            - notheta.total_integrated(cfg, state.coal, state.t2h,
                                       state.subst.heredity, ctx.locus_mask))
    else:
        lnacc = lnacc + _psum_if_sharded(jnp.sum(logpr_new - state.logpr))

    accept = rng.mh_accept(k2, jnp.where(bad, -jnp.inf, lnacc))
    cand = state._replace(gt=gtn, logl=logl_new, logpr=logpr_new,
                          mubar=new)
    if cfg.theta_integrated:
        cand = cand._replace(coal=c_new, t2h=t2_new, logpr=state.logpr)
    new_state = jax.tree.map(
        lambda n, o: jnp.where(accept, n, o), cand, state)
    return new_state, (jnp.ones((), jnp.int32), accept.astype(jnp.int32))
