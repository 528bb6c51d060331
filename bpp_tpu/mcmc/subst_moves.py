"""Substitution- and rate-parameter moves, batched over loci.

Re-derives (SURVEY.md §2.3 moves #8, #11-13):

  * base frequencies  — locus.c:2634 ``propose_freqs``: pick a pair
    (j, k), slide the ratio x = f_j/(f_j+f_k), uniform Dirichlet prior.
  * Q-matrix rates    — locus.c:3167 ``propose_qrates``: log-slide each
    non-reference rate against the reference (A<->G for GTR, beta for
    the kappa models), Dirichlet(2,4,2,2,4,2) prior.
  * Gamma shape alpha — prop_gamma.c:54 ``propose_alpha``: log-slide,
    Gamma(a, b) prior, mean-discretized categories recomputed.
  * locus rates mu_i  — stree.c:9225 ``prop_locusrate_mui``.  The
    hierarchical-prior path is iid per locus and batches directly.  The
    Gamma-Dirichlet prior couples loci through S = sum(mu); the
    reference therefore runs a serial sweep with a running sum.  Here
    the move is re-designed TPU-first as two exact MH kernels that
    leave the same posterior invariant: (a) compensating-pair slides on
    random disjoint locus pairs (pair sums conserved, so the S terms of
    the joint density cancel), and (b) a global log-scale move on all
    mu with lnacc = dlogl + a_mubar*ln(c) - (b_mubar/L)(c-1)S (the
    S-exponent, Dirichlet exponents, Jacobian and Hastings terms of the
    GammaDir density collapse to this).
  * heredity scalars  — gtree.c:8214 ``prop_heredity``: slide mirrored
    at 0, Gamma(a_h, b_h) prior, affects only the MSC density.

Every likelihood-touching proposal recomputes the full batched
Felsenstein pass — one fused pass over all loci replaces the
reference's per-locus pmatrix/CLV buffer swaps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BppConfig, SubstModel
from ..core.gammarates import discrete_gamma_rates
from . import rng
from .state import (
    Ctx, FT_ALPHA, FT_FREQS, FT_LRHT, FT_QRATES, McmcState, SubstState,
    make_logl_fn, make_logpr_fn, refresh_eigen,
)

# number of free Q-matrix params and reference-rate index per model
# (locus.c:3197-3226)
QRATES_COUNT = {
    SubstModel.K80: (2, 1), SubstModel.HKY: (2, 1), SubstModel.T92: (2, 1),
    SubstModel.F84: (2, 1), SubstModel.TN93: (3, 2), SubstModel.GTR: (6, 1),
}
GTR_DIR_ALPHA = jnp.array([2.0, 4.0, 2.0, 2.0, 4.0, 2.0])  # locus.c:3190
FREQS_MODELS = (SubstModel.F81, SubstModel.HKY, SubstModel.T92,
                SubstModel.TN93, SubstModel.F84, SubstModel.GTR)


def _derive_kappas(subst: SubstState, model: SubstModel,
                   custom=None) -> SubstState:
    """kappa1/kappa2 from the qrates vector for the TN93 family."""
    if model == SubstModel.CUSTOM:
        q, kind = subst.qrates, custom.kind
        one = jnp.ones_like(q[:, 0])
        k1 = jnp.where(kind == 1, q[:, 0] / q[:, 1],
                       jnp.where(kind == 2, q[:, 0] / q[:, 2], one))
        k2 = jnp.where(kind == 1, q[:, 0] / q[:, 1],
                       jnp.where(kind == 2, q[:, 1] / q[:, 2], one))
        return subst._replace(kappa1=k1, kappa2=k2)
    if model in (SubstModel.K80, SubstModel.HKY, SubstModel.T92,
                 SubstModel.F84):
        k = subst.qrates[:, 0] / subst.qrates[:, 1]
        return subst._replace(kappa1=k, kappa2=k)
    if model == SubstModel.TN93:
        return subst._replace(kappa1=subst.qrates[:, 0] / subst.qrates[:, 2],
                              kappa2=subst.qrates[:, 1] / subst.qrates[:, 2])
    return subst


def freqs_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    L = state.gt.n_loci
    subst = state.subst
    lidx = jnp.arange(L)
    eps = state.finetune[FT_FREQS]
    kj, kk, ks, ka = jax.random.split(key, 4)
    # under per-locus models only loci whose model has free frequencies
    # participate (always the first 4 states: AA freqs are fixed)
    free = ctx.locus_mask if ctx.custom is None \
        else ctx.locus_mask & ctx.custom.freqs_free

    f = subst.freqs
    j = jax.random.randint(kj, (L,), 0, 4)
    k = jax.random.randint(kk, (L,), 0, 3)
    k = jnp.where(k >= j, k + 1, k)
    fj = f[lidx, j]
    fk = f[lidx, k]
    s = fj + fk
    minv = 1e-8 / jnp.maximum(s, 1e-30)   # PLL_MISC_EPSILON bound
    y = rng.reflect(fj / jnp.maximum(s, 1e-30)
                    + eps * rng.bactrian(ks, (L,), dtype=eps.dtype),
                    minv, 1.0 - minv)
    fnew = f.at[lidx, j].set(y * s)
    fnew = fnew.at[lidx, k].set(s - y * s)
    fnew = jnp.where(free[:, None], fnew, f)

    subst_new = refresh_eigen(subst._replace(freqs=fnew), cfg.model,
                              ctx.custom)
    logl_new = make_logl_fn(ctx, cfg)(state.gt, subst_new, state.sp,
                                      state.clock, mig=state.mig)
    lnacc = logl_new - state.logl         # uniform Dirichlet prior, symmetric
    accept = rng.mh_accept(ka, lnacc) & free
    L_ = accept.shape[0]
    subst = jax.tree.map(
        lambda n, o: jnp.where(
            accept.reshape((L_,) + (1,) * (o.ndim - 1)), n, o),
        subst_new, subst)
    logl = jnp.where(accept, logl_new, state.logl)
    nprop = free.sum(dtype=jnp.int32)
    return (state._replace(subst=subst, logl=logl),
            (nprop, accept.sum(dtype=jnp.int32)))


def qrates_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Sequential sweep over non-reference rates, each batched over loci."""
    if cfg.model == SubstModel.CUSTOM:
        return _qrates_move_custom(ctx, cfg, state, key)
    L = state.gt.n_loci
    count, ref = QRATES_COUNT[cfg.model]
    lidx = jnp.arange(L)
    eps = state.finetune[FT_QRATES]
    logl_fn = make_logl_fn(ctx, cfg)
    targets = [j for j in range(count) if j != ref]

    subst, logl = state.subst, state.logl
    nacc = jnp.zeros((), jnp.int32)
    for t, j in enumerate(targets):
        ks, ka = jax.random.split(jax.random.fold_in(key, t))
        q = subst.qrates
        s = q[:, j] + q[:, ref]
        lo = jnp.log(jnp.full((L,), 1e-5))
        hi = jnp.log(s)
        old_lg = jnp.log(q[:, j])
        new_lg = rng.reflect(old_lg + eps * rng.bactrian(ks, (L,), dtype=eps.dtype), lo, hi)
        qnew = q.at[:, j].set(jnp.exp(new_lg))
        qnew = qnew.at[:, ref].set(s - jnp.exp(new_lg))

        subst_new = refresh_eigen(
            _derive_kappas(subst._replace(qrates=qnew), cfg.model), cfg.model)
        logl_new = logl_fn(state.gt, subst_new, state.sp, state.clock,
                           mig=state.mig)
        aj, ar = GTR_DIR_ALPHA[j], GTR_DIR_ALPHA[ref]
        lnacc = (new_lg - old_lg) + (logl_new - logl) \
            + (aj - 1.0) * (new_lg - old_lg) \
            + (ar - 1.0) * jnp.log(qnew[:, ref] / q[:, ref])
        accept = rng.mh_accept(ka, lnacc) & ctx.locus_mask
        subst = jax.tree.map(
            lambda n, o: jnp.where(
                accept.reshape((L,) + (1,) * (o.ndim - 1)), n, o),
            subst_new, subst)
        logl = jnp.where(accept, logl_new, logl)
        nacc = nacc + accept.sum(dtype=jnp.int32)
    nprop = len(targets) * ctx.locus_mask.sum(dtype=jnp.int32)
    return state._replace(subst=subst, logl=logl), (nprop, nacc)


def _qrates_move_custom(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Per-locus-model qrates sweep (model = custom).

    Same slot-vs-reference log-slide as the homogeneous move, but the
    reference slot and the set of free slots vary per locus
    (state.CustomModels); loci whose model does not free slot j sit out
    that round.
    """
    cm = ctx.custom
    L = state.gt.n_loci
    lidx = jnp.arange(L)
    eps = state.finetune[FT_QRATES]
    logl_fn = make_logl_fn(ctx, cfg)

    subst, logl = state.subst, state.logl
    nprop = jnp.zeros((), jnp.int32)
    nacc = jnp.zeros((), jnp.int32)
    for t, j in enumerate(cm.q_slots):
        ks, ka = jax.random.split(jax.random.fold_in(key, t))
        free_j = cm.q_free[:, j] & ctx.locus_mask
        q = subst.qrates
        qref = q[lidx, cm.q_ref]
        s = q[:, j] + qref
        lo = jnp.log(jnp.full((L,), 1e-5))
        hi = jnp.log(s)
        old_lg = jnp.log(q[:, j])
        new_lg = rng.reflect(
            old_lg + eps * rng.bactrian(ks, (L,), dtype=eps.dtype), lo, hi)
        qnew = q.at[:, j].set(jnp.exp(new_lg))
        qnew = qnew.at[lidx, cm.q_ref].set(s - jnp.exp(new_lg))
        qnew = jnp.where(free_j[:, None], qnew, q)

        subst_new = refresh_eigen(
            _derive_kappas(subst._replace(qrates=qnew), cfg.model, cm),
            cfg.model, cm)
        logl_new = logl_fn(state.gt, subst_new, state.sp, state.clock,
                           mig=state.mig)
        aj = GTR_DIR_ALPHA[j]
        ar = GTR_DIR_ALPHA[cm.q_ref]
        ref_ratio = jnp.log(
            jnp.where(free_j, qnew[lidx, cm.q_ref] / jnp.maximum(qref, 1e-300),
                      1.0))
        lnacc = (new_lg - old_lg) + (logl_new - logl) \
            + (aj - 1.0) * (new_lg - old_lg) + (ar - 1.0) * ref_ratio
        accept = rng.mh_accept(ka, lnacc) & free_j
        subst = jax.tree.map(
            lambda n, o: jnp.where(
                accept.reshape((L,) + (1,) * (o.ndim - 1)), n, o),
            subst_new, subst)
        logl = jnp.where(accept, logl_new, logl)
        nprop = nprop + free_j.sum(dtype=jnp.int32)
        nacc = nacc + accept.sum(dtype=jnp.int32)
    return state._replace(subst=subst, logl=logl), (nprop, nacc)


def alpha_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    L = state.gt.n_loci
    C = state.subst.rates.shape[1]
    a0, b0 = cfg.alphaprior.alpha, cfg.alphaprior.beta
    eps = state.finetune[FT_ALPHA]
    ks, ka = jax.random.split(key)

    alpha = state.subst.alpha
    loga = jnp.log(alpha)
    loga_new = rng.reflect(loga + eps * rng.bactrian(ks, (L,), dtype=eps.dtype), -99.0, 99.0)
    alpha_new = jnp.exp(loga_new)
    rates_new = jax.vmap(lambda a: discrete_gamma_rates(a, C))(alpha_new)

    subst_new = state.subst._replace(alpha=alpha_new,
                                     rates=rates_new.astype(alpha.dtype))
    logl_new = make_logl_fn(ctx, cfg)(state.gt, subst_new, state.sp,
                                      state.clock, mig=state.mig)
    lnacc = (loga_new - loga) + (logl_new - state.logl) \
        + (a0 - 1.0) * (loga_new - loga) - b0 * (alpha_new - alpha)
    accept = rng.mh_accept(ka, lnacc) & ctx.locus_mask
    subst = state.subst._replace(
        alpha=jnp.where(accept, alpha_new, alpha),
        rates=jnp.where(accept[:, None], subst_new.rates, state.subst.rates))
    logl = jnp.where(accept, logl_new, state.logl)
    return (state._replace(subst=subst, logl=logl),
            (ctx.locus_mask.sum(dtype=jnp.int32), accept.sum(dtype=jnp.int32)))


def _mu_logl(ctx, cfg, state, mu_new):
    subst_new = state.subst._replace(mu=mu_new)
    return subst_new, make_logl_fn(ctx, cfg)(
        state.gt, subst_new, state.sp, state.clock, mig=state.mig)


def locusrate_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """mu_i moves; the clock is global so mu changes the likelihood."""
    L = state.gt.n_loci
    eps = state.finetune[FT_LRHT]
    a_mui = cfg.locusrate_alpha
    nprop = jnp.zeros((), jnp.int32)
    nacc = jnp.zeros((), jnp.int32)

    if cfg.locusrate_prior == 1:      # HIERARCHICAL: iid conditional
        ks, ka = jax.random.split(key)
        mu = state.subst.mu
        logm = jnp.log(mu)
        logm_new = rng.reflect(logm + eps * rng.bactrian(ks, (L,), dtype=eps.dtype),
                               -99.0, 99.0)
        mu_new = jnp.exp(logm_new)
        subst_new, logl_new = _mu_logl(ctx, cfg, state, mu_new)
        b = a_mui / cfg.locusrate_mubar
        lnacc = (logm_new - logm) + (logl_new - state.logl) \
            + (a_mui - 1.0) * (logm_new - logm) - b * (mu_new - mu)
        accept = rng.mh_accept(ka, lnacc) & ctx.locus_mask
        mu = jnp.where(accept, mu_new, mu)
        logl = jnp.where(accept, logl_new, state.logl)
        state = state._replace(subst=state.subst._replace(mu=mu), logl=logl)
        nprop += ctx.locus_mask.sum(dtype=jnp.int32)
        nacc += accept.sum(dtype=jnp.int32)
        return state, (nprop, nacc)

    # GammaDir / Dir: compensating pairs + (GammaDir only) global scale
    kp, ks, ka, kc, kca = jax.random.split(key, 5)
    perm = jax.random.permutation(kp, L)
    n_pairs = L // 2
    pi = perm[:n_pairs]
    pj = perm[n_pairs:2 * n_pairs]
    valid = ctx.locus_mask[pi] & ctx.locus_mask[pj]

    mu = state.subst.mu
    s = mu[pi] + mu[pj]
    minv = 1e-8 / s
    x = mu[pi] / s
    y = rng.reflect(x + eps * rng.bactrian(ks, (n_pairs,), dtype=eps.dtype), minv, 1.0 - minv)
    mu_new = mu.at[pi].set(jnp.where(valid, y * s, mu[pi]))
    mu_new = mu_new.at[pj].set(jnp.where(valid, s - y * s, mu[pj]))

    subst_new, logl_new = _mu_logl(ctx, cfg, state, mu_new)
    dlogl = logl_new - state.logl
    pair_lnacc = dlogl[pi] + dlogl[pj] + (a_mui - 1.0) * (
        jnp.log(mu_new[pi] * mu_new[pj]) - jnp.log(mu[pi] * mu[pj]))
    accept_p = rng.mh_accept(ka, pair_lnacc) & valid
    accept = jnp.zeros((L,), bool).at[pi].set(accept_p).at[pj].set(accept_p)
    mu = jnp.where(accept, mu_new, mu)
    logl = jnp.where(accept, logl_new, state.logl)
    state = state._replace(subst=state.subst._replace(mu=mu), logl=logl)
    nprop += valid.sum(dtype=jnp.int32)
    nacc += accept_p.sum(dtype=jnp.int32)

    if cfg.locusrate_prior == 0 and cfg.locusrate_mubar_est:
        # global log-scale move on all mu (see module docstring)
        a_mubar, b_mubar = cfg.locusrate_mubar_a, cfg.locusrate_mubar_b
        nl = ctx.locus_mask.sum()
        lnc = eps * rng.bactrian(kc, dtype=eps.dtype)
        c = jnp.exp(lnc)
        mu_sc = jnp.where(ctx.locus_mask, mu * c, mu)
        subst_sc, logl_sc = _mu_logl(ctx, cfg, state, mu_sc)
        S = jnp.sum(jnp.where(ctx.locus_mask, mu, 0.0))
        lnacc = (jnp.sum(jnp.where(ctx.locus_mask, logl_sc - state.logl, 0.0))
                 + a_mubar * lnc - (b_mubar / nl) * (c - 1.0) * S)
        acc = rng.mh_accept(kca, lnacc)
        mu = jnp.where(acc, mu_sc, mu)
        logl = jnp.where(acc, logl_sc, state.logl)
        state = state._replace(subst=state.subst._replace(mu=mu), logl=logl)
        nprop += 1
        nacc += acc.astype(jnp.int32)

    return state, (nprop, nacc)


def heredity_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Batched prop_heredity: affects only the MSC density."""
    L = state.gt.n_loci
    eps = state.finetune[FT_LRHT]
    ks, ka = jax.random.split(key)
    h = state.subst.heredity
    h_new = jnp.abs(h + eps * rng.bactrian(ks, (L,), dtype=eps.dtype))
    h_new = jnp.maximum(h_new, 1e-300)

    h_new = jnp.where(ctx.locus_mask, h_new, h)
    dprior = (cfg.heredity_alpha - 1.0) * jnp.log(h_new / h) \
        - cfg.heredity_beta * (h_new - h)
    if cfg.theta_integrated:
        # gt unchanged: only the heredity scaling of C_h moves
        from . import notheta
        accept = notheta.scan_accept(
            ka, cfg, dprior, state.coal, state.t2h, h,
            state.coal, state.t2h, h_new, ctx.locus_mask, ctx.locus_mask)
        h = jnp.where(accept, h_new, h)
        return (state._replace(subst=state.subst._replace(heredity=h)),
                (ctx.locus_mask.sum(dtype=jnp.int32),
                 accept.sum(dtype=jnp.int32)))
    logpr_fn = make_logpr_fn(ctx)
    logpr_new, _, _ = logpr_fn(state.gt, state.sp, h_new)
    lnacc = dprior + (logpr_new - state.logpr)
    accept = rng.mh_accept(ka, lnacc) & ctx.locus_mask
    h = jnp.where(accept, h_new, h)
    logpr = jnp.where(accept, logpr_new, state.logpr)
    return (state._replace(subst=state.subst._replace(heredity=h),
                           logpr=logpr),
            (ctx.locus_mask.sum(dtype=jnp.int32), accept.sum(dtype=jnp.int32)))
