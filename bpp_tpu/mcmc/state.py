"""MCMC state pytrees and likelihood glue.

The reference threads its state through ~50 mutable C structures; here
the whole sampler state is one immutable pytree, and every move is a
pure jitted function ``(ctx, state, key) -> state`` (SURVEY.md §7
design #3).  Rollback is ``jnp.where(accept, new, old)`` instead of
CLV index-swapping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BppConfig, PriorDist, SubstModel
from ..core import felsenstein as fe
from ..core import pmatrix as pm
from ..core.gammarates import discrete_gamma_rates
from ..trees import coalescent as coal
from ..trees.gtree import (
    GTrees, SpeciesArrays, assign_populations, species_arrays,
)

# finetune slot indices (mirrors the reference's finetune vector order,
# cfile.c:3199 / method.c pjump bookkeeping)
FT_GTAGE = 0
FT_GTSPR = 1
FT_THETA = 2
FT_TAU = 3
FT_MIX = 4
FT_LRHT = 5
FT_PHI = 6
FT_FREQS = 7
FT_QRATES = 8
FT_ALPHA = 9
FT_MUI = 10
FT_NUI = 11
FT_MUBAR = 12
FT_NUBAR = 13
FT_BRATE = 14
FT_MIGRATES = 15
FT_MIG_AGES = 16
FT_BRATE_M = 17      # trait branch rates (opt_finetune_brate_m)
N_FINETUNE = 18

# move-statistics slots (proposed, accepted) per move family
MV_GTAGE = 0
MV_GTSPR = 1
MV_THETA = 2
MV_TAU = 3
MV_MIX = 4
MV_LRHT = 5
MV_FREQS = 6
MV_QRATES = 7
MV_ALPHA = 8
MV_PHI = 9
MV_RJ = 10
MV_SSPR = 11
MV_SNL = 12
MV_HPATH = 13
MV_MUI = 14
MV_NUI = 15
MV_MUBAR = 16
MV_NUBAR = 17
MV_BRATE = 18
MV_MIGRATES = 19
MV_MIG_AGES = 20
MV_TRAIT = 21        # trait branch rates (prop_branch_rates_trait)
N_MOVES = 22


class SubstState(NamedTuple):
    """Per-locus substitution-model parameters."""

    freqs: jax.Array     # [L, 4]
    kappa1: jax.Array    # [L]
    kappa2: jax.Array    # [L]
    qrates: jax.Array    # [L, 6]
    alpha: jax.Array     # [L] gamma shape (unused when C == 1)
    rates: jax.Array     # [L, C] category rates (derived from alpha)
    mu: jax.Array        # [L] locus rate
    heredity: jax.Array  # [L]
    # cached GTR eigendecomposition (pll_update_eigen analog): depends
    # only on (freqs, qrates); refreshed by refresh_eigen() when either
    # moves, NOT recomputed per edge
    eigw: jax.Array      # [L, 4]
    eigT: jax.Array      # [L, 4, 4]
    eigTi: jax.Array     # [L, 4, 4]


def refresh_eigen(subst: SubstState, model: SubstModel) -> SubstState:
    """Recompute the cached eigendecomposition (GTR only)."""
    if model != SubstModel.GTR:
        return subst
    w, T, Tinv = pm.gtr_eigen(subst.freqs, subst.qrates)
    return subst._replace(eigw=w, eigT=T, eigTi=Tinv)


class ClockState(NamedTuple):
    """Relaxed-clock state (clock = 2 IID / 3 CORR / 4 SIMPLE).

    ``brate[l, h]`` is the substitution rate of species-tree branch h at
    locus l (``snode->brate[msa_index]``); for the SIMPLE clock the
    leading axis is 1 (one shared rate per branch, scaled by mu_i,
    locus.c:1142).  ``nu`` is the per-locus rate variance nu_i,
    ``nubar``/``mubar`` the hierarchical means, ``lnrates`` the cached
    per-locus branch-rate prior (gtree->lnprior_rates).
    """

    brate: jax.Array     # [L, H] (or [1, H] for SIMPLE)
    nu: jax.Array        # [L]
    mubar: jax.Array     # [] hierarchical locus-rate mean
    nubar: jax.Array     # [] hierarchical rate-variance mean
    lnrates: jax.Array   # [L] cached lnprior_rates


class McmcState(NamedTuple):
    gt: GTrees
    sp: SpeciesArrays
    subst: SubstState
    logl: jax.Array      # [L] cached log-likelihood
    logpr: jax.Array     # [L] cached MSC log-density (theta-estimated path)
    finetune: jax.Array  # [N_FINETUNE]
    clock: ClockState | None = None
    # theta-integrated-out caches (None on the theta-estimated path):
    # per-locus coalescent counts / waiting-time sums per population
    # (the tensors behind notheta_logpr, see mcmc.notheta)
    coal: jax.Array | None = None    # [L, H] int32
    t2h: jax.Array | None = None     # [L, H]
    # MSC-M migration events + rates (None without migration)
    mig: object | None = None        # trees.migration.MigState
    # tip dating (locusrate = 3 / MUTRATE_ONLY): the overall mutation
    # rate converting calendar dates to substitution units; tip ages are
    # tip_dates * mubar (stree.c:9419 prop_tipDate_muGtree)
    mubar: jax.Array | None = None   # [] scalar
    # morphological traits (traitfile; morph.c trait_t per snode):
    # per-partition branch rates + cached trait log-likelihoods
    trait: object | None = None      # trees.traits.TraitState


class Ctx(NamedTuple):
    """Static per-run device arrays (sharded along the locus axis)."""

    tip_partials: jax.Array  # [L, T, S, A]
    weights: jax.Array       # [L, W]
    res_map: jax.Array       # [L, W, R] resolution columns per weight pattern
    res_count: jax.Array     # [L, W]
    n_seq: jax.Array         # [L]
    tip_pop: jax.Array       # [L, T]
    locus_mask: jax.Array    # [L] bool
    # A-major tip partials [L, T, A, S'] with S' padded to a multiple of
    # 128; present only when the Pallas likelihood kernel is enabled
    tips_am: jax.Array | None = None
    # --- tip dating (datefile; gtree.c:1735 set_tip_date_infer) ---------
    # calendar sample dates per sequence (tip age = date * mubar) and
    # per-species-node max descendant date (the l_constraint of
    # gtree.c:1637 divided by mubar, so bounds track the sampled mubar)
    tip_dates: jax.Array | None = None   # [L, T] calendar units
    date_lmax: jax.Array | None = None   # [H] max calendar date below node
    # morphological traits: trait_logl(tau, brate) -> [n_part] closure
    # over the (fixed) species topology (trees.traits.make_trait_logl)
    trait_fn: object | None = None
    # A01 topology constraints (constraintfile): per-species-node
    # constraint-group ids, 0 = unconstrained (snode->constraint,
    # io.constraints.build_constraint_ids)
    sp_constraint: jax.Array | None = None   # [H] int
    # linked-theta models (thetamodel; init_theta_linkage stree.c:2427):
    # theta OWNER per node; thetas within a group are one parameter
    theta_link: jax.Array | None = None      # [H] int32
    # A11 species-count prior masses (delimit.c partition_fast
    # prior_A11): log P(class with tau_count active taus); present only
    # for A11 with speciesmodelprior >= 2
    prior_a11_log: jax.Array | None = None   # [NS]


def compute_pmats(gt: GTrees, subst: SubstState, model: SubstModel,
                  blen=None):
    """Transition matrices for every (node, category): [L, N, C, A, A]."""
    if blen is None:
        blen = fe.branch_lengths(gt, subst.mu)              # [L, N]
    t_eff = blen[:, :, None] * subst.rates[:, None, :]      # [L, N, C]
    if model == SubstModel.JC69:
        return pm.pmatrix_jc69(t_eff)
    if model in (SubstModel.K80, SubstModel.F81, SubstModel.HKY,
                 SubstModel.T92, SubstModel.TN93, SubstModel.F84):
        f = subst.freqs[:, None, None, :]
        return pm.pmatrix_tn93(t_eff, f, subst.kappa1[:, None, None],
                               subst.kappa2[:, None, None])
    if model == SubstModel.GTR:
        return pm.pmatrix_eigen(
            t_eff, subst.eigw[:, None, None, :],
            subst.eigT[:, None, None, :, :], subst.eigTi[:, None, None, :, :])
    if model.is_aa:
        return pm.pmatrix_aa(t_eff, model.name)
    raise NotImplementedError(model)


def make_logl_fn(ctx: Ctx, cfg: BppConfig):
    """Returns logl(gt, subst, sp=None, clock=None) -> [L]; bfbeta
    scales like the power posterior (locus.c:2630 opt_bfbeta * logl).

    Under a relaxed clock (cfg.clock != GLOBAL) ``sp`` and ``clock``
    are REQUIRED — branch lengths depend on the species-tree taus and
    per-branch rates, so every move that changes gene ages, taus or
    rates must pass its candidate sp/clock."""
    from ..config import Clock
    usedata = cfg.usedata
    model = cfg.model
    bfbeta = cfg.bfbeta
    relaxed = cfg.clock != Clock.GLOBAL

    def logl_fn(gt: GTrees, subst: SubstState, sp=None, clock=None):
        if not usedata:
            return jnp.zeros(ctx.weights.shape[0], ctx.weights.dtype)
        if relaxed:
            if sp is None or clock is None:
                raise ValueError(
                    "relaxed clock: logl_fn requires (sp, clock)")
            brate = clock.brate
            if cfg.clock == Clock.SIMPLE:
                brate = brate * subst.mu[:, None]     # locus.c:1142
            pops = assign_populations(gt, sp, ctx.tip_pop)
            blen = fe.relaxed_branch_lengths(gt, sp, pops, brate)
            pmats = compute_pmats(gt, subst, model, blen=blen)
            cw = jnp.full((subst.rates.shape[1],),
                          1.0 / subst.rates.shape[1], ctx.weights.dtype)
            ll = fe.loglikelihood(gt, ctx.tip_partials, ctx.weights,
                                  ctx.n_seq, pmats, subst.freqs, cw,
                                  res_map=ctx.res_map,
                                  res_count=ctx.res_count)
            if bfbeta != 1.0:
                ll = ll * bfbeta
            return jnp.where(ctx.locus_mask, ll, 0.0)
        if ctx.tips_am is not None:
            from ..core.pallas_fels import site_logl_pallas
            from ..trees.gtree import inner_order
            rk = jnp.concatenate(
                [subst.rates, subst.kappa1[:, None], subst.kappa2[:, None]],
                axis=1)
            site_logl = site_logl_pallas(
                inner_order(gt), gt.left, gt.right, ctx.n_seq, gt.age,
                subst.mu, rk, subst.freqs, subst.eigw, subst.eigT,
                subst.eigTi, ctx.tips_am, model=model,
                n_cats=subst.rates.shape[1])
            ll = fe.reduce_root(site_logl.astype(ctx.weights.dtype),
                                ctx.weights, ctx.res_map, ctx.res_count)
        else:
            pmats = compute_pmats(gt, subst, model)
            cw = jnp.full((subst.rates.shape[1],),
                          1.0 / subst.rates.shape[1], ctx.weights.dtype)
            ll = fe.loglikelihood(gt, ctx.tip_partials, ctx.weights,
                                  ctx.n_seq, pmats, subst.freqs, cw,
                                  res_map=ctx.res_map,
                                  res_count=ctx.res_count)
        if bfbeta != 1.0:
            ll = ll * bfbeta
        return jnp.where(ctx.locus_mask, ll, 0.0)

    return logl_fn


def make_logpr_fn(ctx: Ctx):
    """Returns logpr(gt, sp) -> ([L], coal [L,H], T2h [L,H]).

    For MSC-I networks the density adds the per-hybridization
    seqin*log(phi) terms (gtree.c:3925-3931) and an -inf validity
    indicator when a coalescence's two child routes disagree (the
    reference maintains that invariant structurally; here inconsistent
    proposals are simply rejected)."""

    def logpr_fn(gt: GTrees, sp: SpeciesArrays, heredity):
        pops = assign_populations(gt, sp, ctx.tip_pop)
        if ctx.tip_dates is not None:
            c, t2, n_in = coal.per_pop_stats_dated(gt, sp, pops, ctx.n_seq)
        else:
            c, t2, n_in = coal.per_pop_stats(gt, sp, pops, ctx.n_seq)
        contrib = coal.msc_contrib(c, t2, sp.theta, heredity)
        lp = contrib.sum(1)
        if sp.is_network:
            from ..trees.gtree import route_consistent
            lphi = jnp.where(sp.hindex >= 0,
                             jnp.log(jnp.maximum(sp.phi, 1e-300)), 0.0)
            n_eff = coal.phi_entry_counts(sp, n_in)
            lp = lp + jnp.sum(n_eff * lphi[None, :], axis=1)
            ok = route_consistent(gt, sp, pops, ctx.n_seq)
            lp = jnp.where(ok, lp, -jnp.inf)
        lp = jnp.where(ctx.locus_mask, lp, 0.0)
        return lp, c, t2

    return logpr_fn


def finetune_array(cfg: BppConfig, dtype=jnp.float64) -> jax.Array:
    ft = cfg.finetune
    vals = np.zeros(N_FINETUNE)
    vals[FT_GTAGE] = ft.gtage
    vals[FT_GTSPR] = ft.gtspr
    vals[FT_THETA] = ft.theta
    vals[FT_TAU] = ft.tau
    vals[FT_MIX] = ft.mix
    vals[FT_LRHT] = ft.locusrate
    vals[FT_PHI] = ft.phi
    vals[FT_FREQS] = ft.freqs
    vals[FT_QRATES] = ft.qrates
    vals[FT_ALPHA] = ft.alpha
    vals[FT_MUI] = ft.mui
    vals[FT_NUI] = ft.nui
    vals[FT_MUBAR] = ft.mubar
    vals[FT_NUBAR] = ft.nubar
    vals[FT_BRATE] = ft.branchrate
    vals[FT_MIGRATES] = ft.migrates
    vals[FT_MIG_AGES] = ft.mig_ages
    vals[FT_BRATE_M] = ft.brate_m
    return jnp.asarray(vals, dtype)
