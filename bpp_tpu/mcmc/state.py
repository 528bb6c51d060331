"""MCMC state pytrees and likelihood glue.

The reference threads its state through ~50 mutable C structures; here
the whole sampler state is one immutable pytree, and every move is a
pure jitted function ``(ctx, state, key) -> state`` (SURVEY.md §7
design #3).  Rollback is ``jnp.where(accept, new, old)`` instead of
CLV index-swapping.
"""

from __future__ import annotations

import dataclasses
import functools
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
MV_GFRJ = 22         # geneflow rjMCMC route add/remove + flip
N_MOVES = 23


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


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("kind", "freqs_free", "q_free", "q_ref", "is_dna",
                 "aa_w", "aa_T", "aa_Ti"),
    meta_fields=("n_states", "any_freqs", "q_slots"))
@dataclasses.dataclass(frozen=True)
class CustomModels:
    """Per-locus substitution models (model = custom partition file).

    Static per-run constants derived from the partition assignments
    (method.c:3344-3352).  A registered pytree (NOT a NamedTuple) so
    the whole Ctx can be passed as a jit ARGUMENT — required under
    multihost, where sharded arrays may not be closure constants; the
    schedule-selecting fields ride the treedef as static metadata.
    Every DNA model is canonicalized into the GTR parameterization, so
    one eigendecomposition path covers the whole batch (SURVEY.md §7 #2).

    kind codes: 0 JC69, 1 two-param kappa family (K80/HKY/T92/F84),
    2 TN93, 3 GTR, 4 empirical AA.
    """

    kind: jax.Array        # [L] int32
    freqs_free: jax.Array  # [L] bool — locus samples base frequencies
    q_free: jax.Array      # [L, 6] bool — qrates slot is a proposal target
    q_ref: jax.Array       # [L] int32 — reference slot per locus
    is_dna: jax.Array      # [L] bool
    # fixed eigensystem for AA loci (zeros for DNA loci); None when the
    # batch has no AA partitions
    aa_w: jax.Array | None
    aa_T: jax.Array | None
    aa_Ti: jax.Array | None
    n_states: int                  # static: 4, or 20 when AA present
    any_freqs: bool                # static: schedule the freqs move
    q_slots: tuple[int, ...]       # static: slots free for >=1 locus


def build_custom_models(locus_models, n_loci: int, dtype) -> CustomModels:
    """Static per-locus model constants from the partition assignment.

    ``locus_models`` covers the real loci; padding loci (index >=
    len(locus_models)) are treated as JC69 with no free parameters.
    """
    _KIND = {SubstModel.JC69: 0, SubstModel.F81: 0, SubstModel.K80: 1,
             SubstModel.HKY: 1, SubstModel.T92: 1, SubstModel.F84: 1,
             SubstModel.TN93: 2, SubstModel.GTR: 3}
    _FREQS_FREE = {SubstModel.F81, SubstModel.HKY, SubstModel.T92,
                   SubstModel.TN93, SubstModel.F84, SubstModel.GTR}
    kind = np.zeros(n_loci, np.int32)
    freqs_free = np.zeros(n_loci, bool)
    q_free = np.zeros((n_loci, 6), bool)
    q_ref = np.ones(n_loci, np.int32)
    is_dna = np.ones(n_loci, bool)
    has_aa = any(m.is_aa for m in locus_models)
    S = 20 if has_aa else 4
    aa_w = np.zeros((n_loci, S)) if has_aa else None
    aa_T = np.zeros((n_loci, S, S)) if has_aa else None
    aa_Ti = np.zeros((n_loci, S, S)) if has_aa else None
    for i, m in enumerate(locus_models):
        if m.is_aa:
            kind[i] = 4
            is_dna[i] = False
            w, T, Ti, _ = pm.aa_eigen(m.name)
            aa_w[i], aa_T[i], aa_Ti[i] = w, T, Ti
            continue
        k = _KIND[m]
        kind[i] = k
        freqs_free[i] = m in _FREQS_FREE
        if k == 1:                       # (alpha, beta): slot 0 vs ref 1
            q_free[i, 0] = True
            q_ref[i] = 1
        elif k == 2:                     # TN93 (a1, a2, b): ref slot 2
            q_free[i, [0, 1]] = True
            q_ref[i] = 2
        elif k == 3:                     # GTR: all but the AG reference
            q_free[i, :] = True
            q_free[i, 1] = False
            q_ref[i] = 1
    q_slots = tuple(j for j in range(6) if q_free[:, j].any())
    as_j = lambda a: None if a is None else jnp.asarray(a, dtype)
    return CustomModels(
        kind=jnp.asarray(kind), freqs_free=jnp.asarray(freqs_free),
        q_free=jnp.asarray(q_free), q_ref=jnp.asarray(q_ref),
        is_dna=jnp.asarray(is_dna), aa_w=as_j(aa_w), aa_T=as_j(aa_T),
        aa_Ti=as_j(aa_Ti), n_states=S, any_freqs=bool(freqs_free.any()),
        q_slots=q_slots)


def expand_qrates(subst: SubstState, custom: CustomModels) -> jax.Array:
    """Per-locus GTR-layout (AC,AG,AT,CG,CT,GT) exchangeabilities.

    K80-family loci map (alpha, beta) -> kappa = q0/q1 on the
    transition slots; TN93 maps (a1, a2, b) -> kappa1 = q0/q2,
    kappa2 = q1/q2; JC69/AA loci are all-ones (unused for AA).
    """
    q = subst.qrates
    kind = custom.kind
    one = jnp.ones_like(q[:, 0])
    k1 = jnp.where(kind == 1, q[:, 0] / q[:, 1],
                   jnp.where(kind == 2, q[:, 0] / q[:, 2], one))
    k2 = jnp.where(kind == 1, q[:, 0] / q[:, 1],
                   jnp.where(kind == 2, q[:, 1] / q[:, 2], one))
    tn = jnp.stack([one, k1, one, one, k2, one], axis=1)
    return jnp.where((kind == 3)[:, None], q, tn)


def refresh_eigen(subst: SubstState, model: SubstModel,
                  custom: CustomModels | None = None) -> SubstState:
    """Recompute the cached eigendecomposition (GTR / custom loci)."""
    if model == SubstModel.CUSTOM:
        assert custom is not None
        exp = expand_qrates(subst, custom)
        if custom.n_states == 4:
            w, T, Tinv = pm.gtr_eigen(subst.freqs, exp)
        else:
            # mixed DNA/AA: 4-state eigen for DNA loci embedded in the
            # 20-state space (zero eigenvalues => identity on the AA
            # block); AA loci keep their fixed empirical eigensystems
            f4 = jnp.where(custom.is_dna[:, None], subst.freqs[:, :4], 0.25)
            w4, T4, Ti4 = pm.gtr_eigen(f4, exp)
            L = w4.shape[0]
            S = custom.n_states
            w = jnp.zeros((L, S), w4.dtype).at[:, :4].set(w4)
            eyeR = jnp.eye(S, dtype=w4.dtype)[None, 4:, 4:]
            T = jnp.zeros((L, S, S), w4.dtype).at[:, :4, :4].set(T4)
            T = T.at[:, 4:, 4:].set(eyeR)
            Tinv = jnp.zeros((L, S, S), w4.dtype).at[:, :4, :4].set(Ti4)
            Tinv = Tinv.at[:, 4:, 4:].set(eyeR)
            d = custom.is_dna
            w = jnp.where(d[:, None], w, custom.aa_w)
            T = jnp.where(d[:, None, None], T, custom.aa_T)
            Tinv = jnp.where(d[:, None, None], Tinv, custom.aa_Ti)
        return subst._replace(eigw=w, eigT=T, eigTi=Tinv)
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


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("tip_partials", "weights", "res_map", "res_count",
                 "n_seq", "tip_pop", "locus_mask", "tips_am", "n_pat",
                 "tip_dates", "date_lmax", "sp_constraint", "theta_link",
                 "prior_a11_log", "custom", "pack"),
    meta_fields=("trait_fn", "trait_fn_topo", "integrated"))
@dataclasses.dataclass(frozen=True)
class Ctx:
    """Static per-run device arrays (sharded along the locus axis).

    A registered pytree so the jitted step can take it as an ARGUMENT
    (multihost-sharded arrays may not be closure constants);
    ``trait_fn`` (a host closure) and ``integrated`` ride the treedef.
    """

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
    # real likelihood-pattern counts per locus: the Pallas kernel skips
    # whole 128-column tiles beyond this (padding costs ~nothing on the
    # TPU hot path — the zigzag load-balance analog, threads.c:265)
    n_pat: jax.Array | None = None
    # --- tip dating (datefile; gtree.c:1735 set_tip_date_infer) ---------
    # calendar sample dates per sequence (tip age = date * mubar) and
    # per-species-node max descendant date (the l_constraint of
    # gtree.c:1637 divided by mubar, so bounds track the sampled mubar)
    tip_dates: jax.Array | None = None   # [L, T] calendar units
    date_lmax: jax.Array | None = None   # [H] max calendar date below node
    # morphological traits: trait_logl(tau, brate) -> [n_part] closure
    # over the (fixed) species topology (trees.traits.make_trait_logl);
    # under species-tree search (A01) trait_fn is None and trait_fn_topo
    # (left, right, parent, tau, brate) is used instead, so the SPR/SNL
    # moves can re-score the proposed topology (stree.c:727-736)
    trait_fn: object | None = None
    trait_fn_topo: object | None = None
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
    # per-locus substitution models (model = custom partition file)
    custom: CustomModels | None = None
    # lane-packed likelihood layout (core.pallas_pack): built for
    # non-diploid DNA f32 runs; supersedes the per-locus kernel there
    pack: object | None = None
    # thetas integrated out ('e' flag): logpr_fn returns only the
    # theta-FREE per-locus density part (MSC-I phi terms + route
    # validity); the theta-marginalized lgamma terms live in
    # notheta.total_integrated over the (coal, t2h) caches
    integrated: bool = False


def compute_pmats(gt: GTrees, subst: SubstState, model: SubstModel,
                  blen=None):
    """Transition matrices for every (node, category): [L, N, C, A, A]."""
    if blen is None:
        blen = fe.branch_lengths(gt, subst.mu)              # [L, N]
    t_eff = blen[:, :, None] * subst.rates[:, None, :]      # [L, N, C]
    if model == SubstModel.CUSTOM:
        # per-locus models all ride the cached per-locus eigensystem
        # (canonical GTR expansion for DNA, empirical constants for AA)
        return pm.pmatrix_eigen(
            t_eff, subst.eigw[:, None, None, :],
            subst.eigT[:, None, None, :, :], subst.eigTi[:, None, None, :, :])
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

    def logl_fn(gt: GTrees, subst: SubstState, sp=None, clock=None,
                mig=None):
        if not usedata:
            return jnp.zeros(ctx.weights.shape[0], ctx.weights.dtype)
        if relaxed:
            if sp is None or clock is None:
                raise ValueError(
                    "relaxed clock: logl_fn requires (sp, clock)")
            brate = clock.brate
            if cfg.clock == Clock.SIMPLE:
                brate = brate * subst.mu[:, None]     # locus.c:1142
            if cfg.migration:
                # migrating edges change population mid-span: lengths
                # come from the sub-edge sweep (locus.c:1151 + miginfo)
                if mig is None:
                    raise ValueError("relaxed clock under migration: "
                                     "logl_fn requires mig")
                from ..trees import migration as mgmod
                pops = mgmod.assign_populations_mig(
                    gt, sp, ctx.tip_pop, mig, ctx.n_seq)
                blen = mgmod.relaxed_branch_lengths_mig(
                    gt, sp, mig, pops, ctx.n_seq, brate)
            else:
                pops = assign_populations(gt, sp, ctx.tip_pop)
                blen = fe.relaxed_branch_lengths(gt, sp, pops, brate)
            if ctx.pack is not None:
                # relaxed clocks ride the SAME packed CLV kernel as the
                # strict clock — only the branch lengths differ (the
                # reference likewise shares its SIMD CLV kernels across
                # clock modes, locus.c:1139-1151)
                from ..core.pallas_pack import site_logl_packed
                from ..trees.gtree import inner_order
                rk = jnp.concatenate(
                    [subst.rates, subst.kappa1[:, None],
                     subst.kappa2[:, None]], axis=1)
                ll = site_logl_packed(
                    ctx.pack, inner_order(gt), gt.left, gt.right,
                    gt.parent, ctx.n_seq, gt.age, subst.mu, rk,
                    subst.freqs, subst.eigw, subst.eigT, subst.eigTi,
                    model=model, n_cats=subst.rates.shape[1], blen=blen
                ).astype(ctx.weights.dtype)
            elif ctx.tips_am is not None:
                from ..core.pallas_fels import site_logl_pallas
                from ..trees.gtree import inner_order
                rk = jnp.concatenate(
                    [subst.rates, subst.kappa1[:, None],
                     subst.kappa2[:, None]], axis=1)
                site_logl = site_logl_pallas(
                    inner_order(gt), gt.left, gt.right, gt.parent,
                    ctx.n_seq, gt.age, subst.mu, rk, subst.freqs,
                    subst.eigw, subst.eigT, subst.eigTi, ctx.tips_am,
                    model=model, n_cats=subst.rates.shape[1], blen=blen,
                    n_pat=ctx.n_pat)
                ll = fe.reduce_root(site_logl.astype(ctx.weights.dtype),
                                    ctx.weights, ctx.res_map, ctx.res_count)
            else:
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
        if ctx.pack is not None:
            from ..core.pallas_pack import site_logl_packed
            from ..trees.gtree import inner_order
            rk = jnp.concatenate(
                [subst.rates, subst.kappa1[:, None], subst.kappa2[:, None]],
                axis=1)
            ll = site_logl_packed(
                ctx.pack, inner_order(gt), gt.left, gt.right, gt.parent,
                ctx.n_seq, gt.age, subst.mu, rk, subst.freqs, subst.eigw,
                subst.eigT, subst.eigTi, model=model,
                n_cats=subst.rates.shape[1]).astype(ctx.weights.dtype)
        elif ctx.tips_am is not None:
            from ..core.pallas_fels import site_logl_pallas
            from ..trees.gtree import inner_order
            rk = jnp.concatenate(
                [subst.rates, subst.kappa1[:, None], subst.kappa2[:, None]],
                axis=1)
            site_logl = site_logl_pallas(
                inner_order(gt), gt.left, gt.right, gt.parent, ctx.n_seq,
                gt.age, subst.mu, rk, subst.freqs, subst.eigw, subst.eigT,
                subst.eigTi, ctx.tips_am, model=model,
                n_cats=subst.rates.shape[1], n_pat=ctx.n_pat)
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
    proposals are simply rejected).

    When ``ctx.integrated`` (thetas integrated out, gtree.c:3780
    update_logpg_contrib), the per-locus value contains ONLY the
    theta-free terms — the MSC-I phi terms (the reference's hphi_sum)
    and the validity indicator; zeros for plain trees.  The
    theta-marginalized part couples loci and is computed from the
    returned (coal, T2h) by notheta.total_integrated."""

    def logpr_fn(gt: GTrees, sp: SpeciesArrays, heredity, msp=None):
        # msp: optional [L, N] species-MRCA of every gene node.  It is a
        # topology-only quantity, so moves that fix the gene-tree
        # topology (ages/taus/mixing) compute it ONCE and skip the
        # per-evaluation mrca topo-scan (the per-row gathers of that
        # scan dominate assign_populations at large L).
        if msp is not None and not sp.is_network:
            from ..trees.gtree import BIG_AGE, lift_population
            age = jnp.clip(gt.age, 0.0, BIG_AGE * 0.5)
            pops = lift_population(sp, msp, age)
        else:
            pops = assign_populations(gt, sp, ctx.tip_pop)
        if ctx.tip_dates is not None:
            c, t2, n_in = coal.per_pop_stats_dated(gt, sp, pops, ctx.n_seq)
        else:
            c, t2, n_in = coal.per_pop_stats(gt, sp, pops, ctx.n_seq)
        if ctx.integrated:
            lp = jnp.zeros(c.shape[0], t2.dtype)
        else:
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
