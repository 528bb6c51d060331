"""MSC-I (introgression network) moves: phi, network taus, hpath.

Re-derivations of the reference's MSC-I proposal set on the derived
route representation (gene-node populations are computed from ages +
per-edge hybridization flags, never book-kept):

  * phi Gibbs     — stree.c:1593 ``propose_phi_gibbs``: the full
    conditional of phi given the routes is Beta(p + sum_l n_main,
    q + sum_l n_mirror) because the density's phi terms are exactly
    seqin_main*log(phi) + seqin_mirror*log(1-phi) per locus
    (gtree.c:3925-3931); an exact Gibbs draw, always accepted.
  * network tau rubber band — propose_tau (stree.c:5512) MSC-I
    variants (stree.c:5544-5611): hybridization taus move as one unit
    (hinner + mirror + htau==0-tied parents) and gene-node ages in the
    affected populations rubber-band along (stree.c:4413-4422).
  * hpath repath  — the MSC-I part of propose_ages (gtree.c:4726-4905):
    for blocks of independent coalescences, re-pick the node's
    population uniformly among the candidates compatible with its age
    (candidate counts cancel since ages are unchanged) and re-sample
    the three incident edges' hybridization flags phi-weighted and
    endpoint-conditioned (``sample_hpath`` gtree.c:4225); the Hastings
    ratio is the reverse/forward path-proposal probability.  Ages and
    topology are untouched, so under the strict clock the likelihood is
    unchanged and the move only re-costs the MSC density; under a
    relaxed clock the re-routed edges change their rate-weighted
    lengths and the likelihood delta is included.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BppConfig, PriorDist
from ..trees import coalescent as coalmod
from ..trees.gtree import (
    SpeciesArrays, assign_populations, node_depths,
)
from . import rng
from .moves import _psum_if_sharded
from .state import Ctx, FT_TAU, McmcState, make_logl_fn, make_logpr_fn


# --------------------------------------------------------------------------
# phi Gibbs
# --------------------------------------------------------------------------


def phi_gibbs_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Exact Gibbs update of every hybridization's phi."""
    gt, sp = state.gt, state.sp
    HY = sp.n_hybrids
    pops = assign_populations(gt, sp, ctx.tip_pop)
    _, _, n_in = coalmod.per_pop_stats(gt, sp, pops, ctx.n_seq)
    n_in = coalmod.phi_entry_counts(sp, n_in)       # BDI-corrected counts
    n_in = jnp.where(ctx.locus_mask[:, None], n_in, 0)
    tot = n_in.sum(0)                                    # [H]
    p0 = cfg.phiprior.alpha if cfg.phiprior else 1.0
    q0 = cfg.phiprior.beta if cfg.phiprior else 1.0

    hin = sp.hslot                                       # [HY]
    mir = sp.hybrid[hin]
    a = p0 + tot[hin].astype(sp.phi.dtype)
    b = q0 + tot[mir].astype(sp.phi.dtype)
    draw = jax.random.beta(key, a, b, dtype=sp.phi.dtype)
    draw = jnp.clip(draw, 1e-9, 1.0 - 1e-9)
    phi = sp.phi.at[hin].set(draw).at[mir].set(1.0 - draw)
    sp_new = sp._replace(phi=phi)
    # phi enters only the seqin*log(phi) terms; refresh cached logpr
    logpr_fn = make_logpr_fn(ctx)
    logpr_new, _, _ = logpr_fn(gt, sp_new, state.subst.heredity)
    new_state = state._replace(sp=sp_new, logpr=logpr_new)
    return new_state, (jnp.asarray(HY, jnp.int32), jnp.asarray(HY, jnp.int32))


# --------------------------------------------------------------------------
# network tau slide
# --------------------------------------------------------------------------


def tau_move_net(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Rubber-band slide of every free tau (normal inners +
    hybridization tied units), the MSC-I variant of ``propose_tau``
    (stree.c:5512, MSC-I bounds :5544-5611, gene-age scaling
    :4413-4422).

    Bounds: [max over non-moving children taus of the moving set, min
    over non-moving parent taus].  Gene-node ages in the affected
    populations (the tied group and its child populations — the
    general form of the reference's per-model H1/H2/H3 sets,
    stree.c:5718-5830) inside (minage, maxage) are rubber-banded with
    the standard min/max factors, with the count_above*log(maxf) +
    count_below*log(minf) Jacobian.
    """
    sp0 = state.sp
    H = sp0.n_nodes
    NS = sp0.n_tips
    T = state.gt.n_tips
    N = state.gt.n_nodes
    n_inner = H - NS - sp0.n_hybrids
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn(ctx)
    gamma_tau = cfg.tauprior.dist == PriorDist.GAMMA
    a, b = cfg.tauprior.alpha, cfg.tauprior.beta
    eps = state.finetune[FT_TAU]
    nodes_idx = jnp.arange(N)[None, :]

    def tied_group(h):
        """[H] bool: taus that move together with node h's tau."""
        grp = jax.nn.one_hot(h, H, dtype=jnp.bool_)
        is_hin = sp0.hindex[h] >= 0
        mir = jnp.where(is_hin, sp0.hybrid[h], h)
        grp = grp | (jax.nn.one_hot(mir, H, dtype=jnp.bool_) & is_hin)
        if sp0.bdi_partner is not None:
            # BDI: one tau shared by X, Y and both mirrors (stree.c:5652)
            part = sp0.bdi_partner[h]
            is_bdi = part >= 0
            part_s = jnp.maximum(part, 0)
            grp = grp | (jax.nn.one_hot(part_s, H, dtype=jnp.bool_) & is_bdi)
            grp = grp | (jax.nn.one_hot(sp0.hybrid[part_s], H,
                                        dtype=jnp.bool_) & is_bdi)
        for side in (h, mir):
            par = sp0.parent[side]
            tie = is_hin & (par >= 0) & ~sp0.tau_free[jnp.maximum(par, 0)]
            grp = grp | (jax.nn.one_hot(jnp.maximum(par, 0), H,
                                        dtype=jnp.bool_) & tie)
        return grp

    integ = cfg.theta_integrated
    if integ:
        from . import notheta

    def body(off, carry):
        age, tau, logl, logpr, coal_c, t2_c, kkey, nprop, nacc = carry
        h = NS + off
        kkey, k1, k2 = jax.random.split(kkey, 3)
        free = sp0.tau_free[h]
        grp = tied_group(h)                              # [H] moving taus
        told = tau[h]

        lc, rc = sp0.left, sp0.right
        child_tau = jnp.maximum(
            jnp.where((lc >= 0) & ~grp[jnp.maximum(lc, 0)],
                      tau[jnp.maximum(lc, 0)], 0.0),
            jnp.where((rc >= 0) & ~grp[jnp.maximum(rc, 0)],
                      tau[jnp.maximum(rc, 0)], 0.0))
        minage = jnp.max(jnp.where(grp, child_tau, 0.0))
        par = sp0.parent
        par_s = jnp.maximum(par, 0)
        ptau = jnp.where((par >= 0) & ~grp[par_s], tau[par_s], jnp.inf)
        maxage = jnp.min(jnp.where(grp, ptau, jnp.inf))
        is_root = sp0.parent[h] < 0
        maxage = jnp.where(jnp.isinf(maxage), 999.0, maxage)

        tnew = rng.reflect(told + eps * rng.bactrian(k1, dtype=eps.dtype),
                           minage, maxage)
        dt = tnew - told
        tau_new = jnp.where(grp, tnew, tau)
        sp_cur = sp0._replace(tau=tau)
        sp_new = sp0._replace(tau=tau_new)

        # affected populations: the tied group and its children
        aff = grp | jnp.where(sp0.parent >= 0, grp[par_s], False)
        gtc = state.gt._replace(age=age)
        pops = assign_populations(gtc, sp_cur, ctx.tip_pop)
        is_inner = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)
        in_aff = aff[pops]
        window = (age > minage) & (age < maxage)
        cond = is_inner & in_aff & window & ctx.locus_mask[:, None]
        above = cond & (age >= told)
        below = cond & (age < told)
        # delta-form rubber band (avoids float32 cancellation at the
        # 999 maxage cap, cf. tau_move)
        age_new = jnp.where(
            above, age + dt * (maxage - age) / (maxage - told),
            jnp.where(below, age + dt * (age - minage) / (told - minage),
                      age))
        ca = _psum_if_sharded(above.sum())
        cb = _psum_if_sharded(below.sum())

        gtn = state.gt._replace(age=age_new)
        logl_new = logl_fn(gtn, state.subst, sp_new, state.clock)
        logpr_new, c_new, t2_new = logpr_fn(gtn, sp_new,
                                            state.subst.heredity)
        if integ:
            # logpr is the theta-free per-locus part (phi terms /
            # validity); the coupled theta-marginalized part comes from
            # the (coal, t2h) caches (gtree.c:3780 analog)
            dpr = (_psum_if_sharded(jnp.sum(logpr_new - logpr))
                   + notheta.total_integrated(
                       cfg, c_new, t2_new, state.subst.heredity,
                       ctx.locus_mask)
                   - notheta.total_integrated(
                       cfg, coal_c, t2_c, state.subst.heredity,
                       ctx.locus_mask))
        else:
            dpr = _psum_if_sharded(jnp.sum(logpr_new - logpr))

        ln_maxf = jnp.log1p(dt / (told - maxage))
        ln_minf = jnp.log1p(dt / (told - minage))
        cand = jnp.sum((tau > 0) & sp0.tau_free).astype(tau.dtype)
        if gamma_tau:
            root_term = (a - 1.0 - cand + 1.0) * jnp.log(tnew / told) \
                - b * (tnew - told)
        else:
            root_term = (-a - 1.0 - cand + 1.0) * jnp.log(tnew / told) \
                - b * (1.0 / tnew - 1.0 / told)
        lnacc = (ca * ln_maxf + cb * ln_minf
                 + _psum_if_sharded(jnp.sum(logl_new - logl))
                 + dpr
                 + jnp.where(is_root, root_term, 0.0))

        accept = rng.mh_accept(k2, lnacc) & free & (told > 0)
        age = jnp.where(accept, age_new, age)
        tau = jnp.where(accept, tau_new, tau)
        logl = jnp.where(accept, logl_new, logl)
        logpr = jnp.where(accept, logpr_new, logpr)
        if integ:
            coal_c = jnp.where(accept, c_new, coal_c)
            t2_c = jnp.where(accept, t2_new, t2_c)
        nprop = nprop + free.astype(jnp.int32)
        nacc = nacc + accept.astype(jnp.int32)
        return (age, tau, logl, logpr, coal_c, t2_c, kkey, nprop, nacc)

    zero_lh = jnp.zeros((), state.logl.dtype)
    coal0 = state.coal if integ else zero_lh
    t20 = state.t2h if integ else zero_lh
    init = (state.gt.age, sp0.tau, state.logl, state.logpr, coal0, t20,
            key, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    age, tau, logl, logpr, coal_c, t2_c, _, nprop, nacc = jax.lax.fori_loop(
        0, n_inner, body, init)
    new_state = state._replace(
        gt=state.gt._replace(age=age), sp=sp0._replace(tau=tau),
        logl=logl, logpr=logpr)
    if integ:
        new_state = new_state._replace(coal=coal_c, t2h=t2_c)
    return new_state, (nprop, nacc)


# --------------------------------------------------------------------------
# hpath repath move
# --------------------------------------------------------------------------


def _sample_path(sp: SpeciesArrays, start, end, flags, u01):
    """Resample edge flags along the walk start -> end (sample_hpath).

    ``start``/``end``: int arrays [...]; ``flags`` int8 [..., HY] are
    updated along the way.  At a hinner where BOTH sides reach ``end``
    (network pptable), the main side is taken w.p. phi (contributing
    log phi to the proposal density); a one-sided reach is forced (no
    contribution).  ``u01`` are precomputed uniforms [..., HY] — each
    hybridization slot is crossed at most once per edge, so using one
    uniform per slot is exact.

    Returns (flags_new, logq, failed).
    """
    H = sp.n_nodes
    logq = jnp.zeros(start.shape, sp.phi.dtype)

    def bodyf(carry, _):
        p, flags, logq = carry
        at_end = p == end
        par = sp.parent[p]
        par_s = jnp.maximum(par, 0)
        hidx = sp.hindex[par_s]
        is_hin = (hidx >= 0) & (par >= 0) & ~at_end
        if sp.bdi_mirror is not None:
            # stepping up FROM a BDI mirror enters the partner hinner
            # directly (the switch already happened; no choice point)
            is_hin = is_hin & ~sp.bdi_mirror[p]
        hclip = jnp.maximum(hidx, 0)
        mir = sp.hybrid[par_s]
        mir_s = jnp.maximum(mir, 0)
        main_ok = sp.pptable[par_s, end]
        mir_ok = sp.pptable[mir_s, end] & (mir >= 0)
        both = is_hin & main_ok & mir_ok
        u = jnp.take_along_axis(u01, hclip[..., None], axis=-1)[..., 0]
        phi_m = sp.phi[par_s]
        take_mirror = jnp.where(both, u >= phi_m, is_hin & ~main_ok)
        newflag = jnp.where(take_mirror, 1, 0).astype(flags.dtype)
        write = is_hin[..., None] & (
            jnp.arange(flags.shape[-1]) == hclip[..., None])
        flags = jnp.where(write, newflag[..., None], flags)
        logq = logq + jnp.where(
            both,
            jnp.log(jnp.maximum(jnp.where(take_mirror, 1.0 - phi_m, phi_m),
                                1e-300)),
            0.0)
        nxt = jnp.where(is_hin & take_mirror, mir_s, par_s)
        p = jnp.where(at_end | (par < 0), p, nxt)
        return (p, flags, logq), None

    (p, flags, logq), _ = jax.lax.scan(
        bodyf, (start, flags, logq), None, length=H)
    return flags, logq, p != end


def _replay_path(sp: SpeciesArrays, start, end, flags):
    """Log proposal probability of an EXISTING path start -> end under
    the phi-weighted scheme (sample_hpath_reverse, gtree.c:4342)."""
    H = sp.n_nodes
    logq = jnp.zeros(start.shape, sp.phi.dtype)

    def bodyf(carry, _):
        p, logq = carry
        at_end = p == end
        par = sp.parent[p]
        par_s = jnp.maximum(par, 0)
        hidx = sp.hindex[par_s]
        is_hin = (hidx >= 0) & (par >= 0) & ~at_end
        if sp.bdi_mirror is not None:
            # stepping up FROM a BDI mirror enters the partner hinner
            # directly (the switch already happened; no choice point)
            is_hin = is_hin & ~sp.bdi_mirror[p]
        hclip = jnp.maximum(hidx, 0)
        mir = sp.hybrid[par_s]
        mir_s = jnp.maximum(mir, 0)
        main_ok = sp.pptable[par_s, end]
        mir_ok = sp.pptable[mir_s, end] & (mir >= 0)
        both = is_hin & main_ok & mir_ok
        flag = jnp.take_along_axis(flags, hclip[..., None], axis=-1)[..., 0]
        take_mirror = is_hin & (flag == 1)
        phi_m = sp.phi[par_s]
        logq = logq + jnp.where(
            both,
            jnp.log(jnp.maximum(jnp.where(take_mirror, 1.0 - phi_m, phi_m),
                                1e-300)),
            0.0)
        nxt = jnp.where(take_mirror, mir_s, par_s)
        p = jnp.where(at_end | (par < 0), p, nxt)
        return (p, logq), None

    (p, logq), _ = jax.lax.scan(bodyf, (start, logq), None, length=H)
    return logq, p != end


def repath_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    """Blocked re-choice of coalescence populations + edge flags.

    Two depth-parity phases: the edges touched by node u are exactly
    those incident to u, and parity-blocks have disjoint incident edge
    sets, so block members are independent.  Flags are written via
    per-row gathers (each gene node's edge has at most one writer: its
    parent if the parent is in the block, else itself), never scatters.
    """
    gt, sp = state.gt, state.sp
    L, N, T = gt.n_loci, gt.n_nodes, gt.n_tips
    HY = sp.n_hybrids
    lidx = jnp.arange(L)[:, None]
    nodes = jnp.arange(N)[None, :]
    logpr_fn = make_logpr_fn(ctx)
    depths = node_depths(gt)
    inner_valid = (nodes >= T) & (nodes < T + ctx.n_seq[:, None] - 1)
    tau = sp.tau
    par_pop_tau = jnp.where(sp.parent >= 0,
                            tau[jnp.maximum(sp.parent, 0)], jnp.inf)

    hpath = gt.hpath
    logpr = state.logpr
    integ = cfg.theta_integrated
    if integ:
        from . import notheta
        coal_c, t2_c = state.coal, state.t2h
    # under a relaxed clock the hpath choice routes each edge through
    # different populations, changing its rate-weighted length — the
    # move must then re-cost the likelihood too (locus.c:1151 segment
    # walk); under the strict clock ages alone fix the lengths
    from ..config import Clock
    relaxed = cfg.clock != Clock.GLOBAL
    logl = state.logl
    logl_fn = make_logl_fn(ctx, cfg) if relaxed else None
    nprop = jnp.zeros((), jnp.int32)
    nacc = jnp.zeros((), jnp.int32)

    for phase in (0, 1):
        key, kc, ku, ka = jax.random.split(key, 4)
        mask = inner_valid & (depths % 2 == phase) & ctx.locus_mask[:, None]
        gtc = gt._replace(hpath=hpath)
        pops = assign_populations(gtc, sp, ctx.tip_pop)

        lc = jnp.maximum(gt.left, 0)
        rc = jnp.maximum(gt.right, 0)
        pop_lc = pops[lidx, lc]
        pop_rc = pops[lidx, rc]
        par_s = jnp.maximum(gt.parent, 0)
        pop_pu = jnp.where(gt.parent >= 0, pops[lidx, par_s], sp.root)
        age = gt.age

        # candidate pops for node u at its (unchanged) age: reachable
        # from both children's pops, time interval contains the age,
        # and the parent's pop reachable onward (gtree.c:4740-4757)
        reach_l = sp.pptable[pop_lc]                     # [L, N, H]
        reach_r = sp.pptable[pop_rc]
        has_time = (tau <= age[..., None]) & (age[..., None] < par_pop_tau)
        reach_par = sp.pptable.T[pop_pu]                 # [L,N,H]: pp[x,pu]
        cand = reach_l & reach_r & has_time & reach_par
        ccount = cand.sum(-1)
        logits = jnp.where(cand, 0.0, -1e30)
        choice = jax.random.categorical(kc, logits, axis=-1).astype(jnp.int32)

        # forward path resampling for the three incident edges of u
        u01 = jax.random.uniform(ku, (L, N, 3, HY), dtype=sp.phi.dtype)
        fl_l, ql_f, bad_l = _sample_path(sp, pop_lc, choice,
                                         hpath[lidx, lc], u01[:, :, 0])
        fl_r, qr_f, bad_r = _sample_path(sp, pop_rc, choice,
                                         hpath[lidx, rc], u01[:, :, 1])
        fl_u, qu_f, bad_u = _sample_path(sp, choice, pop_pu,
                                         hpath, u01[:, :, 2])
        # reverse: replay the OLD paths toward the OLD pop
        old_pop = pops
        ql_r, _ = _replay_path(sp, pop_lc, old_pop, hpath[lidx, lc])
        qr_r, _ = _replay_path(sp, pop_rc, old_pop, hpath[lidx, rc])
        qu_r, _ = _replay_path(sp, old_pop, pop_pu, hpath)

        ok = mask & (ccount > 0) & ~(bad_l | bad_r | bad_u)

        # per-row gather of the (unique) writer's resampled flags:
        # row r's edge is rewritten by its parent (r as child) when the
        # parent is an ok block node, else by r itself when ok
        pr = jnp.maximum(gt.parent, 0)
        has_pr = gt.parent >= 0
        pok = ok[lidx, pr] & has_pr
        r_is_lc = gt.left[lidx, pr] == nodes
        from_parent = jnp.where(r_is_lc[..., None],
                                fl_l[lidx, pr], fl_r[lidx, pr])
        hp_new = jnp.where(pok[..., None], from_parent,
                           jnp.where(ok[..., None], fl_u, hpath))

        q_fwd = jnp.sum(jnp.where(ok, ql_f + qr_f + qu_f, 0.0), axis=-1)
        q_rev = jnp.sum(jnp.where(ok, ql_r + qr_r + qu_r, 0.0), axis=-1)

        gtn = gt._replace(hpath=hp_new)
        logpr_new, c_new, t2_new = logpr_fn(gtn, sp, state.subst.heredity)
        if relaxed:
            logl_new = logl_fn(gtn, state.subst, sp, state.clock)
            dlogl = logl_new - logl
        else:
            dlogl = 0.0
        amask = ctx.locus_mask & ok.any(1)
        if integ:
            # repathing moves coalescences between populations: the
            # per-locus accepts couple through the aggregated K/C sums,
            # so run the exact serial accept chain (notheta.scan_accept)
            hered = state.subst.heredity
            accept = notheta.scan_accept(
                ka, cfg, (logpr_new - logpr) + (q_rev - q_fwd) + dlogl,
                coal_c, t2_c, hered, c_new, t2_new, hered,
                amask, ctx.locus_mask)
            coal_c = jnp.where(accept[:, None], c_new, coal_c)
            t2_c = jnp.where(accept[:, None], t2_new, t2_c)
        else:
            lnacc = (logpr_new - logpr) + (q_rev - q_fwd) + dlogl
            accept = rng.mh_accept(ka, lnacc) & amask
        hpath = jnp.where(accept[:, None, None], hp_new, hpath)
        logpr = jnp.where(accept, logpr_new, logpr)
        if relaxed:
            logl = jnp.where(accept, logl_new, logl)
        nprop = nprop + amask.sum(dtype=jnp.int32)
        nacc = nacc + accept.sum(dtype=jnp.int32)

    new_state = state._replace(gt=gt._replace(hpath=hpath), logpr=logpr,
                               logl=logl)
    if integ:
        new_state = new_state._replace(coal=coal_c, t2h=t2_c)
    return new_state, (nprop, nacc)
