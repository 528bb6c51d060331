"""Species-tree topology moves (A01/A11): the SPR move.

Re-derivation of ``stree_propose_spr`` (src/stree.c:7747, the
Rannala-Yang 2017 SPR with gene-tree surgery), TPU-first:

  * The species-level choice (focal node Y weighted 1/sqrt(branch len),
    target C weighted 1/path-length, Z = LCA) runs as vectorized ops
    over the small [H] species arrays INSIDE jit, so the move composes
    with the fused iteration megastep and is replicated-deterministic
    across devices (same PRNG key -> same decision on every shard).
  * The gene-tree surgery (mark A/OTHER lineages, find Moved nodes,
    prune + regraft each at a uniformly chosen target branch spanning
    its age) is batched over all loci.
  * The reference's square/diamond/circle/triangle population
    re-bookkeeping (stree.c:8337-8470) vanishes entirely: populations
    are DERIVED from ages + the species tree here (assign_populations),
    so only the topology surgery and the Hastings terms remain, and the
    MSC density/likelihood are recomputed in full batch.

Acceptance (matching stree.c:8579-8630):
  lnacc = log(w'_Y) - log(w_Y) + log(p'_B) - log(p_C)
        + sum_moved log(#targets/#sources)
        + dlogpr + dlogl + d ln prior(species model)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BppConfig, Clock
from ..trees.gtree import GTrees, SpeciesArrays, assign_populations, topo_scan
from . import rng
from .state import Ctx, McmcState, make_logl_fn, make_logpr_fn

NEG = -1e30


def _sp_depth(pptable):
    """#ancestors per species node from the ancestor-or-self table."""
    return pptable.sum(-1).astype(jnp.int32) - 1


def _recompute_pptable(parent, H: int):
    """Ancestor-or-self table by repeated squaring (stree.c:2840 analog)."""
    P = (jnp.arange(H)[None, :] == jnp.where(parent < 0, H, parent)[:, None])
    reach = jnp.eye(H, dtype=bool) | P
    for _ in range(max(1, H.bit_length())):
        reach = reach | (reach.astype(jnp.int32) @ reach.astype(jnp.int32) > 0)
    return reach


def _recompute_mrca(pptable):
    depth = _sp_depth(pptable)
    common = pptable[:, None, :] & pptable[None, :, :]
    score = jnp.where(common, depth[None, None, :], -1)
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


def log_histories_tau(sp) -> jax.Array:
    """log #labeled histories of the (possibly partially collapsed)
    species tree, counting only ACTIVE inner nodes (tau > 0), exactly
    like ``histories`` (delimit.c:729): the product over active inner
    nodes v of C(e_l + e_r, e_l) with e_* the active-event counts of
    the child subtrees."""
    H = sp.tau.shape[0]
    NS = (H + 1) // 2
    act = (jnp.arange(H) >= NS) & (sp.tau > 0)
    # e[v] = #active inner nodes in subtree(v) (descendant-or-self)
    e = (sp.pptable & act[:, None]).sum(0)
    el = e[jnp.maximum(sp.left, 0)]
    er = e[jnp.maximum(sp.right, 0)]
    lc = (jax.lax.lgamma((el + er + 1.0).astype(jnp.float64))
          - jax.lax.lgamma((el + 1.0).astype(jnp.float64))
          - jax.lax.lgamma((er + 1.0).astype(jnp.float64)))
    return jnp.sum(jnp.where(act, lc, 0.0))


def log_species_model_prior(cfg, sp, prior_a11_log=None) -> jax.Array:
    """lnprior_species_model (delimit.c:709): 0 for the LH/SLH priors
    (0/2), -log(histories) for the uniform-tree priors (1/3), plus the
    A11 species-count normalization -log prior_A11[tau_count] for
    priors >= 2."""
    lp = jnp.zeros((), jnp.float64)
    if cfg.delimit_prior in (1, 3):
        lp = lp - log_histories_tau(sp)
    if prior_a11_log is not None and cfg.delimit_prior >= 2:
        H = sp.tau.shape[0]
        NS = (H + 1) // 2
        tau_count = (sp.tau[NS:] > 0).sum()
        lp = lp - prior_a11_log[tau_count]
    return lp


def _log_histories(pptable, tips_mask):
    """log #labeled histories = log (n-1)! - sum_v log(#inner below v)
    (delimit.c ``histories``); used for the uniform-tree priors 2/3."""
    # ntips_below[v] = #tips t with v ancestor-or-self of t
    ntips_below = pptable.astype(jnp.int32).T @ tips_mask.astype(jnp.int32)
    inner_below = jnp.maximum(ntips_below - 1, 0)
    inner_mask = ~tips_mask & (inner_below > 0)
    n = tips_mask.sum()
    return (jax.lax.lgamma(jnp.asarray(n, jnp.float64))
            - jnp.where(inner_mask, jnp.log(jnp.maximum(inner_below, 1)),
                        0.0).sum())


def _pick_categorical(key, logw, mask):
    logits = jnp.where(mask, logw, NEG)
    idx = jax.random.categorical(key, logits)
    logp = logits[idx] - jax.scipy.special.logsumexp(logits)
    return idx.astype(jnp.int32), logp


def _constraint_feasible(cids, sp, partau, is_inner):
    """Per-node Y-feasibility under topology constraints
    (fill_feasible_flags stree.c:7697): Y's children and sister share
    Y's group, and some branch with Y's group spans tau_Y."""
    H = cids.shape[0]
    hidx = jnp.arange(H)
    x = jnp.maximum(sp.parent, 0)
    lc = jnp.maximum(sp.left, 0)
    rc = jnp.maximum(sp.right, 0)
    sib = jnp.where(sp.left[x] == hidx, sp.right[x], sp.left[x])
    sib = jnp.maximum(sib, 0)
    neigh = ((cids == cids[lc]) & (cids == cids[rc])
             & (cids == cids[sib]))
    # exists[y] = any same-group branch (c, parent(c)) spanning tau_y,
    # c not a descendant-or-self of y (check_age_feasibility_recursive
    # stree.c:7676 — group regions are connected, so id equality is the
    # reachability test)
    spans = ((sp.tau[None, :] < sp.tau[:, None])
             & (partau[None, :] > sp.tau[:, None]))         # [y, c]
    ok_c = spans & (cids[None, :] == cids[:, None]) & ~sp.pptable.T
    return is_inner & neigh & ok_c.any(axis=1)


def species_spr_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    gt, sp = state.gt, state.sp
    L, N, T = gt.n_loci, gt.n_nodes, gt.n_tips
    H = sp.n_nodes
    NS = (H + 1) // 2
    lidx = jnp.arange(L)
    hidx = jnp.arange(H)
    nodes_idx = jnp.arange(N)[None, :]
    dtype = sp.tau.dtype
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn(ctx)

    k_y, k_ab, k_c, k_t, k_acc = jax.random.split(key, 5)

    partau = jnp.where(sp.parent >= 0, sp.tau[jnp.maximum(sp.parent, 0)],
                       jnp.inf)
    depth = _sp_depth(sp.pptable)
    is_inner = hidx >= NS

    # --- select focal node Y (init_weights: 1/sqrt(branch length)) ----------
    feas_y = is_inner & (sp.parent >= 0) & (sp.tau > 0)
    if ctx.sp_constraint is not None:
        # constraints (fill_feasible_flags stree.c:7697): Y is prunable
        # only when Y, its children and its sister share one group AND
        # a same-group target branch spanning tau_Y exists
        feas_y = feas_y & _constraint_feasible(ctx.sp_constraint, sp,
                                               partau, is_inner)
    w = jnp.where(feas_y, 1.0 / jnp.sqrt(jnp.maximum(partau - sp.tau, 1e-30)),
                  0.0)
    y, logp_y = _pick_categorical(k_y, jnp.log(jnp.maximum(w, 1e-300)),
                                  feas_y)
    x = sp.parent[y]
    swap = jax.random.bernoulli(k_ab)
    a = jnp.where(swap, sp.right[y], sp.left[y])
    b = jnp.where(swap, sp.left[y], sp.right[y])

    # --- select target C (weight 1/path length) -----------------------------
    # candidates: not a descendant-or-self of Y, tau < tau_Y < parent tau
    cand = (~sp.pptable[:, y]) & (sp.tau < sp.tau[y]) & (partau > sp.tau[y])
    if ctx.sp_constraint is not None:
        # stree.c:7847: matching constraint groups between C and Y
        cand = cand & (ctx.sp_constraint == ctx.sp_constraint[y])
    # z(c) = LCA(x, c): deepest common ancestor
    common = sp.pptable[x][None, :] & sp.pptable          # [H(c), H]
    zc = jnp.argmax(jnp.where(common, depth[None, :], -1),
                    axis=-1).astype(jnp.int32)            # [H]
    pathlen = 1 + (depth[y] - depth[zc]) + (depth - depth[zc])
    c, logp_c = _pick_categorical(
        k_c, -jnp.log(jnp.maximum(pathlen, 1).astype(dtype)), cand)
    z = zc[c]

    # --- new species topology ----------------------------------------------
    def replace_child(left, right, par, old, new):
        left = left.at[par].set(jnp.where(left[par] == old, new, left[par]))
        right = right.at[par].set(
            jnp.where(right[par] == old, new, right[par]))
        return left, right

    nleft, nright = sp.left, sp.right
    nparent = sp.parent
    cp = sp.parent[c]
    # detach: B replaces Y under X
    nleft, nright = replace_child(nleft, nright, x, y, b)
    nparent = nparent.at[b].set(x)
    # regraft: Y replaces C under C's parent; Y's B-slot takes C
    nleft, nright = replace_child(nleft, nright, cp, c, y)
    nparent = nparent.at[y].set(cp)
    nleft = nleft.at[y].set(jnp.where(sp.left[y] == b, c, nleft[y]))
    nright = nright.at[y].set(jnp.where(sp.right[y] == b, c, nright[y]))
    nparent = nparent.at[c].set(y)

    npptable = _recompute_pptable(nparent, H)
    nmrca = _recompute_mrca(npptable)
    sp_new = sp._replace(left=nleft, right=nright, parent=nparent,
                         pptable=npptable, mrca=nmrca)

    # --- gene-tree marks on the ORIGINAL state ------------------------------
    pops = assign_populations(gt, sp, ctx.tip_pop)         # [L, N]
    age = gt.age

    # path masks on the species tree
    path_yz = sp.pptable[y] & sp.pptable[:, z] & (hidx != z)   # y..z exclusive
    path_cz = sp.pptable[c] & sp.pptable[:, z] & (hidx != z)   # c..z exclusive

    tip_under_a = sp.pptable[ctx.tip_pop, a]               # [L, T]
    ge_zmask = sp.pptable[z, pops]                         # pop >= z  [L, N]

    hasA = topo_scan(gt, tip_under_a, jnp.logical_or)      # [L, N]
    markA = hasA & ~ge_zmask
    tip_qual = (~tip_under_a) & (
        sp.pptable[ctx.tip_pop] & path_yz[None, None, :]).any(-1)
    hasO = topo_scan(gt, tip_qual, jnp.logical_or)
    markO = hasO & ~ge_zmask

    pureA = markA & ~markO
    valid_inner = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)
    on_path = path_yz[pops]                                # [L, N]
    lA = pureA[lidx[:, None], jnp.maximum(gt.left, 0)]
    rA = pureA[lidx[:, None], jnp.maximum(gt.right, 0)]
    lO = markO[lidx[:, None], jnp.maximum(gt.left, 0)]
    rO = markO[lidx[:, None], jnp.maximum(gt.right, 0)]
    square = (pops == y) & lO & rO
    moved = valid_inner & on_path & (lA ^ rA) & ~square & ctx.locus_mask[:, None]

    pruned_is_left = lA
    pruned = jnp.where(pruned_is_left, gt.left, gt.right)
    intact = jnp.where(pruned_is_left, gt.right, gt.left)

    # pop_cz per node: highest node on c..z-exclusive path with tau < age
    elig = path_cz[None, None, :] & (sp.tau[None, None, :] < age[..., None])
    pop_cz = jnp.argmax(jnp.where(elig, sp.tau[None, None, :], -1.0),
                        axis=-1).astype(jnp.int32)         # [L, N]

    # spanning test for every candidate branch (tmp, parent(tmp))
    page = jnp.where(gt.parent >= 0,
                     jnp.take_along_axis(age, jnp.maximum(gt.parent, 0), 1),
                     jnp.inf)
    valid_branch = ((nodes_idx < ctx.n_seq[:, None])
                    | valid_inner) & (gt.parent >= 0)

    def _select_uniform_rows(kkey, mask):
        count = mask.sum(1)
        r = jax.random.uniform(kkey, (L,))
        sel = jnp.minimum(jnp.floor(r * count).astype(jnp.int32),
                          jnp.maximum(count - 1, 0))
        cum = jnp.cumsum(mask, axis=1) - mask
        hit = mask & (cum == sel[:, None])
        return jnp.argmax(hit, axis=1).astype(jnp.int32), count

    # identification pass: per inner node k, compute (is_moved, target, HR)
    def ident(carry, inp):
        lnhr, bad, targets = carry
        k, kkey = inp
        node = T + k
        is_m = moved[:, node]
        mtime = age[:, node]
        mcz = pop_cz[:, node]
        maz = pops[:, node]
        spans = valid_branch & (age < mtime[:, None]) & (page > mtime[:, None])
        tmask = spans & sp.pptable[pops, mcz[:, None]]
        tcount = tmask.sum(1)
        tgt, _ = _select_uniform_rows(kkey, tmask)
        smask = spans & sp.pptable[pops, maz[:, None]] & ~pureA \
            & (nodes_idx != intact[:, node][:, None])
        scount = smask.sum(1) + 1
        lnhr = lnhr + jnp.where(is_m & (tcount > 0),
                                jnp.log(tcount.astype(dtype))
                                - jnp.log(scount.astype(dtype)), 0.0)
        bad = bad | (is_m & (tcount == 0))
        targets = targets.at[:, node].set(jnp.where(is_m, tgt, -1))
        return (lnhr, bad, targets), None

    keys_id = jax.random.split(k_t, T - 1)
    (lnhr, badmask, targets), _ = jax.lax.scan(
        ident,
        (jnp.zeros((L,), dtype), jnp.zeros((L,), bool),
         jnp.full((L, N), -1, jnp.int32)),
        (jnp.arange(T - 1, dtype=jnp.int32), keys_id))

    # application pass: sequential prune+regraft on evolving topology
    def apply_one(carry, k):
        left, right, parent = carry
        node = T + k
        is_m = moved[:, node] & ~badmask
        prn = pruned[:, node]
        # intact must be recomputed from the CURRENT topology: an earlier
        # moved node's prune may have replaced this node's other child
        # (stree.c:8208-8210 recomputes it at application time)
        lcur = left[lidx, node]
        rcur = right[lidx, node]
        itc = jnp.where(lcur == prn, rcur, lcur)
        par = parent[lidx, node]
        par_s = jnp.maximum(par, 0)

        # prune: intact replaces node under its parent
        lval = left[lidx, par_s]
        left = left.at[lidx, par_s].set(
            jnp.where(is_m & (lval == node), itc, lval))
        rval = right[lidx, par_s]
        right = right.at[lidx, par_s].set(
            jnp.where(is_m & (rval == node), itc, rval))
        parent = parent.at[lidx, itc].set(
            jnp.where(is_m, par, parent[lidx, itc]))

        # receiver: lift stored target while its current parent is younger
        mtime = age[lidx, node]

        def lift(rcv):
            rp = parent[lidx, jnp.maximum(rcv, 0)]
            again = is_m & (rp >= 0) & (
                age[lidx, jnp.maximum(rp, 0)] <= mtime)
            return jnp.where(again, rp, rcv), again.any()

        def cond(st):
            return st[1]

        def body(st):
            rcv, _ = st
            return lift(rcv)

        rcv0 = targets[:, node]
        rcv, _ = jax.lax.while_loop(cond, body, lift(rcv0))
        rcv_s = jnp.maximum(rcv, 0)

        # regraft: node replaces receiver under receiver's parent
        rp = parent[lidx, rcv_s]
        rp_s = jnp.maximum(rp, 0)
        lval = left[lidx, rp_s]
        left = left.at[lidx, rp_s].set(
            jnp.where(is_m & (lval == rcv), node, lval))
        rval = right[lidx, rp_s]
        right = right.at[lidx, rp_s].set(
            jnp.where(is_m & (rval == rcv), node, rval))
        parent = parent.at[lidx, node].set(
            jnp.where(is_m, rp, parent[lidx, node]))
        # node's intact slot takes the receiver; the pruned slot stays
        lval = left[lidx, node]
        rval = right[lidx, node]
        new_l = jnp.where(lval == prn, lval, rcv)
        new_r = jnp.where(lval == prn, rcv, rval)
        left = left.at[lidx, node].set(jnp.where(is_m, new_l, lval))
        right = right.at[lidx, node].set(jnp.where(is_m, new_r, rval))
        parent = parent.at[lidx, rcv_s].set(
            jnp.where(is_m, node, parent[lidx, rcv_s]))
        return (left, right, parent), None

    (gl, gr, gp), _ = jax.lax.scan(
        apply_one, (gt.left, gt.right, gt.parent),
        jnp.arange(T - 1, dtype=jnp.int32))
    gt_new = gt._replace(left=gl, right=gr, parent=gp)

    # --- full re-evaluation --------------------------------------------------
    logl_new = logl_fn(gt_new, state.subst, sp_new, state.clock)
    logpr_new, c_new, t2_new = logpr_fn(gt_new, sp_new, state.subst.heredity)

    # --- reverse species-level weights ---------------------------------------
    npartau = jnp.where(nparent >= 0, sp_new.tau[jnp.maximum(nparent, 0)],
                        jnp.inf)
    ndepth = _sp_depth(npptable)
    feas2 = is_inner & (nparent >= 0) & (sp_new.tau > 0)
    if ctx.sp_constraint is not None:
        feas2 = feas2 & _constraint_feasible(ctx.sp_constraint, sp_new,
                                             npartau, is_inner)
    w2 = jnp.where(feas2,
                   1.0 / jnp.sqrt(jnp.maximum(npartau - sp_new.tau, 1e-30)),
                   0.0)
    logits2 = jnp.where(feas2, jnp.log(jnp.maximum(w2, 1e-300)), NEG)
    logp_y_rev = logits2[y] - jax.scipy.special.logsumexp(logits2)

    cand2 = (~npptable[:, y]) & (sp_new.tau < sp_new.tau[y]) & (
        npartau > sp_new.tau[y])
    if ctx.sp_constraint is not None:
        cand2 = cand2 & (ctx.sp_constraint == ctx.sp_constraint[y])
    nx = nparent[y]
    common2 = npptable[jnp.maximum(nx, 0)][None, :] & npptable
    zc2 = jnp.argmax(jnp.where(common2, ndepth[None, :], -1),
                     axis=-1).astype(jnp.int32)
    pathlen2 = 1 + (ndepth[y] - ndepth[zc2]) + (ndepth - ndepth[zc2])
    logits3 = jnp.where(cand2,
                        -jnp.log(jnp.maximum(pathlen2, 1).astype(dtype)), NEG)
    logp_b_rev = logits3[b] - jax.scipy.special.logsumexp(logits3)

    # species-model prior ratio (lnprior_species_model, stree.c:8630;
    # tau_count is unchanged by SPR so the A11 prior_A11 term cancels)
    prior_ratio = (log_species_model_prior(cfg, sp_new)
                   - log_species_model_prior(cfg, sp)).astype(dtype)

    # no feasible focal/target (e.g. A11 states with everything
    # collapsed): the categorical picked garbage; reject outright
    bad_any = (badmask & ctx.locus_mask).any() \
        | ~feas_y.any() | ~cand.any()
    if cfg.theta_integrated:
        from . import notheta
        dpr = (notheta.total_integrated(cfg, c_new, t2_new,
                                        state.subst.heredity, ctx.locus_mask)
               - notheta.total_integrated(cfg, state.coal, state.t2h,
                                          state.subst.heredity,
                                          ctx.locus_mask))
    else:
        dpr = jnp.sum(jnp.where(ctx.locus_mask,
                                logpr_new - state.logpr, 0.0))
    lnacc = (logp_y_rev - logp_y + logp_b_rev - logp_c
             + jnp.sum(jnp.where(ctx.locus_mask, lnhr, 0.0))
             + jnp.sum(jnp.where(ctx.locus_mask,
                                 logl_new - state.logl, 0.0))
             + dpr + prior_ratio)
    # correlated-clock branch-rate prior depends on the species
    # topology + taus (stree.c:8839-8844 in propose SPR)
    lnr_new = None
    if state.clock is not None and cfg.clock == Clock.CORRELATED:
        from .clock_moves import lnprior_rates
        lnr_new = lnprior_rates(cfg, sp_new, state.subst.mu, state.clock)
        lnacc = lnacc + jnp.sum(jnp.where(
            ctx.locus_mask, lnr_new - state.clock.lnrates, 0.0))
    # morphological traits: re-score on the proposed topology
    # (stree.c:727-736 subtracts trait_old_logl and adds
    # loglikelihood_trait inside the SPR lnacceptance)
    tl_new = None
    if ctx.trait_fn_topo is not None and state.trait is not None:
        tl_new = ctx.trait_fn_topo(sp_new.left, sp_new.right,
                                   sp_new.parent, sp_new.tau,
                                   state.trait.brate)
        lnacc = lnacc + jnp.sum(tl_new - state.trait.logl)
    lnacc = jnp.where(bad_any, -jnp.inf, lnacc)
    accept = rng.mh_accept(k_acc, lnacc)

    def pick(new, old):
        return jax.tree.map(lambda n, o: jnp.where(accept, n, o), new, old)

    new_state = state._replace(
        gt=pick(gt_new, gt), sp=pick(sp_new, sp),
        logl=jnp.where(accept, logl_new, state.logl),
        logpr=jnp.where(accept, logpr_new, state.logpr))
    if cfg.theta_integrated:
        new_state = new_state._replace(
            coal=jnp.where(accept, c_new, state.coal),
            t2h=jnp.where(accept, t2_new, state.t2h))
    if lnr_new is not None:
        new_state = new_state._replace(clock=state.clock._replace(
            lnrates=jnp.where(accept, lnr_new, state.clock.lnrates)))
    if tl_new is not None:
        new_state = new_state._replace(trait=state.trait._replace(
            logl=jnp.where(accept, tl_new, state.trait.logl)))
    return new_state, (jnp.ones((), jnp.int32), accept.astype(jnp.int32))


# --------------------------------------------------------------------------
# SNL: SubNet Leap (stree_propose_stree_snl, stree.c:11354; core
# snl_expand_and_shrink:10597).  An SPR of Y (keeping child A) onto a
# branch found by a delta-walk from the attachment point, combined with
# rescaling clade A's species taus and pure-A gene subtrees by
# taufactor = tau_Y_new / tau_Y_old.  Populations are derived from ages
# here, so the reference's square/diamond re-bookkeeping vanishes.
# --------------------------------------------------------------------------


def _logpdf_power(y, b, lam):
    """pdf of delta = b(1-u^(1/lam)) (stree.c:10496)."""
    return jnp.log(lam / b) + (lam - 1.0) * jnp.log(
        jnp.maximum(1.0 - y / b, 1e-300))


def snl_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    gt, sp = state.gt, state.sp
    L, N, T = gt.n_loci, gt.n_nodes, gt.n_tips
    H = sp.n_nodes
    NS = (H + 1) // 2
    lidx = jnp.arange(L)
    hidx = jnp.arange(H)
    nodes_idx = jnp.arange(N)[None, :]
    dtype = sp.tau.dtype
    logl_fn = make_logl_fn(ctx, cfg)
    logpr_fn = make_logpr_fn(ctx)
    lam_e = jnp.asarray(cfg.snl_lambda_expand, dtype)
    lam_s = jnp.asarray(cfg.snl_lambda_shrink, dtype)
    p_shrink = cfg.prob_snl_shrink

    k_mt, k_sel, k_ab, k_d, k_walk, k_t, k_acc = jax.random.split(key, 7)

    partau = jnp.where(sp.parent >= 0, sp.tau[jnp.maximum(sp.parent, 0)],
                       jnp.inf)
    is_inner = hidx >= NS

    # --- weights + focal selection (init_weights, stree.c:10406) ------------
    feas = is_inner & (sp.parent >= 0) & (sp.tau > 0)
    w = jnp.where(feas, 1.0 / jnp.sqrt(jnp.maximum(partau - sp.tau, 1e-30)),
                  0.0)
    wnorm = w / jnp.maximum(w.sum(), 1e-300)
    sel, logp_sel = _pick_categorical(
        k_sel, jnp.log(jnp.maximum(wnorm, 1e-300)), feas)
    shrink = jax.random.uniform(k_mt) < p_shrink

    # --- y / x / a / b / c0 and delta ---------------------------------------
    # EXPAND: y = sel, x = parent(y), (a,b) random child split,
    #         delta ~ power(x.tau, lam_e), walk starts at x
    # SHRINK: c0 = sel, y = parent(c0), a = other child of y,
    #         delta ~ power(c0.tau, lam_s), walk starts at c0, downward
    y = jnp.where(shrink, sp.parent[sel], sel)
    x = sp.parent[y]                  # -1 possible for shrink root-y
    swap = jax.random.bernoulli(k_ab)
    a_exp = jnp.where(swap, sp.right[y], sp.left[y])
    a_shr = jnp.where(sp.left[y] == sel, sp.right[y], sp.left[y])
    a = jnp.where(shrink, a_shr, a_exp)
    u_d = jax.random.uniform(k_d, dtype=dtype)
    start = jnp.where(shrink, sel, x)
    dscale = jnp.where(shrink, sp.tau[sel], sp.tau[jnp.maximum(x, 0)])
    delta0 = dscale * (1.0 - u_d ** (1.0 / jnp.where(shrink, lam_s, lam_e)))

    # --- delta walk (stree.c:11450-11510) ------------------------------------
    def walk_body(k, st):
        done, kk, target, prevnode, down, delta, tau_new, lca, wbad = st
        kk, k1, k2 = jax.random.split(kk, 3)
        go_up = (~down) & (jax.random.uniform(k1) < 0.5)
        par = sp.parent[target]

        # upward branch
        up_has_par = par >= 0
        dist_up = jnp.where(up_has_par,
                            sp.tau[jnp.maximum(par, 0)] - sp.tau[target],
                            jnp.inf)
        up_fits = dist_up > delta
        # downward branch
        first_down = ~down
        other = jnp.where(sp.left[target] == prevnode, sp.right[target],
                          sp.left[target])
        rand_child = jnp.where(jax.random.uniform(k2) < 0.5,
                               sp.left[target], sp.right[target])
        nxt = jnp.where(first_down, other, rand_child)
        nxt = jnp.maximum(nxt, 0)
        dist_dn = sp.tau[target] - sp.tau[nxt]
        # in exact arithmetic the remaining delta is always smaller than
        # the distance to any tip below (stree.c walk invariant), but
        # float32 rounding can violate it — force a stop on a tip edge
        # and flag the (zero-measure) invalid landing for rejection
        dn_fits = (dist_dn > delta) | (nxt < NS)
        wbad = wbad | (~go_up & (nxt < NS) & (dist_dn <= delta))

        new_lca = jnp.where(go_up, lca,
                            jnp.where(first_down, target, lca))
        # apply
        t_up_stop = sp.tau[target] + delta     # also the root case
        t_dn_stop = sp.tau[target] - delta
        stop = jnp.where(go_up, up_fits | ~up_has_par, dn_fits)
        tau_new = jnp.where(done, tau_new,
                            jnp.where(go_up, t_up_stop, t_dn_stop))
        target_next = jnp.where(
            go_up,
            jnp.where(up_fits | ~up_has_par, target, jnp.maximum(par, 0)),
            nxt)
        # on an up-stop the landing BRANCH is above `target` itself; on a
        # down-stop it is above `nxt` (stree.c:11497 target = nextnode)
        prev_next = jnp.where(go_up, target, target_next)
        delta_next = jnp.where(
            go_up, jnp.where(up_fits, 0.0, delta - dist_up),
            jnp.where(dn_fits, 0.0, delta - dist_dn))
        down_next = down | ~go_up

        def keep(v, n):
            return jax.tree.map(lambda a, b: jnp.where(done, a, b), v, n)

        return (done | stop, kk,
                keep(target, target_next), keep(prevnode, prev_next),
                keep(down, down_next), keep(delta, delta_next),
                tau_new, keep(lca, new_lca), wbad)

    init = (jnp.asarray(False), k_walk, start, y, shrink,
            delta0, jnp.zeros((), dtype), jnp.full((), -1, jnp.int32),
            jnp.asarray(False))
    # bounded walk: >= 4H steps cannot happen in exact arithmetic (each
    # descent consumes tau-distance); treat an unfinished walk as bad
    (wdone, _, target, _, went_down, _, tau_new, lca, wbad) = \
        jax.lax.fori_loop(0, 4 * H + 16, walk_body, init)
    # `went_down` is True when any downward step happened (always for
    # shrink); for expand it distinguishes (++) from (+-)
    c = target
    tpar = sp.parent[c]
    tpar_s = jnp.maximum(tpar, 0)

    # A11 guard: SNL needs >= 3 delimited species and a feasible focal
    # node (method.c:5438 ndspecies > 2); reject degenerate states
    ndsp_cur = jnp.sum(sp.tau[NS:] > 0) + 1
    bad = ~wdone | wbad | ~feas.any() | (ndsp_cur <= 2)
    # degenerate landings: on y's own branch or inside {y} (c==y) make
    # the surgery ill-defined; also c must not be y's current child a
    bad = bad | (c == y)

    lnacc = -logp_sel

    # --- proposal-density corrections (stree.c:11512-11552) ------------------
    tau_y = sp.tau[y]
    pure_expand = (~shrink) & (~went_down)
    expand_down = (~shrink) & went_down

    # pure expand (++)
    d_rev_pe = sp.tau[c] - tau_y
    bad = bad | (pure_expand & (d_rev_pe >= sp.tau[c]))
    term_pe = (_logpdf_power(jnp.maximum(d_rev_pe, 1e-300), sp.tau[c],
                             lam_s)
               - jnp.log(0.5)
               - _logpdf_power(tau_new - sp.tau[jnp.maximum(x, 0)],
                               sp.tau[jnp.maximum(x, 0)], lam_e)
               + jnp.log(p_shrink / (1 - p_shrink)))
    # shrink (--)
    d_rev_sh = tau_y - sp.tau[tpar_s]
    bad = bad | (shrink & ((d_rev_sh >= sp.tau[tpar_s]) | (tpar < 0)))
    term_sh = (_logpdf_power(jnp.maximum(d_rev_sh, 1e-300),
                             jnp.maximum(sp.tau[tpar_s], 1e-300), lam_e)
               + jnp.log(0.5)
               - _logpdf_power(sp.tau[sel] - tau_new, sp.tau[sel], lam_s)
               + jnp.log((1 - p_shrink) / p_shrink))
    # expand with downward steps (+-)
    lca_s = jnp.maximum(lca, 0)
    dist_fw = (sp.tau[lca_s] - sp.tau[jnp.maximum(x, 0)]
               + sp.tau[lca_s] - tau_new)
    dist_rev = (sp.tau[lca_s] - tau_y
                + sp.tau[lca_s] - sp.tau[tpar_s])
    bad = bad | (expand_down & ((dist_rev >= sp.tau[tpar_s]) | (tpar < 0)))
    term_ed = (_logpdf_power(jnp.maximum(dist_rev, 1e-300),
                             jnp.maximum(sp.tau[tpar_s], 1e-300), lam_e)
               - _logpdf_power(jnp.maximum(dist_fw, 1e-300),
                               sp.tau[jnp.maximum(x, 0)], lam_e))
    lnacc = lnacc + jnp.where(pure_expand, term_pe,
                              jnp.where(shrink, term_sh, term_ed))

    taufactor = tau_new / tau_y

    # --- species-tree surgery (stree.c:11000-11060) ---------------------------
    b_node = jnp.where(sp.left[y] == a, sp.right[y], sp.left[y])
    nleft, nright = sp.left, sp.right
    nparent = sp.parent

    def replace_child(left, right, par, old, new):
        p_s = jnp.maximum(par, 0)
        has = par >= 0
        left = left.at[p_s].set(jnp.where(has & (left[p_s] == old),
                                          new, left[p_s]))
        right = right.at[p_s].set(jnp.where(has & (right[p_s] == old),
                                            new, right[p_s]))
        return left, right

    nleft, nright = replace_child(nleft, nright, x, y, b_node)
    nparent = nparent.at[b_node].set(x)
    nleft, nright = replace_child(nleft, nright, tpar, c, y)
    nparent = nparent.at[y].set(tpar)
    nleft = nleft.at[y].set(jnp.where(sp.left[y] == a, nleft[y], c))
    nright = nright.at[y].set(jnp.where(sp.left[y] == a, c, nright[y]))
    nparent = nparent.at[c].set(y)
    # taus: y at tau_new, clade-A species taus scaled
    in_a = sp.pptable[:, a]                    # descendants-or-self of a
    ntau = jnp.where(in_a & (sp.tau > 0), sp.tau * taufactor, sp.tau)
    ntau = ntau.at[y].set(tau_new)
    sp_scaled = jnp.sum(in_a & (sp.tau > 0) & is_inner)

    npptable = _recompute_pptable(nparent, H)
    nmrca = _recompute_mrca(npptable)
    sp_new = sp._replace(left=nleft, right=nright, parent=nparent,
                         tau=ntau, pptable=npptable, mrca=nmrca)

    # --- rway / newpop mapping (stree.c:10680-10700) --------------------------
    # candidate populations for retimed nodes: y* and NEW-tree ancestors
    # of target; deepest with tau <= tnew.  Then map new->old for the
    # old-pptable feasibility test: y->c, b->y.
    anc_t_new = npptable[c] & (hidx != c)        # target's new ancestors (incl y)
    rway_tau = jnp.where(anc_t_new, ntau, jnp.inf)       # y included

    # --- gene-tree painting ---------------------------------------------------
    pops = assign_populations(gt, sp, ctx.tip_pop)
    age = gt.age
    tip_under_a = sp.pptable[ctx.tip_pop, a]               # [L, T]
    pureA = topo_scan(gt, tip_under_a, jnp.logical_and)    # [L, N]
    valid_inner = (nodes_idx >= T) & (nodes_idx < T + ctx.n_seq[:, None] - 1)
    lA = pureA[lidx[:, None], jnp.maximum(gt.left, 0)]
    rA = pureA[lidx[:, None], jnp.maximum(gt.right, 0)]
    moved = valid_inner & (lA ^ rA) & ctx.locus_mask[:, None]
    pruned = jnp.where(lA, gt.left, gt.right)
    intact = jnp.where(lA, gt.right, gt.left)

    # new ages: pure-A inner and moved nodes scale by taufactor
    scale_mask = (pureA | moved) & valid_inner
    age_new = jnp.where(scale_mask, age * taufactor, age)
    g_scaled = jnp.sum(scale_mask & ctx.locus_mask[:, None])

    # newpop per moved node at its new age, mapped to old labels
    tnew_all = age * taufactor                              # [L, N]
    below = rway_tau[None, None, :] <= tnew_all[..., None]
    npop_new = jnp.argmax(
        jnp.where(below, jnp.where(rway_tau[None, None, :] == jnp.inf,
                                   -jnp.inf, rway_tau[None, None, :]),
                  -jnp.inf), axis=-1).astype(jnp.int32)
    any_below = below.any(-1)
    npop_new = jnp.where(any_below, npop_new, y)
    npop_old = jnp.where(npop_new == y, c,
                         jnp.where(npop_new == b_node, y, npop_new))

    page = jnp.where(gt.parent >= 0,
                     jnp.take_along_axis(age, jnp.maximum(gt.parent, 0), 1),
                     jnp.inf)
    valid_branch = ((nodes_idx < ctx.n_seq[:, None]) | valid_inner) \
        & (gt.parent >= 0)

    def _select_uniform_rows(kkey, mask):
        count = mask.sum(1)
        r = jax.random.uniform(kkey, (L,))
        s = jnp.minimum(jnp.floor(r * count).astype(jnp.int32),
                        jnp.maximum(count - 1, 0))
        cum = jnp.cumsum(mask, axis=1) - mask
        hit = mask & (cum == s[:, None])
        return jnp.argmax(hit, axis=1).astype(jnp.int32), count

    # --- identification pass: targets + Hastings ------------------------------
    def ident(carry, inp):
        lnhr, badm, targets = carry
        k, kkey = inp
        node = T + k
        is_m = moved[:, node]
        tnew = tnew_all[:, node]
        np_old = npop_old[:, node]
        # target branches at the NEW time (spans computed on new ages)
        page_new = jnp.where(
            gt.parent >= 0,
            jnp.take_along_axis(age_new, jnp.maximum(gt.parent, 0), 1),
            jnp.inf)
        spans = valid_branch & (age_new < tnew[:, None]) \
            & (page_new > tnew[:, None])
        tmask = spans & ~pureA & sp.pptable[pops, np_old[:, None]]
        tcount = tmask.sum(1)
        tgt, _ = _select_uniform_rows(kkey, tmask)
        # source count at the OLD time in the node's OLD population
        otime = age[:, node]
        spans_o = valid_branch & (age < otime[:, None]) \
            & (page > otime[:, None])
        smask = spans_o & ~pureA \
            & sp.pptable[pops, pops[:, node][:, None]] \
            & (nodes_idx != intact[:, node][:, None]) \
            & (nodes_idx != node)
        scount = smask.sum(1) + 1
        lnhr = lnhr + jnp.where(is_m & (tcount > 0),
                                jnp.log(tcount.astype(dtype))
                                - jnp.log(scount.astype(dtype)), 0.0)
        badm = badm | (is_m & (tcount == 0))
        targets = targets.at[:, node].set(jnp.where(is_m, tgt, -1))
        return (lnhr, badm, targets), None

    keys_id = jax.random.split(k_t, T - 1)
    (lnhr, badmask, targets), _ = jax.lax.scan(
        ident,
        (jnp.zeros((L,), dtype), jnp.zeros((L,), bool),
         jnp.full((L, N), -1, jnp.int32)),
        (jnp.arange(T - 1, dtype=jnp.int32), keys_id))

    # resolve targets that are themselves moved nodes down to their
    # intact child (stree.c:10725 "trace towards tips until BLACK")
    def resolve(carry):
        tgts, again = carry
        t_s = jnp.maximum(tgts, 0)
        t_moved = moved[lidx[:, None], t_s] & (tgts >= 0)
        nxt = jnp.where(t_moved, intact[lidx[:, None], t_s], tgts)
        return (nxt, (t_moved & (nxt != tgts)).any())

    targets, _ = jax.lax.while_loop(
        lambda cs: cs[1], lambda cs: resolve(cs), resolve((targets, True)))

    # --- application pass: sequential prune+regraft with new ages -------------
    def apply_one(carry, k):
        left, right, parent = carry
        node = T + k
        is_m = moved[:, node] & ~badmask & ~bad
        prn = pruned[:, node]
        lcur = left[lidx, node]
        rcur = right[lidx, node]
        itc = jnp.where(lcur == prn, rcur, lcur)
        par = parent[lidx, node]
        par_s = jnp.maximum(par, 0)

        lval = left[lidx, par_s]
        left = left.at[lidx, par_s].set(
            jnp.where(is_m & (lval == node), itc, lval))
        rval = right[lidx, par_s]
        right = right.at[lidx, par_s].set(
            jnp.where(is_m & (rval == node), itc, rval))
        parent = parent.at[lidx, itc].set(
            jnp.where(is_m, par, parent[lidx, itc]))

        mtime = tnew_all[lidx, node]

        def lift(rcv):
            rp = parent[lidx, jnp.maximum(rcv, 0)]
            again = is_m & (rp >= 0) & (
                age_new[lidx, jnp.maximum(rp, 0)] <= mtime)
            return jnp.where(again, rp, rcv), again.any()

        rcv, _ = jax.lax.while_loop(
            lambda st: st[1], lambda st: lift(st[0]),
            lift(targets[:, node]))
        rcv_s = jnp.maximum(rcv, 0)

        rp = parent[lidx, rcv_s]
        rp_s = jnp.maximum(rp, 0)
        lval = left[lidx, rp_s]
        left = left.at[lidx, rp_s].set(
            jnp.where(is_m & (rp >= 0) & (lval == rcv), node, lval))
        rval = right[lidx, rp_s]
        right = right.at[lidx, rp_s].set(
            jnp.where(is_m & (rp >= 0) & (rval == rcv), node, rval))
        parent = parent.at[lidx, node].set(
            jnp.where(is_m, rp, parent[lidx, node]))
        lval = left[lidx, node]
        rval = right[lidx, node]
        new_l = jnp.where(lval == prn, lval, rcv)
        new_r = jnp.where(lval == prn, rcv, rval)
        left = left.at[lidx, node].set(jnp.where(is_m, new_l, lval))
        right = right.at[lidx, node].set(jnp.where(is_m, new_r, rval))
        parent = parent.at[lidx, rcv_s].set(
            jnp.where(is_m, node, parent[lidx, rcv_s]))
        return (left, right, parent), None

    (gl, gr, gp), _ = jax.lax.scan(
        apply_one, (gt.left, gt.right, gt.parent),
        jnp.arange(T - 1, dtype=jnp.int32))
    gt_new = gt._replace(left=gl, right=gr, parent=gp, age=age_new)

    # --- full re-evaluation + remaining acceptance terms ----------------------
    logl_new = logl_fn(gt_new, state.subst, sp_new, state.clock)
    logpr_new, c_new, t2_new = logpr_fn(gt_new, sp_new,
                                        state.subst.heredity)

    # reverse-weight term (new tree): expand-down -> weight of target's
    # NEW parent (= y), pure expand -> weight of target, shrink -> y
    npartau = jnp.where(nparent >= 0, ntau[jnp.maximum(nparent, 0)],
                        jnp.inf)
    feas2 = is_inner & (nparent >= 0) & (ntau > 0)
    w2 = jnp.where(feas2,
                   1.0 / jnp.sqrt(jnp.maximum(npartau - ntau, 1e-30)), 0.0)
    w2 = w2 / jnp.maximum(w2.sum(), 1e-300)
    rev_node = jnp.where(shrink, y, jnp.where(went_down, y, c))
    lnacc = lnacc + jnp.log(jnp.maximum(w2[rev_node], 1e-300))

    # Jacobian + species-model prior + root-tau prior (stree.c:11090-11110)
    lnacc = lnacc + (g_scaled + sp_scaled) * jnp.log(taufactor)
    lnacc = lnacc + (log_species_model_prior(cfg, sp_new)
                     - log_species_model_prior(cfg, sp)).astype(dtype)
    tau0 = sp.tau[sp.root]
    root_new = jnp.argmax(jnp.where(nparent < 0, 1, 0)).astype(jnp.int32)
    tau0n = ntau[root_new]
    from ..config import PriorDist
    ta, tb = cfg.tauprior.alpha, cfg.tauprior.beta
    ndsp = jnp.sum(sp.tau[NS:] > 0) + 1
    if cfg.tauprior.dist == PriorDist.INVGAMMA:
        rt = (-ta - 1 - (ndsp - 2)) * jnp.log(tau0n / tau0) \
            - tb * (1 / tau0n - 1 / tau0)
    else:
        rt = (ta - 1 - (ndsp - 2)) * jnp.log(tau0n / tau0) \
            - tb * (tau0n - tau0)
    lnacc = lnacc + jnp.where(jnp.abs(tau0n - tau0) > 1e-20, rt, 0.0)

    lnacc = lnacc + lnhr.sum() \
        + jnp.sum(jnp.where(ctx.locus_mask,
                            (logl_new - state.logl)
                            + (logpr_new - state.logpr), 0.0))
    if cfg.theta_integrated:
        from . import notheta
        dpr = (notheta.total_integrated(cfg, c_new, t2_new,
                                        state.subst.heredity,
                                        ctx.locus_mask)
               - notheta.total_integrated(cfg, state.coal, state.t2h,
                                          state.subst.heredity,
                                          ctx.locus_mask))
        lnacc = lnacc + dpr - jnp.sum(jnp.where(
            ctx.locus_mask, logpr_new - state.logpr, 0.0))

    # correlated-clock branch-rate prior depends on the species
    # topology + taus (stree.c:11314-11318 in SNL)
    lnr_new = None
    if state.clock is not None and cfg.clock == Clock.CORRELATED:
        from .clock_moves import lnprior_rates
        lnr_new = lnprior_rates(cfg, sp_new, state.subst.mu, state.clock)
        lnacc = lnacc + jnp.sum(jnp.where(
            ctx.locus_mask, lnr_new - state.clock.lnrates, 0.0))

    bad_any = bad | badmask.any() | ~jnp.isfinite(lnacc)
    # morphological traits: re-score on the proposed topology
    # (stree.c:727-736 subtracts trait_old_logl and adds
    # loglikelihood_trait inside the SPR lnacceptance)
    tl_new = None
    if ctx.trait_fn_topo is not None and state.trait is not None:
        tl_new = ctx.trait_fn_topo(sp_new.left, sp_new.right,
                                   sp_new.parent, sp_new.tau,
                                   state.trait.brate)
        lnacc = lnacc + jnp.sum(tl_new - state.trait.logl)
    lnacc = jnp.where(bad_any, -jnp.inf, lnacc)
    accept = rng.mh_accept(k_acc, lnacc)

    def pick(new, old):
        return jax.tree.map(lambda n, o: jnp.where(accept, n, o), new, old)

    new_state = state._replace(
        gt=pick(gt_new, gt), sp=pick(sp_new, sp),
        logl=jnp.where(accept, logl_new, state.logl),
        logpr=jnp.where(accept, logpr_new, state.logpr))
    if cfg.theta_integrated:
        new_state = new_state._replace(
            coal=jnp.where(accept, c_new, state.coal),
            t2h=jnp.where(accept, t2_new, state.t2h))
    if lnr_new is not None:
        new_state = new_state._replace(clock=state.clock._replace(
            lnrates=jnp.where(accept, lnr_new, state.clock.lnrates)))
    if tl_new is not None:
        new_state = new_state._replace(trait=state.trait._replace(
            logl=jnp.where(accept, tl_new, state.trait.logl)))
    return new_state, (jnp.ones((), jnp.int32), accept.astype(jnp.int32))
