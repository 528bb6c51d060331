"""Incremental (path-update) likelihood engine.

The reference recomputes, per proposal, only the CLVs on the path from
the changed node to the root (``SWAP_CLV_INDEX`` double-buffering,
``src/gtree.c:5445-5533``).  This module is the batched TPU analog: a
cache of per-node quantities

  * ``clv [L, N, S, C, A]`` conditional likelihood vectors,
  * ``cum [L, N, S]`` cumulative log-scales of each subtree,
  * ``leaves [L, N]`` subtree tip counts (gnode->leaves),
  * ``msp [L, N]`` species-MRCA of the subtree's tips,

plus a root-ward *stale-set walk* over up to two chains (an age move
stales one rootward chain; an SPR stales the chains above both the
pruned and the regraft location).  Each step computes the youngest
not-yet-recomputed stale node, sourcing each child from a frontier (if
the child is that chain's previously computed node) or from the cache.
``jax.lax.while_loop`` makes the cost the actual max chain length
across loci (~log T for coalescent trees), not the worst case.

Rollback: evaluate with a non-destructive walk, then re-walk committing
only accepted loci.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# The 4-state CLV contraction runs on the VPU as a broadcast
# multiply-sum: a 4-wide matmul would use ~3% of the MXU and, worse,
# default to bf16 inputs (logL noise corrupts MH acceptance decisions).


def _pclv(P, x):
    """parent partial: sum_b P[l,c,a,b] * x[l,s,c,b] -> [L,S,C,A]."""
    return jnp.sum(P[:, None] * x[:, :, :, None, :], axis=-1)


def _rootdot(clv, freqs, cw):
    """site likelihood: sum_{c,a} clv[l,s,c,a] pi[l,a] w[l,c] -> [L,S]."""
    return jnp.sum(clv * freqs[:, None, None, :] * cw[:, None, :, None],
                   axis=(2, 3))

from ..config import SubstModel
from ..trees.gtree import GTrees, SpeciesArrays
from . import pmatrix as pm
from .felsenstein import reduce_root

TINY = 1e-30


class ClvCache(NamedTuple):
    clv: jax.Array     # [L, N, S, C, A]
    cum: jax.Array     # [L, N, S] cumulative log-scale of each subtree
    leaves: jax.Array  # [L, N] int32 subtree tip counts
    msp: jax.Array     # [L, N] int32 species-MRCA of subtree tips


def edge_pmats(blen, subst, model: SubstModel):
    """P(t) for one edge per locus: blen [L] -> [L, C, A, A]."""
    teff = jnp.maximum(blen, 0.0)[:, None] * subst.rates     # [L, C]
    if model == SubstModel.JC69:
        return pm.pmatrix_jc69(teff)
    if model in (SubstModel.K80, SubstModel.F81, SubstModel.HKY,
                 SubstModel.T92, SubstModel.TN93, SubstModel.F84):
        f = subst.freqs[:, None, :]
        return pm.pmatrix_tn93(teff, f, subst.kappa1[:, None],
                               subst.kappa2[:, None])
    if model in (SubstModel.GTR, SubstModel.CUSTOM):
        # CUSTOM keeps per-locus eigensystems fresh (state.refresh_eigen)
        return pm.pmatrix_eigen(teff, subst.eigw[:, None, :],
                                subst.eigT[:, None, :, :],
                                subst.eigTi[:, None, :, :])
    raise NotImplementedError(model)


def build_cache(gt: GTrees, sp: SpeciesArrays, tip_partials, tip_pop, n_seq,
                subst, model, order=None):
    """Full pruning pass storing CLVs, scales, leaves and species MRCAs."""
    from ..trees.gtree import inner_order

    L, T, S, A = tip_partials.shape
    N = 2 * T - 1
    dtype = tip_partials.dtype
    lidx = jnp.arange(L)
    if order is None:
        order = inner_order(gt)

    clv = jnp.zeros((L, N, S, subst.rates.shape[1], A), dtype=dtype)
    clv = clv.at[:, :T].set(tip_partials[:, :, :, None, :])
    cum = jnp.zeros((L, N, S), dtype=dtype)
    tipvalid = (jnp.arange(T)[None, :] < n_seq[:, None])
    leaves = jnp.zeros((L, N), jnp.int32).at[:, :T].set(tipvalid)
    msp = jnp.zeros((L, N), jnp.int32).at[:, :T].set(tip_pop)
    mu = subst.mu

    def step(carry, k):
        clv, cum, leaves, msp = carry
        node = order[:, k]
        lc = gt.left[lidx, node]
        rc = gt.right[lidx, node]
        na = gt.age[lidx, node]
        Pl = edge_pmats((na - gt.age[lidx, lc]) * mu, subst, model)
        Pr = edge_pmats((na - gt.age[lidx, rc]) * mu, subst, model)
        yl = _pclv(Pl, clv[lidx, lc])
        yr = _pclv(Pr, clv[lidx, rc])
        y = yl * yr
        m = jnp.maximum(jnp.max(y, axis=(2, 3), keepdims=True), TINY)
        clv = clv.at[lidx, node].set(y / m)
        cum = cum.at[lidx, node].set(
            cum[lidx, lc] + cum[lidx, rc] + jnp.log(m[:, :, 0, 0]))
        leaves = leaves.at[lidx, node].set(
            leaves[lidx, lc] + leaves[lidx, rc])
        msp = msp.at[lidx, node].set(sp.mrca[msp[lidx, lc], msp[lidx, rc]])
        return (clv, cum, leaves, msp), None

    (clv, cum, leaves, msp), _ = jax.lax.scan(
        step, (clv, cum, leaves, msp), jnp.arange(T - 1))
    return ClvCache(clv=clv, cum=cum, leaves=leaves, msp=msp)


def cache_logl(gt: GTrees, cache: ClvCache, subst, n_seq, weights,
               res_map, res_count, order=None):
    """Total log-likelihood from a (valid) cache."""
    from ..trees.gtree import root_index

    L = gt.n_loci
    lidx = jnp.arange(L)
    root = root_index(gt, n_seq, order=order)
    return _root_reduce(cache.clv[lidx, root], cache.cum[lidx, root],
                        subst, weights, res_map, res_count)


def _root_reduce(slab, cum_s, subst, weights, res_map, res_count):
    C = subst.rates.shape[1]
    L = slab.shape[0]
    cw = jnp.full((L, C), 1.0 / C, slab.dtype)
    site_lik = _rootdot(slab, subst.freqs, cw)
    site_logl = jnp.log(jnp.maximum(site_lik, TINY)) + cum_s
    return reduce_root(site_logl, weights, res_map, res_count)


def stale_walk(
    gt: GTrees,
    sp: SpeciesArrays,
    cache: ClvCache,
    startB,                 # [L] always-stale node (the re-aged/new-parent)
    startA=None,            # [L] optional second stale start (old grandparent)
    activeA=None,           # [L] bool where startA applies
    *,
    subst, model, weights, res_map, res_count,
    valid,                  # [L] loci to process at all
    commit_mask=None,       # if given: write results into cache where True
):
    """Recompute the stale chains of ``startA``/``startB`` root-ward.

    Returns ``(logl_new [L], cache')``.  When ``commit_mask`` is None
    the cache is returned unmodified (pure evaluation; logl is 0 for
    loci outside ``valid``).

    Invariant: the stale set is the union of the rootward chains of the
    start nodes *in the proposed topology*; each step computes the
    youngest pending stale node, so a stale child of the node being
    computed is always a frontier's freshly computed previous node
    (sourced from its slab), never a stale cache read.
    """
    L = gt.n_loci
    lidx = jnp.arange(L)
    dtype = cache.clv.dtype
    S, C, A = cache.clv.shape[2:]
    do_commit = commit_mask is not None

    if startA is None:
        startA = jnp.zeros((L,), jnp.int32)
        activeA = jnp.zeros((L,), bool)

    mask = valid if commit_mask is None else (valid & commit_mask)

    zero_slab = jnp.zeros((L, S, C, A), dtype)
    zero_cum = jnp.zeros((L, S), dtype)
    zeroi = jnp.zeros((L,), jnp.int32)
    neg1 = jnp.full((L,), -1, jnp.int32)

    init = (
        activeA & mask, mask,                 # actA, actB
        jnp.asarray(startA, jnp.int32), jnp.asarray(startB, jnp.int32),
        neg1, neg1,                           # curA, curB (computed nodes)
        zero_slab, zero_cum, zeroi, zeroi,    # slabA, cumA, lvA, mspA
        zero_slab, zero_cum, zeroi, zeroi,    # slabB, cumB, lvB, mspB
        jnp.zeros((L,), dtype),               # logl
        cache,
    )

    def cond(carry):
        return jnp.any(carry[0] | carry[1])

    def body(carry):
        (actA, actB, nextA, nextB, curA, curB,
         slabA, cumA, lvA, mspA, slabB, cumB, lvB, mspB,
         logl, cache) = carry
        clv, cum, leaves, msp = cache

        ageA = jnp.where(actA, gt.age[lidx, nextA], jnp.inf)
        ageB = jnp.where(actB, gt.age[lidx, nextB], jnp.inf)
        useA = actA & (ageA <= ageB)
        act = actA | actB
        node = jnp.where(useA, nextA, nextB)

        lc = gt.left[lidx, node]
        rc = gt.right[lidx, node]

        def child(c):
            isA = c == curA
            isB = c == curB
            m4a = isA[:, None, None, None]
            m4b = isB[:, None, None, None]
            cv = jnp.where(m4a, slabA, jnp.where(m4b, slabB, clv[lidx, c]))
            cc = jnp.where(isA[:, None], cumA,
                           jnp.where(isB[:, None], cumB, cum[lidx, c]))
            clvs = jnp.where(isA, lvA, jnp.where(isB, lvB, leaves[lidx, c]))
            cmsp = jnp.where(isA, mspA, jnp.where(isB, mspB, msp[lidx, c]))
            return cv, cc, clvs, cmsp

        lv_, lcum, llvs, lmsp = child(lc)
        rv_, rcum, rlvs, rmsp = child(rc)
        na = gt.age[lidx, node]
        Pl = edge_pmats((na - gt.age[lidx, lc]) * subst.mu, subst, model)
        Pr = edge_pmats((na - gt.age[lidx, rc]) * subst.mu, subst, model)
        y = (_pclv(Pl, lv_)
             * _pclv(Pr, rv_))
        m = jnp.maximum(jnp.max(y, axis=(2, 3), keepdims=True), TINY)
        nslab = y / m
        ncum = lcum + rcum + jnp.log(m[:, :, 0, 0])
        nlvs = llvs + rlvs
        nmsp = sp.mrca[lmsp, rmsp]

        if do_commit:
            w4 = act[:, None, None, None]
            clv = clv.at[lidx, node].set(jnp.where(w4, nslab, clv[lidx, node]))
            cum = cum.at[lidx, node].set(
                jnp.where(act[:, None], ncum, cum[lidx, node]))
            leaves = leaves.at[lidx, node].set(
                jnp.where(act, nlvs, leaves[lidx, node]))
            msp = msp.at[lidx, node].set(
                jnp.where(act, nmsp, msp[lidx, node]))

        p = gt.parent[lidx, node]
        at_root = act & (p < 0)
        if not do_commit:
            lr = _root_reduce(nslab, ncum, subst, weights, res_map, res_count)
            logl = jnp.where(at_root, lr, logl)

        # merge: the non-picked frontier dies if its next is this node
        killB = useA & actB & (nextB == node)
        killA = (~useA) & actA & (nextA == node)
        actA = actA & ~killA
        actB = actB & ~killB

        updA = useA & act
        updB = (~useA) & actB & act
        a4 = updA[:, None, None, None]
        b4 = updB[:, None, None, None]
        slabA = jnp.where(a4, nslab, slabA)
        cumA = jnp.where(updA[:, None], ncum, cumA)
        lvA = jnp.where(updA, nlvs, lvA)
        mspA = jnp.where(updA, nmsp, mspA)
        curA = jnp.where(updA, node, curA)
        nextA = jnp.where(updA, jnp.maximum(p, 0), nextA)
        actA = actA & ~(updA & at_root)
        slabB = jnp.where(b4, nslab, slabB)
        cumB = jnp.where(updB[:, None], ncum, cumB)
        lvB = jnp.where(updB, nlvs, lvB)
        mspB = jnp.where(updB, nmsp, mspB)
        curB = jnp.where(updB, node, curB)
        nextB = jnp.where(updB, jnp.maximum(p, 0), nextB)
        actB = actB & ~(updB & at_root)

        return (actA, actB, nextA, nextB, curA, curB,
                slabA, cumA, lvA, mspA, slabB, cumB, lvB, mspB,
                logl, ClvCache(clv, cum, leaves, msp))

    out = jax.lax.while_loop(cond, body, init)
    logl = out[-2]
    if do_commit:
        return logl, out[-1]
    return logl, cache
