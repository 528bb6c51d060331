"""Batched Felsenstein pruning over ``[loci, sites, cats, states]``.

TPU-native replacement for the reference's CLV kernels
(``src/core_partials.c`` ``pll_core_update_partial_ii:585``,
``src/core_likelihood.c`` ``pll_core_root_loglikelihood:24``, and the
per-locus drivers ``src/locus.c:2417-2614``).

Design (SURVEY.md §7): instead of walking one gene tree and updating
one CLV path per proposal, all loci are processed together by an
age-ordered scan: gene-tree nodes sorted by age are valid topological
order (children are always younger), so step ``k`` updates inner node
``order[l, k]`` of every locus ``l`` at once.  Numerical scaling is a
per-site running renormalization (log-scale accumulator) instead of the
reference's 2^256 scaler counters (``core_partials.c:682-755``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The 4-state CLV contraction runs on the VPU as a broadcast
# multiply-sum: a 4-wide matmul would use ~3% of the MXU and, worse,
# default to bf16 inputs (logL noise corrupts MH acceptance decisions).


def _pclv(P, x):
    """parent partial: sum_b P[l,c,a,b] * x[l,s,c,b] -> [L,S,C,A]."""
    if P.shape[-1] >= 20:
        # 20-state (AA): wide enough for the MXU; HIGHEST keeps fp32
        return jnp.einsum("lcab,lscb->lsca", P, x,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(P[:, None] * x[:, :, :, None, :], axis=-1)


def _rootdot(clv, freqs, cw):
    """site likelihood: sum_{c,a} clv[l,s,c,a] pi[l,a] w[l,c] -> [L,S]."""
    return jnp.sum(clv * freqs[:, None, None, :] * cw[:, None, :, None],
                   axis=(2, 3))

from ..trees.gtree import BIG_AGE, GTrees, inner_order, root_index  # noqa: F401


def relaxed_branch_lengths(gt: GTrees, sp, pops, brate):
    """Per-node branch lengths under a relaxed clock ``[L, N]``.

    The gene-tree edge of node u spans times [age_u, age_parent_u) and
    ascends from population pops[u]; its expected-substitutions length
    is the rate-weighted sum of its overlap with every population it
    crosses (src/locus.c:1151 update_branchlength_relaxed_clock, but as
    one masked tensor contraction instead of a pointer walk):

      len_u = sum_h visits[u, h] * brate[l, h]
              * max(0, min(t_parent, tau_top(h)) - max(t_u, tau_h))

    For plain trees ``visits = pptable[pops]`` (ancestor-or-self mask);
    populations above the parent's population contribute 0 via the
    clamp.  For MSC-I networks the hpath-routed ``edge_passes`` mask is
    used.  Zero-duration populations (htau==0 hybridization segments,
    locus.c:1139 skip) contribute 0 automatically.
    """
    tau = sp.tau
    par = sp.parent
    if getattr(sp, "rate_owner", None) is not None:
        # BDI mirror segments read their hinner partner's rate (the
        # reference never assigns mirror rates; method.c:4235)
        brate = brate[:, sp.rate_owner]
    partau = jnp.where(par >= 0, tau[jnp.maximum(par, 0)], BIG_AGE)
    safe_parent = jnp.maximum(gt.parent, 0)
    from ..trees.gtree import gather_rows
    page = gather_rows(gt.age, safe_parent)                      # [L, N]
    if sp.is_network:
        from ..trees.gtree import edge_passes
        visits = edge_passes(gt, sp, pops)                       # [L, N, H]
    else:
        visits = sp.pptable[pops]                                # [L, N, H]
    lo = jnp.maximum(gt.age[..., None], tau[None, None, :])
    hi = jnp.minimum(page[..., None], partau[None, None, :])
    seg = jnp.maximum(hi - lo, 0.0)
    blen = jnp.sum(jnp.where(visits, seg, 0.0) * brate[:, None, :], axis=-1)
    return jnp.where(gt.parent >= 0, blen, 0.0)


def branch_lengths(gt: GTrees, rate):
    """Per-node branch length to parent, scaled by per-locus rate ``[L]``.

    Root/padded nodes (parent == -1) get 0.
    """
    safe_parent = jnp.maximum(gt.parent, 0)
    from ..trees.gtree import gather_rows as _gr
    page = _gr(gt.age, safe_parent)
    # clamp at 0 like the incremental path (edge_pmats): transient float32
    # parent-child inversions of a few ulps must read as zero-length
    # branches, not negative times (negative t explodes the eigen P(t))
    blen = jnp.where(gt.parent >= 0, jnp.maximum(page - gt.age, 0.0), 0.0)
    return blen * rate[:, None]


def tip_partials_from_codes(codes, dtype=jnp.float32, n_states=4):
    """Expand ambiguity masks ``[L, T, S]`` to 0/1 partials
    ``[L, T, S, A]`` (A = 4 nucleotide / 20 amino-acid states)."""
    bits = jnp.arange(n_states, dtype=codes.dtype)
    return ((codes[..., None] >> bits) & 1).astype(dtype)


def reduce_root(site_logl, weights, res_map=None, res_count=None):
    """Weighted per-site reduction with diploid resolution averaging.

    ``site_logl [L, S]`` are per-likelihood-pattern log-likelihoods;
    with ``res_map [L, W, R]``/``res_count [L, W]`` each weight pattern
    averages its resolution columns (locus.c:2587-2614), in log space
    via logsumexp so per-pattern scaling is respected.
    """
    if res_map is None:
        # site_logl may be wider than weights (the Pallas kernel pads
        # the pattern axis to a multiple of 128); the tail is padding
        return jnp.sum(weights * site_logl[:, :weights.shape[1]], axis=1)
    L, W, R = res_map.shape
    if R == 1:
        gathered = jnp.take_along_axis(site_logl, res_map[..., 0], axis=1)
        return jnp.sum(weights * gathered, axis=1)
    lidx = jnp.arange(L)[:, None, None]
    vals = site_logl[lidx, res_map]                          # [L, W, R]
    jidx = jnp.arange(R)[None, None, :]
    valid = jidx < res_count[..., None]
    neg = jnp.asarray(-1e30, site_logl.dtype)
    vals = jnp.where(valid, vals, neg)
    m = jnp.max(vals, axis=-1)
    sumexp = jnp.sum(jnp.where(valid, jnp.exp(vals - m[..., None]), 0.0), -1)
    logmean = m + jnp.log(sumexp) - jnp.log(res_count)
    return jnp.sum(weights * logmean, axis=1)


def loglikelihood(
    gt: GTrees,
    tip_partials,      # [L, T, S, A]
    weights,           # [L, W]
    n_seq,             # [L]
    pmats,             # [L, N, C, A, A] transition matrix of each node's branch
    freqs,             # [L, A]
    cat_weights,       # [C] or [L, C]
    order=None,        # [L, T-1] precomputed schedule (optional)
    return_site=False,
    res_map=None,      # [L, W, R] resolution columns per weight pattern
    res_count=None,    # [L, W]
):
    """Log-likelihood of every locus: ``[L]`` (masked loci give 0).

    ``pmats[l, i]`` is P(branch above node i) for each rate category.
    """
    L, T, S, A = tip_partials.shape
    N = 2 * T - 1
    C = pmats.shape[2]
    dtype = tip_partials.dtype
    lidx = jnp.arange(L)

    if order is None:
        order = inner_order(gt)

    # CLV buffer over all nodes; tips broadcast over categories
    clv = jnp.zeros((L, N, S, C, A), dtype=dtype)
    clv = clv.at[:, :T].set(tip_partials[:, :, :, None, :])
    logscale = jnp.zeros((L, S), dtype=dtype)

    tiny = jnp.asarray(1e-30, dtype)

    def step(carry, k):
        clv, logscale = carry
        node = order[:, k]                                     # [L]
        lc = gt.left[lidx, node]
        rc = gt.right[lidx, node]
        xl = clv[lidx, lc]                                     # [L,S,C,A]
        xr = clv[lidx, rc]
        Pl = pmats[lidx, lc]                                   # [L,C,A,A]
        Pr = pmats[lidx, rc]
        yl = _pclv(Pl, xl)
        yr = _pclv(Pr, xr)
        y = yl * yr
        m = jnp.max(y, axis=(2, 3), keepdims=True)             # [L,S,1,1]
        msafe = jnp.maximum(m, tiny)
        y = y / msafe
        valid = (k < n_seq - 1)                                # [L]
        logscale = logscale + jnp.where(
            valid[:, None], jnp.log(msafe[:, :, 0, 0]), 0.0)
        clv = clv.at[lidx, node].set(y)
        return (clv, logscale), None

    (clv, logscale), _ = jax.lax.scan(
        step, (clv, logscale), jnp.arange(T - 1))

    root = order[lidx, n_seq - 2]
    root_clv = clv[lidx, root]                                 # [L,S,C,A]
    cw = jnp.broadcast_to(
        cat_weights if cat_weights.ndim == 2 else cat_weights[None, :], (L, C))
    site_lik = _rootdot(root_clv, freqs, cw)
    site_logl = jnp.log(jnp.maximum(site_lik, tiny)) + logscale
    logl = reduce_root(site_logl, weights, res_map, res_count)
    if return_site:
        return logl, site_logl
    return logl
