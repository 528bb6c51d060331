"""MSC (multispecies coalescent) log-density, batched over loci.

TPU-native replacement for the reference's per-population event-list
walk (``src/gtree.c:3859`` ``gtree_update_logprob_contrib``,
``gtree_logprob:3957``).  Instead of maintaining per-(population,
locus) dlists of coalescent events, everything is recomputed from the
fixed-shape gene-tree arrays each call (SURVEY.md §7: recompute beats
bookkeeping on TPU — it is a masked sort/scan, tiny next to the CLVs).

Per population h with n_in entering lineages and k coalescences at
sorted times t_1..t_k inside [tau_h, tau_parent_h):

  T2h      = sum_i n_i (n_i - 1) (t_i+1 - t_i)      (n decrements at events)
  contrib  = k log(2 / (heredity * theta_h)) - T2h / (heredity * theta_h)

The theta-integrated variant (``gtree.c:3780`` analog) marginalizes
theta_h under its inverse-gamma prior:
  contrib = k log(2/heredity) + a log b - lgamma(a)
            + lgamma(a + K_h) - (a + K_h) log(b + C_h)
where K_h/C_h aggregate counts/T2h over all loci, so it is computed
from the same per-locus (k, T2h) tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gtree import BIG_AGE, GTrees, SpeciesArrays

_FINITE_BIG = 1.0e12


def per_pop_stats(gt: GTrees, sp: SpeciesArrays, pops, n_seq):
    """Coalescent counts and waiting-time sums per (locus, population).

    Args:
      pops: ``[L, N]`` population of every gene node (assign_populations).
      n_seq: ``[L]`` valid tip counts.

    Returns:
      (coal_count ``[L, H]`` int32, T2h ``[L, H]`` float, n_in ``[L, H]`` int32)

    Without serial sampling, every lineage enters population h at
    ``tau_h`` (n_in of them) and the count only DECREASES — by one at
    each coalescence inside ``[tau_h, end_h)``.  Abel summation of
    ``T2h = sum_j n_j (n_j - 1) (t_{j+1} - t_j)`` with ``n_j = n_in - j``
    then gives a closed event-rank form (no sort, no pairwise tensor):

      T2h = (n_in - k)(n_in - k - 1) end_h - n_in (n_in - 1) tau_h
            + sum_events 2 (n_in - rank_e) t_e

    where ``rank_e`` (1-based) is the event's time rank among the
    events of its own population — computed by an O(T^2/4) pairwise
    age comparison over the inner nodes, with no H axis.  This
    replaces both the reference's per-population sorted event sweep
    (``gtree.c:3859``) and this file's earlier pairwise-coexistence
    form, whose ``[L, N, N, H]`` tensor dominated the MSC-density cost
    at scale.  Dated tips (mid-interval entries) take
    :func:`per_pop_stats_dated` instead.
    """
    if gt.n_tips <= 1:
        return _per_pop_stats_pairwise(gt, sp, pops, n_seq)
    from .gtree import table_rows

    L, N = pops.shape
    T = gt.n_tips
    H = sp.n_nodes
    node_idx = jnp.arange(N)[None, :]
    is_tip = node_idx < n_seq[:, None]
    is_inner = (node_idx >= T) & (node_idx < T + n_seq[:, None] - 1)
    valid = is_tip | is_inner

    tau = sp.tau
    par = sp.parent
    partau = jnp.where(par >= 0, tau[jnp.maximum(par, 0)], jnp.inf)
    end = jnp.minimum(partau, _FINITE_BIG)                   # [H]

    has_par = gt.parent >= 0
    from .gtree import gather_rows
    page = jnp.where(
        has_par,
        gather_rows(gt.age, jnp.maximum(gt.parent, 0)),
        _FINITE_BIG)
    if sp.is_network:
        from .gtree import edge_passes
        anc = edge_passes(gt, sp, pops)                      # [L, N, H]
    else:
        anc = table_rows(sp.pptable, pops)                   # [L, N, H]
    pres = anc & valid[..., None]

    # lineages entering each population (at tau_h)
    inh = pres & (gt.age[..., None] <= tau) & (tau < page[..., None])
    n_in = inh.sum(axis=1).astype(jnp.int32)                 # [L, H]

    # coalescent events per population
    ev_pop = jnp.where(is_inner, pops, -1)                   # [L, N]
    ev_oh = (ev_pop[:, T:, None] == jnp.arange(H))           # [L, T-1, H]
    coal = ev_oh.sum(axis=1).astype(jnp.int32)               # [L, H]

    # event ranks within their population: 1 + #(earlier same-pop events)
    ia = gt.age[:, T:]                                       # [L, T-1]
    same = (ev_pop[:, T:, None] == ev_pop[:, T:][:, None, :]) \
        & is_inner[:, T:, None] & is_inner[:, T:][:, None, :]
    iidx = jnp.arange(T - 1)
    earlier = (ia[:, None, :] < ia[:, :, None]) | (
        (ia[:, None, :] == ia[:, :, None])
        & (iidx[None, None, :] < iidx[None, :, None]))
    rank = 1 + jnp.sum(same & earlier, axis=2).astype(ia.dtype)  # [L, T-1]

    # n at each event = n_in[pop_e] - rank_e + 1; event term 2(n-1) t_e
    n_in_e = jnp.einsum("leh,lh->le", ev_oh.astype(ia.dtype),
                        n_in.astype(ia.dtype))
    contrib = 2.0 * (n_in_e - rank) * ia * is_inner[:, T:].astype(ia.dtype)
    ev_sum = jnp.einsum("leh,le->lh", ev_oh.astype(ia.dtype), contrib)

    n_inf = n_in.astype(ia.dtype)
    k_f = coal.astype(ia.dtype)
    nk = n_inf - k_f
    T2h = nk * (nk - 1.0) * end - n_inf * (n_inf - 1.0) * tau + ev_sum
    # pops with no entering lineages contribute exactly 0 (guards the
    # end*0*(0-1) arithmetic at the clamped root horizon)
    T2h = jnp.where(n_in > 0, T2h, 0.0)
    return coal, T2h, n_in


def _per_pop_stats_pairwise(gt: GTrees, sp: SpeciesArrays, pops, n_seq):
    """Pairwise-coexistence form of :func:`per_pop_stats` (O(N^2 H)).

    T2h equals the summed pairwise coexistence time of distinct lineage
    edges inside the interval (each ordered pair (u, v) is jointly
    present for |I_u ∩ I_v ∩ [tau_h, end_h)|).  Slower than the
    event-rank form but valid under serial sampling — dated tips enter
    populations mid-interval, so the "count only decreases" premise of
    the Abel form does not hold there.
    """
    from .gtree import edge_passes

    L, N = pops.shape
    T = gt.n_tips
    H = sp.n_nodes
    node_idx = jnp.arange(N)[None, :]
    is_tip = node_idx < n_seq[:, None]
    is_inner = (node_idx >= T) & (node_idx < T + n_seq[:, None] - 1)
    valid = is_tip | is_inner

    tau = sp.tau
    par = sp.parent
    partau = jnp.where(par >= 0, tau[jnp.maximum(par, 0)], jnp.inf)
    end = jnp.minimum(partau, _FINITE_BIG)                   # [H]

    # edge of node u spans [age_u, age_parent_u); root edge to +inf
    has_par = gt.parent >= 0
    from .gtree import gather_rows
    page = jnp.where(
        has_par,
        gather_rows(gt.age, jnp.maximum(gt.parent, 0)),
        _FINITE_BIG)
    # the edge's route visits h (ancestry for trees, hpath-routed walk
    # for MSC-I networks)
    if sp.is_network:
        anc = edge_passes(gt, sp, pops)                      # [L, N, H]
    else:
        anc = sp.pptable[pops]                               # [L, N, H]
    pres = anc & valid[..., None]

    # --- lineages entering each population (at tau_h) -------------------------
    inh = pres & (gt.age[..., None] <= tau) & (tau < page[..., None])
    n_in = inh.sum(axis=1).astype(jnp.int32)                 # [L, H]

    # --- coalescent events in each population ---------------------------------
    ev_in_h = (jnp.where(is_inner & valid, pops, -1)[..., None]
               == jnp.arange(H))                             # [L, N, H]
    coal = ev_in_h.sum(axis=1).astype(jnp.int32)             # [L, H]

    # --- pairwise coexistence T2h ---------------------------------------------
    # presence interval of edge u inside pop h (empty -> lo == hi)
    lo = jnp.clip(gt.age[..., None], tau, end)               # [L, N, H]
    hi = jnp.clip(page[..., None], tau, end)
    lo = jnp.where(pres, lo, end)
    hi = jnp.where(pres, hi, end)
    ov = jnp.maximum(
        jnp.minimum(hi[:, :, None], hi[:, None, :, :])
        - jnp.maximum(lo[:, :, None], lo[:, None, :, :]), 0.0)
    # the diagonal (u == v) is excluded directly rather than subtracted
    # afterwards: root-population intervals are clamped at 1e12 and a
    # subtract-the-diagonal formulation would cancel catastrophically
    # in float32 (ulp(1e12) = 65536)
    ov = ov * (1.0 - jnp.eye(N, dtype=ov.dtype))[None, :, :, None]
    T2h = ov.sum((1, 2))                                     # [L, H]
    return coal, T2h, n_in


def per_pop_stats_dated(gt: GTrees, sp: SpeciesArrays, pops, n_seq):
    """Serial-sampling (dated tips) variant: uses the pairwise
    coexistence form, which is exact when lineages enter a population
    mid-interval (a dated tip's presence interval starts at its age).
    The Abel event-rank form of :func:`per_pop_stats` assumes every
    lineage enters at ``tau_h`` and is wrong for tip ages > 0."""
    return _per_pop_stats_pairwise(gt, sp, pops, n_seq)


def phi_entry_counts(sp: SpeciesArrays, n_in):
    """Effective per-node entry counts for the phi terms ``[L, H]``.

    For plain hybridizations these are ``n_in`` directly (lineages
    entering hinner pay log(phi), entering the mirror pay log(1-phi)).
    For a BDI hinner X, ``n_in[X]`` also counts partner-side switchers
    (they enter X at the shared tau after passing the partner's mirror)
    — those already paid log(phi[mirror_Y]), so they are subtracted
    (the reference counts via per-mirror seqin, gtree.c:3925)."""
    if sp.bdi_partner is None:
        return n_in
    part = sp.bdi_partner
    pmir = jnp.where(part >= 0, sp.hybrid[jnp.maximum(part, 0)], 0)
    sub = jnp.where(part >= 0, n_in[:, pmir], 0)
    return n_in - jnp.where((part >= 0)[None, :], sub, 0)


def msc_contrib(coal, T2h, theta, heredity):
    """Per-(locus, population) MSC log-density contributions ``[L, H]``."""
    th = theta[None, :] * heredity[:, None]
    th = jnp.maximum(th, 1e-300)
    return coal * jnp.log(2.0 / th) - T2h / th


def msc_logprob(gt: GTrees, sp: SpeciesArrays, pops, n_seq, heredity):
    """Total MSC log-density per locus ``[L]`` (theta-estimated path)."""
    coal, T2h, _ = per_pop_stats(gt, sp, pops, n_seq)
    return msc_contrib(coal, T2h, sp.theta, heredity).sum(axis=1)


def msc_logprob_integrated(coal, T2h, heredity, a, b, locus_mask):
    """theta-integrated-out total log PG over ALL loci (scalar).

    Marginalizes each population's theta under InvGamma(a, b):
      integral prod_l (2/(h_l th))^{k_l} exp(-T2_l/(h_l th)) d InvG(th)
      = 2^K b^a Gamma(a+K) / (Gamma(a) (b+C)^{a+K}) * prod_l h_l^{-k_l}
    with K = sum_l k_l, C = sum_l T2_l/h_l.
    """
    mask = locus_mask[:, None]
    K = jnp.sum(coal * mask, axis=0)                        # [H]
    C = jnp.sum(T2h / heredity[:, None] * mask, axis=0)     # [H]
    hterm = jnp.sum(
        jnp.where(mask, coal * jnp.log(2.0 / heredity[:, None]), 0.0), axis=0)
    lg = (a * jnp.log(b) - jax.lax.lgamma(jnp.asarray(a, C.dtype))
          + jax.lax.lgamma(a + K) - (a + K) * jnp.log(b + C))
    return jnp.sum(hterm + lg)
