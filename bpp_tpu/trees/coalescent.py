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

    # --- lineages entering each population -----------------------------------
    # edge of node u spans [age_u, age_parent_u); root edge spans to +inf
    has_par = gt.parent >= 0
    page = jnp.where(
        has_par,
        jnp.take_along_axis(gt.age, jnp.maximum(gt.parent, 0), axis=1),
        jnp.inf)
    # lineage is in h at time tau_h iff the edge's route visits h
    # (ancestry for trees, hpath-dependent walk for MSC-I networks)
    # and age_u <= tau_h < age_parent_u
    if sp.is_network:
        anc = edge_passes(gt, sp, pops)                      # [L, N, H]
    else:
        anc = sp.pptable[pops]                               # [L, N, H]
    inh = anc & (gt.age[..., None] <= tau) & (tau < page[..., None])
    inh = inh & valid[..., None]
    n_in = inh.sum(axis=1).astype(jnp.int32)                 # [L, H]

    # --- coalescent events in each population --------------------------------
    is_event = is_inner & valid                              # [L, N]
    ev_pop = jnp.where(is_event, pops, -1)
    ev_in_h = ev_pop[..., None] == jnp.arange(H)             # [L, N, H]
    coal = ev_in_h.sum(axis=1).astype(jnp.int32)             # [L, H]

    # sorted event times per (l, h): mask then sort along node axis
    times = jnp.where(ev_in_h, gt.age[..., None], BIG_AGE)   # [L, N, H]
    times = jnp.sort(times, axis=1)
    times = jnp.swapaxes(times, 1, 2)                        # [L, H, N]

    # clamp padded events to the population end time
    end = jnp.minimum(partau, _FINITE_BIG)                   # [H]
    endb = jnp.broadcast_to(end, (L, H))
    kidx = jnp.arange(N)[None, None, :]
    t_ev = jnp.where(kidx < coal[..., None], times, endb[..., None])
    t_all = jnp.concatenate(
        [jnp.broadcast_to(tau, (L, H))[..., None], t_ev, endb[..., None]],
        axis=-1)                                             # [L, H, N+2]
    dt = jnp.diff(t_all, axis=-1)                            # [L, H, N+1]
    ni = n_in[..., None] - kidx                              # lineages in segment i
    ni = jnp.concatenate(
        [ni, (n_in - coal)[..., None]], axis=-1)
    coeff = (ni * (ni - 1)).astype(t_all.dtype)
    coeff = jnp.maximum(coeff, 0.0)
    T2h = jnp.sum(coeff * jnp.maximum(dt, 0.0), axis=-1)     # [L, H]
    return coal, T2h, n_in


def per_pop_stats_dated(gt: GTrees, sp: SpeciesArrays, pops, n_seq):
    """`per_pop_stats` generalized to serial sampling (tip dating).

    With dated tips, lineages can ENTER a population mid-interval (a
    tip whose age falls inside [tau_h, tau_parent_h)), so the lineage
    count n_h(t) is no longer "n_in at tau_h minus coalescences".  The
    reference handles this with per-population epoch lists
    (``snode->tip_date``, stree.c:5278-5330); here every edge simply
    contributes a +1 entry event at max(age_u, tau_h) and a -1 exit at
    min(age_parent_u, tau_parent_h), and T2h = sum n(n-1) dt over the
    sorted event sweep.  Exact for undated data too (slower: 2N-event
    sort instead of N), so it is only used when a datefile is present.
    """
    L, N = pops.shape
    T = gt.n_tips
    H = sp.n_nodes
    node_idx = jnp.arange(N)[None, :]
    is_tip = node_idx < n_seq[:, None]
    is_inner = (node_idx >= T) & (node_idx < T + n_seq[:, None] - 1)
    valid = is_tip | is_inner

    tau = sp.tau
    partau = jnp.where(sp.parent >= 0, tau[jnp.maximum(sp.parent, 0)],
                       jnp.inf)
    end = jnp.minimum(partau, _FINITE_BIG)                   # [H]

    has_par = gt.parent >= 0
    page = jnp.where(
        has_par,
        jnp.take_along_axis(gt.age, jnp.maximum(gt.parent, 0), axis=1),
        _FINITE_BIG)
    anc = sp.pptable[pops]                                   # [L, N, H]
    # edge u overlaps population h's interval
    passes = anc & valid[..., None] \
        & (gt.age[..., None] < end) & (page[..., None] > tau)
    t_in = jnp.clip(gt.age[..., None], tau, end)             # [L, N, H]
    t_out = jnp.clip(page[..., None], tau, end)
    t_in = jnp.where(passes, t_in, end)
    t_out = jnp.where(passes, t_out, end)
    delta = jnp.concatenate(
        [jnp.where(passes, 1, 0), jnp.where(passes, -1, 0)],
        axis=1)                                              # [L, 2N, H]
    t_ev = jnp.concatenate([t_in, t_out], axis=1)            # [L, 2N, H]
    order = jnp.argsort(t_ev, axis=1)
    t_s = jnp.take_along_axis(t_ev, order, axis=1)
    d_s = jnp.take_along_axis(delta, order, axis=1)
    n_t = jnp.cumsum(d_s, axis=1)                            # n after event i
    dt = jnp.diff(t_s, axis=1, append=end[None, None, :]
                  * jnp.ones_like(t_s[:, :1, :]))
    coeff = (n_t * (n_t - 1)).astype(t_s.dtype)
    T2h = jnp.sum(jnp.maximum(coeff, 0.0)
                  * jnp.maximum(dt, 0.0), axis=1)            # [L, H]

    # coalescent counts and entry counts (for phi terms) as before
    ev_in_h = (jnp.where(is_inner & valid, pops, -1)[..., None]
               == jnp.arange(H))
    coal = ev_in_h.sum(axis=1).astype(jnp.int32)
    inh = anc & (gt.age[..., None] <= tau) & (page[..., None] > tau)
    n_in = (inh & valid[..., None]).sum(axis=1).astype(jnp.int32)
    return coal, T2h, n_in


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
