"""MSC-M (isolation-with-migration) state and density, batched over loci.

TPU-native replacement for the reference's per-population migbuffer
walk (``src/gtree.c:3459`` ``gtree_update_logprob_contrib_mig``) and
the per-edge ``miginfo_t`` event lists (``src/miginfo.c``).

Representation.  Migration events live in a fixed-capacity per-locus
buffer: ``time/node/src/dst [L, ME]`` where ``node`` is the gene-tree
edge (the node whose branch to its parent carries the event; -1 marks
an empty slot), ``src`` the population the lineage occupies BELOW the
event and ``dst`` the population ABOVE it (a backward-in-time jump
src -> dst corresponds to a forward-time migrant dst -> src; the
reference's migevent_t source/target, miginfo.c:165).

Density (gtree.c:3620-3663): with K_h coalescences and waiting sums
C2_h per population, mc_k migration events and lineage-time overlaps
W_k per route k = (s -> t forward),

  logPG = sum_h [K_h log(2/(hered*theta_h)) - C2_h/(hered*theta_h)]
        + sum_k [mc_k log M_k - M_k W_k]

where W_k = integral over time of (#lineages in t) * 1[s alive]
(``Wsji``, stree.c:779-843).  Everything is recomputed from the
fixed-shape arrays by a masked interval sweep (recompute beats
bookkeeping on TPU, SURVEY.md section 7): each migration event splits
its edge into sub-edges; a sub-edge starting in population p visits
p's ancestors through speciation boundaries exactly like a plain edge,
so the per-population lineage-count function n_h(x) is the sum of
sub-edge interval indicators.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .gtree import BIG_AGE, GTrees, SpeciesArrays, lift_population

_FINITE_BIG = 1.0e12


@dataclass(frozen=True)
class MigRoutes:
    """Static route table resolved against the species tree (host)."""

    si: np.ndarray        # [K] forward-source population index
    ti: np.ndarray        # [K] forward-target population index
    alpha: np.ndarray     # [K] Gamma prior shape for M_k
    beta: np.ndarray      # [K] Gamma prior rate
    am: np.ndarray        # [K] per-locus variable-rate shape (0 = fixed)
    index: np.ndarray     # [H, H] (si, ti) -> route k, -1 if absent

    @property
    def n_routes(self) -> int:
        return len(self.si)


def build_routes(cfg, st) -> MigRoutes:
    """Resolve MigSpec source/target labels to node indices.

    Labels follow the reference's naming: tip names, or ancestral
    populations named by the concatenation of their descendant tip
    labels in the control-file order (output.node_label)."""
    from ..output import node_label

    H = st.n_nodes
    names = {}
    for i in range(H):
        names[node_label(st, i)] = i
    K = len(cfg.mig_specs)
    si = np.zeros(K, np.int32)
    ti = np.zeros(K, np.int32)
    al = np.zeros(K)
    be = np.zeros(K)
    am = np.zeros(K)
    wa, wb = (cfg.wprior.alpha, cfg.wprior.beta) if cfg.wprior else (
        (cfg.migprior.alpha, cfg.migprior.beta) if cfg.migprior
        else (2.0, 1.0))
    index = np.full((H, H), -1, np.int32)
    for k, s in enumerate(cfg.mig_specs):
        for label, attr in ((s.source, "source"), (s.target, "target")):
            if label not in names:
                raise ValueError(
                    f"migration {attr} {label!r} is not a population "
                    f"(known: {sorted(names)})")
        si[k] = names[s.source]
        ti[k] = names[s.target]
        al[k] = s.alpha if s.alpha > 0 else wa
        be[k] = s.beta if s.beta > 0 else wb
        am[k] = s.am
        index[si[k], ti[k]] = k
    return MigRoutes(si=si, ti=ti, alpha=al, beta=be, am=am, index=index)


class MigState(NamedTuple):
    """Per-locus migration events + route rates (device)."""

    time: jax.Array    # [L, ME] event times (BIG_AGE in empty slots)
    node: jax.Array    # [L, ME] gene-tree edge (-1 empty)
    src: jax.Array     # [L, ME] population below the event
    dst: jax.Array     # [L, ME] population above the event
    M: jax.Array       # [K] route rates (forward s->t); for routes with
                       # a variable-rates shape am>0 this is the MEAN
                       # rate Mbar (migspec_t.M, bpp.h:1036)
    Mi: jax.Array      # [L, K] per-locus rates (migspec_t.Mi); only
                       # consulted where routes.am > 0
    # geneflow rjMCMC (stree.c:15419 stree_migration_rj): which routes
    # of the SATURATED candidate table are in the current model.  None
    # = fixed-route mode (every configured route always on).  Inactive
    # routes keep an M value distributed per its prior (the W Gibbs
    # draws it from the conjugate with zeroed stats) - the Carlin-Chib
    # pseudo-prior construction that replaces the reference's
    # dimension-jumping draw (prop M ~ Gamma(a,b) = prior, so the
    # proposal/prior terms cancel identically there too).
    on: jax.Array | None = None    # [K] bool

    @property
    def cap(self) -> int:
        return self.time.shape[1]

    def count(self):
        """[L] live event counts."""
        return jnp.sum(self.node >= 0, axis=1).astype(jnp.int32)


def empty_mig_state(L: int, cap: int, K: int, M0, dtype,
                    on=None) -> MigState:
    M = jnp.asarray(M0, dtype)
    return MigState(
        time=jnp.full((L, cap), BIG_AGE, dtype),
        node=jnp.full((L, cap), -1, jnp.int32),
        src=jnp.zeros((L, cap), jnp.int32),
        dst=jnp.zeros((L, cap), jnp.int32),
        M=M,
        Mi=jnp.broadcast_to(M[None, :], (L, K)).astype(dtype),
        on=None if on is None else jnp.asarray(on, bool))


def build_routes_geneflow(cfg, st):
    """Saturated candidate route table for geneflow rjMCMC.

    Candidates are every ordered population pair (s, t), neither the
    root, s != t, neither an ancestor of the other (such pairs never
    coexist; select_migpair stree.c:15275 additionally requires CURRENT
    tau-interval overlap, which the move re-checks dynamically).
    Routes from an explicit ``migration`` block keep their configured
    priors/am and start ACTIVE; all other candidates get the wprior
    defaults and start off.

    Returns (routes, on0 [K] bool).
    """
    base = build_routes(cfg, st)
    H = st.n_nodes
    anc = st.pptable()
    root = st.root
    wa, wb = (cfg.wprior.alpha, cfg.wprior.beta) if cfg.wprior else (
        (cfg.migprior.alpha, cfg.migprior.beta) if cfg.migprior
        else (2.0, 1.0))
    si, ti, al, be, am, on0 = [], [], [], [], [], []
    index = np.full((H, H), -1, np.int32)
    for s in range(H):
        for t in range(H):
            if s == t or s == root or t == root:
                continue
            if anc[s, t] or anc[t, s]:
                continue
            k0 = base.index[s, t]
            index[s, t] = len(si)
            si.append(s)
            ti.append(t)
            al.append(base.alpha[k0] if k0 >= 0 else wa)
            be.append(base.beta[k0] if k0 >= 0 else wb)
            am.append(base.am[k0] if k0 >= 0 else 0.0)
            on0.append(k0 >= 0)
    # note: the reference's Hastings uses the CONSTANT
    # NS(NS+1)(NS-1)/3 (stree.c:14238 mrcount) as the candidate count,
    # which matches the true non-ancestor pair count only for some
    # topologies (e.g. 20 vs 22 for a balanced 4-species tree); the
    # move here uses the exact per-state feasible counts instead
    routes = MigRoutes(si=np.asarray(si, np.int32),
                       ti=np.asarray(ti, np.int32),
                       alpha=np.asarray(al), beta=np.asarray(be),
                       am=np.asarray(am), index=index)
    return routes, np.asarray(on0, bool)


def eff_rates(routes: MigRoutes, mig: MigState):
    """Effective per-locus route rates [L, K]: Mi where the route has a
    variable-rates shape (am > 0), the shared M otherwise.  Routes
    switched off by the geneflow mask get rate 0 (no simulation jumps,
    no density contribution)."""
    has_am = jnp.asarray(routes.am > 0)
    r = jnp.where(has_am[None, :], mig.Mi, mig.M[None, :])
    if mig.on is not None:
        r = jnp.where(mig.on[None, :], r, 0.0)
    return r


# --------------------------------------------------------------------------
# population assignment with migration
# --------------------------------------------------------------------------


def edge_top_pop(sp: SpeciesArrays, mig: MigState, pops, node_ids, t_top):
    """Population of edge ``node_ids [L]`` just below time ``t_top [L]``.

    Latest migration event on the edge determines the base population;
    speciation boundaries lift it the rest of the way
    (lift_population)."""
    L = pops.shape[0]
    lidx = jnp.arange(L)
    on_edge = (mig.node == node_ids[:, None]) & (
        mig.time < t_top[:, None])                       # [L, ME]
    t_ev = jnp.where(on_edge, mig.time, -jnp.inf)
    last = jnp.argmax(t_ev, axis=1)                      # [L]
    has = on_edge[lidx, last]
    base = jnp.where(has, mig.dst[lidx, last], pops[lidx, node_ids])
    return lift_population(sp, base, t_top)


def assign_populations_mig(gt: GTrees, sp: SpeciesArrays, tip_pop,
                           mig: MigState, n_seq):
    """[L, N] population of every gene node under migration events.

    Age-ordered scan (children before parents): node u's population is
    its left child's edge population at age_u."""
    from .gtree import inner_order

    L, N = gt.age.shape
    T = gt.n_tips
    lidx = jnp.arange(L)
    pops = jnp.zeros((L, N), jnp.int32)
    pops = pops.at[:, :T].set(tip_pop)
    order = inner_order(gt)

    def step(pops, k):
        node = order[:, k]
        valid = k < n_seq - 1
        lc = gt.left[lidx, node]
        age_u = gt.age[lidx, node]
        p = edge_top_pop(sp, mig, pops, jnp.maximum(lc, 0), age_u)
        cur = pops[lidx, node]
        pops = pops.at[lidx, node].set(jnp.where(valid, p, cur))
        return pops, None

    pops, _ = jax.lax.scan(step, pops, jnp.arange(T - 1))
    return pops


def route_consistent_mig(gt: GTrees, sp: SpeciesArrays, mig: MigState,
                         pops, n_seq):
    """[L] validity: every coalescence's right-child edge must arrive in
    the same population as the assigned (left-derived) one, and every
    event must lie inside both its populations' lifetimes and its
    edge's time span."""
    L, N = gt.age.shape
    T = gt.n_tips
    lidx = jnp.arange(L)
    nodes = jnp.arange(N)[None, :]
    is_inner = (nodes >= T) & (nodes < T + n_seq[:, None] - 1)

    rc = jnp.maximum(gt.right, 0)
    age = gt.age
    # right-child arrival population at each inner node, all columns at
    # once (edge_top_pop logic with the node axis kept)
    on_edge = (mig.node[:, None, :] == rc[:, :, None]) & (
        mig.time[:, None, :] < age[:, :, None])          # [L, N, ME]
    t_ev = jnp.where(on_edge, mig.time[:, None, :], -jnp.inf)
    last = jnp.argmax(t_ev, axis=2)                      # [L, N]
    has = jnp.take_along_axis(on_edge, last[:, :, None], 2)[..., 0]
    base = jnp.where(has,
                     jnp.take_along_axis(mig.dst, last, 1),
                     jnp.take_along_axis(pops, rc, 1))
    lifted = jax.vmap(lift_population, in_axes=(None, 1, 1), out_axes=1)(
        sp, base, age)
    ok_nodes = jnp.where(is_inner, lifted == pops, True).all(axis=1)

    # events: alive-window checks for both pops, inside the edge span
    live = mig.node >= 0
    nd = jnp.maximum(mig.node, 0)
    e_lo = jnp.take_along_axis(gt.age, nd, 1)
    par = jnp.take_along_axis(gt.parent, nd, 1)
    e_hi = jnp.where(par >= 0,
                     jnp.take_along_axis(gt.age, jnp.maximum(par, 0), 1),
                     BIG_AGE)
    tau = sp.tau
    partau = jnp.where(sp.parent >= 0, tau[jnp.maximum(sp.parent, 0)],
                       jnp.inf)
    t = mig.time
    ok_ev = ((t > e_lo) & (t < e_hi)
             & (t >= tau[mig.src]) & (t < partau[mig.src])
             & (t >= tau[mig.dst]) & (t < partau[mig.dst]))
    ok_ev = jnp.where(live, ok_ev, True).all(axis=1)
    return ok_nodes & ok_ev


# --------------------------------------------------------------------------
# interval sweep: coalescent + migration waiting statistics
# --------------------------------------------------------------------------


def _subedges(gt: GTrees, mig: MigState, pops, n_seq, exclude=None,
              include_root_edge=False):
    """Split edges at migration events.

    Returns (t_lo [L, E], t_hi [L, E], pop_lo [L, E], live [L, E]) with
    E = N + ME: the base piece of every edge plus one piece per event.

    ``exclude [L, X]``: node columns whose edges are masked out (the
    sim-SPR prune set).  ``include_root_edge``: treat the root's edge
    as extending to +inf (the "rest" lineage pool of sim-SPR; plain
    density sweeps exclude it since n=1 contributes nothing anyway).
    """
    L, N = gt.age.shape
    T = gt.n_tips
    ME = mig.cap
    nodes = jnp.arange(N)[None, :]
    valid_edge = ((nodes < n_seq[:, None]) |
                  ((nodes >= T) & (nodes < T + n_seq[:, None] - 1)))
    if not include_root_edge:
        valid_edge = valid_edge & (gt.parent >= 0)
    if exclude is not None:
        for j in range(exclude.shape[1]):
            valid_edge = valid_edge & (nodes != exclude[:, j:j + 1])
    page = jnp.where(gt.parent >= 0,
                     jnp.take_along_axis(gt.age, jnp.maximum(gt.parent, 0), 1),
                     BIG_AGE)

    live = mig.node >= 0
    nd = jnp.maximum(mig.node, 0)

    # base piece: [age_u, first event on edge else parent age)
    ev_t = jnp.where(live[:, None, :] & (mig.node[:, None, :] == nodes[:, :, None]),
                     mig.time[:, None, :], jnp.inf)       # [L, N, ME]
    first_ev = jnp.min(ev_t, axis=2)                      # [L, N]
    base_hi = jnp.minimum(page, first_ev)
    base = (gt.age, base_hi, pops, valid_edge)

    # event pieces: [t_e, next event on same edge above else parent age)
    et = mig.time                                         # [L, ME]
    same = (mig.node[:, :, None] == mig.node[:, None, :]) & \
        live[:, :, None] & live[:, None, :]
    above = same & (et[:, None, :] > et[:, :, None])      # [L, ME, ME]
    nxt = jnp.min(jnp.where(above, et[:, None, :], jnp.inf), axis=2)
    ev_page = jnp.take_along_axis(page, nd, 1)
    ev_hi = jnp.minimum(nxt, ev_page)
    ev = (et, ev_hi, mig.dst, live)

    t_lo = jnp.concatenate([base[0], ev[0]], axis=1)
    t_hi = jnp.concatenate([base[1], ev[1]], axis=1)
    pop_lo = jnp.concatenate([base[2], ev[2]], axis=1)
    lv = jnp.concatenate([base[3], ev[3]], axis=1)
    return t_lo, t_hi, pop_lo, lv


def mig_stats(gt: GTrees, sp: SpeciesArrays, pops, mig: MigState,
              routes_si, routes_ti, n_seq):
    """Per-locus structured-coalescent statistics.

    Returns (coal [L,H] int32, C2 [L,H], W [L,K], mc [L,K] int32,
    n_in [L,H] int32).
    """
    L, N = gt.age.shape
    T = gt.n_tips
    H = sp.n_nodes
    dtype = gt.age.dtype
    tau = sp.tau
    partau = jnp.where(sp.parent >= 0, tau[jnp.maximum(sp.parent, 0)],
                       _FINITE_BIG).astype(dtype)

    # the root lineage counts toward migration waiting sums (n=1 adds
    # nothing to C2 but Wsji_epoch += n*t includes it, gtree.c:3604)
    t_lo, t_hi, pop_lo, live = _subedges(gt, mig, pops, n_seq,
                                         include_root_edge=True)  # [L, E]
    anc = sp.pptable[pop_lo]                                     # [L, E, H]

    # interval of sub-edge e inside population h
    lo = jnp.maximum(t_lo[..., None], tau[None, None, :])
    hi = jnp.minimum(jnp.minimum(t_hi[..., None], partau[None, None, :]),
                     _FINITE_BIG)
    seg = jnp.where(anc & live[..., None], jnp.maximum(hi - lo, 0.0), 0.0)
    inh = seg > 0.0                                              # [L, E, H]

    # lineages entering h at tau_h
    n_in = jnp.sum(
        anc & live[..., None] & (t_lo[..., None] <= tau)
        & (tau < t_hi[..., None]), axis=1).astype(jnp.int32)

    # coalescent event counts per population
    nodes = jnp.arange(N)[None, :]
    is_inner = (nodes >= T) & (nodes < T + n_seq[:, None] - 1)
    ev_in_h = jnp.where(is_inner, pops, -1)[..., None] == jnp.arange(H)
    coal = ev_in_h.sum(axis=1).astype(jnp.int32)                 # [L, H]

    # --- n_h(x) sweep: C2 = sum n(n-1) dt ---------------------------------
    # per (l, h): 2E boundary points (interval starts +1 / ends -1)
    starts = jnp.where(inh, lo, _FINITE_BIG)                     # [L, E, H]
    ends = jnp.where(inh, hi, _FINITE_BIG)
    times = jnp.concatenate([starts, ends], axis=1)              # [L, 2E, H]
    deltas = jnp.concatenate(
        [jnp.where(inh, 1, 0), jnp.where(inh, -1, 0)],
        axis=1)                                                  # [L, 2E, H]
    times = jnp.swapaxes(times, 1, 2)                            # [L, H, 2E]
    deltas = jnp.swapaxes(deltas, 1, 2)
    o = jnp.argsort(times, axis=2)
    ts = jnp.take_along_axis(times, o, 2)
    ds = jnp.take_along_axis(deltas, o, 2)
    n_run = jnp.cumsum(ds, axis=2)                               # after point
    dt = jnp.diff(ts, axis=2, append=jnp.full_like(ts[..., :1],
                                                   _FINITE_BIG))
    dt = jnp.maximum(dt, 0.0)
    nn = n_run.astype(dtype)
    C2 = jnp.sum(nn * (nn - 1.0) * dt, axis=2)                   # [L, H]

    # --- route waiting sums W_k = int n_t(x) 1[s alive] dx ----------------
    # reuse the sweep segments of population t_k, clipped to s_k's life
    si = jnp.asarray(routes_si)
    ti = jnp.asarray(routes_ti)
    ts_t = ts[:, ti, :]                                          # [L, K, 2E]
    n_t = n_run[:, ti, :].astype(dtype)
    seg_lo = ts_t
    seg_hi = jnp.concatenate(
        [ts_t[..., 1:], jnp.full_like(ts_t[..., :1], _FINITE_BIG)], axis=2)
    a_lo = jnp.maximum(seg_lo, tau[si][None, :, None])
    a_hi = jnp.minimum(seg_hi, partau[si][None, :, None])
    W = jnp.sum(n_t * jnp.maximum(a_hi - a_lo, 0.0), axis=2)     # [L, K]

    # --- migration event counts per route ---------------------------------
    live_ev = mig.node >= 0
    # forward route (s=dst_above, t=src_below)
    match = (mig.dst[:, :, None] == si[None, None, :]) & \
        (mig.src[:, :, None] == ti[None, None, :]) & live_ev[:, :, None]
    mc = match.sum(axis=1).astype(jnp.int32)                     # [L, K]
    return coal, C2, W, mc, n_in


def msc_logprob_mig(coal, C2, W, mc, theta, heredity, M, on=None):
    """Per-locus MSC-M log density [L] (gtree.c:3637-3663).

    ``M`` is [K] (shared route rates) or [L, K] (per-locus effective
    rates from :func:`eff_rates` when any route has am > 0).  ``on``
    [K] bool masks the terms of switched-off routes (geneflow rjMCMC);
    an event on an off route makes the density -inf (impossible
    state, rejected structurally)."""
    th = theta[None, :] * heredity[:, None]
    th = jnp.maximum(th, 1e-300)
    pop_terms = jnp.sum(coal * jnp.log(2.0 / th) - C2 / th, axis=1)
    Msafe = jnp.maximum(M, 1e-300)
    if Msafe.ndim == 1:
        Msafe = Msafe[None, :]
    per_route = mc * jnp.log(Msafe) - Msafe * W
    if on is not None:
        per_route = jnp.where(on[None, :], per_route, 0.0)
        bad = jnp.any(~on[None, :] & (mc > 0), axis=1)
        pop_terms = jnp.where(bad, -jnp.inf, pop_terms)
    mig_terms = jnp.sum(per_route, axis=1)
    return pop_terms + mig_terms


# --------------------------------------------------------------------------
# host-side structured-coalescent simulator with migration
# (simulate.c + gtree_simulate gtree.c:2242 with opt_migration)
# --------------------------------------------------------------------------


def simulate_gtree_mig_host(rng, tip_species, st_parent, tau, theta,
                            routes_si, routes_ti, M):
    """Simulate one gene tree under the MSC-M prior (numpy, host).

    Backward-in-time event-driven simulation: within each epoch the
    total rate is sum_h k_h(k_h-1)/theta_h + sum_k k_{t_k} M_k over
    routes whose donor is alive; a migration moves one random lineage
    from the route's target to its source population (backward jump).

    Returns (left, right, parent, age) over 2n-1 nodes, tips first.
    """
    import numpy as np

    n = len(tip_species)
    H = len(st_parent)
    nnodes = 2 * n - 1
    left = np.zeros(nnodes, np.int32)
    right = np.zeros(nnodes, np.int32)
    parent = np.full(nnodes, -1, np.int32)
    age = np.zeros(nnodes, np.float64)
    partau = np.where(st_parent >= 0, tau[np.maximum(st_parent, 0)], np.inf)

    lineages = {h: [] for h in range(H)}
    for i, spx in enumerate(tip_species):
        lineages[int(spx)].append(i)
    next_node = n
    t = 0.0
    boundaries = sorted({float(tau[h]) for h in range(H) if tau[h] > 0})
    K = len(routes_si)

    def alive(h, x):
        return tau[h] <= x < partau[h]

    while next_node < nnodes:
        # rates
        crates = {h: len(v) * (len(v) - 1) / max(theta[h], 1e-300)
                  for h, v in lineages.items() if len(v) >= 2 and alive(h, t)}
        mrates = {}
        for k in range(K):
            s, d = int(routes_si[k]), int(routes_ti[k])
            if alive(s, t) and alive(d, t) and lineages[d]:
                mrates[k] = len(lineages[d]) * M[k]
        rate = sum(crates.values()) + sum(mrates.values())
        nb = min([b for b in boundaries if b > t], default=np.inf)
        if rate > 0:
            dt = rng.exponential(1.0 / rate)
        else:
            dt = np.inf
        if t + dt < nb:
            t = t + dt
            u = rng.random() * rate
            acc = 0.0
            done = False
            for h, r in crates.items():
                acc += r
                if u < acc:
                    k_ = len(lineages[h])
                    i_, j_ = rng.choice(k_, size=2, replace=False)
                    a, b = lineages[h][i_], lineages[h][j_]
                    node = next_node
                    next_node += 1
                    left[node], right[node] = a, b
                    parent[a] = parent[b] = node
                    age[node] = t
                    lineages[h] = [x for x in lineages[h]
                                   if x not in (a, b)] + [node]
                    done = True
                    break
            if not done:
                for k, r in mrates.items():
                    acc += r
                    if u < acc:
                        s, d = int(routes_si[k]), int(routes_ti[k])
                        pick = rng.integers(len(lineages[d]))
                        lin = lineages[d].pop(pick)
                        lineages[s].append(lin)
                        break
        else:
            if not np.isfinite(nb):
                # single remaining pair deadlock cannot happen: root pop
                # coalesces everything (rate > 0 whenever >= 2 remain)
                break
            t = nb
            for h in range(H):
                p = st_parent[h]
                if p >= 0 and abs(tau[p] - nb) < 1e-300 and lineages[h]:
                    lineages[p].extend(lineages[h])
                    lineages[h] = []
        if next_node == nnodes:
            break
    return left, right, parent, age


def relaxed_branch_lengths_mig(gt: GTrees, sp: SpeciesArrays,
                               mig: MigState, pops, n_seq, brate):
    """Per-node relaxed-clock branch lengths under migration ``[L, N]``.

    A migrating edge occupies different populations along its span, so
    its expected-substitutions length is the rate-weighted sum over its
    SUB-edges (one per migration event, :func:`_subedges`) of each
    sub-edge's overlap with every population it ascends through —
    the migration-aware generalization of
    felsenstein.relaxed_branch_lengths (locus.c:1151 with miginfo
    walks).
    """
    L, N = gt.age.shape
    tau = sp.tau
    partau = jnp.where(sp.parent >= 0, tau[jnp.maximum(sp.parent, 0)],
                       BIG_AGE)
    t_lo, t_hi, pop_lo, live = _subedges(gt, mig, pops, n_seq)  # [L, E]
    anc = sp.pptable[pop_lo]                                    # [L, E, H]
    lo = jnp.maximum(t_lo[..., None], tau[None, None, :])
    hi = jnp.minimum(t_hi[..., None], partau[None, None, :])
    seg = jnp.where(anc & live[..., None], jnp.maximum(hi - lo, 0.0), 0.0)
    len_e = jnp.sum(seg * brate[:, None, :], axis=-1)           # [L, E]
    # attribute sub-edges back to their gene node: base pieces are the
    # first N columns (node == column); event pieces go to mig.node
    blen = len_e[:, :N]
    ev_oh = ((jnp.maximum(mig.node, 0)[:, :, None]
              == jnp.arange(N)[None, None, :])
             & (mig.node >= 0)[:, :, None]).astype(len_e.dtype)
    blen = blen + jnp.einsum("len,le->ln", ev_oh, len_e[:, N:])
    return jnp.where(gt.parent >= 0, blen, 0.0)
