"""Batched gene-tree state and topology operations.

TPU-native replacement of the reference's pointer-based
``gtree_t``/``gnode_t`` (``src/bpp.h:692-774``): per-locus gene trees
live in fixed-shape ``[L, N]`` index arrays (SURVEY.md §7 design #1).
Population assignments are re-derived from ages instead of maintained
through coalescent-event bookkeeping (``src/gtree.c`` dlists): a gene
node's population is the ancestor of the species-MRCA of its descendant
tips whose tau interval contains the node age.  Initial gene trees are
simulated from the MSC prior like the reference's ``gtree_simulate``
(``src/gtree.c:2242-2330``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BIG_AGE = 1.0e30  # age sentinel for padded inner-node slots


class GTrees(NamedTuple):
    """Batched gene trees as index arrays.

    Node indexing per locus: tips ``0..T-1`` (only ``0..n_seq-1``
    valid), inner nodes ``T..2T-2`` (only ``T..T+n_seq-2`` occupied;
    padded slots keep ``age=BIG_AGE``, ``parent=-1``, children 0).
    """

    left: jax.Array      # [L, N] int32
    right: jax.Array     # [L, N] int32
    parent: jax.Array    # [L, N] int32, -1 for root & padded
    age: jax.Array       # [L, N] float
    # MSC-I: per-edge hybridization path flags [L, N, HY] int8
    # (0 = main/hinner side, 1 = mirror side); the flag of slot k on
    # node u governs which parent the lineage u -> parent(u) takes when
    # crossing hybridization k (bpp.h:715-727 gnode hpath).  None for
    # plain species trees.
    hpath: jax.Array = None

    @property
    def n_loci(self):
        return self.left.shape[0]

    @property
    def n_nodes(self):
        return self.left.shape[1]

    @property
    def n_tips(self):
        return (self.left.shape[1] + 1) // 2


class SpeciesArrays(NamedTuple):
    """Replicated species tree/network state on device.

    Mirrors ``stree_t`` essentials: node indexing tips ``0..NS-1``,
    inner ``NS..NS+NI-1`` with root last, MSC-I mirror nodes appended
    after; ``pptable[i, j]`` True iff j is i or an ancestor of i
    (through EITHER hybridization parent for networks,
    ``src/stree.c:2840``); ``mrca[i, j]`` the species MRCA.

    ``hslot`` has shape [HY] (hinner index per hybridization slot), so
    ``n_hybrids`` is shape-static under jit; each hybridization
    contributes one 1-child inner node (hinner), one extra binary join
    (the mirror's attachment), and one mirror node, hence
    ``H = 2 NS - 1 + 3 HY``.
    """

    left: jax.Array      # [H] int32
    right: jax.Array     # [H] int32
    parent: jax.Array    # [H] int32 (-1 root)
    tau: jax.Array       # [H] float
    theta: jax.Array     # [H] float
    pptable: jax.Array   # [H, H] bool
    mrca: jax.Array      # [H, H] int32
    # --- MSC-I network fields (all-empty/identity for plain trees) ---
    hslot: jax.Array = None     # [HY] int32: hinner index per slot
    hybrid: jax.Array = None    # [H] int32 partner (hinner<->mirror), -1
    phi: jax.Array = None       # [H] float: phi on hinner, 1-phi mirror
    hindex: jax.Array = None    # [H] int32 hybridization slot or -1
    tau_free: jax.Array = None  # [H] bool: node carries its own tau
                                # parameter (prop_tau analog: inner
                                # non-mirror, minus htau==0-tied parents,
                                # hinner counts once for the pair)
    # --- bidirectional introgression (treeparse.c:1232) ---------------
    # bdi_partner[X] = partner hinner Y (else -1); bdi_mirror marks the
    # zero-width BDI mirror populations; bdi_pairs [n_pairs, 2] lists
    # (X, Y) hinner pairs — its STATIC shape corrects the node-count
    # arithmetic (a BDI slot adds 2 nodes, a hybridization slot 3)
    bdi_partner: jax.Array = None   # [H] int32
    bdi_mirror: jax.Array = None    # [H] bool
    bdi_pairs: jax.Array = None     # [n_pairs, 2] int32
    # relaxed-clock rate-carrying populations: all, minus zero-length
    # hybridization segments (htau == 0) and BDI mirrors — the nodes
    # prop_branch_rates skips (stree.c:10293-10298); None = all True
    rate_nodes: jax.Array = None    # [H] bool
    # rate OWNER per population: a BDI mirror segment is the same
    # biological population as its hinner partner pre-introgression, so
    # its branch rate is the partner's (the reference never assigns a
    # mirror rate: init + proposals both skip mirrors, method.c:4235,
    # stree.c:10298); None = identity
    rate_owner: jax.Array = None    # [H] int32

    @property
    def n_nodes(self):
        return self.left.shape[0]

    @property
    def n_hybrids(self):
        return 0 if self.hslot is None else self.hslot.shape[0]

    @property
    def n_bdi_slots(self):
        return 0 if self.bdi_pairs is None else 2 * self.bdi_pairs.shape[0]

    @property
    def n_tips(self):
        return (self.left.shape[0] + 1 - 3 * self.n_hybrids
                + self.n_bdi_slots) // 2

    @property
    def root(self):
        return self.left.shape[0] - 1 - self.n_hybrids

    @property
    def is_network(self):
        return self.n_hybrids > 0


def species_arrays(st, dtype=jnp.float64) -> SpeciesArrays:
    """Build device arrays from a host-side SpeciesTree."""
    kw = {}
    if st.n_hybrids > 0:
        hslot = np.full(st.n_hybrids, -1, np.int32)
        mirror_start = st.n_tips + st.n_inner
        free = np.zeros(st.n_nodes, bool)
        free[st.n_tips:mirror_start] = True
        # relaxed-clock rate carriers: skip zero-length hybridization
        # segments (htau == 0: tau pinned to the parent's, zero span)
        # like prop_branch_rates (stree.c:10296)
        rate_nodes = np.ones(st.n_nodes, bool)
        for i in range(st.n_nodes):
            if st.hindex[i] >= 0:
                if i < mirror_start:
                    hslot[st.hindex[i]] = i
                else:
                    free[i] = False               # mirror: tau tied to hinner
                if not st.htau[i]:
                    free[st.parent[i]] = False    # tied parent
                    rate_nodes[i] = False
        kw = dict(hslot=jnp.asarray(hslot),
                  hybrid=jnp.asarray(st.hybrid, jnp.int32),
                  phi=jnp.asarray(st.phi, dtype),
                  hindex=jnp.asarray(st.hindex, jnp.int32),
                  tau_free=jnp.asarray(free),
                  rate_nodes=jnp.asarray(rate_nodes))
        if st.bdi is not None and (st.bdi >= 0).any():
            bdi = np.asarray(st.bdi, np.int64)
            pairs = [(i, int(bdi[i])) for i in range(st.n_nodes)
                     if bdi[i] >= 0 and i < bdi[i]]
            bdi_mirror = np.zeros(st.n_nodes, bool)
            rate_owner = np.arange(st.n_nodes, dtype=np.int32)
            for i in range(st.n_nodes):
                if bdi[i] >= 0:
                    bdi_mirror[st.hybrid[i]] = True
                    rate_nodes[st.hybrid[i]] = False   # stree.c:10298
                    # the mirror's segment uses its hinner's rate (the
                    # partner-rate tie; the reference never initializes
                    # or proposes mirror rates)
                    rate_owner[st.hybrid[i]] = i
                    free[i] = i < bdi[i]     # one shared tau per pair
            kw.update(
                bdi_partner=jnp.asarray(bdi, jnp.int32),
                bdi_mirror=jnp.asarray(bdi_mirror),
                bdi_pairs=jnp.asarray(np.asarray(pairs, np.int32)
                                      .reshape(-1, 2)),
                tau_free=jnp.asarray(free),
                rate_nodes=jnp.asarray(rate_nodes),
                rate_owner=jnp.asarray(rate_owner))
    return SpeciesArrays(
        left=jnp.asarray(st.left, jnp.int32),
        right=jnp.asarray(st.right, jnp.int32),
        parent=jnp.asarray(st.parent, jnp.int32),
        tau=jnp.asarray(st.tau, dtype),
        theta=jnp.asarray(st.theta, dtype),
        pptable=jnp.asarray(st.pptable()),
        mrca=jnp.asarray(st.mrca_table(), jnp.int32),
        **kw,
    )


# --- schedules -----------------------------------------------------------------


def gather_rows(values, idx):
    """``out[l, i] = values[l, idx[l, i]]`` via a one-hot contraction.

    The obvious ``take_along_axis`` lowers to a serial row-gather that
    costs ~1 ms per [1000, 128] call on TPU (measured: the single most
    expensive op class in the sampler); the one-hot matmul form is pure
    VPU/MXU work at ~16 MB of traffic, ~20x faster.  Exact: the one-hot
    rows select a single addend, and precision=HIGHEST keeps the MXU
    from rounding float values through bf16.  Negative indices must be
    clamped by the caller (jnp semantics differ)."""
    N = values.shape[1]
    if jnp.issubdtype(values.dtype, jnp.integer):
        oh = (idx[..., None] == jnp.arange(N)).astype(jnp.float32)
        # HIGHEST keeps the MXU from rounding ids >= 2^8 through bf16
        out = jnp.einsum("lin,ln->li", oh, values.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.round(out).astype(values.dtype)
    oh = (idx[..., None] == jnp.arange(N)).astype(values.dtype)
    return jnp.einsum("lin,ln->li", oh, values,
                      precision=jax.lax.Precision.HIGHEST)


def scatter_rows(arr, row_ok, col, val):
    """``arr[l, col[l]] = val[l]`` where ``row_ok[l]`` — as a one-hot
    where-select.  ``.at[lidx, col].set`` lowers to an XLA scatter,
    which (like gathers) serializes on this TPU backend; the one-hot
    form is two cheap [L, N] vector ops."""
    N = arr.shape[1]
    oh = (jnp.arange(N)[None, :] == col[:, None]) & row_ok[:, None]
    v = val[:, None] if val.ndim == 1 else val
    return jnp.where(oh, v.astype(arr.dtype), arr)


def lookup2d(table, i, j):
    """``out[...] = table[i[...], j[...]]`` for a small [H, H] table via
    one-hot contractions (XLA 2D advanced-index gathers serialize)."""
    H = table.shape[0]
    tf = table.astype(jnp.float32)
    ohj = (j[..., None] == jnp.arange(H)).astype(jnp.float32)
    # rows[..., h] = table[h, j[...]]; HIGHEST: int tables (sp.mrca)
    # hold node ids that may exceed the bf16-exact 2^8 range
    rows = jnp.einsum("...k,hk->...h", ohj, tf,
                      precision=jax.lax.Precision.HIGHEST)
    ohi = (i[..., None] == jnp.arange(H)).astype(jnp.float32)
    out = jnp.sum(ohi * rows, axis=-1)
    if jnp.issubdtype(table.dtype, jnp.bool_):
        return out > 0.5
    if jnp.issubdtype(table.dtype, jnp.integer):
        return jnp.round(out).astype(table.dtype)
    return out.astype(table.dtype)


def table_rows(table, i):
    """``out[..., :] = table[i[...], :]`` for a small [H, K] table via a
    one-hot matmul (row gathers serialize on this backend)."""
    H = table.shape[0]
    tf = table.astype(jnp.float32)
    oh = (i[..., None] == jnp.arange(H)).astype(jnp.float32)
    out = jnp.einsum("...h,hk->...k", oh, tf,
                     precision=jax.lax.Precision.HIGHEST)
    if jnp.issubdtype(table.dtype, jnp.bool_):
        return out > 0.5
    if jnp.issubdtype(table.dtype, jnp.integer):
        return jnp.round(out).astype(table.dtype)
    return out.astype(table.dtype)


def node_depths(gt: GTrees):
    """Topological depth (#ancestors) per node, [L, N] int32.

    Row-sum of the ancestor-or-self matrix minus one: a handful of
    batched [L, N, N] matmuls on the MXU (anc_matrix) instead of the
    old pointer-doubling loop's 2 log2(N) serial row-gathers (~0.6 ms
    per call; this is called once per likelihood pass for the
    age-sorted schedule's tie-break)."""
    M = anc_matrix(gt)
    return jnp.round(M.sum(-1)).astype(jnp.int32) - 1


def detie_ages(gt: GTrees, n_seq):
    """Restore strict child < parent age ordering after float rounding.

    Affine age maps (tau rubber band, stree.c:4413) can compress a
    parent-child age gap below one float32 ulp, collapsing it to an
    exact tie (or to 0.0 near a zero bound).  Likelihood evaluation is
    tie-robust, but persisted ties would degrade the sweeps'
    youngest-first stale-walk scheduling, so each iteration bumps every
    inner node at least one ulp above its children, in tie-broken age
    order.  The bump is a few ulps — statistically invisible.
    """
    L = gt.age.shape[0]
    T = gt.n_tips
    lidx = jnp.arange(L)
    order = inner_order(gt)

    def step(age, k):
        node = order[:, k]
        valid = (k < n_seq - 1)                      # skip padded slots
        lc = jnp.clip(gt.left[lidx, node], 0, gt.n_nodes - 1)
        rc = jnp.clip(gt.right[lidx, node], 0, gt.n_nodes - 1)
        cm = jnp.maximum(age[lidx, lc], age[lidx, rc])
        above = jnp.nextafter(cm, jnp.asarray(jnp.inf, age.dtype))
        # subnormals are flushed to zero by XLA: keep a normal-number floor
        above = jnp.where(above <= cm,
                          cm + jnp.asarray(jnp.finfo(age.dtype).tiny,
                                           age.dtype), above)
        bumped = jnp.maximum(age[lidx, node], above)
        bumped = jnp.where(valid, bumped, age[lidx, node])
        return age.at[lidx, node].set(bumped), None

    age, _ = jax.lax.scan(step, gt.age, jnp.arange(order.shape[1]))
    return gt._replace(age=age)


def inner_order(gt: GTrees):
    """Age-sorted inner-node schedule ``[L, T-1]`` (values are node ids).

    Ties in age (possible from float rounding of rubber-band/reflect
    maps) are broken by topological depth, deepest first, so a child
    always precedes its equal-aged parent.  Padded slots (BIG_AGE)
    sort last.
    """
    T = gt.n_tips
    ia = gt.age[:, T:]                                # [L, K]
    dep = node_depths(gt)[:, T:]
    K = ia.shape[1]
    kidx = jnp.arange(K)
    # pairwise-rank form of lexsort((-depth, age)): j sorts before i
    # iff age_j < age_i, or tied ages and depth_j > depth_i, or full
    # tie and j < i (lexsort's stable index order).  jnp.lexsort lowers
    # to serial variadic sorts + gathers on this TPU backend (~0.1 ms
    # per call at L=1000, measured round 5); the O(K^2) comparison +
    # one-hot contraction is pure VPU/MXU work at ~5 us.
    lt = ia[:, None, :] < ia[:, :, None]
    eq = ia[:, None, :] == ia[:, :, None]
    dgt = dep[:, None, :] > dep[:, :, None]
    deq = dep[:, None, :] == dep[:, :, None]
    jlt = (kidx[None, :] < kidx[:, None])[None]
    before = lt | (eq & (dgt | (deq & jlt)))
    rank = before.sum(2).astype(jnp.int32)            # [L, K], a permutation
    oh = (rank[:, :, None] == kidx[None, None, :]).astype(jnp.float32)
    order = jnp.einsum("lkr,k->lr", oh, (T + kidx).astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.round(order).astype(jnp.int32)


def root_index(gt: GTrees, n_seq, order=None):
    if order is None:
        order = inner_order(gt)
    return order[jnp.arange(gt.n_loci), n_seq - 2]


def topo_scan(gt: GTrees, tip_vals, combine, order=None):
    """Bottom-up accumulation over all loci: ``out[u] = combine(out[l], out[r])``.

    ``tip_vals``: [L, T] initial values; returns [L, N] (padded inner
    slots receive garbage).
    """
    L, T = tip_vals.shape
    N = gt.n_nodes
    if order is None:
        order = inner_order(gt)
    lidx = jnp.arange(L)
    buf = jnp.zeros((L, N), dtype=tip_vals.dtype).at[:, :T].set(tip_vals)

    def step(buf, k):
        node = order[:, k]
        lv = buf[lidx, gt.left[lidx, node]]
        rv = buf[lidx, gt.right[lidx, node]]
        return buf.at[lidx, node].set(combine(lv, rv)), None

    buf, _ = jax.lax.scan(step, buf, jnp.arange(T - 1))
    return buf


def anc_matrix(gt: GTrees):
    """Ancestor-or-self indicator ``M [L, N, N]`` float32.

    ``M[l, v, a] = 1`` iff node a is v or an ancestor of v.  Built by
    log-depth squaring of the (parent + identity) adjacency on the MXU
    — a handful of small batched matmuls instead of a T-step sequential
    gather scan (each tiny per-locus gather costs ~10-20 us of fixed
    per-op overhead on TPU; see mrca_species docstring)."""
    N = gt.n_nodes
    T = gt.n_tips
    A = (gt.parent[:, :, None] == jnp.arange(N)[None, None, :]) \
        .astype(jnp.float32)
    M = A + jnp.eye(N, dtype=jnp.float32)
    # (A+I)^(2^k) reaches ancestors at distance <= 2^k; max depth = T-1
    steps = max(1, int(np.ceil(np.log2(max(T, 2)))))
    for _ in range(steps):
        M = jnp.minimum(M @ M, 1.0)
    return M


def mrca_and_leaves(gt: GTrees, sp: SpeciesArrays, tip_pop, n_seq,
                    order=None, M=None):
    """(msp [L, N], leaves [L, N]) — species-MRCA of and #tips below
    every gene node, derived from the ancestor matrix (no scan).

    A species node h covers gene node u iff every valid tip below u
    maps to a species that is h or a descendant of h; the MRCA is the
    deepest such h (pptable rows of the MRCA's ancestor chain have
    strictly decreasing depth, so the argmax is unique).
    """
    del order
    L, T = gt.n_loci, gt.n_tips
    if M is None:
        M = anc_matrix(gt)
    desc_t = jnp.swapaxes(M, 1, 2)[:, :, :T]                 # [L, u, t]
    tipvalid = (jnp.arange(T)[None, :] < n_seq[:, None]) \
        .astype(jnp.float32)
    dt = desc_t * tipvalid[:, None, :]
    leaves = jnp.round(dt.sum(-1)).astype(jnp.int32)
    H = sp.pptable.shape[0]
    ppf = sp.pptable.astype(jnp.float32)
    oh = (tip_pop[..., None] == jnp.arange(H)).astype(jnp.float32)
    pp_t = jnp.einsum("lti,ih->lth", oh, ppf)                # [L, t, h]
    bad = jnp.einsum("lut,lth->luh", dt, 1.0 - pp_t)
    ok = bad < 0.5
    depth_sp = sp.pptable.sum(1)                             # deeper = larger
    msp = jnp.argmax(jnp.where(ok, depth_sp[None, None, :], 0),
                     axis=2).astype(jnp.int32)
    return msp, leaves


def mrca_species(gt: GTrees, sp: SpeciesArrays, tip_pop, order=None):
    """Species-MRCA of the tips below every gene node: ``[L, N]`` int32."""
    T = gt.n_tips
    n_seq = jnp.full((gt.n_loci,), T, jnp.int32)
    # all tip slots count; padded tips carry tip_pop = 0 which is a
    # valid species, matching the old scan's behavior on padded rows
    msp, _ = mrca_and_leaves(gt, sp, tip_pop, n_seq)
    return msp


def leaf_counts(gt: GTrees, n_seq, order=None):
    """Number of valid gene-tree tips below each node: ``[L, N]`` int32."""
    del order
    T = gt.n_tips
    M = anc_matrix(gt)
    tipvalid = (jnp.arange(T)[None, :] < n_seq[:, None]) \
        .astype(jnp.float32)
    dt = jnp.swapaxes(M, 1, 2)[:, :, :T] * tipvalid[:, None, :]
    return jnp.round(dt.sum(-1)).astype(jnp.int32)


def lift_population(sp: SpeciesArrays, base, age):
    """Population containing ``age`` on the ancestor chain of ``base``.

    ``base``/``age`` are broadcast-compatible arrays; returns the unique
    ancestor h of base with ``tau_h <= age < tau_parent(h)`` (root
    interval open above).  Mirrors the pop-reassignment walks in
    ``propose_ages`` (``src/gtree.c:4760+``).
    """
    anc = table_rows(sp.pptable, base)               # [..., H]
    tau = sp.tau
    par = sp.parent
    partau = jnp.where(par >= 0, sp.tau[jnp.maximum(par, 0)], jnp.inf)
    ok = anc & (tau <= age[..., None]) & (age[..., None] < partau)
    return jnp.argmax(ok, axis=-1).astype(jnp.int32)


def assign_populations(gt: GTrees, sp: SpeciesArrays, tip_pop, order=None):
    """Population of every gene node from ages alone: ``[L, N]`` int32.

    Tips sit in (a possibly collapsed ancestor of) their sampled
    species; inner nodes in the ancestor of the species-MRCA of their
    descendants whose tau interval contains their age.  For MSC-I
    networks the route-aware variant is used (hpath flags).
    """
    if sp.is_network:
        return assign_populations_net(gt, sp, tip_pop, order=order)
    T = gt.n_tips
    msp = mrca_species(gt, sp, tip_pop, order=order)
    age = jnp.clip(gt.age, 0.0, BIG_AGE * 0.5)  # padded slots -> root pop
    return lift_population(sp, msp, age)


# --- MSC-I network routing ------------------------------------------------------
#
# A lineage's path upward through the species network depends on its
# per-edge hybridization flags (gt.hpath): entering a hybridization's
# child population, the lineage exits through the hinner (flag 0) or
# the mirror node (flag 1).  Populations of gene nodes, per-population
# seqin counts, and the MSC-I phi density terms are all derived from
# these route walks (replaces the reference's seqin_count/hpath
# bookkeeping, gtree.c increase/decrease_seqin_count).


def route_step(sp: SpeciesArrays, p, flags):
    """One population step up from ``p`` following edge ``flags``.

    ``p``: int array [...]; ``flags``: int8 [..., HY].  Returns the next
    population (the parent, or the hybridization side chosen by the
    flag when the parent is a hinner).  At the root returns p.
    """
    par = sp.parent[p]
    par_s = jnp.maximum(par, 0)
    hidx = sp.hindex[par_s]                       # >= 0 iff par is hinner
    hclip = jnp.maximum(hidx, 0)
    flag = jnp.take_along_axis(flags, hclip[..., None], axis=-1)[..., 0]
    take_mirror = (hidx >= 0) & (flag == 1)
    if sp.bdi_mirror is not None:
        # a lineage stepping up FROM a BDI mirror has already switched
        # sides: it enters the partner hinner directly without
        # consulting that hinner's own hybridization flag (the BDI
        # event is instantaneous at the shared tau)
        take_mirror = take_mirror & ~sp.bdi_mirror[p]
    nxt = jnp.where(take_mirror, sp.hybrid[par_s], par_s)
    return jnp.where(par >= 0, nxt, p)


def lift_population_net(sp: SpeciesArrays, base, age, flags):
    """Route-aware pop containing ``age`` starting from pop ``base``."""
    H = sp.n_nodes

    def body(_, p):
        has_par = sp.parent[p] >= 0
        nxt = route_step(sp, p, flags)
        go = has_par & (sp.tau[nxt] <= age)
        return jnp.where(go, nxt, p)

    return jax.lax.fori_loop(0, H, body, base)


def assign_populations_net(gt: GTrees, sp: SpeciesArrays, tip_pop,
                           order=None):
    """Populations of all gene nodes on an MSC-I network: [L, N] int32.

    Inner node u's population = its LEFT child's route evaluated at
    age[u]; validity (the right child's route converging to the same
    population) is checked separately by route_consistent().
    """
    L, N = gt.left.shape
    T = gt.n_tips
    lidx = jnp.arange(L)
    if order is None:
        order = inner_order(gt)
    pops = jnp.zeros((L, N), jnp.int32)
    pops = pops.at[:, :T].set(tip_pop)

    def step(pops, k):
        node = order[:, k]
        lc = gt.left[lidx, node]
        p = lift_population_net(sp, pops[lidx, lc], gt.age[lidx, node],
                                gt.hpath[lidx, lc])
        return pops.at[lidx, node].set(p), None

    pops, _ = jax.lax.scan(step, pops, jnp.arange(T - 1))
    return pops


def route_consistent(gt: GTrees, sp: SpeciesArrays, pops, n_seq,
                     order=None):
    """[L] bool: every valid coalescence's RIGHT child route reaches the
    same population as the left child's (the MSC-I state-validity
    indicator; the reference maintains this invariant structurally)."""
    L, N = gt.left.shape
    T = gt.n_tips
    lidx = jnp.arange(L)[:, None]
    nodes = jnp.arange(N)[None, :]
    is_inner = (nodes >= T) & (nodes < T + n_seq[:, None] - 1)
    rc = gt.right
    pr = lift_population_net(sp, pops[lidx, rc], gt.age, gt.hpath[lidx, rc])
    ok = jnp.where(is_inner, pr == pops, True)
    return jnp.all(ok, axis=1)


def edge_passes(gt: GTrees, sp: SpeciesArrays, pops):
    """[L, N, H] bool: which populations each edge's route visits.

    The edge of node u spans [age_u, age_parent_u) and starts in
    pops[u]; it ascends following u's flags until the population
    containing the parent's age (the root edge ascends to the species
    root).
    """
    L, N = gt.left.shape
    H = sp.n_nodes
    lidx = jnp.arange(L)[:, None]
    has_par = gt.parent >= 0
    page = jnp.where(
        has_par,
        jnp.take_along_axis(gt.age, jnp.maximum(gt.parent, 0), axis=1),
        jnp.inf)

    mark = jax.nn.one_hot(pops, H, dtype=jnp.bool_)

    def body(carry, _):
        p, mark = carry
        nxt = route_step(sp, p, gt.hpath)
        go = (sp.parent[p] >= 0) & (sp.tau[nxt] < page)
        p = jnp.where(go, nxt, p)
        mark = mark | (jax.nn.one_hot(p, H, dtype=jnp.bool_) & go[..., None])
        return (p, mark), None

    (_, mark), _ = jax.lax.scan(body, (pops, mark), None, length=H)
    return mark


# --- host-side initial simulation from the MSC prior ---------------------------


def host_bdi_mirror(st):
    """[NSt] bool mask of BDI mirror nodes of a host SpeciesTree, or
    None when the tree has no bidirectional introgressions."""
    if getattr(st, "bdi", None) is None or not (st.bdi >= 0).any():
        return None
    m = np.zeros(st.n_nodes, bool)
    for i in range(st.n_nodes):
        if st.bdi[i] >= 0:
            m[st.hybrid[i]] = True
    return m


def simulate_gtree_host(
    rng: np.random.Generator,
    tip_species: np.ndarray,       # [n] species tip index per sequence
    st_left, st_right, st_parent,  # species tree arrays
    tau, theta,
    hindex=None, hybrid=None, phi=None,   # MSC-I network arrays
    tip_ages=None,                 # [n] serial-sampling tip ages (dating)
    bdi_mirror=None,               # [H] bool: zero-width BDI mirrors
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """Simulate one gene tree from the MSC prior (gtree.c:2242 analog).

    Returns (left, right, parent, age, hpath) over ``2n-1`` nodes, tips
    first; hpath is None for plain trees, else ``[2n-1, HY]`` int8 with
    the hybridization side each lineage edge took (sampled ~ phi, which
    IS the MSC-I prior on paths).  ``tip_ages`` gives dated tips
    (gtree.c:1540 addSamples serial sampling): a tip only becomes an
    active lineage once simulation time passes its age.
    """
    n = len(tip_species)
    H = len(st_parent)
    nnodes = 2 * n - 1
    left = np.full(nnodes, 0, np.int32)
    right = np.full(nnodes, 0, np.int32)
    parent = np.full(nnodes, -1, np.int32)
    age = np.zeros(nnodes, np.float64)
    hy = 0 if hindex is None else int(hindex.max(initial=-1)) + 1
    hpath = np.zeros((nnodes, hy), np.int8) if hy else None
    if tip_ages is None:
        tip_ages = np.zeros(n)
    age[:n] = tip_ages

    # lineages per species population; dated tips start pending
    lineages: dict[int, list[int]] = {h: [] for h in range(H)}
    pending: dict[int, list[int]] = {h: [] for h in range(H)}
    for i, spx in enumerate(tip_species):
        if tip_ages[i] > 0:
            pending[int(spx)].append(i)
        else:
            lineages[int(spx)].append(i)
    for h in pending:
        pending[h].sort(key=lambda i: tip_ages[i])

    # species nodes sorted by tau (tips tau=0 first), then root epoch;
    # zero-width BDI mirrors sort BEFORE their equal-tau hinners so
    # switched lineages are forwarded into the partner before its
    # interval is simulated
    def _mirror_first(h):
        return 0 if (bdi_mirror is not None and bdi_mirror[h]) else 1

    epoch_order = sorted(range(H), key=lambda h: (tau[h], _mirror_first(h),
                                                  h))
    next_node = n
    t_now = {h: tau[h] for h in range(H)}

    def coalesce_in(h: int, t_end: float):
        nonlocal next_node
        t = t_now[h]
        # activate tips dated before the population interval starts
        while pending[h] and tip_ages[pending[h][0]] <= t:
            lineages[h].append(pending[h].pop(0))
        while True:
            t_act = tip_ages[pending[h][0]] if pending[h] else np.inf
            k = len(lineages[h])
            if k > 1:
                rate = k * (k - 1) / max(theta[h], 1e-300)
                t_next = t + rng.exponential(1.0 / rate)
                if t_next < min(t_act, t_end):
                    i, j = rng.choice(k, size=2, replace=False)
                    a, b = lineages[h][i], lineages[h][j]
                    node = next_node
                    next_node += 1
                    left[node], right[node] = a, b
                    parent[a] = parent[b] = node
                    age[node] = t_next
                    lineages[h] = [x for x in lineages[h]
                                   if x not in (a, b)]
                    lineages[h].append(node)
                    t = t_next
                    continue
            if t_act < t_end:
                t = t_act
                while pending[h] and tip_ages[pending[h][0]] <= t:
                    lineages[h].append(pending[h].pop(0))
                continue
            break
        t_now[h] = t_end
        # un-activated dated tips above t_end migrate up unchanged
        p = st_parent[h]
        if p >= 0 and pending[h]:
            pending[p].extend(pending[h])
            pending[p].sort(key=lambda i: tip_ages[i])
            pending[h] = []

    for h in epoch_order:
        p = st_parent[h]
        t_end = tau[p] if p >= 0 else np.inf
        coalesce_in(h, t_end)
        if p >= 0:
            if hy and hindex[p] >= 0 and hybrid[p] >= 0 and not (
                    bdi_mirror is not None and bdi_mirror[h]):
                # parent is a hinner: each lineage independently takes
                # the hinner side w.p. phi or the mirror (gtree_simulate
                # MSC-I path choice); record the flag on the edge.
                # Lineages leaving a BDI mirror have already switched:
                # they enter the partner hinner unconditionally
                slot = int(hindex[p])
                mirror = int(hybrid[p])
                for u in lineages[h]:
                    if rng.random() < phi[p]:
                        hpath[u, slot] = 0
                        lineages[p].append(u)
                    else:
                        hpath[u, slot] = 1
                        lineages[mirror].append(u)
            else:
                lineages[p].extend(lineages[h])
            lineages[h] = []
    assert next_node == nnodes, "simulation did not fully coalesce"
    return left, right, parent, age, hpath


def init_gtrees(
    seed: int,
    batch,                  # LocusBatch
    st,                     # host SpeciesTree
    dtype=jnp.float64,
    tip_ages=None,          # [L, T] dated-tip ages (tip dating)
) -> GTrees:
    """Simulate starting gene trees for every locus (incl. padded ones)."""
    rng = np.random.default_rng(seed)
    L, T = batch.n_loci, batch.max_tips
    N = 2 * T - 1
    hy = st.n_hybrids
    left = np.zeros((L, N), np.int32)
    right = np.zeros((L, N), np.int32)
    parent = np.full((L, N), -1, np.int32)
    age = np.full((L, N), BIG_AGE, np.float64)
    age[:, :T] = 0.0 if tip_ages is None else tip_ages
    hpath = np.zeros((L, N, hy), np.int8) if hy else None
    theta = np.maximum(st.theta, 1e-6)
    for li in range(L):
        n = int(batch.n_seq[li])
        tip_sp = batch.tip_pop[li, :n]
        gl, gr, gp, ga, gh = simulate_gtree_host(
            rng, tip_sp, st.left, st.right, st.parent, st.tau, theta,
            hindex=st.hindex, hybrid=st.hybrid, phi=st.phi,
            tip_ages=None if tip_ages is None else tip_ages[li, :n],
            bdi_mirror=host_bdi_mirror(st))
        # map local inner ids n..2n-2 to global T..T+n-2
        def gmap(i):
            return i if i < n else i - n + T
        for i in range(2 * n - 1):
            gi = gmap(i)
            parent[li, gi] = gmap(gp[i]) if gp[i] >= 0 else -1
            age[li, gi] = ga[i]
            if i >= n:
                left[li, gi] = gmap(gl[i])
                right[li, gi] = gmap(gr[i])
            if gh is not None:
                hpath[li, gi] = gh[i]
    return GTrees(
        left=jnp.asarray(left), right=jnp.asarray(right),
        parent=jnp.asarray(parent), age=jnp.asarray(age, dtype),
        hpath=None if hpath is None else jnp.asarray(hpath))
