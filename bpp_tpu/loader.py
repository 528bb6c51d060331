"""Run assembly: control file -> packed device data + initial state.

Mirrors the reference's ``init`` path (``src/method.c:3210``): parse
sequences, clean, compress, map individuals to species, build the
species tree, initialize (tau, theta) from the priors
(``stree_init_tau`` ``src/stree.c:1489``, ``stree_init_theta``
``stree.c:2471``), and simulate starting gene trees from the MSC prior.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .config import BppConfig, PriorDist, SubstModel
from .data.msa import ProcessedLocus, process_locus
from .data.packing import LocusBatch, pack_loci
from .io.ctl import parse_ctl
from .io.imap import parse_imap
from .io.phylip import parse_phylip
from .trees.stree import SpeciesTree

PROP_THRESHOLD = 99  # stree.c PROP_THRESHOLD for tau init proportion


@dataclass
class RunData:
    cfg: BppConfig
    batch: LocusBatch
    stree: SpeciesTree
    loci: list[ProcessedLocus]
    # per-locus substitution models (model = custom partition file,
    # method.c:3344-3352 msa->model assignment); None when homogeneous
    locus_models: list[SubstModel] | None = None
    # tip dating (datefile): calendar sample dates per packed sequence
    # [L, T] and max descendant date per species node [H] (the calendar
    # form of the reference's l_constraint, gtree.c:1637)
    tip_dates: np.ndarray | None = None
    date_lmax: np.ndarray | None = None


def build_species_tree(cfg: BppConfig) -> SpeciesTree:
    spec = cfg.species
    if spec is None:
        raise ValueError("control file lacks species&tree")
    if spec.count == 1:
        return SpeciesTree.single_population(spec.names[0])
    st = SpeciesTree.from_newick(spec.newick, tip_order=list(spec.names))
    return st


def _reflect(x: float, a: float, b: float) -> float:
    """Mirror x into [a, b] (util reflect analog, host side)."""
    if b <= a:
        return a
    span = b - a
    y = (x - a) % (2 * span)
    if y < 0:
        y += 2 * span
    return a + (y if y <= span else 2 * span - y)


def init_tau_theta(cfg: BppConfig, st: SpeciesTree, rng: np.random.Generator,
                   collapsed: np.ndarray | None = None,
                   lconstraint: np.ndarray | None = None) -> None:
    """Initialize tau/theta in place from the priors (stree.c:1489, 2471).

    ``collapsed``: optional bool mask over nodes forcing tau=0 (A10/A11
    random starting delimitation).
    ``lconstraint``: tip-dating lower bounds per node in substitution
    units (reset_tau_tip_date / stree_init_tau_recursive_constraint,
    gtree.c:2013): every tau is reflected above its dated-descendant
    bound.
    """
    theta0 = cfg.thetaprior.mean()
    st.theta[:] = theta0
    if st.n_tips == 1:
        st.tau[:] = 0.0
        return
    tau0 = cfg.tauprior.mean()
    prop = 0.9 if st.n_tips > PROP_THRESHOLD else 0.5
    root = st.root
    active = np.ones(st.n_nodes, bool)
    if collapsed is not None:
        active = ~collapsed
    st.tau[:] = 0.0
    if active[root]:
        st.tau[root] = tau0
        if lconstraint is not None:
            st.tau[root] = _reflect(
                tau0 * (0.9 + 0.2 * rng.random()),
                float(lconstraint[root]), 999.0)

    if st.n_hybrids > 0:
        _init_tau_network(cfg, st, rng, prop)
        return

    def rec(i: int):
        for ch in (st.left[i], st.right[i]):
            if ch < st.n_tips:
                continue
            if st.tau[i] > 0 and active[ch]:
                t = st.tau[i] * (prop + (1 - prop)
                                 * (0.2 + 0.1 * rng.random()))
                if lconstraint is not None and (
                        t < lconstraint[ch] or t >= st.tau[i]):
                    t = _reflect(t, float(lconstraint[ch]), float(st.tau[i]))
                st.tau[ch] = t
            else:
                st.tau[ch] = 0.0
            rec(ch)

    rec(root)


def _init_tau_network(cfg: BppConfig, st: SpeciesTree,
                      rng: np.random.Generator, prop: float) -> None:
    """MSC-I network tau initialization (stree.c:1290-1342 fixpoint).

    Hybridization taus must sit below BOTH parents; tau of a hinner and
    its mirror are always equal; an htau == 0 annotation ties the
    parent's tau to the hybrid's.
    """
    pending = object()
    n = st.n_nodes
    ns = st.n_tips
    vals = [pending] * n
    for i in range(ns):
        vals[i] = 0.0
    vals[st.root] = st.tau[st.root]

    def frac():
        return prop + (1 - prop) * (0.2 + 0.1 * rng.random())

    mirror_start = ns + st.n_inner
    # parents whose tau is tied to a hybridization below (htau == 0)
    # must not be assigned by the plain parent*frac rule
    tied = set()
    for i in range(ns, n):
        if st.hindex[i] >= 0 and not st.htau[i]:
            tied.add(int(st.parent[i]))
    for _ in range(4 * n):          # fixpoint: bounded passes
        progressed = False
        for i in range(ns, n):
            if vals[i] is not pending:
                continue
            if getattr(st, "bdi", None) is not None and st.bdi[i] >= 0 \
                    and i < mirror_start:
                # BDI pair: one tau below both parents (stree.c:5652)
                part = int(st.bdi[i])
                u1 = vals[st.parent[i]]
                u2 = vals[st.parent[part]]
                if u1 is pending or u2 is pending:
                    continue
                t = min(u1, u2) * frac()
                vals[i] = vals[part] = t
                vals[int(st.hybrid[i])] = vals[int(st.hybrid[part])] = t
                progressed = True
                continue
            if st.hindex[i] >= 0 and i < mirror_start:
                # hinner: needs the effective upper age from both sides
                mir = st.hybrid[i]

                def upper(side):
                    p = st.parent[side]
                    if st.htau[side]:
                        return vals[p]
                    # parent tau will be tied to ours: bound by grandparent
                    gp = st.parent[p]
                    return vals[gp] if gp >= 0 else vals[p]

                u1, u2 = upper(i), upper(mir)
                if u1 is pending or u2 is pending:
                    continue
                t = min(u1, u2) * frac()
                vals[i] = vals[mir] = t
                if not st.htau[i]:
                    vals[st.parent[i]] = t
                if not st.htau[mir]:
                    vals[st.parent[mir]] = t
                progressed = True
            elif st.hindex[i] >= 0:
                continue            # mirror: set with its hinner
            else:
                p = st.parent[i]
                if p == -1 or i in tied or vals[i] is not pending:
                    continue
                if vals[p] is pending:
                    continue
                vals[i] = vals[p] * frac()
                progressed = True
        if all(v is not pending for v in vals):
            break
        if not progressed:
            # a tied-parent chain: some normal node's value is produced
            # by a hybridization below it; keep iterating only while the
            # hybrid assignments above can still fire
            continue
    if any(v is pending for v in vals):
        raise ValueError("could not initialize network taus (cyclic ties?)")
    st.tau[:] = vals


def load_run(cfg: BppConfig, pad_loci_to: int | None = None) -> RunData:
    alns = parse_phylip(cfg.seqfile, max_loci=cfg.nloci)
    if cfg.nloci is not None:
        alns = alns[: cfg.nloci]

    st = build_species_tree(cfg)
    species_index = {name: i for i, name in enumerate(st.names)}

    imap = None
    if cfg.imapfile:
        imap = parse_imap(cfg.imapfile)

    locus_models = None
    if cfg.model == SubstModel.CUSTOM:
        from .io.partition import locus_models as expand
        from .io.partition import parse_partition_file
        parts = parse_partition_file(cfg.partition_file)
        locus_models = expand(parts, len(alns), cfg.partition_file)
        loci = [
            process_locus(a, imap, species_index, cleandata=cfg.cleandata,
                          jc69_fold=m == SubstModel.JC69, phase=cfg.phase,
                          aa=m.is_aa)
            for a, m in zip(alns, locus_models)
        ]
    else:
        jc69_fold = cfg.model == SubstModel.JC69
        loci = [
            process_locus(a, imap, species_index, cleandata=cfg.cleandata,
                          jc69_fold=jc69_fold, phase=cfg.phase,
                          aa=cfg.model.is_aa)
            for a in alns
        ]
    batch = pack_loci(loci, site_block=cfg.site_block, pad_loci_to=pad_loci_to)

    tip_dates = date_lmax = None
    if cfg.datefile:
        from .io.imap import parse_datefile
        dates = parse_datefile(cfg.datefile)
        L, T = batch.n_loci, batch.max_tips
        tip_dates = np.zeros((L, T))
        for li, labels in enumerate(batch.labels):
            for j, lab in enumerate(labels):
                # lookup by individual, falling back to the mapped
                # species (examples/mammoth/dates.txt keys by species)
                ind = lab.split("^")[-1]
                spname = st.names[int(batch.tip_pop[li, j])]
                if ind in dates:
                    tip_dates[li, j] = dates[ind]
                elif spname in dates:
                    tip_dates[li, j] = dates[spname]
                else:
                    raise ValueError(
                        f"sequence {lab!r} has no entry in datefile "
                        f"{cfg.datefile}")
        # calendar l_constraint per species node: max date of any
        # descendant sample (update_tau_constraint, gtree.c:1637)
        H = st.n_nodes
        date_lmax = np.zeros(H)
        for li, labels in enumerate(batch.labels):
            n = len(labels)
            for j in range(n):
                s = int(batch.tip_pop[li, j])
                date_lmax[s] = max(date_lmax[s], tip_dates[li, j])
        for _ in range(H):          # fixpoint: child maxima flow upward
            for i in range(H):
                p = int(st.parent[i])
                if p >= 0 and date_lmax[i] > date_lmax[p]:
                    date_lmax[p] = date_lmax[i]
    return RunData(cfg=cfg, batch=batch, stree=st, loci=loci,
                   locus_models=locus_models,
                   tip_dates=tip_dates, date_lmax=date_lmax)


def load_run_from_ctl(path: str, **kw) -> RunData:
    return load_run(parse_ctl(path), **kw)
