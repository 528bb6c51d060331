"""Synthetic run construction for tests, dry-runs, and benchmarks."""

from __future__ import annotations

import numpy as np

from .config import BppConfig, Prior, PriorDist, SpeciesTreeSpec
from .data.msa import ProcessedLocus
from .data.packing import pack_loci
from .loader import RunData
from .trees.stree import SpeciesTree


def synthetic_species_tree(n_species: int, rng: np.random.Generator,
                           tau_root: float = 0.004, theta: float = 0.002
                           ) -> SpeciesTree:
    names = [f"S{i}" for i in range(n_species)]
    if n_species == 1:
        st = SpeciesTree.single_population(names[0])
        st.theta[:] = theta
        return st
    # random coalescent-shaped topology
    nodes = list(range(n_species))
    ns = n_species
    nst = 2 * ns - 1
    left = np.full(nst, -1, np.int32)
    right = np.full(nst, -1, np.int32)
    parent = np.full(nst, -1, np.int32)
    nxt = ns
    while len(nodes) > 1:
        i, j = rng.choice(len(nodes), 2, replace=False)
        a, b = nodes[i], nodes[j]
        left[nxt], right[nxt] = a, b
        parent[a] = parent[b] = nxt
        nodes = [x for x in nodes if x not in (a, b)] + [nxt]
        nxt += 1
    st = SpeciesTree(names=names, left=left, right=right, parent=parent,
                     tau=np.zeros(nst), theta=np.full(nst, theta))
    # taus: root at tau_root, descendants shrink
    def rec(i, t):
        st.tau[i] = t
        for ch in (st.left[i], st.right[i]):
            if ch >= ns:
                rec(ch, t * (0.5 + 0.3 * rng.random()))
    rec(st.root, tau_root)
    return st


def synthetic_run(
    n_loci: int = 8,
    n_seq: int = 6,
    n_patterns: int = 16,
    n_species: int = 4,
    seed: int = 0,
    pad_loci_to: int | None = None,
    locus_models=None,
    **cfg_kw,
) -> RunData:
    """Random (non-simulated) data; adequate for compile/shape testing."""
    rng = np.random.default_rng(seed)
    st = synthetic_species_tree(n_species, rng)
    loci = []
    # n_patterns may be per-locus (list) to build heterogeneous batches
    pat_of = list(n_patterns) if isinstance(n_patterns, (list, tuple)) \
        else [n_patterns] * n_loci
    for li in range(n_loci):
        codes = rng.choice(
            np.array([1, 2, 4, 8, 15], np.uint8),
            size=(n_seq, pat_of[li]),
            p=[0.24, 0.24, 0.24, 0.24, 0.04])
        weights = rng.integers(1, 30, size=pat_of[li]).astype(np.int32)
        tip_species = rng.integers(0, n_species, size=n_seq).astype(np.int32)
        # ensure at least two distinct tips exist
        tip_species[0] = 0
        loci.append(ProcessedLocus(
            index=li, labels=[f"t{li}_{i}" for i in range(n_seq)],
            codes=codes, weights=weights, tip_species=tip_species,
            n_sites=int(weights.sum())))
    batch = pack_loci(loci, site_block=8, pad_loci_to=pad_loci_to)
    cfg = BppConfig(
        species=SpeciesTreeSpec(
            count=n_species, names=tuple(st.names),
            max_seqs=tuple([n_seq] * n_species), newick=None),
        nloci=n_loci,
        thetaprior=Prior(PriorDist.GAMMA, 2.0, 1000.0),
        tauprior=Prior(PriorDist.GAMMA, 2.0, 500.0),
        burnin=2, nsample=2, sampfreq=1,
        **cfg_kw,
    )
    return RunData(cfg=cfg, batch=batch, stree=st, loci=loci,
                   locus_models=locus_models)
