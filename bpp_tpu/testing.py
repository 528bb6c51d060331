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


def generate_aa_benchmark(nloci: int, nsites: int, out_dir: str,
                          seed: int = 137) -> float:
    """Deterministic WAG amino-acid benchmark dataset (PHYLIP + Imap).

    4 species x 4 sequences, MSC gene trees on the same ((A,B),(C,D))
    tree/taus as the DNA bench; evolution via the WAG eigensystem
    (P(t) = V e^{wt} V^-1).  Used by bench.py's AA head-to-head against
    the reference's 20x20 AVX kernels (core_partials_avx.c
    pll_core_update_partial_ti_20x20_avx, bpp.h:2827).  Returns the
    generation wall time."""
    import time as _time

    from .core.aa_matrices import AA_MODELS

    t0 = _time.time()

    rng = np.random.default_rng(seed)
    AAS = "ARNDCQEGHILKMFPSTWYV"
    rates, freqs = AA_MODELS["WAG"]
    Q = np.zeros((20, 20))
    iu = np.triu_indices(20, 1)
    Q[iu] = rates[iu] if rates.ndim == 2 else rates
    Q = Q + Q.T
    Q = Q * freqs[None, :]
    np.fill_diagonal(Q, -Q.sum(1))
    Q /= -(freqs * np.diag(Q)).sum()
    # reversible: symmetrize with sqrt(pi), eigendecompose once
    sp = np.sqrt(freqs)
    S = Q * sp[:, None] / sp[None, :]
    w, U = np.linalg.eigh((S + S.T) / 2)
    V = U / sp[:, None]          # Q = V diag(w) Vinv
    Vinv = U.T * sp[None, :]

    TAUS_AB, TAUS_CD, TAU_R, THETA = 0.01, 0.012, 0.02, 0.01

    def sim_gtree():
        nodes = {}
        ages = {i: 0.0 for i in range(16)}
        def coalesce(lin, t0_, t1):
            t = t0_
            while len(lin) > 1:
                t = t + rng.exponential(THETA / (len(lin) * (len(lin) - 1)))
                if t >= t1:
                    return lin, t1
                i, j = sorted(rng.choice(len(lin), 2, replace=False))
                a, b = lin[i], lin[j]
                n = 16 + len(nodes)
                nodes[n] = (t, a, b)
                ages[n] = t
                lin = [x for x in lin if x not in (a, b)] + [n]
            return lin, t1
        act = {s: list(range(4 * i, 4 * i + 4))
               for i, s in enumerate("ABCD")}
        for s in "ABCD":
            act[s], _ = coalesce(act[s],
                                 0.0, TAUS_AB if s in "AB" else TAUS_CD)
        ab, _ = coalesce(act["A"] + act["B"], TAUS_AB, TAU_R)
        cd, _ = coalesce(act["C"] + act["D"], TAUS_CD, TAU_R)
        root_lin, _ = coalesce(ab + cd, TAU_R, np.inf)
        return nodes, ages, root_lin[0]

    import os
    os.makedirs(out_dir, exist_ok=True)
    labels = [f"{s}{k}^{s}{k}" for s in "ABCD" for k in range(1, 5)]
    cumfreq = freqs.cumsum()
    with open(f"{out_dir}/aa.phy", "w") as f:
        for li in range(nloci):
            nodes, ages, root = sim_gtree()
            seqs = {}
            stack = [(root, (rng.random(nsites)[:, None]
                             > cumfreq[None, :]).sum(1))]
            while stack:
                node, seq = stack.pop()
                if node < 16:
                    seqs[node] = seq
                    continue
                age, l, r = nodes[node]
                for ch in (l, r):
                    t = max(age - ages.get(ch, 0.0), 1e-9)
                    P = (V * np.exp(w * t)[None, :]) @ Vinv
                    P = np.maximum(P, 0.0)
                    P /= P.sum(1, keepdims=True)
                    cum = P.cumsum(1)
                    u = rng.random(nsites)
                    stack.append((ch, (u[:, None] > cum[seq]).sum(1)))
            f.write(f"16 {nsites}\n")
            for i, lab in enumerate(labels):
                f.write(f"{lab}  {''.join(AAS[x] for x in seqs[i])}\n")
            f.write("\n")
    with open(f"{out_dir}/Imap.txt", "w") as f:
        for s in "ABCD":
            for k in range(1, 5):
                f.write(f"{s}{k} {s}\n")
    return _time.time() - t0



def generate_hm_oracle_case(out_dir: str):
    """The heredity x migration referee dataset (VALIDATION.md round 4).

    2 species, one A->B route, 8 loci x 2 sequences (one per species),
    JC69, per-locus heredity from file — the pairwise coalescent-time
    density is closed-form, so the exact posterior is computable by
    quadrature (scripts/hm_oracle.py; oracle posterior means with
    nq=36/nt=600 Gauss-Legendre: theta_A 0.020072, theta_AB 0.016726,
    tau 0.018986, W 0.985400).  Deterministic (seed 20260820).
    """
    import os

    import numpy as np

    rng = np.random.default_rng(20260820)
    os.makedirs(out_dir, exist_ok=True)
    H = np.array([0.5, 1.5, 1.0, 2.0, 0.75, 1.25, 1.0, 0.5])
    NSITES = 500
    th_a, th_r, tau, M = 0.01, 0.02, 0.02, 1.0

    def pd(b):
        return 0.75 * (1.0 - np.exp(-4.0 * b / 3.0))

    ks = []
    for h in H:
        cA = 2.0 / (th_a * h)
        cR = 2.0 / (th_r * h)
        s = rng.exponential(1.0 / M)
        t = np.inf
        if s < tau:
            t0 = s + rng.exponential(1.0 / cA)
            if t0 < tau:
                t = t0
        if not np.isfinite(t):
            t = tau + rng.exponential(1.0 / cR)
        ks.append(int(rng.binomial(NSITES, pd(2.0 * t))))
    NTS = "TCAG"
    with open(f"{out_dir}/hm.phy", "w") as f:
        for k in ks:
            f.write(f"2 {NSITES}\n")
            s1 = rng.integers(0, 4, NSITES)
            s2 = s1.copy()
            pos = rng.choice(NSITES, k, replace=False)
            s2[pos] = (s1[pos] + rng.integers(1, 4, k)) % 4
            f.write("a^a1  " + "".join(NTS[x] for x in s1) + "\n")
            f.write("b^b1  " + "".join(NTS[x] for x in s2) + "\n\n")
    with open(f"{out_dir}/Imap.txt", "w") as f:
        f.write("a1 A\nb1 B\n")
    with open(f"{out_dir}/heredity.txt", "w") as f:
        f.write(" ".join(str(x) for x in H) + "\n")
    return ks
