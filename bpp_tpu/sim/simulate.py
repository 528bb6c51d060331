"""Coalescent simulator (the reference's --simulate / MCcoal successor).

Equivalent of ``src/simulate.c`` (``cmd_simulate:2606``): per locus,
draw a gene tree from the MSC prior over the annotated species tree
(taus from node ages, thetas from ``#`` annotations), evolve sequences
down the tree under the substitution model (JC69 fast path /
closed-form P(t) otherwise), and write multi-locus PHYLIP + Imap +
gene-tree files.
"""

from __future__ import annotations

import sys

import numpy as np

from ..config import SubstModel
from ..io.ctl_sim import SimConfig, parse_sim_ctl
from ..io.newick import parse_newick
from ..trees.gtree import simulate_gtree_host
from ..trees.stree import SpeciesTree


def species_tree_from_sim(cfg: SimConfig) -> SpeciesTree:
    """Annotated newick -> SpeciesTree with taus and thetas."""
    if cfg.newick is None:
        st = SpeciesTree.single_population(cfg.species_names[0])
        st.theta[:] = cfg.theta_single or 0.001
        return st
    root = parse_newick(cfg.newick)
    # '#x' was tokenized as a hybrid tag; reinterpret numeric tags as theta
    thetas = {}
    for node in root.walk():
        if node.hybrid_tag is not None:
            try:
                thetas[id(node)] = float(node.hybrid_tag)
                node.hybrid_tag = None
            except ValueError:
                pass
    st = SpeciesTree.from_node(root, tip_order=list(cfg.species_names))

    # map Node objects to indices again to transfer tau/theta; must
    # mirror _from_network's assignment order for MSC-I trees (marker
    # leaves -> mirror slots in root.leaves() order)
    inner_labels = {n.label for n in root.walk() if n.children and n.label}
    htips = [n for n in root.leaves() if n.label in inner_labels]
    hset = {id(n) for n in htips}
    ns = st.n_tips
    counter = [ns]
    idx_of: dict = {}

    def rec(node):
        if node.is_leaf:
            if id(node) not in hset:
                idx_of[id(node)] = st.names.index(node.label)
            return
        for c in node.children:
            rec(c)
        idx_of[id(node)] = counter[0]
        counter[0] += 1

    rec(root)
    for k, h in enumerate(htips):
        idx_of[id(h)] = ns + st.n_inner + k
    for node in root.walk():
        idx = idx_of[id(node)]
        if node.length is not None and (not node.is_leaf
                                        or id(node) in hset):
            st.tau[idx] = node.length       # sim format: lengths are ages
        if id(node) in thetas:
            st.theta[idx] = thetas[id(node)]
    # hybridization tau ties: mirror = hinner; htau==0 parents tied;
    # BDI quads share one tau (stree.c:5652)
    if st.hindex is not None:
        mirror0 = ns + st.n_inner
        for m in range(mirror0, st.n_nodes):
            hin = int(st.hybrid[m])
            t = max(st.tau[hin], st.tau[m])
            st.tau[hin] = st.tau[m] = t
            if not st.htau[hin]:
                st.tau[st.parent[hin]] = t
            if not st.htau[m]:
                st.tau[st.parent[m]] = t
        if st.bdi is not None:
            for i in range(st.n_nodes):
                j = int(st.bdi[i])
                if j >= 0:
                    t = max(st.tau[i], st.tau[j])
                    st.tau[i] = st.tau[j] = t
                    st.tau[int(st.hybrid[i])] = t
                    st.tau[int(st.hybrid[j])] = t
    # default thetas: inherit parent's where unset
    for i in range(st.n_nodes - 1, -1, -1):
        if st.theta[i] == 0 and st.parent[i] != -1:
            st.theta[i] = st.theta[st.parent[i]]
    return st


_BASES = np.array(list("ACGT"))


# host-side closed-form P(t) (numpy, not jax: the simulator evolves one
# branch at a time and must not dispatch tiny ops to the accelerator)

def _np_pmatrix_jc69(t: float) -> np.ndarray:
    e = np.exp(-4.0 / 3.0 * t)
    return np.full((4, 4), 0.25 * (1 - e)) + np.eye(4) * e


def _np_pmatrix_hky(t: float, freqs: np.ndarray, kappa: float) -> np.ndarray:
    # TN93 closed form (core_pmatrix.c:299-587 math) with a1 = a2 = kappa*b
    pi = freqs
    R, Y = pi[0] + pi[2], pi[1] + pi[3]  # A,G purines / C,T pyrimidines
    # normalize so mean rate = 1
    beta = 1.0 / (2 * R * Y + 2 * kappa * (pi[0] * pi[2] + pi[1] * pi[3]))
    a = kappa * beta
    b = beta
    e2 = np.exp(-b * t)
    P = np.empty((4, 4))
    for i in range(4):
        purine = i in (0, 2)
        S, pair = (R, 2 if i == 0 else 0) if purine else (Y, 3 if i == 1 else 1)
        e3 = np.exp(-(S * a + (1 - S) * b) * t)
        for j in range(4):
            pj = pi[j]
            if j == i:
                P[i, j] = pj + pj * (1 / S - 1) * e2 + (S - pj) / S * e3
            elif j == pair:
                P[i, j] = pj + pj * (1 / S - 1) * e2 - pj / S * e3
            else:
                P[i, j] = pj * (1 - e2)
    return P


def _np_gtr_eigen(freqs: np.ndarray, rates: np.ndarray):
    """Symmetrized eigendecomposition of the reversible GTR rate matrix."""
    a, b, c, d, e, f = rates  # AC AG AT CG CT GT
    Q = np.zeros((4, 4))
    Q[0, 1], Q[0, 2], Q[0, 3] = a * freqs[1], b * freqs[2], c * freqs[3]
    Q[1, 2], Q[1, 3] = d * freqs[2], e * freqs[3]
    Q[2, 3] = f * freqs[3]
    Q += Q.T * (freqs[None, :] / freqs[:, None])
    np.fill_diagonal(Q, 0.0)
    np.fill_diagonal(Q, -Q.sum(axis=1))
    mean_rate = -(freqs * np.diag(Q)).sum()
    Q /= mean_rate
    sq = np.sqrt(freqs)
    S = Q * sq[:, None] / sq[None, :]
    w, U = np.linalg.eigh((S + S.T) / 2)
    # Q = D^-1/2 U diag(w) U^T D^1/2  =>  P(t) = T exp(wt) Tinv
    return w, U / sq[:, None], U.T * sq[None, :]


def _np_pmatrix_eigen(t: float, w, T, Tinv) -> np.ndarray:
    return (T * np.exp(w * t)[None, :]) @ Tinv


def evolve_sequences(rng, left, right, parent, age, n_tips, length,
                     model: SubstModel, freqs, pmat_fn):
    """Simulate sequences down one gene tree; returns [n_tips, length] chars."""
    nn = 2 * n_tips - 1
    seqs = np.zeros((nn, length), dtype=np.int64)
    root = nn - 1
    seqs[root] = rng.choice(4, size=length, p=freqs)
    # process nodes root-down (descending age order)
    order = sorted(range(n_tips, nn), key=lambda u: -age[u])
    assert order[0] == root or age[order[0]] >= age[root]
    for u in order:
        for ch in (left[u], right[u]):
            t = age[u] - age[ch]
            P = pmat_fn(t)                        # [4, 4]
            cum = P.cumsum(axis=1)
            r = rng.random(length)
            src = seqs[u]
            draw = (r[:, None] > cum[src]).sum(axis=1)
            seqs[ch] = np.minimum(draw, 3)
    return seqs[:n_tips]


_IUPAC_NALLELE = np.array([bin(m).count("1") for m in range(16)])


def sequencing_machine(rng, masks, species_frac, eps, a_sites,
                       dmin=2, dmax=10, prob_prev=0.9):
    """ML genotype-calling errors on one unphased-diploid row
    (sequencing_machine, simulate.c:1081).

    ``masks``: [L] uint8 IUPAC bitmasks (modified copy returned).
    Per site: read depth ~ round(dmin + Beta(xm*a, (1-a)*...)*(dmax -
    dmin)) with site means AR(1)-blended toward the species mean
    (simulate.c:1103), reads of the first allele ~ Binomial, genotype
    called by ML among {hom, het}; miscalls flip the stored mask.
    Returns (masks', n_hom_to_het, n_het_to_hom).
    """
    out = masks.copy()
    L = len(masks)
    lne, ln1e = np.log(eps), np.log(1 - eps)
    err01 = err10 = 0
    xdepth = species_frac
    for i in range(L):
        xm = prob_prev * xdepth + (1 - prob_prev) * species_frac \
            if i else species_frac
        xm = min(max(xm, 1e-6), 1 - 1e-6)
        xdepth = rng.beta(xm * a_sites, (1 - xm) * a_sites)
        depth = int(round(dmin + xdepth * (dmax - dmin)))
        m = int(out[i])
        nallele = int(_IUPAC_NALLELE[m])
        if nallele > 2:
            continue                     # ambiguity codes left alone
        p = (1 - eps) if nallele == 1 else 0.5
        k = rng.binomial(depth, p)
        ln_hom0 = k * ln1e + (depth - k) * lne
        ln_het = -depth * np.log(2.0)
        ln_hom1 = (depth - k) * ln1e + k * lne
        alleles = [b for b in (1, 2, 4, 8) if m & b]
        if ln_het > ln_hom0 and ln_het > ln_hom1:
            if nallele == 1:             # true hom called het
                others = [b for b in (1, 2, 4, 8) if not (m & b)]
                out[i] = m | others[rng.integers(3)]
                err01 += 1
        else:
            if nallele == 2:             # true het called hom
                out[i] = alleles[int(rng.random() < 0.5)]
                err10 += 1
    return out, err01, err10


def run_simulation(ctl_path: str, seed: int | None = None) -> int:
    cfg = parse_sim_ctl(ctl_path)
    rng = np.random.default_rng(
        seed if seed is not None else (cfg.seed if cfg.seed > 0 else None))
    st = species_tree_from_sim(cfg)

    # individual labels per species: a1..aN style from lower-cased species
    # name; diploid species simulate two haplotypes per individual which
    # are OR-merged into IUPAC ambiguity codes (simulate.c:129
    # process_diploid doubles the counts, :739 merge comment)
    diploid = list(cfg.diploid) + [0] * len(st.names)
    labels = []
    tip_species = []
    merge_pairs = []        # (row_a, row_b, out_label) per diploid ind.
    row = 0
    for si, (name, count) in enumerate(zip(st.names, cfg.n_per_species)):
        for k in range(count):
            if diploid[si]:
                labels.append(f"{name}^{name.lower()}{k+1}.A")
                labels.append(f"{name}^{name.lower()}{k+1}.B")
                tip_species += [si, si]
                merge_pairs.append((row, row + 1,
                                    f"{name}^{name.lower()}{k+1}"))
                row += 2
            else:
                labels.append(f"{name}^{name.lower()}{k+1}")
                tip_species.append(si)
                row += 1
    tip_species = np.asarray(tip_species, np.int32)
    n = len(labels)
    any_diploid = bool(merge_pairs)

    if cfg.model == SubstModel.JC69:
        pmat_fn = _np_pmatrix_jc69
        freqs = np.full(4, 0.25)
    elif cfg.model in (SubstModel.HKY, SubstModel.K80, SubstModel.F81):
        freqs = (np.full(4, 0.25) if cfg.model == SubstModel.K80
                 else np.asarray(cfg.basefreqs))
        kappa = 1.0 if cfg.model == SubstModel.F81 else cfg.kappa

        def pmat_fn(t):
            return _np_pmatrix_hky(t, freqs, kappa)
    else:
        freqs = np.asarray(cfg.basefreqs)
        w, Tm, Tinv = _np_gtr_eigen(freqs, np.asarray(cfg.qrates))

        def pmat_fn(t):
            return _np_pmatrix_eigen(t, w, Tm, Tinv)

    mig_routes = None
    if cfg.migration:
        from ..output import node_label
        from ..trees.migration import simulate_gtree_mig_host
        names = {node_label(st, i): i for i in range(st.n_nodes)}
        msi = np.asarray([names[s] for s, _, _ in cfg.migration], np.int32)
        mti = np.asarray([names[t] for _, t, _ in cfg.migration], np.int32)
        mw = np.asarray([w for _, _, w in cfg.migration])
        mig_routes = (msi, mti, mw)

    seq_fp = open(cfg.seqfile, "w")
    tree_fp = open(cfg.treefile, "w") if cfg.treefile else None
    # seqerr: genotype-error copies go to <seqfile>.seqerr
    # (simulate.c:1773); per-species mean read-depth fractions drawn
    # once (init_sequencing_machine, beta model, simulate.c:1060)
    err_fp = None
    species_frac = None
    if cfg.read_depth and any_diploid:
        err_fp = open(cfg.seqfile + ".seqerr", "w")
        xm = (cfg.read_depth - 2) / 8.0          # read_depth_min/max 2/10
        xm = min(max(xm, 1e-6), 1 - 1e-6)
        species_frac = rng.beta(xm * cfg.a_samples,
                                (1 - xm) * cfg.a_samples, st.n_tips)

    for li in range(cfg.n_loci):
        if mig_routes is not None:
            from ..trees.migration import simulate_gtree_mig_host
            gl, gr, gp, ga = simulate_gtree_mig_host(
                rng, tip_species, st.parent, st.tau,
                np.maximum(st.theta, 1e-12), *mig_routes)
        else:
            from ..trees.gtree import host_bdi_mirror
            gl, gr, gp, ga, _ = simulate_gtree_host(
                rng, tip_species, st.left, st.right, st.parent, st.tau,
                np.maximum(st.theta, 1e-12),
                hindex=st.hindex, hybrid=st.hybrid, phi=st.phi,
                bdi_mirror=host_bdi_mirror(st))
        mu = 1.0
        if cfg.locusrate_alpha > 0:
            mu = rng.gamma(cfg.locusrate_alpha, 1.0 / cfg.locusrate_alpha)
        seqs = evolve_sequences(rng, gl, gr, gp, ga * mu, n, cfg.length,
                                cfg.model, freqs, pmat_fn)
        if any_diploid:
            # IUPAC mask merge: bit order A,C,G,T
            from ..io.maps import NT_MAP
            inv = {int(NT_MAP[ord(c)]): c for c in "ACGTRYSWKMBDHVN"}
            masks = np.uint8(1) << seqs.astype(np.uint8)
            out_rows = []
            err_rows = []
            used = set()
            for a, b, lab in merge_pairs:
                m = masks[a] | masks[b]
                out_rows.append((lab, "".join(inv[int(x)] for x in m)))
                if err_fp is not None:
                    sfrac = species_frac[tip_species[a]]
                    me, e01, e10 = sequencing_machine(
                        rng, m, sfrac, cfg.base_err, cfg.a_sites)
                    err_rows.append(
                        (lab, "".join(inv[int(x)] for x in me)))
                used.add(a)
                used.add(b)
            for i, lab in enumerate(labels):
                if i not in used:
                    row = (lab, "".join(_BASES[seqs[i]]))
                    out_rows.append(row)
                    if err_fp is not None:
                        err_rows.append(row)   # haploids pass through
            seq_fp.write(f"{len(out_rows)} {cfg.length}\n\n")
            for lab, s in out_rows:
                seq_fp.write(f"{lab:<12} {s}\n")
            if err_fp is not None:
                err_fp.write(f"{len(err_rows)} {cfg.length}\n\n")
                for lab, s in err_rows:
                    err_fp.write(f"{lab:<12} {s}\n")
                err_fp.write("\n")
        else:
            seq_fp.write(f"{n} {cfg.length}\n\n")
            for i, lab in enumerate(labels):
                seq_fp.write(f"{lab:<12} {''.join(_BASES[seqs[i]])}\n")
        seq_fp.write("\n")
        if tree_fp:
            tree_fp.write(_gtree_newick(gl, gr, gp, ga, labels, n) + "\n")

    seq_fp.close()
    if err_fp is not None:
        err_fp.close()
    if tree_fp:
        tree_fp.close()
    if cfg.imapfile and st.n_tips > 1:
        seen = set()
        with open(cfg.imapfile, "w") as fh:
            for lab, si in zip(labels, tip_species):
                tag = lab.split("^")[1]
                if tag.endswith((".A", ".B")):
                    tag = tag[:-2]
                if tag in seen:
                    continue
                seen.add(tag)
                fh.write(f"{tag}\t{st.names[si]}\n")
    print(f"simulated {cfg.n_loci} loci -> {cfg.seqfile}", file=sys.stderr)
    return 0


def _gtree_newick(left, right, parent, age, labels, n_tips) -> str:
    def rec(u):
        if u < n_tips:
            s = labels[u]
        else:
            s = f"({rec(left[u])},{rec(right[u])})"
        p = parent[u]
        if p >= 0:
            s += f":{age[p]-age[u]:.10f}"
        return s
    root = 2 * n_tips - 2
    return rec(root) + ";"
