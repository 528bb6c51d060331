"""Amino-acid model tests (reference: empirical matrices
src/maps.c:276-1011, model table locus.c:985-1110).

Oracles: scipy expm for P(t) (independent of our eigh path), and a
from-scratch numpy pruning implementation for the likelihood.
"""

import numpy as np
import pytest

from bpp_tpu.config import SubstModel
from bpp_tpu.core.aa_matrices import AA_MODELS, aa_qmatrix
from bpp_tpu.core.pmatrix import aa_eigen, pmatrix_aa
from bpp_tpu.io import maps


@pytest.mark.parametrize("name", ["WAG", "LG", "DAYHOFF", "MTMAM"])
def test_pmatrix_aa_vs_expm(name):
    from scipy.linalg import expm

    import jax.numpy as jnp

    rates, freqs = AA_MODELS[name]
    Q = aa_qmatrix(rates, freqs)
    for t in (0.0, 0.01, 0.3, 2.5):
        got = np.asarray(pmatrix_aa(jnp.asarray([t], jnp.float64), name))[0]
        want = expm(Q * t)
        np.testing.assert_allclose(got, want, atol=1e-10)
        np.testing.assert_allclose(got.sum(1), 1.0, atol=1e-10)
    # stationarity: pi P = pi
    w, T, Ti, f = aa_eigen(name)
    P = np.asarray(pmatrix_aa(jnp.asarray([1.0], jnp.float64), name))[0]
    np.testing.assert_allclose(f @ P, f, atol=1e-10)


def _write_aa_phylip(path, loci):
    with open(path, "w") as fh:
        for labels, seqs in loci:
            fh.write(f"{len(seqs)} {len(seqs[0])}\n")
            for lab, s in zip(labels, seqs):
                fh.write(f"{lab}  {s}\n")
            fh.write("\n")


def _simulate_aa_locus(rng, names, tree, taus, theta, model, n_sites):
    """2-tips-per-species MSC gene tree + WAG evolution via scipy expm."""
    from scipy.linalg import expm

    rates, freqs = AA_MODELS[model]
    Q = aa_qmatrix(rates, freqs)
    # gene tree: one seq per species on the fixed 4-taxon tree
    # (((A,B),C),D) with node ages from taus plus exponential waits
    # -- simple hand simulation adequate for likelihood testing
    t_ab = taus[0] + rng.exponential(theta / 2)
    t_abc = max(taus[1], t_ab) + rng.exponential(theta / 2)
    t_root = max(taus[2], t_abc) + rng.exponential(theta / 2)
    # evolve
    root_seq = rng.choice(20, size=n_sites, p=freqs / freqs.sum())

    def evolve(seq, t):
        P = expm(Q * t)
        out = np.empty_like(seq)
        for a in range(20):
            idx = np.nonzero(seq == a)[0]
            if idx.size:
                out[idx] = rng.choice(20, size=idx.size, p=P[a] / P[a].sum())
        return out

    n_abc = evolve(root_seq, t_root - t_abc)
    n_ab = evolve(n_abc, t_abc - t_ab)
    seqs = {
        "a^A": evolve(n_ab, t_ab),
        "b^B": evolve(n_ab, t_ab),
        "c^C": evolve(n_abc, t_abc),
        "d^D": evolve(root_seq, t_root),
    }
    aa = maps.AA_ORDER
    return (list(seqs.keys()),
            ["".join(aa[x] for x in s) for s in seqs.values()])


@pytest.fixture(scope="module")
def aa_run(tmp_path_factory):
    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine

    tmp = tmp_path_factory.mktemp("aa")
    rng = np.random.default_rng(5)
    loci = [_simulate_aa_locus(rng, "ABCD", None, [0.01, 0.02, 0.03],
                               0.02, "WAG", 120) for _ in range(3)]
    seqfile = tmp / "aa.txt"
    _write_aa_phylip(seqfile, loci)
    imap = tmp / "aa.Imap.txt"
    imap.write_text("A A\nB B\nC C\nD D\n")
    ctl = f"""
seed = 3
seqfile = {seqfile}
Imapfile = {imap}
jobname = out
species&tree = 4 A B C D
                1 1 1 1
               (((A, B), C), D);
usedata = 1
nloci = 3
model = WAG
thetaprior = invgamma 3 0.04
tauprior = invgamma 3 0.06
finetune = 1
burnin = 50
sampfreq = 2
nsample = 50
"""
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    run = load_run(cfg)
    eng = Engine(run, seed=3)
    state = eng.init_state()
    return cfg, run, eng, state


def test_aa_likelihood_vs_numpy_pruning(aa_run):
    """Engine logl vs a from-scratch numpy Felsenstein with scipy expm."""
    from scipy.linalg import expm

    cfg, run, eng, state = aa_run
    rates, freqs = AA_MODELS["WAG"]
    Q = aa_qmatrix(rates, freqs)

    got = np.asarray(eng._logl_fn(state.gt, state.subst, state.sp,
                                  state.clock))
    age = np.asarray(state.gt.age, np.float64)
    left = np.asarray(state.gt.left)
    right = np.asarray(state.gt.right)
    parent = np.asarray(state.gt.parent)
    mu = np.asarray(state.subst.mu, np.float64)
    codes = run.batch.tip_codes
    weights = run.batch.weights
    for li in range(3):
        ns = int(run.batch.n_seq[li])
        N = 2 * run.batch.max_tips - 1
        S = codes.shape[2]
        clv = np.zeros((N, S, 20))
        for t in range(ns):
            for s_ in range(S):
                m = int(codes[li, t, s_])
                clv[t, s_] = [(m >> a) & 1 for a in range(20)]
        # postorder over inner nodes by age
        T = run.batch.max_tips
        inner = sorted(
            [n for n in range(T, T + ns - 1)], key=lambda n: age[li, n])
        for n in inner:
            lc, rc = left[li, n], right[li, n]
            out = np.ones((S, 20))
            for ch in (lc, rc):
                t_br = (age[li, n] - age[li, ch]) * mu[li]
                P = expm(Q * t_br)
                out *= clv[ch] @ P.T
            clv[n] = out
        root = inner[-1]
        site_l = clv[root] @ AA_MODELS["WAG"][1]
        want = float((weights[li] * np.log(np.maximum(site_l, 1e-300))).sum())
        assert abs(got[li] - want) < 0.05 * abs(want) / 100 + 0.02, (
            li, got[li], want)


def test_aa_mcmc_runs_and_caches(aa_run):
    import jax

    cfg, run, eng, state = aa_run
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, _ = eng.step(state, sub)
    ll = eng._logl_fn(state.gt, state.subst, state.sp, state.clock)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(state.logl),
                               rtol=1e-5, atol=1e-3)
    # no freq/qrate moves for empirical AA models: freqs stay fixed
    np.testing.assert_allclose(
        np.asarray(state.subst.freqs[0]), AA_MODELS["WAG"][1], rtol=1e-6)
