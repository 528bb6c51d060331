"""Substitution/rate-parameter engine tests.

1. HKY/GTR + discrete-Gamma likelihood parity against a slow pure-numpy
   Felsenstein oracle (independent implementation, scipy expm P(t)).
2. Prior recovery without data (the reference's own validation trick,
   locus.c:2729-2737 "#if 0 ... obtain the prior when running without
   data"): with usedata=0 every substitution move must sample its
   prior, so posterior moments must match the prior's.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bpp_tpu.config import Prior, PriorDist, SubstModel
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.mcmc.state import make_logl_fn
from bpp_tpu.testing import synthetic_run


def numpy_loglikelihood(run, gt, subst, model, cats):
    """Slow reference Felsenstein over the packed batch, scipy expm."""
    import scipy.linalg

    batch = run.batch
    L = batch.n_loci
    total = np.zeros(L)
    tipp = np.asarray(
        jax.device_get(jnp.asarray(batch.tip_codes)), np.uint8)
    freqs = np.asarray(subst.freqs, np.float64)
    mu = np.asarray(subst.mu, np.float64)
    rates = np.asarray(subst.rates, np.float64)
    age = np.asarray(gt.age, np.float64)
    left = np.asarray(gt.left)
    right = np.asarray(gt.right)
    nseq = np.asarray(batch.n_seq)
    weights = np.asarray(batch.weights, np.float64)

    for li in range(L):
        if not batch.locus_mask[li]:
            continue
        f = freqs[li]
        if model == SubstModel.JC69:
            Q = np.full((4, 4), 1.0 / 3.0)
            np.fill_diagonal(Q, -1.0)
            f = np.full(4, 0.25)
        elif model == SubstModel.HKY:
            kappa = float(np.asarray(subst.kappa1)[li])
            Q = np.zeros((4, 4))
            for i in range(4):
                for j in range(4):
                    if i == j:
                        continue
                    tr = (i, j) in ((0, 2), (2, 0), (1, 3), (3, 1))
                    Q[i, j] = (kappa if tr else 1.0) * f[j]
            np.fill_diagonal(Q, -Q.sum(1))
            Q /= -(f * np.diag(Q)).sum()
        else:  # GTR
            q = np.asarray(subst.qrates, np.float64)[li]
            Q = np.zeros((4, 4))
            iu = np.triu_indices(4, 1)
            Q[iu] = q
            Q = Q + Q.T
            Q *= f[None, :]
            np.fill_diagonal(Q, -Q.sum(1))
            Q /= -(f * np.diag(Q)).sum()

        T = tipp.shape[1]
        n = int(nseq[li])
        nn = 2 * T - 1
        S = tipp.shape[2]
        C = rates.shape[1]
        clv = np.zeros((nn, S, C, 4))
        for t in range(T):
            code = tipp[li, t]
            for a in range(4):
                clv[t, :, :, a] = ((code >> a) & 1)[:, None]
        # postorder: inner nodes T..T+n-2 in index order (packing invariant)
        for u in range(T, T + n - 1):
            lc, rc = left[li, u], right[li, u]
            res = np.ones((S, C, 4))
            for ch in (lc, rc):
                tbr = (age[li, u] - age[li, ch]) * mu[li]
                for c in range(C):
                    P = scipy.linalg.expm(Q * tbr * rates[li, c])
                    res[:, c, :] *= clv[ch][:, c, :] @ P.T
            clv[u] = res
        root = T + n - 2 if n > 1 else 0
        lik = (clv[root] * f[None, None, :]).sum(-1).mean(-1)  # [S]
        total[li] = (np.log(np.maximum(lik, 1e-300)) * weights[li][
            :lik.shape[0]]).sum()
    return total


@pytest.mark.parametrize("model", [SubstModel.HKY, SubstModel.GTR])
def test_likelihood_vs_numpy_oracle(model):
    run = synthetic_run(n_loci=4, n_seq=5, n_patterns=12, n_species=3,
                        seed=2, dtype="float64", model=model,
                        alphaprior=Prior(PriorDist.GAMMA, 2.0, 4.0),
                        alpha_cats=4)
    eng = Engine(run, seed=9)
    state = eng.init_state()
    ours = np.asarray(state.logl)
    theirs = numpy_loglikelihood(run, state.gt, state.subst, model,
                                 cats=4)
    mask = np.asarray(run.batch.locus_mask)
    np.testing.assert_allclose(ours[mask], theirs[mask], rtol=1e-8)


@pytest.mark.smoke
def test_prior_recovery_no_data():
    """usedata=0: freqs/alpha/heredity/mu posteriors == their priors."""
    run = synthetic_run(
        n_loci=6, n_seq=4, n_patterns=8, n_species=2, seed=3,
        dtype="float64", model=SubstModel.HKY, usedata=False,
        alphaprior=Prior(PriorDist.GAMMA, 4.0, 8.0), alpha_cats=4,
        est_heredity=1, heredity_alpha=4.0, heredity_beta=4.0,
        est_locusrate=1, locusrate_prior=1, locusrate_alpha=5.0,
        locusrate_mubar=1.0)
    eng = Engine(run, seed=11)
    state = eng.init_state()
    key = jax.random.PRNGKey(4)

    n_iter, thin, burn = 3000, 5, 500
    freqs_s, alpha_s, h_s, mu_s = [], [], [], []
    for i in range(n_iter // thin):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, thin)
        if i * thin >= burn:
            freqs_s.append(np.asarray(state.subst.freqs))
            alpha_s.append(np.asarray(state.subst.alpha))
            h_s.append(np.asarray(state.subst.heredity))
            mu_s.append(np.asarray(state.subst.mu))
    freqs_s = np.stack(freqs_s)      # [n, L, 4]
    alpha_s = np.stack(alpha_s)
    h_s = np.stack(h_s)
    mu_s = np.stack(mu_s)

    mask = np.asarray(run.batch.locus_mask)
    # freqs ~ uniform Dirichlet: mean 1/4 (sd of mean over samples*loci small)
    fmean = freqs_s[:, mask].mean(axis=(0, 1))
    assert np.all(np.abs(fmean - 0.25) < 0.04), fmean
    # alpha ~ Gamma(4, 8): mean 0.5, var 1/16
    am = alpha_s[:, mask].mean()
    assert abs(am - 0.5) < 0.08, am
    # heredity ~ Gamma(4, 4): mean 1
    hm = h_s[:, mask].mean()
    assert abs(hm - 1.0) < 0.15, hm
    # mu_i ~ Gamma(5, 5): mean 1
    mm = mu_s[:, mask].mean()
    assert abs(mm - 1.0) < 0.15, mm


def test_gammadir_locusrate_sum_behavior():
    """Dir prior (fixed mubar): pair moves keep sum(mu) == L * mubar."""
    run = synthetic_run(
        n_loci=6, n_seq=4, n_patterns=8, n_species=2, seed=5,
        dtype="float64", model=SubstModel.JC69, usedata=False,
        est_locusrate=1, locusrate_prior=3, locusrate_alpha=2.0,
        locusrate_mubar=1.0)
    eng = Engine(run, seed=13)
    state = eng.init_state()
    key = jax.random.PRNGKey(6)
    mask = np.asarray(run.batch.locus_mask)
    s0 = np.asarray(state.subst.mu)[mask].sum()
    for _ in range(5):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 20)
        s = np.asarray(state.subst.mu)[mask].sum()
        assert abs(s - s0) < 1e-6 * max(1.0, s0)
    # and the rates actually moved
    mu = np.asarray(state.subst.mu)[mask]
    assert np.std(mu) > 1e-3
