import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.core import felsenstein as fe
from bpp_tpu.core import pmatrix as pm
from bpp_tpu.core.gammarates import discrete_gamma_rates
from bpp_tpu.trees.gtree import BIG_AGE, GTrees


def random_tree(rng, n):
    """Random coalescent-ish tree over n tips: returns arrays of size 2n-1."""
    nn = 2 * n - 1
    left = np.zeros(nn, np.int32)
    right = np.zeros(nn, np.int32)
    parent = np.full(nn, -1, np.int32)
    age = np.zeros(nn)
    lineages = list(range(n))
    t = 0.0
    nxt = n
    while len(lineages) > 1:
        t += rng.exponential(0.01)
        i, j = rng.choice(len(lineages), 2, replace=False)
        a, b = lineages[i], lineages[j]
        left[nxt], right[nxt] = a, b
        parent[a] = parent[b] = nxt
        age[nxt] = t
        lineages = [x for x in lineages if x not in (a, b)] + [nxt]
        nxt += 1
    return left, right, parent, age


def numpy_felsenstein(left, right, age, tips, freqs, rates, weights, kappa=None):
    """Direct recursive pruning in float64 (oracle)."""
    n = tips.shape[0]
    nn = 2 * n - 1
    S = tips.shape[1]
    C = len(rates)

    def pmat(t):
        out = np.zeros((C, 4, 4))
        for c, r in enumerate(rates):
            e = np.exp(-4.0 / 3.0 * t * r)
            out[c] = 0.25 + np.where(np.eye(4, dtype=bool), 0.75 * e, -0.25 * e)
        return out

    clv = np.zeros((nn, S, C, 4))
    clv[:n] = tips[:, :, None, :]

    def post(u):
        order = []
        stack = [(u, False)]
        while stack:
            v, done = stack.pop()
            if v < n:
                continue
            if done:
                order.append(v)
            else:
                stack.append((v, True))
                stack.append((left[v], False))
                stack.append((right[v], False))
        return order

    root = nn - 1
    for u in post(root):
        res = np.ones((S, C, 4))
        for ch in (left[u], right[u]):
            P = pmat(age[u] - age[ch])
            res *= np.einsum("cab,scb->sca", P, clv[ch])
        clv[u] = res
    site = np.einsum("sa,a->s", clv[root].mean(axis=1), freqs)
    return float(np.dot(weights, np.log(site)))


def pack_gtrees(trees, T):
    L = len(trees)
    N = 2 * T - 1
    left = np.zeros((L, N), np.int32)
    right = np.zeros((L, N), np.int32)
    parent = np.full((L, N), -1, np.int32)
    age = np.full((L, N), BIG_AGE)
    age[:, :T] = 0.0
    n_seq = np.zeros(L, np.int32)
    for i, (l, r, p, a) in enumerate(trees):
        n = (len(l) + 1) // 2
        n_seq[i] = n

        def m(x):
            return x if x < n else x - n + T
        for u in range(2 * n - 1):
            age[i, m(u)] = a[u]
            parent[i, m(u)] = m(p[u]) if p[u] >= 0 else -1
            if u >= n:
                left[i, m(u)] = m(l[u])
                right[i, m(u)] = m(r[u])
    return GTrees(jnp.asarray(left), jnp.asarray(right), jnp.asarray(parent),
                  jnp.asarray(age)), jnp.asarray(n_seq)


@pytest.mark.parametrize("n_cats", [1, 4])
def test_loglik_matches_numpy(n_cats):
    rng = np.random.default_rng(42)
    L, T, S = 3, 8, 12
    tip_counts = [8, 5, 3]
    trees = []
    tipsL, wL = [], []
    for n in tip_counts:
        trees.append(random_tree(rng, n))
    gt, n_seq = pack_gtrees(trees, T)

    codes = rng.choice([1, 2, 4, 8, 15], size=(L, T, S), p=[0.24] * 4 + [0.04])
    tipp = fe.tip_partials_from_codes(jnp.asarray(codes, jnp.uint8),
                                      dtype=jnp.float64)
    weights = rng.integers(1, 5, size=(L, S)).astype(np.float64)
    for i, n in enumerate(tip_counts):
        weights[i, S - 2:] = 0.0  # exercise padding

    rates = np.asarray(discrete_gamma_rates(0.7, n_cats))
    blen = fe.branch_lengths(gt, jnp.ones(L))
    # [L, N, C] effective lengths -> jc69 pmatrix
    t_eff = blen[:, :, None] * rates[None, None, :]
    pmats = pm.pmatrix_jc69(t_eff)

    freqs = jnp.full((L, 4), 0.25)
    cw = jnp.full((n_cats,), 1.0 / n_cats)
    logl = fe.loglikelihood(gt, tipp, jnp.asarray(weights), n_seq, pmats,
                            freqs, cw)

    from bpp_tpu.io.maps import NT_PARTIALS
    for i, n in enumerate(tip_counts):
        expect = numpy_felsenstein(
            *(np.asarray(x)[i] for x in (gt.left, gt.right)),
            np.asarray(gt.age)[i],
            NT_PARTIALS[codes[i, :n]], np.full(4, 0.25), rates, weights[i],
        )
        # numpy oracle uses local node ids == packed ids only when n == T;
        # for smaller loci rebuild locally
        if n != T:
            l, r, p, a = trees[i]
            expect = numpy_felsenstein(
                l, r, a, NT_PARTIALS[codes[i, :n]], np.full(4, 0.25), rates,
                weights[i])
        assert np.isclose(float(logl[i]), expect, rtol=1e-10), (i, logl[i], expect)


def test_pmatrix_rows_sum_to_one():
    t = jnp.asarray([0.0, 0.01, 0.3, 2.0])
    for P in (pm.pmatrix_jc69(t),
              pm.pmatrix_hky(t, jnp.asarray([[0.3, 0.2, 0.1, 0.4]] * 4), 2.5),
              pm.pmatrix_k80(t, 3.0)):
        assert np.allclose(np.asarray(P).sum(-1), 1.0, atol=1e-12)
        assert (np.asarray(P) >= -1e-15).all()


def test_pmatrix_vs_expm():
    # TN93 closed form vs matrix exponential of the normalized Q
    freqs = np.array([0.35, 0.15, 0.2, 0.3])
    k1, k2 = 3.0, 1.5
    # build Q
    Q = np.zeros((4, 4))
    for i in range(4):
        for j in range(4):
            if i == j:
                continue
            r = 1.0
            if (i, j) in ((0, 2), (2, 0)):
                r = k1
            if (i, j) in ((1, 3), (3, 1)):
                r = k2
            Q[i, j] = r * freqs[j]
    Q -= np.diag(Q.sum(1))
    mu = -(freqs * np.diag(Q)).sum()
    Q /= mu
    from scipy.linalg import expm as scipy_expm
    for t in (0.01, 0.1, 0.7):
        P_ref = scipy_expm(Q * t)
        P = np.asarray(pm.pmatrix_tn93(jnp.asarray(t), jnp.asarray(freqs),
                                       k1, k2))
        assert np.allclose(P, P_ref, atol=1e-10), t


def test_gtr_eigen_vs_expm():
    freqs = np.array([0.35, 0.15, 0.2, 0.3])
    rates = np.array([1.2, 3.0, 0.7, 0.9, 2.2, 1.0])
    w, T, Tinv = pm.gtr_eigen(jnp.asarray(freqs), jnp.asarray(rates))
    # reconstruct Q and check against expm
    iu = np.triu_indices(4, 1)
    R = np.zeros((4, 4))
    R[iu] = rates
    R += R.T
    Q = R * freqs[None, :]
    Q -= np.diag(Q.sum(1))
    mu = -(freqs * np.diag(Q)).sum()
    Q /= mu
    from scipy.linalg import expm as scipy_expm
    for t in (0.05, 0.4):
        P = np.asarray(pm.pmatrix_eigen(jnp.asarray(t), w, T, Tinv))
        assert np.allclose(P, scipy_expm(Q * t), atol=1e-10)
        assert np.allclose(P.sum(-1), 1.0, atol=1e-10)


def test_discrete_gamma():
    for alpha in (0.2, 0.7, 1.0, 5.0, 50.0):
        for k in (2, 4, 8):
            r = np.asarray(discrete_gamma_rates(alpha, k))
            assert r.shape == (k,)
            assert np.all(np.diff(r) > 0)
            assert np.isclose(r.mean(), 1.0, atol=1e-6), (alpha, k, r.mean())
    assert np.asarray(discrete_gamma_rates(0.5, 1)) == np.ones(1)
