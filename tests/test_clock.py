"""Relaxed-clock (clock=2) and hierarchical locus-rate tests.

Prior-only sampling must reproduce the hierarchy exactly:
  mubar ~ Gamma(a_mubar, b_mubar)        mean a/b
  mu_i | mubar ~ Gamma(a_mui, a_mui/mubar)   mean mubar
  nubar ~ Gamma(a_vbar, b_vbar)
  nu_i | nubar ~ Gamma(a_vi, a_vi/nubar)
  brate | mu_i, nu_i ~ Gamma(mu^2/nu, mu/nu) (or LogNormal)  mean mu_i
(reference: lnprior_rates stree.c:8880, prop_locusrate_* stree.c:9052-9868)
"""

import jax
import numpy as np
import pytest

from bpp_tpu.config import Clock
from bpp_tpu.io.ctl import parse_ctl_lines
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine

CTL = """
seed = 7
seqfile = /root/reference/examples/frogs/frogs.txt
Imapfile = /root/reference/examples/frogs/frogs.Imap.txt
jobname = out
species&tree = 4 K C L H
                9 7 14 2
               (((K, C), L), H);
usedata = 0
nloci = 4
thetaprior = gamma 2 200
tauprior = gamma 2 100
locusrate = 1 4 2 10 iid
clock = 2 10 50 10 iid G
finetune = 1
burnin = 500
sampfreq = 2
nsample = 4000
"""


@pytest.fixture(scope="module")
def clock_run():
    cfg = parse_ctl_lines(CTL.strip().splitlines())
    eng = Engine(load_run(cfg), seed=3)
    state = eng.init_state()
    key = jax.random.PRNGKey(3)
    mus, nus, mubars, nubars, brates = [], [], [], [], []
    # burn-in
    state, _ = eng.chunk_step(state, key, 500)
    for i in range(40):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 100)
        mus.append(np.asarray(state.subst.mu))
        nus.append(np.asarray(state.clock.nu))
        mubars.append(float(state.clock.mubar))
        nubars.append(float(state.clock.nubar))
        brates.append(np.asarray(state.clock.brate))
    return (np.stack(mus), np.stack(nus), np.asarray(mubars),
            np.asarray(nubars), np.stack(brates), state, eng)


@pytest.mark.slow
def test_prior_means(clock_run):
    mus, nus, mubars, nubars, brates, _, _ = clock_run
    # E[mubar] = 4/2 = 2.0; E[mu_i] = E[mubar]
    assert abs(mubars.mean() - 2.0) < 0.5, mubars.mean()
    assert abs(mus.mean() - 2.0) < 0.5, mus.mean()
    # E[nubar] = 10/50 = 0.2; E[nu_i] = E[nubar]
    assert abs(nubars.mean() - 0.2) < 0.05, nubars.mean()
    assert abs(nus.mean() - 0.2) < 0.05, nus.mean()
    # E[brate] = E[mu_i]
    assert abs(brates.mean() - 2.0) < 0.5, brates.mean()
    # conditional sd check: Var[mu_i | mubar] = mubar^2 / a_mui, so the
    # within-sample spread of mu_i around mubar has CV ~ 1/sqrt(10)
    cv = (mus / mubars[:, None]).std()
    assert 0.15 < cv < 0.65, cv


@pytest.mark.slow
def test_likelihood_zero_and_caches(clock_run):
    *_, state, eng = clock_run
    assert float(np.abs(np.asarray(state.logl)).sum()) == 0.0
    from bpp_tpu.mcmc.clock_moves import lnprior_rates
    lnr = lnprior_rates(eng.cfg, state.sp, state.subst.mu, state.clock)
    np.testing.assert_allclose(np.asarray(lnr),
                               np.asarray(state.clock.lnrates), atol=1e-3)


def test_lnprior_rates_formula():
    """IID-gamma prior density against a scipy cross-check."""
    from scipy.stats import gamma as sgamma

    from bpp_tpu.config import BppConfig
    from bpp_tpu.mcmc.clock_moves import lnprior_rates
    from bpp_tpu.mcmc.state import ClockState
    import jax.numpy as jnp

    cfg = parse_ctl_lines(CTL.strip().splitlines())
    rng = np.random.default_rng(0)
    H = 7
    L = 3
    mu = rng.uniform(0.5, 2.0, L)
    nu = rng.uniform(0.05, 0.3, L)
    brate = rng.uniform(0.3, 3.0, (L, H))

    class SpStub:
        n_nodes = H
        n_tips = 4
        rate_nodes = None

    clock = ClockState(brate=jnp.asarray(brate), nu=jnp.asarray(nu),
                       mubar=jnp.asarray(1.0), nubar=jnp.asarray(0.2),
                       lnrates=jnp.zeros(L))
    got = np.asarray(lnprior_rates(cfg, SpStub(), jnp.asarray(mu), clock))
    for l in range(L):
        a = mu[l] ** 2 / nu[l]
        b = mu[l] / nu[l]
        want = sgamma.logpdf(brate[l], a, scale=1.0 / b).sum()
        np.testing.assert_allclose(got[l], want, rtol=1e-6)


@pytest.mark.parametrize("extra,tag", [
    ("locusrate = 1 2 10 5 iid\nclock = 3 10 100 5 iid G", "corr_gamma"),
    ("locusrate = 1 2 10 5 iid\nclock = 3 10 100 5 iid LN", "corr_ln"),
    ("locusrate = 1 2 10 5 iid\nclock = 2 10 100 5 iid LN", "iid_ln"),
    ("clock = 4 2.0", "simple"),
])
@pytest.mark.slow
def test_clock_variants_cache_honesty(extra, tag):
    """Every clock variant keeps logl and lnprior_rates caches honest
    across steps with data (catches missing tau->rate-prior coupling,
    e.g. the CORR-LN dependence on branch midpoints)."""
    base = CTL.replace("usedata = 0", "usedata = 1").split("locusrate")[0]
    cfg = parse_ctl_lines((base + extra).strip().splitlines())
    cfg = cfg.replace(burnin=0, nsample=1)
    eng = Engine(load_run(cfg), seed=5)
    state = eng.init_state()
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, sub = jax.random.split(key)
        state, _ = eng.step(state, sub)
    ll = eng._logl_fn(state.gt, state.subst, state.sp, state.clock)
    # rtol: the cached value comes from inside the step graph, the
    # recompute from a standalone trace — XLA fuses them differently,
    # so f32 values ~1e3 legitimately differ by a few ulps (observed
    # 2.4e-7 relative; f32 eps is 1.2e-7)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(state.logl),
                               rtol=2e-6, atol=1e-4)
    from bpp_tpu.mcmc.clock_moves import lnprior_rates
    lnr = lnprior_rates(cfg, state.sp, state.subst.mu, state.clock)
    np.testing.assert_allclose(np.asarray(lnr),
                               np.asarray(state.clock.lnrates), atol=1e-3)
    if cfg.clock == Clock.CORRELATED:
        np.testing.assert_allclose(
            np.asarray(state.clock.brate[:, state.sp.root]),
            np.asarray(state.subst.mu))


def test_relaxed_lengths_match_pointer_walk():
    """relaxed_branch_lengths against a reference-style per-edge walk
    (locus.c:1151 update_branchlength_relaxed_clock)."""
    cfg = parse_ctl_lines(CTL.strip().splitlines())
    eng = Engine(load_run(cfg), seed=11)
    state = eng.init_state()
    from bpp_tpu.core.felsenstein import relaxed_branch_lengths
    from bpp_tpu.trees.gtree import assign_populations

    gt, sp = state.gt, state.sp
    pops = np.asarray(assign_populations(gt, sp, eng.ctx.tip_pop))
    got = np.asarray(relaxed_branch_lengths(gt, sp, pops,
                                            state.clock.brate))
    age = np.asarray(gt.age)
    parent = np.asarray(gt.parent)
    tau = np.asarray(sp.tau)
    spar = np.asarray(sp.parent)
    brate = np.asarray(state.clock.brate)
    n_seq = np.asarray(eng.ctx.n_seq)
    T = gt.n_tips
    for li in range(gt.n_loci):
        for u in range(gt.n_nodes):
            if parent[li, u] < 0:
                continue
            is_tip = u < n_seq[li]
            is_inner = T <= u < T + n_seq[li] - 1
            if not (is_tip or is_inner):
                continue
            t = age[li, u]
            t1 = age[li, parent[li, u]]
            p = pops[li, u]
            want = 0.0
            while spar[p] >= 0 and tau[spar[p]] < t1:
                want += (tau[spar[p]] - t) * brate[li, p]
                t = tau[spar[p]]
                p = spar[p]
            want += (t1 - t) * brate[li, p]
            np.testing.assert_allclose(got[li, u], want, rtol=2e-5,
                                       atol=1e-8)


@pytest.mark.parametrize("extra,tag", [
    ("locusrate = 1 2 10 5 iid\nclock = 3 10 100 5 iid LN", "a01_corr_ln"),
    ("locusrate = 1 2 10 5 iid\nclock = 3 10 100 5 iid G", "a01_corr_g"),
    ("locusrate = 1 2 10 5 iid\nclock = 2 10 100 5 iid LN", "a01_iid_ln"),
])
@pytest.mark.slow
def test_a01_relaxed_clock_cache_honesty(extra, tag):
    """A01 (species-tree SPR/SNL) under relaxed clocks: the correlated
    rate prior depends on the species topology + taus (stree.c:8839,
    11314), so accepted SPR/SNL moves must refresh clock.lnrates and
    logl stays honest under the new topology."""
    base = CTL.replace("usedata = 0", "usedata = 1").split("locusrate")[0]
    base += "speciestree = 1\n"
    cfg = parse_ctl_lines((base + extra).strip().splitlines())
    cfg = cfg.replace(burnin=0, nsample=1)
    eng = Engine(load_run(cfg), seed=11)
    state = eng.init_state()
    key = jax.random.PRNGKey(11)
    topo0 = (np.asarray(state.sp.left).tolist(),
             np.asarray(state.sp.right).tolist())
    changed = False
    for i in range(40):
        key, sub = jax.random.split(key)
        state, _ = eng.step(state, sub)
        if (np.asarray(state.sp.left).tolist(),
                np.asarray(state.sp.right).tolist()) != topo0:
            changed = True
        if changed and i >= 12:
            break
    ll = eng._logl_fn(state.gt, state.subst, state.sp, state.clock)
    # rtol: the cached value comes from inside the step graph, the
    # recompute from a standalone trace — XLA fuses them differently,
    # so f32 values ~1e3 legitimately differ by a few ulps (observed
    # 2.4e-7 relative; f32 eps is 1.2e-7)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(state.logl),
                               rtol=2e-6, atol=1e-4)
    from bpp_tpu.mcmc.clock_moves import lnprior_rates
    lnr = lnprior_rates(cfg, state.sp, state.subst.mu, state.clock)
    np.testing.assert_allclose(np.asarray(lnr),
                               np.asarray(state.clock.lnrates), atol=1e-3)


# ---------------------------------------------------------------------------
# relaxed clocks on MSC-I networks (IID; the reference fatals only on
# CORR x MSC-I, method.c:3291; rate-node skips stree.c:10293-10298)
# ---------------------------------------------------------------------------

MSCI_CLOCK_CTL = """
seed = 5
seqfile = tests/fixtures/msci/d.txt
Imapfile = tests/fixtures/msci/d.imap
jobname = out
species&tree = 3 A B C
               2 2 2
               ((A,(B)H[&phi=0.4,&tau-parent=yes]),(H[&tau-parent=yes],C))R;
usedata = 1
nloci = 1
model = 0
thetaprior = gamma 2 200
tauprior = gamma 2 100
phiprior = 1 1
clock = 2 10.0 100.0 5.0 iid G
locusrate = 1 0 0 5.0 iid
finetune = 1
burnin = 0
sampfreq = 2
nsample = 10
"""


@pytest.mark.smoke
def test_msci_iid_clock_smoke():
    """IID relaxed clock on a 1-hybridization network: finite chain,
    honest caches after steps through every move (incl. the repath
    move's relaxed-clock likelihood delta)."""
    import numpy as np

    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine

    cfg = parse_ctl_lines(MSCI_CLOCK_CTL.strip().splitlines())
    eng = Engine(load_run(cfg), seed=5)
    state = eng.init_state()
    assert state.clock is not None
    # zero-length segments carry no rate under tau-parent=yes (all
    # segments real here) -> every node is a rate node
    assert state.sp.rate_nodes is None or bool(
        np.asarray(state.sp.rate_nodes).all())
    key = jax.random.PRNGKey(5)
    state, _ = eng.chunk_step(state, key, 25)
    assert np.isfinite(float(np.asarray(state.logl).sum()))
    ll = eng._logl_fn(state.gt, state.subst, state.sp, state.clock)
    # a few f32 ulps between in-graph cache and standalone recompute
    np.testing.assert_allclose(np.asarray(ll), np.asarray(state.logl),
                               rtol=2e-6)
    lp, _, _ = eng._logpr_fn(state.gt, state.sp, state.subst.heredity)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(state.logpr),
                               rtol=1e-8)


@pytest.mark.smoke
def test_msci_htau0_segment_carries_no_rate():
    """tau-parent=no hybridization: the zero-length segment is excluded
    from the rate prior and the brate sweep (stree.c:10296)."""
    import numpy as np

    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine

    ctl = MSCI_CLOCK_CTL.replace(
        "((A,(B)H[&phi=0.4,&tau-parent=yes]),(H[&tau-parent=yes],C))R;",
        "((A,(B)H[&phi=0.4,&tau-parent=no]),(H[&tau-parent=yes],C))R;")
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=5)
    state = eng.init_state()
    rn = np.asarray(state.sp.rate_nodes)
    hin = int(state.sp.hslot[0])
    assert not rn[hin]              # zero-length segment: no rate
    assert rn.sum() == rn.size - 1
    key = jax.random.PRNGKey(6)
    state, _ = eng.chunk_step(state, key, 15)
    assert np.isfinite(float(np.asarray(state.logl).sum()))


def test_msci_corr_clock_blocked():
    import pytest

    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine

    ctl = MSCI_CLOCK_CTL.replace("clock = 2", "clock = 3")
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    with pytest.raises(NotImplementedError, match="auto-correlated"):
        Engine(load_run(cfg), seed=5)
