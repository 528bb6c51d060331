"""theta-integrated-out ("e" flag) path tests.

Oracle 1: the integrated density formula against brute-force numerical
integration of the per-population MSC density over InvGamma(a, b).
Oracle 2: marginal equivalence — integrating theta out analytically
must leave the tau marginals identical to the theta-estimated sampler
(both simulate p(tau, G | prior) with theta marginalized).
(reference: gtree.c:3780 update_logpg_contrib, method.c:5490 serial
gene-tree moves under !opt_est_theta)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.io.ctl import parse_ctl_lines
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.trees import coalescent as coalmod

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
thetaprior = invgamma 3 0.002 int
tauprior = invgamma 3 0.004
finetune = 1
burnin = 400
sampfreq = 2
nsample = 2000
"""


def test_integrated_density_vs_quadrature():
    from scipy.integrate import quad
    from scipy.stats import invgamma

    rng = np.random.default_rng(2)
    L, H = 3, 5
    a, b = 3.0, 0.004
    coal = rng.integers(0, 4, (L, H))
    t2h = rng.uniform(0.0, 0.01, (L, H))
    hered = rng.uniform(0.8, 1.2, L)
    mask = np.ones(L, bool)

    got = float(coalmod.msc_logprob_integrated(
        jnp.asarray(coal), jnp.asarray(t2h), jnp.asarray(hered),
        a, b, jnp.asarray(mask)))

    want = 0.0
    for h in range(H):
        def f(th):
            dens = 1.0
            for l in range(L):
                hth = hered[l] * th
                dens *= (2.0 / hth) ** coal[l, h] * np.exp(-t2h[l, h] / hth)
            return dens * invgamma.pdf(th, a, scale=b)
        val, _ = quad(f, 1e-8, 1.0, limit=200)
        want += np.log(val)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.fixture(scope="module")
def notheta_run():
    cfg = parse_ctl_lines(CTL.strip().splitlines())
    eng = Engine(load_run(cfg), seed=13)
    state = eng.init_state()
    key = jax.random.PRNGKey(13)
    taus = []
    state, _ = eng.chunk_step(state, key, 400)
    for i in range(120):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 100)
        taus.append(np.asarray(state.sp.tau))
    return np.stack(taus), state, eng


@pytest.mark.slow
def test_prior_tau_recovery(notheta_run):
    """usedata=0: tau_root ~ InvGamma(3, 0.004), E = 0.002."""
    taus, state, eng = notheta_run
    root = int(state.sp.root)
    m = taus[:, root].mean()
    assert abs(m - 0.002) < 0.0005, m


@pytest.mark.slow
def test_cache_honesty_with_data(notheta_run):
    """coal/t2h caches must equal a fresh recompute after many moves."""
    _, state, eng = notheta_run
    _, c, t2 = eng._logpr_fn(state.gt, state.sp, state.subst.heredity)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(state.coal))
    np.testing.assert_allclose(np.asarray(t2), np.asarray(state.t2h),
                               rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_tau_posterior_vs_reference_oracle():
    """Integrated-path tau posterior means vs the reference binary.

    Frozen oracle: /tmp/bppbuild/src/bpp with this exact ctl
    (thetaprior invgamma 3 0.002 int, 20k samples):
      tau:5 (root) 0.001362   tau:6 0.001029   tau:7 0.000851
    Posterior SDs ~ (4.8e-4, 2.7e-4, 3.7e-4); tolerance covers both
    chains' Monte-Carlo error at the test's moderate length.
    """
    from bpp_tpu.output import bpp_inner_order

    base = CTL.replace("usedata = 0", "usedata = 1") \
              .replace("nsample = 2000", "nsample = 600") \
              .replace("burnin = 400", "burnin = 800")
    cfg = parse_ctl_lines(base.strip().splitlines())
    run = load_run(cfg)
    eng = Engine(run, seed=17)
    state = eng.init_state()
    assert state.coal is not None
    key = jax.random.PRNGKey(17)
    state, _ = eng.chunk_step(state, key, cfg.burnin)
    ts = []
    for i in range(40):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 75)
        ts.append(np.asarray(state.sp.tau))
    taus = np.stack(ts)
    order = bpp_inner_order(run.stree)     # [tau:5(root), tau:6, tau:7]
    got = taus[:, order].mean(0)
    want = np.array([0.001362, 0.001029, 0.000851])
    np.testing.assert_allclose(got, want, atol=3.0e-4)


def test_mcmc_txt_has_no_theta_columns(tmp_path):
    from bpp_tpu.output import McmcWriter

    cfg = parse_ctl_lines(CTL.strip().splitlines())
    run = load_run(cfg)
    w = McmcWriter(str(tmp_path / "x.mcmc.txt"), cfg, run.stree)
    assert not any(c.startswith("theta") for c in w.columns)
    assert any(c.startswith("tau") for c in w.columns)
    w.close()


# ---------------------------------------------------------------------------
# MSC-I networks with thetas integrated out (gtree.c:3386-3419 phi terms,
# update_logpg_contrib gtree.c:3780) — the anopheles flagship mode
# ---------------------------------------------------------------------------

MSCI_CTL_INT = """
seed = 3
seqfile = tests/fixtures/msci/d.txt
Imapfile = tests/fixtures/msci/d.imap
jobname = out
species&tree = 3 A B C
               2 2 2
               ((A,(B)H[&phi=0.4,&tau-parent=yes]),(H[&tau-parent=yes],C))R;
usedata = 0
nloci = 1
thetaprior = invgamma 3 0.002 int
tauprior = gamma 2 100
phiprior = 1 1
finetune = 1
burnin = 3000
sampfreq = 2
nsample = 6000
"""


@pytest.mark.slow
def test_msci_integrated_prior_marginals():
    """usedata=0 on the 1-hybridization network with thetas integrated
    out: the tau/phi prior marginals must match the theta-estimated
    sampler's (theta is marginalized either way).  Targets from
    tests/test_msci.py::test_prior_marginals (exact rejection sampling:
    tau_R 0.0200, tau_H 0.0050, phi 0.50)."""
    cfg = parse_ctl_lines(MSCI_CTL_INT.strip().splitlines())
    assert cfg.theta_integrated
    eng = Engine(load_run(cfg), seed=11)
    log = eng.run_mcmc(progress_every=0)
    taus = np.stack(log.tau)
    phis = np.stack(log.phi)
    sp = eng.init_state().sp
    root = sp.root
    m = taus[:, root].mean()
    assert 0.010 < m < 0.030, f"tau_R mean {m}"
    hin = int(sp.hslot[0])
    mh = taus[:, hin].mean()
    assert 0.0025 < mh < 0.0085, f"tau_H mean {mh}"  # exact 0.0050
    mp = phis[:, hin].mean()
    assert 0.38 < mp < 0.62, f"phi mean {mp}"        # Beta(1,1) -> 0.5
    assert phis[:, hin].std() > 0.15


@pytest.mark.slow
def test_msci_integrated_data_mode_caches():
    """usedata=1 smoke: finite state, coal/t2h and phi-part logpr caches
    honest after many steps (every integ+network move path exercised)."""
    cfg = parse_ctl_lines(MSCI_CTL_INT.strip().splitlines())
    cfg = cfg.replace(usedata=True, burnin=0, nsample=1, sampfreq=1)
    eng = Engine(load_run(cfg), seed=7)
    state = eng.init_state()
    assert state.coal is not None
    key = jax.random.PRNGKey(0)
    state, _ = eng.chunk_step(state, key, 30)
    assert np.isfinite(float(np.asarray(state.logl).sum()))
    lp, c, t2 = eng._logpr_fn(state.gt, state.sp, state.subst.heredity)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(state.logpr),
                               atol=1e-8)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(state.coal))
    np.testing.assert_allclose(np.asarray(t2), np.asarray(state.t2h),
                               rtol=1e-4, atol=1e-9)
