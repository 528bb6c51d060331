"""Bidirectional introgression (BDI; resolve_bd_introgression
treeparse.c:1232, lswitch.c label-switching correction).

Fixtures in fixtures/bdi/ were simulated by the reference binary under
the model (((A,Y[&phi=0.3])X,(B,X[&phi=0.2])Y)S,C)R with
tau_X=tau_Y=0.02, tau_S=0.03, tau_R=0.06 (node ages given as the
":age" annotations), all theta=0.002 (JC69, 30 loci x 300bp, 4+4+2
sequences).  A head-to-head reference A00 run
(seed 7, gamma 2 1000 / gamma 4 100 / Beta(1,1) priors, 2000 samples)
gave posterior means used as oracle targets below:

    tau_R 0.05821(19)  tau_S 0.02788(238)  tau_X 0.02325(205)
    lnL  -19139.1(72)
"""

import os

import jax
import numpy as np
import pytest

from bpp_tpu.io.ctl import parse_ctl_lines
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.trees.stree import SpeciesTree

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "bdi")
NWK = "(((A,Y[&phi=0.300000])X,(B,X[&phi=0.200000])Y)S, C)R;"

CTL = """
seed = 7
seqfile = {fix}/bdi_seqs.txt
Imapfile = {fix}/bdi_imap.txt
jobname = out
species&tree = 3 A B C
               4 4 2
               {nwk}
usedata = {usedata}
nloci = {nloci}
cleandata = 0
model = JC69
thetaprior = gamma 2 1000
tauprior = gamma 4 100
phiprior = 1 1
finetune = 1
burnin = {burnin}
sampfreq = 2
nsample = {nsample}
"""


def _cfg(**kw):
    kw.setdefault("fix", FIX)
    kw.setdefault("nwk", NWK)
    return parse_ctl_lines(CTL.format(**kw).strip().splitlines())


def test_bdi_parse_both_diagrams():
    d2 = SpeciesTree.from_newick(NWK, ["A", "B", "C"])
    d1 = SpeciesTree.from_newick(
        "(((A,(B)Y[&phi=0.300000])X,(X[&phi=0.200000])Y)S,C)R;",
        ["A", "B", "C"])
    for st in (d2, d1):
        assert st.n_nodes == 9 and st.n_hybrids == 2 and st.n_tips == 3
        x = st.labels.index("X")
        y = st.labels.index("Y")
        assert st.bdi[x] == y and st.bdi[y] == x
        # X.right = mirror_Y, mirror_X.parent = Y (reference structure)
        mir_x, mir_y = st.hybrid[x], st.hybrid[y]
        assert st.right[x] == mir_y and st.right[y] == mir_x
        assert st.parent[mir_x] == y and st.parent[mir_y] == x
        # phi: marker annotations belong to the mirrors
        assert abs(st.phi[mir_x] - 0.2) < 1e-9
        assert abs(st.phi[mir_y] - 0.3) < 1e-9
        assert abs(st.phi[x] - 0.8) < 1e-9
    np.testing.assert_array_equal(d1.left, d2.left)
    np.testing.assert_array_equal(d1.parent, d2.parent)


@pytest.mark.slow
def test_bdi_prior_sampling():
    """usedata=0: priors must be reproduced; taus of the quad stay tied."""
    cfg = _cfg(usedata=0, nloci=3, burnin=400, nsample=1500)
    eng = Engine(load_run(cfg), seed=3)
    log = eng.run_mcmc(progress_every=0)
    gen, theta, tau, lnl, _ = log.arrays()
    x = 3
    assert np.allclose(tau[:, 3], tau[:, 4])
    assert np.allclose(tau[:, 3], tau[:, 7])
    # tau_root ~ Gamma(4, 100): mean 0.04
    assert abs(tau[:, 6].mean() - 0.04) < 0.008, tau[:, 6].mean()
    phis = np.stack(log.phi)
    # phi ~ Beta(1,1): mean 0.5, sd 0.289
    for m in (7, 8):
        assert abs(phis[:, m].mean() - 0.5) < 0.12, phis[:, m].mean()
        assert abs(phis[:, m].std() - 0.289) < 0.06, phis[:, m].std()
    assert abs(theta[:, :7].mean() - 0.002) < 0.0005


@pytest.mark.slow
def test_bdi_posterior_vs_reference_oracle():
    """Same data/priors as the recorded reference run: tau and lnL
    posterior means must agree within MC error (docstring oracle)."""
    cfg = _cfg(usedata=1, nloci=30, burnin=1500, nsample=1500)
    eng = Engine(load_run(cfg), seed=5)
    log = eng.run_mcmc(progress_every=0)
    gen, theta, tau, lnl, _ = log.arrays()
    assert abs(tau[:, 6].mean() - 0.05821) < 0.003, tau[:, 6].mean()
    assert abs(tau[:, 5].mean() - 0.02788) < 0.006, tau[:, 5].mean()
    assert abs(tau[:, 3].mean() - 0.02325) < 0.005, tau[:, 3].mean()
    assert abs(lnl.mean() - (-19139.1)) < 15.0, lnl.mean()


def test_lswitch():
    """The BG relabeler must undo an artificial tower flip."""
    from bpp_tpu.summary.lswitch import lswitch_bdi
    rng = np.random.default_rng(0)
    n = 800
    # well-separated towers: phi_x ~ Beta(20, 60) (mean .25),
    # phi_y ~ Beta(10, 40), theta_x ~ Gamma(40, 10000), theta_y bigger
    phi_x = rng.beta(20, 60, n)
    phi_y = rng.beta(10, 40, n)
    th_x = rng.gamma(40.0, 1 / 10000.0, n)
    th_y = rng.gamma(80.0, 1 / 10000.0, n)
    flip = rng.random(n) < 0.4
    px = np.where(flip, 1 - phi_x, phi_x)
    py = np.where(flip, 1 - phi_y, phi_y)
    tx = np.where(flip, th_y, th_x)
    ty = np.where(flip, th_x, th_y)
    tower, qx, qy, sx, sy = lswitch_bdi(px, py, tx, ty)
    # all samples restored to one mode
    assert (qx < 0.5).mean() > 0.97, (qx < 0.5).mean()
    assert abs(sx.mean() - th_x.mean()) < 5e-4
    assert abs(sy.mean() - th_y.mean()) < 5e-4


@pytest.mark.slow
def test_bdi_relaxed_clock_partner_rate_tie():
    """BDI x clock=2 (reference-supported: mirrors are skipped in rate
    init and proposals, method.c:4235 / stree.c:10298).  The mirror
    segment must read its hinner partner's rate - so a garbage mirror
    rate must not change the likelihood, while the partner's rate must.
    """
    from bpp_tpu.config import Clock
    cfg = _cfg(usedata=1, nloci=5, burnin=4, nsample=3)
    cfg = cfg.replace(clock=Clock.IID, clock_vbar_a=10.0,
                      clock_vbar_b=100.0, clock_vi_alpha=5.0,
                      clock_rate_prior=1, check_every=5)
    eng = Engine(load_run(cfg), seed=3)
    state = eng.init_state()
    st = eng.run.stree
    x = st.labels.index("X")
    mir_x = int(st.hybrid[x])
    assert not bool(np.asarray(state.sp.rate_nodes)[mir_x])
    assert int(np.asarray(state.sp.rate_owner)[mir_x]) == x

    ll0 = eng._logl_fn(state.gt, state.subst, state.sp, state.clock)
    garbage = state.clock._replace(
        brate=state.clock.brate.at[:, mir_x].set(777.0))
    ll_g = eng._logl_fn(state.gt, state.subst, state.sp, garbage)
    np.testing.assert_array_equal(np.asarray(ll0), np.asarray(ll_g))
    bumped = state.clock._replace(
        brate=state.clock.brate.at[:, x].multiply(3.0))
    ll_b = eng._logl_fn(state.gt, state.subst, state.sp, bumped)
    assert np.abs(np.asarray(ll_b) - np.asarray(ll0)).max() > 1e-3

    # short chain with the runtime invariant check enabled
    log = eng.run_mcmc(progress_every=0)
    assert len(log.gen) == 3
    assert np.isfinite(log.lnL).all()
