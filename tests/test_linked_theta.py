"""Linked-theta models (thetamodel = linked-all / linked-inner /
linked-msci; init_theta_linkage stree.c:2427)."""

import numpy as np
import pytest

from bpp_tpu.io.ctl import parse_ctl_lines
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.trees.stree import SpeciesTree, theta_link_map

CTL = """
seed = 7
seqfile = /root/reference/examples/frogs/frogs.txt
Imapfile = /root/reference/examples/frogs/frogs.Imap.txt
jobname = out
species&tree = 4 K C L H
                9 7 14 2
               (((K, C), L), H);
usedata = {usedata}
nloci = 2
cleandata = 0
thetaprior = gamma 2 200
tauprior = gamma 4 100
thetamodel = {model}
finetune = 1
burnin = 200
sampfreq = 2
nsample = 600
"""


def test_link_maps():
    st = SpeciesTree.from_newick("(((K,C),L),H);", ["K", "C", "L", "H"])
    assert theta_link_map(st, 0) is None
    m1 = theta_link_map(st, 1)
    assert (m1 == st.root).all()
    m2 = theta_link_map(st, 2)
    assert (m2[: st.n_tips] == np.arange(st.n_tips)).all()
    assert (m2[st.n_tips:] == st.root).all()
    # msci: hybrid linked to child (model A htau=yes,yes links nothing)
    stn = SpeciesTree.from_newick(
        "((A,(B)h[&phi=0.3,&tau-parent=yes])s,"
        "(h[&tau-parent=no],C)t)r;", ["A", "B", "C"])
    mm = theta_link_map(stn, 3)
    h = stn.labels.index("h")
    b = stn.names.index("B")
    assert mm[h] == b                    # hybrid -> child
    mir = int(stn.hybrid[h])
    t = int(stn.parent[mir])             # htau=no: t linked to sibling C
    assert mm[t] == stn.names.index("C")


@pytest.mark.slow
@pytest.mark.parametrize("model", ["linked-all", "linked-inner"])
def test_linked_prior_chain(model):
    import jax
    cfg = parse_ctl_lines(
        CTL.format(usedata=0, model=model).strip().splitlines())
    assert cfg.linked_theta == {"linked-all": 1, "linked-inner": 2}[model]
    run = load_run(cfg)
    eng = Engine(run, seed=3)
    log = eng.run_mcmc(progress_every=0)
    gen, theta, tau, lnl, _ = log.arrays()
    H = run.stree.n_nodes
    root = run.stree.root
    # group equality at every sample
    if model == "linked-all":
        assert np.allclose(theta, theta[:, [root]])
    else:
        inner = list(range(run.stree.n_tips, H))
        assert np.allclose(theta[:, inner], theta[:, [root]])
        assert not np.allclose(theta[:, 0], theta[:, root])
    # prior marginal: Gamma(2, 200) mean 0.01
    assert abs(theta[:, root].mean() - 0.01) < 0.003, theta[:, root].mean()
    assert theta[:, root].std() > 0.002          # it mixes


@pytest.mark.slow
def test_linked_columns(tmp_path):
    from bpp_tpu.output import McmcWriter
    cfg = parse_ctl_lines(
        CTL.format(usedata=0, model="linked-all").strip().splitlines())
    run = load_run(cfg)
    w = McmcWriter(str(tmp_path / "m.txt"), cfg, run.stree)
    th_cols = [c for c in w.columns if c.startswith("theta")]
    # only the root column; BPP numbers the root NS+1 = 5 (preorder)
    assert len(th_cols) == 1 and th_cols[0].startswith("theta:5:")
    w.close()


@pytest.mark.smoke
def test_linked_theta_a01_species_search():
    """thetamodel = linked-all under A01 species-tree search (the
    reference supports this, verified 4.8.7 round 4): the owner map is
    node-index-class based so SPR/SNL topology changes keep it valid;
    all thetas stay equal through the chain."""
    import jax

    from bpp_tpu.mcmc.driver import Engine
    from bpp_tpu.testing import synthetic_run

    run = synthetic_run(n_loci=4, n_seq=5, n_species=4, seed=2,
                        est_stree=True, linked_theta=1)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=5)
    state = eng.init_state()
    state, stats = eng.chunk_step(state, jax.random.PRNGKey(1), 120)
    th = np.asarray(state.sp.theta)
    assert np.allclose(th, th[0]), th         # one linked parameter
    from bpp_tpu.mcmc.state import MV_SSPR, MV_THETA
    assert np.asarray(stats)[MV_THETA][1] > 0
    assert eng.validate_state(state)


@pytest.mark.slow
def test_linked_theta_a10_delimitation_prior():
    """thetamodel = linked-all under A10 rjMCMC (reference supports it,
    verified 4.8.7 round 4; prop_rj.c:606 master indirection).  Theta
    linkage must not change the DELIMITATION prior: with usedata = 0
    the P(#species) marginals must match the unlinked run, and all
    thetas stay equal through split/join dimension changes."""
    import jax

    from bpp_tpu.mcmc.driver import Engine
    from bpp_tpu.testing import synthetic_run

    # the prior-chain rj occupancy mixes slowly (seed-to-seed spread
    # ~0.1 at 12000 samples); pool 2 seeds per mode — pooled linked vs
    # plain agreed to 0.017 when calibrated (2026-08-21)
    occ = {}
    for name, lk in (("linked", 1), ("plain", 0)):
        pooled = []
        for seed in (17, 99):
            run = synthetic_run(n_loci=3, n_seq=5, n_species=4, seed=4,
                                est_delimit=True, linked_theta=lk,
                                usedata=False)
            run.cfg = run.cfg.replace(dtype="float64", burnin=1000,
                                      nsample=12000, sampfreq=1)
            eng = Engine(run, seed=seed)
            log = eng.run_mcmc(progress_every=0)
            tau = np.stack(log.tau)
            NS = eng.run.stree.n_tips
            pooled.append(1 + (tau[:, NS:] > 0).sum(1))
            if lk:
                # every sampled state keeps one shared theta
                th = np.stack(log.theta)
                assert np.allclose(th, th[:, :1]), th[:5]
        nsp = np.concatenate(pooled)
        occ[name] = np.array([(nsp == k).mean() for k in range(1, NS + 1)])
    assert np.abs(occ["linked"] - occ["plain"]).max() < 0.10, occ
