"""A10 rjMCMC species delimitation.

1. Prior sampling (usedata=0, speciesmodelprior=1): the three up-closed
   delimitations of a 3-species guide tree must be ~equally probable.
2. Signal: clearly diverged simulated data -> high P(3 species);
   panmictic data (one population relabeled into 3) -> collapsed models
   dominate.
3. Consistency under split/join: cached logl/logpr never drift.
"""

import textwrap

import jax
import pytest
import numpy as np

from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.mcmc.state import make_logl_fn, make_logpr_fn
from bpp_tpu.summary.delimit_summary import n_species, summarize_delimitations


def _write_ctl(tmp_path, seqfile, imap, usedata, nloci, burnin, nsample,
               seed, guide="((A,B),C)"):
    ctl = tmp_path / "a10.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = {seed}
        seqfile = {seqfile}
        Imapfile = {imap}
        jobname = out
        speciesdelimitation = 1 0 2
        species&tree = 3 A B C
                       4 4 4
                       {guide};
        usedata = {1 if usedata else 0}
        nloci = {nloci}
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        finetune = 1
        burnin = {burnin}
        sampfreq = 2
        nsample = {nsample}
    """))
    return str(ctl)


def _run(tmp_path, ctl, seed):
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    cfg = parse_ctl(ctl)
    run = load_run(cfg)
    eng = Engine(run, seed=seed)
    log = eng.run_mcmc(progress_every=0)
    return eng, log, run


def _sim(tmp_path, tau_ab, tau_root, n_loci=8, length=300, seed=5):
    ctl = tmp_path / "sim.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = {seed}
        seqfile = sim.txt
        Imapfile = sim.imap
        species&tree = 3 A B C
                        4 4 4
                        ((A #0.002, B #0.002) :{tau_ab} #0.002,
                          C #0.002) :{tau_root} #0.002;
        loci&length = {n_loci} {length}
        model = 0
    """))
    import os

    from bpp_tpu.sim.simulate import run_simulation
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_simulation(str(ctl))
    finally:
        os.chdir(cwd)
    return "sim.txt", "sim.imap"


@pytest.mark.slow
def test_a10_prior_rj_flow_balance(tmp_path):
    """Detailed-balance flow test for the rjMCMC kernel under the prior.

    Occupancy over unit-test-scale chains is useless here: 1sp<->2sp
    transitions happen ~1 per 900 iterations (the reference binary needs
    ~800k prior iterations to show the uniform 1/3 1/3 1/3; at 40k its
    own occupancy is 0.23/0.37/0.40).  Instead measure the DIRECTED
    PROBABILITY FLOWS with probe proposals from within-state stationary
    ensembles: for the uniform-prior target, flow(2sp->1sp) must equal
    flow(1sp->2sp) and flow(2sp->3sp) must equal flow(3sp->2sp), which
    the per-proposal acceptance averages estimate ~30x more efficiently
    than waiting for realized jumps."""
    import jax.numpy as jnp

    from bpp_tpu.mcmc import rj_moves
    from bpp_tpu.mcmc.state import make_logpr_fn

    (tmp_path / "d.txt").write_text(
        "\n".join(["12 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                               for s in "ABC" for i in range(4)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC" for i in range(4)))
    ctl = _write_ctl(tmp_path, "d.txt", "d.imap", usedata=False, nloci=1,
                     burnin=300, nsample=100, seed=17)
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    cfg = parse_ctl(ctl)
    run = load_run(cfg)
    eng = Engine(run, seed=17)
    rjdbg = jax.jit(lambda st, k: rj_moves.rj_move(
        eng.ctx, cfg, st, k, eng.root_age0, debug=True))
    logpr_fn = make_logpr_fn(eng.ctx)

    def flow(collapsed, seed):
        """Per-rj-call flow out of the given delimitation state, split
        into (join_flow, split_flow)."""
        st = eng.init_state()
        tau = np.array(st.sp.tau)
        tau[collapsed] = 0.0
        sp = st.sp._replace(tau=jnp.asarray(tau, eng.dtype))
        logpr, _, _ = logpr_fn(st.gt, sp, st.subst.heredity)
        st = st._replace(sp=sp, logpr=logpr)
        key = jax.random.PRNGKey(seed)
        probe = jax.random.PRNGKey(seed + 10**6)
        alpha = {True: 0.0, False: 0.0}
        n = 0
        for it in range(1200):
            key, s1 = jax.random.split(key)
            st, _ = eng.step(st, s1)  # rj inside keeps delimitation moving;
            tau_now = np.asarray(st.sp.tau)
            if it < 200 or ((tau_now[3:] > 0) != ~np.isin([3, 4], collapsed)).any():
                continue  # only probe from the target delimitation
            probe, p1 = jax.random.split(probe)
            _, _, d = rjdbg(st, p1)
            n += 1
            if not bool(d["bad"]):
                alpha[bool(d["do_split"])] += min(
                    1.0, float(np.exp(min(float(d["lnacc"]), 0.0))))
        return alpha[False] / n, alpha[True] / n, n

    j2, s2, n2 = flow([3], 41)        # 2sp: tau_AB = 0
    j1, s1, n1 = flow([3, 4], 43)     # 1sp: both collapsed
    j3, s3, n3 = flow([], 47)         # 3sp: nothing collapsed
    # uniform prior: flow(2->1) == flow(1->2), flow(2->3) == flow(3->2)
    assert n1 > 300 and n2 > 300 and n3 > 300, (n1, n2, n3)
    assert j1 == 0.0  # no joinable node in the 1sp state
    assert s3 == 0.0  # no splittable node in the 3sp state
    # band calibrated from seed sweeps (2026-08-19: ratios 3.95 / 0.58 /
    # 1.09 across seeds at this chain length): the ~500-probe ensembles
    # are serially correlated through the slow tau equilibrium, so the
    # flow-ratio noise spans ~4x around 1.  A systematic bias (e.g. a
    # wrong Jacobian) shows up as ratios consistently >5 or <0.2.
    ratio_12 = j2 / max(s1, 1e-12)
    ratio_23 = s2 / max(j3, 1e-12)
    assert 0.15 < ratio_12 < 6.0, (j2, s1, ratio_12)
    assert 0.15 < ratio_23 < 6.0, (s2, j3, ratio_23)


@pytest.mark.slow
def test_a10_detects_distinct_species(tmp_path):
    _sim(tmp_path, tau_ab=0.008, tau_root=0.02)
    ctl = _write_ctl(tmp_path, "sim.txt", "sim.imap", usedata=True, nloci=8,
                     burnin=150, nsample=200, seed=23)
    eng, log, run = _run(tmp_path, ctl, 23)
    models, nsp = summarize_delimitations(np.stack(log.tau), run.stree)
    total = sum(nsp.values())
    assert nsp.get(3, 0) / total > 0.85, nsp


@pytest.mark.slow
def test_a10_collapses_panmictic_data(tmp_path):
    # one population: negligible divergence between "species"
    _sim(tmp_path, tau_ab=1e-6, tau_root=2e-6, n_loci=8, seed=9)
    # needs a few hundred iterations for the first AB-join to land
    # (theta-window + tau gates); 150+400 was observed to be marginal
    ctl = _write_ctl(tmp_path, "sim.txt", "sim.imap", usedata=True, nloci=8,
                     burnin=400, nsample=350, seed=29)
    eng, log, run = _run(tmp_path, ctl, 29)
    models, nsp = summarize_delimitations(np.stack(log.tau), run.stree)
    total = sum(nsp.values())
    assert nsp.get(3, 0) / total < 0.5, nsp


@pytest.mark.slow
def test_a10_no_cache_drift(tmp_path):
    _sim(tmp_path, tau_ab=0.004, tau_root=0.01, n_loci=4, length=200)
    ctl = _write_ctl(tmp_path, "sim.txt", "sim.imap", usedata=True, nloci=4,
                     burnin=2, nsample=2, seed=31)
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    cfg = parse_ctl(ctl).replace(dtype="float32")
    run = load_run(cfg)
    eng = Engine(run, seed=31)
    state = eng.init_state()
    key = jax.random.PRNGKey(31)
    logl_fn = jax.jit(make_logl_fn(eng.ctx, cfg))
    logpr_fn = jax.jit(lambda gt, sp, h: make_logpr_fn(eng.ctx)(gt, sp, h)[0])
    for chunk in range(6):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 25)
        fresh = np.asarray(logl_fn(state.gt, state.subst))
        d = np.abs(fresh - np.asarray(state.logl)).max()
        assert d < 0.05, f"logl drift {d}"
        fp = np.asarray(logpr_fn(state.gt, state.sp, state.subst.heredity))
        dp = np.abs(fp - np.asarray(state.logpr)).max()
        assert dp < 0.05, f"logpr drift {dp}"


@pytest.mark.slow
def test_a11_prior_joint_frequencies(tmp_path):
    """A11 (both moves on): uniform over the 9 (topology, delimitation)
    states => P(1sp)=3/9, each 2sp/3sp model 1/9 (matches the reference
    binary's A11 prior run)."""
    import textwrap as tw

    (tmp_path / "d.txt").write_text(
        "\n".join(["12 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                               for s in "ABC" for i in range(4)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC" for i in range(4)))
    ctl = tmp_path / "a11.ctl"
    ctl.write_text(tw.dedent("""\
        seed = 7
        seqfile = d.txt
        Imapfile = d.imap
        jobname = out
        speciesdelimitation = 1 0 2
        speciestree = 1
        species&tree = 3 A B C
                       4 4 4
                       ((A,B),C);
        usedata = 0
        nloci = 1
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        finetune = 1
        burnin = 500
        sampfreq = 2
        nsample = 3000
    """))
    from collections import Counter

    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run
    from bpp_tpu.summary.mixed_summary import summarize_mixed

    cfg = parse_ctl(str(ctl))
    run = load_run(cfg)
    # single-chain occupancy has huge sojourn variance; pool seeds
    pooled: Counter = Counter()
    for seed in (7, 77, 777, 7777):
        eng = Engine(run, seed=seed)
        log = eng.run_mcmc(progress_every=0)
        _, nsp = summarize_mixed(log.sptrees, np.stack(log.tau),
                                 run.stree.names)
        pooled.update(nsp)
    total = sum(pooled.values())
    for k in (1, 2, 3):
        assert 0.15 < pooled.get(k, 0) / total < 0.55, pooled


def test_prior_a11_masses_match_reference_table():
    """partition_fast/print_pinfo (delimit.c:88-215) for n=4 prints the
    reference table: pro = 15, 15, 18, 18 for k = 1..4 (SLH prior 2)."""
    import numpy as np
    from bpp_tpu.mcmc.driver import prior_a11_masses
    m2 = prior_a11_masses(4, 2) * 66
    np.testing.assert_allclose(m2, [15, 15, 18, 18], rtol=1e-12)
    m3 = prior_a11_masses(4, 3)
    np.testing.assert_allclose(m3 * 63, [15, 15, 18, 15], rtol=1e-12)


@pytest.mark.slow
def test_a10_notheta_rj_and_caches(tmp_path):
    """A10 with integrated-out thetas (thetaprior ... int): the rj
    split/join must run (prop_rj.c !opt_est_theta paths, no theta
    mapping) and the coupled coal/t2h caches must stay honest."""
    import jax.numpy as jnp

    _sim(tmp_path, tau_ab=0.004, tau_root=0.01, n_loci=4, length=200)
    ctl = _write_ctl(tmp_path, "sim.txt", "sim.imap", usedata=True, nloci=4,
                     burnin=2, nsample=2, seed=37)
    txt = open(ctl).read().replace("thetaprior = gamma 2 200",
                                   "thetaprior = invgamma 3 0.004 int")
    open(ctl, "w").write(txt)
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    cfg = parse_ctl(ctl).replace(dtype="float32")
    assert cfg.theta_integrated and cfg.est_delimit
    run = load_run(cfg)
    eng = Engine(run, seed=37)
    state = eng.init_state()
    assert state.coal is not None
    key = jax.random.PRNGKey(37)
    logl_fn = jax.jit(make_logl_fn(eng.ctx, cfg))
    delims = set()
    for chunk in range(6):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 25)
        delims.add(tuple(np.asarray(state.sp.tau)[3:] > 0))
        fresh = np.asarray(logl_fn(state.gt, state.subst))
        d = np.abs(fresh - np.asarray(state.logl)).max()
        assert d < 0.05, f"logl drift {d}"
        _, c, t2 = eng._logpr_fn(state.gt, state.sp, state.subst.heredity)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(state.coal))
        np.testing.assert_allclose(np.asarray(t2), np.asarray(state.t2h),
                                   rtol=1e-4, atol=1e-7)
    # data has clear AB/C signal at these taus; chain should visit >= 2
    # delimitations across 150 iterations only if rj actually moves --
    # under strong signal it may lock to the true model, so at minimum
    # the terminal state must be a valid delimitation (no NaNs anywhere)
    assert np.isfinite(np.asarray(state.logl)).all()
    assert np.isfinite(float(jnp.sum(state.t2h)))


@pytest.mark.slow
def test_a10_relaxed_clock_iid(tmp_path):
    """A10 x clock=2 (iid rates): reference-supported (its rjMCMC run
    accepts the combination; the guide tree keeps every branch rate
    alive across delimitation models, so the rj move is exact for
    tau-independent rate priors).  Chain must run with the runtime
    invariant check on and keep the logl cache honest across rj flips.
    """
    _sim(tmp_path, tau_ab=0.004, tau_root=0.01, n_loci=3, length=200)
    ctl = _write_ctl(tmp_path, "sim.txt", "sim.imap", usedata=True,
                     nloci=3, burnin=10, nsample=5, seed=17)
    from bpp_tpu.config import Clock
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    cfg = parse_ctl(ctl).replace(
        dtype="float32", clock=Clock.IID, clock_vbar_a=10.0,
        clock_vbar_b=100.0, clock_vi_alpha=5.0, clock_rate_prior=1,
        check_every=8)
    eng = Engine(load_run(cfg), seed=17)
    log = eng.run_mcmc(progress_every=0)   # validate_state inside
    assert len(log.gen) == 5
    assert np.isfinite(log.lnL).all()


def test_a10_corr_clock_still_blocked(tmp_path):
    """clock=3 x delimitation stays blocked: the correlated rate prior
    depends on the taus the rj move changes and the reference's
    prop_rj.c never recomputes it (documented reference defect)."""
    _sim(tmp_path, tau_ab=0.004, tau_root=0.01, n_loci=2, length=100)
    ctl = _write_ctl(tmp_path, "sim.txt", "sim.imap", usedata=True,
                     nloci=2, burnin=2, nsample=2, seed=3)
    from bpp_tpu.config import Clock
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    cfg = parse_ctl(ctl).replace(
        clock=Clock.CORRELATED, clock_vbar_a=10.0, clock_vbar_b=100.0,
        clock_vi_alpha=5.0, clock_rate_prior=1)
    with pytest.raises(NotImplementedError, match="auto-correlated"):
        Engine(load_run(cfg), seed=3)
