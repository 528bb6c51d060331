"""Tip dating (serial sampling / datefile; reference: opt_datefile,
set_tip_date_infer gtree.c:1735, prop_tipDate_muGtree stree.c:9419,
per-epoch coalescent density stree.c:5278).

Under ``usedata = 0`` the chain samples the joint prior; the mubar
marginal must reproduce its Gamma(a, b) prior (the tau>date constraint
is made negligible by choosing dates << taus), tip ages must track
``date * mubar`` exactly, and the dated coalescent sweep must agree
with the undated fast path when all dates are zero.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.io.ctl import parse_ctl_lines
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine

CTL = """
seed = 5
seqfile = /root/reference/examples/frogs/frogs.txt
Imapfile = /root/reference/examples/frogs/frogs.Imap.txt
jobname = out
species&tree = 4 K C L H
                9 7 14 2
               (((K, C), L), H);
usedata = 0
nloci = 2
cleandata = 0
thetaprior = gamma 2 200
tauprior = gamma 4 100
locusrate = 3 10 10000
clock = 1
datefile = {datefile}
finetune = 1
burnin = 400
sampfreq = 2
nsample = 1000
"""

INDIVIDUALS = [
    "6", "bj64", "c14", "c66", "dl10", "dl4", "gs01", "gs132", "gs250",
    "gs49", "gs75", "hn24", "kiz1375", "kiz2305", "kiz2321", "kiz2405",
    "nx4", "rd1", "wlht2", "ypx2732", "ypx2734", "ypx2767", "ypx3032",
    "ypx3195", "ypx3460", "ypx3462", "ypx3748", "ypx3876", "ypx3893",
    "ypx4184", "ypx4186", "ypx4225",
]


@pytest.fixture(scope="module")
def date_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tipdate")
    datefile = tmp / "dates.txt"
    rng = np.random.default_rng(11)
    dates = {ind: round(float(rng.uniform(0.0, 1.0)), 3)
             for ind in INDIVIDUALS}
    datefile.write_text(
        "".join(f"{k} {v}\n" for k, v in dates.items()))
    cfg = parse_ctl_lines(
        CTL.format(datefile=datefile).strip().splitlines())
    run = load_run(cfg)
    eng = Engine(run, seed=9)
    return cfg, run, eng, dates


def test_config_and_loading(date_run):
    cfg, run, eng, dates = date_run
    assert cfg.est_locusrate == 3
    assert cfg.locusrate_mubar_a == 10 and cfg.locusrate_mubar_b == 10000
    assert run.tip_dates is not None and run.date_lmax is not None
    # per-sequence dates match the datefile through the Imap packing
    for li, labels in enumerate(run.batch.labels):
        for j, lab in enumerate(labels):
            assert run.tip_dates[li, j] == dates[lab.split("^")[-1]]
    # date_lmax is monotone up the species tree
    st = run.stree
    for i in range(st.n_nodes):
        p = int(st.parent[i])
        if p >= 0:
            assert run.date_lmax[p] >= run.date_lmax[i]


@pytest.mark.slow
def test_prior_chain_invariants(date_run):
    cfg, run, eng, dates = date_run
    state = eng.init_state()
    key = jax.random.PRNGKey(4)
    state, _ = eng.chunk_step(state, key, 400)
    mubars, taus = [], []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, stats = eng.chunk_step(state, sub, 50)
        mubars.append(float(state.mubar))
        taus.append(np.asarray(state.sp.tau))
        ga = np.asarray(state.gt.age)
        # tip ages track date * mubar exactly
        want = np.asarray(run.tip_dates) * mubars[-1]
        T = run.batch.max_tips
        np.testing.assert_allclose(ga[:, :T], want, rtol=2e-6, atol=1e-10)
        # parent older than child everywhere
        gp = np.asarray(state.gt.parent)
        for li in range(run.batch.n_loci):
            n = int(run.batch.n_seq[li])
            for u in range(2 * n - 1):
                uu = u if u < n else run.batch.max_tips + (u - n)
                p = gp[li, uu]
                if p >= 0:
                    assert ga[li, p] >= ga[li, uu] - 1e-12
        # taus respect the dated lower bounds
        lmax = np.asarray(run.date_lmax) * mubars[-1]
        tau = taus[-1]
        assert np.all(tau[tau > 0] >= lmax[tau > 0] - 1e-12)
    mubars = np.asarray(mubars)
    # prior marginal: Gamma(10, 10000), mean 1e-3, sd ~3.2e-4
    assert abs(mubars.mean() - 1e-3) < 3e-4, mubars.mean()
    assert mubars.std() > 5e-5          # the move actually mixes
    # logpr cache consistent with a full recompute
    lp, _, _ = eng._logpr_fn(state.gt, state.sp, state.subst.heredity)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(state.logpr),
                               rtol=1e-6, atol=1e-5)


@pytest.mark.slow
def test_dated_stats_match_undated_when_contemporary():
    """per_pop_stats_dated is exact for undated data too."""
    from bpp_tpu.mcmc.state import Ctx  # noqa: F401  (import check)
    from bpp_tpu.trees import coalescent as coal
    from bpp_tpu.trees.gtree import assign_populations, init_gtrees

    cfg = parse_ctl_lines(CTL.format(datefile="/dev/null").replace(
        "datefile = /dev/null", "").strip().splitlines())
    run = load_run(cfg)
    gt = init_gtrees(3, run.batch, run.stree, dtype=jnp.float64)
    from bpp_tpu.mcmc.state import species_arrays
    sp = species_arrays(run.stree, dtype=jnp.float64)
    n_seq = jnp.asarray(run.batch.n_seq)
    pops = assign_populations(gt, sp, jnp.asarray(run.batch.tip_pop))
    c0, t0, n0 = coal.per_pop_stats(gt, sp, pops, n_seq)
    c1, t1, n1 = coal.per_pop_stats_dated(gt, sp, pops, n_seq)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))


def test_dated_stats_match_sweep_oracle(date_run):
    """With NONZERO tip ages, per_pop_stats_dated must equal an
    independent per-population time-sweep oracle (n(t)(n(t)-1) integral
    over presence breakpoints).  The Abel event-rank fast path assumes
    every lineage enters at tau_h and is wrong here — pinned below so a
    future 'optimization' cannot silently re-route dated runs onto it
    (regression for the round-4 advisor finding)."""
    from bpp_tpu.trees import coalescent as coal
    from bpp_tpu.trees.gtree import assign_populations

    cfg, run, eng, dates = date_run
    state = eng.init_state()
    gt, sp = state.gt, state.sp
    pops = assign_populations(gt, sp, jnp.asarray(run.batch.tip_pop))
    n_seq = jnp.asarray(run.batch.n_seq)
    T = run.batch.max_tips
    assert float(np.asarray(gt.age)[:, :T].max()) > 0.0  # really dated

    c1, t1, _ = coal.per_pop_stats_dated(gt, sp, pops, n_seq)
    c0, t0, _ = coal.per_pop_stats(gt, sp, pops, n_seq)

    age = np.asarray(gt.age)
    par = np.asarray(gt.parent)
    pop = np.asarray(pops)
    tau = np.asarray(sp.tau)
    spar = np.asarray(sp.parent)
    ppt = np.asarray(sp.pptable)
    BIG = 1.0e12
    L, N = pop.shape
    H = tau.shape[0]
    t_oracle = np.zeros((L, H))
    for li in range(L):
        n = int(n_seq[li])
        nodes = [u for u in range(N)
                 if (u < n) or (T <= u < T + n - 1)]
        for h in range(H):
            end = tau[spar[h]] if spar[h] >= 0 else BIG
            pts = {tau[h], end}
            ivs = []
            for u in nodes:
                if not ppt[pop[li, u], h]:
                    continue
                p = par[li, u]
                hi = age[li, p] if p >= 0 else BIG
                lo = max(age[li, u], tau[h])
                hi = min(hi, end)
                if hi > lo:
                    ivs.append((lo, hi))
                    pts.update((lo, hi))
            cuts = sorted(pts)
            acc = 0.0
            for a, b in zip(cuts[:-1], cuts[1:]):
                m = 0.5 * (a + b)
                k = sum(1 for lo, hi in ivs if lo <= m < hi)
                acc += k * (k - 1) * (b - a)
            t_oracle[li, h] = acc
    np.testing.assert_allclose(np.asarray(t1), t_oracle,
                               rtol=1e-6, atol=1e-8)
    # the undated fast path must NOT be used for dated tips: it
    # measurably disagrees with the oracle on this fixture
    assert np.abs(np.asarray(t0) - t_oracle).max() > 1e-3


@pytest.mark.smoke
def test_usedata_smoke(tmp_path):
    datefile = tmp_path / "dates.txt"
    rng = np.random.default_rng(3)
    datefile.write_text("".join(
        f"{ind} {rng.uniform(0, 1):.3f}\n" for ind in INDIVIDUALS))
    ctl = CTL.format(datefile=datefile).replace("usedata = 0",
                                                "usedata = 1")
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=2)
    state = eng.init_state()
    state, stats = eng.chunk_step(state, jax.random.PRNGKey(0), 60)
    logl = eng._logl_fn(state.gt, state.subst, state.sp, state.clock)
    # a few f32 ulps between in-graph cache and standalone recompute
    np.testing.assert_allclose(np.asarray(logl), np.asarray(state.logl),
                               rtol=2e-6, atol=1e-6)
    assert np.isfinite(float(np.asarray(state.logl).sum()))
