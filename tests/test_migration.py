"""MSC-M (isolation-with-migration) density and state tests.

Hand-computed oracle on a 2-species IM scenario (reference density:
gtree_update_logprob_contrib_mig, gtree.c:3459-3675):

  species A, B, root R; tau_R = 0.1; one locus with a in A, b in B.
  One migration event on a's edge at t_m = 0.04 (backward jump A->B,
  i.e. a forward-time migrant B->A via route k = B->A), coalescence of
  (a, b) at t_r = 0.08 in B.

  logPG = log M - M*0.04 + log(2/theta_B) - 0.08/theta_B
  (W_{B->A} = int n_A(x) 1[B alive] dx = 0.04;
   C2_B = 2*1*(0.08-0.04) = 0.08)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.trees.gtree import BIG_AGE, GTrees
from bpp_tpu.trees import migration as mg


def _two_species_setup(theta=0.01, tau_r=0.1):
    from bpp_tpu.trees.stree import SpeciesTree
    from bpp_tpu.trees.gtree import species_arrays

    st = SpeciesTree.from_newick("(A, B);", tip_order=["A", "B"])
    st.tau[:] = [0.0, 0.0, tau_r]
    st.theta[:] = theta
    sp = species_arrays(st, dtype=jnp.float64)
    return st, sp


def _gtree_one_locus(t_r=0.08):
    # tips 0 (a in A), 1 (b in B); inner 2 = root at t_r
    left = jnp.asarray([[-1, -1, 0]], jnp.int32)
    right = jnp.asarray([[-1, -1, 1]], jnp.int32)
    parent = jnp.asarray([[2, 2, -1]], jnp.int32)
    age = jnp.asarray([[0.0, 0.0, t_r]], jnp.float64)
    return GTrees(left, right, parent, age, None)


def test_density_hand_oracle():
    theta, tau_r, t_m, t_r, M = 0.01, 0.1, 0.04, 0.08, 1.7
    st, sp = _two_species_setup(theta, tau_r)
    gt = _gtree_one_locus(t_r)
    n_seq = jnp.asarray([2])
    tip_pop = jnp.asarray([[0, 1]], jnp.int32)

    # route k: forward B->A  (si=1, ti=0)
    si, ti = np.asarray([1]), np.asarray([0])
    mig = mg.empty_mig_state(1, 4, 1, [M], jnp.float64)
    # backward jump A->B on edge of tip 0 at t_m
    mig = mig._replace(
        time=mig.time.at[0, 0].set(t_m),
        node=mig.node.at[0, 0].set(0),
        src=mig.src.at[0, 0].set(0),
        dst=mig.dst.at[0, 0].set(1))

    pops = mg.assign_populations_mig(gt, sp, tip_pop, mig, n_seq)
    assert int(pops[0, 2]) == 1          # coalescence in B
    ok = mg.route_consistent_mig(gt, sp, mig, pops, n_seq)
    assert bool(ok[0])

    coal, C2, W, mc, n_in = mg.mig_stats(gt, sp, pops, mig, si, ti, n_seq)
    np.testing.assert_array_equal(np.asarray(coal[0]), [0, 1, 0])
    np.testing.assert_allclose(np.asarray(C2[0]), [0.0, 0.08, 0.0],
                               atol=1e-12)
    np.testing.assert_allclose(float(W[0, 0]), 0.04, atol=1e-12)
    assert int(mc[0, 0]) == 1

    hered = jnp.ones(1, jnp.float64)
    lp = mg.msc_logprob_mig(coal, C2, W, mc, sp.theta, hered, mig.M)
    want = (np.log(M) - M * 0.04
            + np.log(2.0 / theta) - 0.08 / theta)
    np.testing.assert_allclose(float(lp[0]), want, rtol=1e-12)


def test_density_no_events_matches_plain_msc():
    """With zero migration events, pop terms must equal the plain MSC
    density; the migration part reduces to -M*W."""
    from bpp_tpu.trees import coalescent as coalmod
    from bpp_tpu.trees.gtree import assign_populations

    theta, tau_r, t_r, M = 0.02, 0.1, 0.15, 0.9
    st, sp = _two_species_setup(theta, tau_r)
    gt = _gtree_one_locus(t_r)       # coalescence in root pop
    n_seq = jnp.asarray([2])
    tip_pop = jnp.asarray([[0, 1]], jnp.int32)
    si, ti = np.asarray([1]), np.asarray([0])
    mig = mg.empty_mig_state(1, 4, 1, [M], jnp.float64)

    pops = mg.assign_populations_mig(gt, sp, tip_pop, mig, n_seq)
    pops_plain = assign_populations(gt, sp, tip_pop)
    np.testing.assert_array_equal(np.asarray(pops), np.asarray(pops_plain))

    coal, C2, W, mc, _ = mg.mig_stats(gt, sp, pops, mig, si, ti, n_seq)
    c_p, t2_p, _ = coalmod.per_pop_stats(gt, sp, pops_plain, n_seq)
    np.testing.assert_array_equal(np.asarray(coal), np.asarray(c_p))
    np.testing.assert_allclose(np.asarray(C2), np.asarray(t2_p), atol=1e-12)
    # a's edge is in A over [0, tau_r) while B alive: W = tau_r
    np.testing.assert_allclose(float(W[0, 0]), tau_r, atol=1e-12)
    assert int(mc[0, 0]) == 0

    hered = jnp.ones(1, jnp.float64)
    lp = mg.msc_logprob_mig(coal, C2, W, mc, sp.theta, hered, mig.M)
    lp_plain = coalmod.msc_logprob(gt, sp, pops_plain, n_seq, hered)
    np.testing.assert_allclose(float(lp[0]),
                               float(lp_plain[0]) - M * tau_r, rtol=1e-12)


def test_ctl_migration_block():
    from bpp_tpu.io.ctl import parse_ctl_lines

    ctl = """
seed = 1
seqfile = x
species&tree = 2 A B
                2 2
               (A, B);
migration = 2
  A B
  B A 2.0 5.0
wprior = 3 1.5
usedata = 0
"""
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    assert cfg.migration and len(cfg.mig_specs) == 2
    assert cfg.mig_specs[0].source == "A" and cfg.mig_specs[0].alpha == 0.0
    assert cfg.mig_specs[1].alpha == 2.0 and cfg.mig_specs[1].beta == 5.0

    from bpp_tpu.loader import build_species_tree
    st = build_species_tree(cfg)
    routes = mg.build_routes(cfg, st)
    assert routes.n_routes == 2
    assert routes.alpha[0] == 3.0 and routes.beta[0] == 1.5   # wprior default
    assert routes.index[routes.si[1], routes.ti[1]] == 1


@pytest.mark.slow
def test_prior_recovery_chain():
    """Short prior-only chain: the full MSC-M move set (sim-SPR event
    birth/death, event-age slides, rate Gibbs, tau/theta/mixing) must
    keep the migration-rate marginal at its Gamma prior and create
    events.  (Long-run check: mean M 209/209 vs prior 200, sd 146/154
    vs 141, theta 0.0038 vs 0.004.)"""
    import jax

    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine
    from bpp_tpu.mcmc.mig_moves import make_logpr_fn_mig

    ctl = """
seed = 5
seqfile = /root/reference/examples/frogs/frogs.txt
Imapfile = /root/reference/examples/frogs/frogs.Imap.txt
jobname = out
species&tree = 4 K C L H
                9 7 14 2
               (((K, C), L), H);
usedata = 0
nloci = 4
thetaprior = invgamma 3 0.008
tauprior = invgamma 3 0.012
migration = 2
  K C 2 0.01
  C K 2 0.01
finetune = 1
burnin = 100
sampfreq = 2
nsample = 100
"""
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=5)
    st = eng.init_state()
    key = jax.random.PRNGKey(5)
    Ms, evs = [], []
    for it in range(60):
        key, sub = jax.random.split(key)
        st, _ = eng.chunk_step(st, sub, 25)
        if it >= 10:
            Ms.append(np.asarray(st.mig.M))
            evs.append(np.asarray(st.mig.count()).mean())
    m = np.stack(Ms).mean()
    assert 90 < m < 330, m                    # prior mean 200, short chain
    assert np.mean(evs) > 0.2, np.mean(evs)   # events are being created
    lp, *_ = make_logpr_fn_mig(eng.ctx, eng.routes)(
        st.gt, st.sp, st.mig, st.subst.heredity)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(st.logpr),
                               atol=1e-3)


@pytest.mark.slow
def test_sim_mig_theory():
    """Structured-coalescent simulator against exact 2-deme theory:
    E[T | different demes] solves the Wakeley two-state system
      E[T_D] = 1/(2m) + E[T_S],  E[T_S] = (1 + E[T_D] m theta)/(2/theta + 2m) ...
    with theta=1, m=0.5: E[T_S]=1, E[T_D]=2; strong migration -> 1."""
    from bpp_tpu.trees.migration import simulate_gtree_mig_host

    st_parent = np.asarray([2, 2, -1])
    tau = np.asarray([0.0, 0.0, 5000.0])
    theta = np.asarray([1.0, 1.0, 1.0])
    si, ti = np.asarray([0, 1]), np.asarray([1, 0])
    rng = np.random.default_rng(0)
    tips = np.asarray([0, 1], np.int32)

    def mean_T(M, n=1500):
        Ms = np.asarray([M, M])
        return np.mean([simulate_gtree_mig_host(
            rng, tips, st_parent, tau, theta, si, ti, Ms)[3][2]
            for _ in range(n)])

    np.testing.assert_allclose(mean_T(0.5), 2.0, rtol=0.12)
    np.testing.assert_allclose(mean_T(50.0), 1.0, rtol=0.12)


# ---------------------------------------------------------------------------
# relaxed clocks + heredity under migration (the reference allows both;
# branch lengths ride the sub-edge sweep, locus.c:1151 + miginfo walks)
# ---------------------------------------------------------------------------

MIG_CLOCK_CTL = """
seed = 5
seqfile = /root/reference/examples/frogs/frogs.txt
Imapfile = /root/reference/examples/frogs/frogs.Imap.txt
jobname = out
species&tree = 4 K C L H
                9 7 14 2
               (((K, C), L), H);
usedata = 1
nloci = 2
thetaprior = invgamma 3 0.008
tauprior = invgamma 3 0.012
migration = 2
  K C 2 0.01
  C K 2 0.01
heredity = 1 4 4
clock = 2 10.0 100.0 5.0 iid G
locusrate = 1 0 0 5.0 iid
finetune = 1
burnin = 0
sampfreq = 2
nsample = 5
"""


@pytest.mark.smoke
def test_mig_relaxed_clock_heredity_smoke():
    """IID clock + heredity estimation under migration: finite chain,
    honest caches (incl. the relaxed sub-edge branch lengths through
    event / tau / age moves)."""
    import jax
    import numpy as np

    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine
    from bpp_tpu.mcmc.mig_moves import make_logpr_fn_mig

    cfg = parse_ctl_lines(MIG_CLOCK_CTL.strip().splitlines())
    eng = Engine(load_run(cfg), seed=5)
    state = eng.init_state()
    assert state.clock is not None and state.mig is not None
    key = jax.random.PRNGKey(5)
    state, _ = eng.chunk_step(state, key, 20)
    assert np.isfinite(float(np.asarray(state.logl).sum()))
    # heredity actually moved
    h = np.asarray(state.subst.heredity)
    assert (np.abs(h - 1.0) > 1e-9).any()
    # cache honesty: likelihood recompute through the migration-aware
    # relaxed-length path must match the carried values
    ll = eng._logl_fn(state.gt, state.subst, state.sp, state.clock,
                      mig=state.mig)
    # rtol: in-graph cache vs standalone recompute fuse differently in
    # XLA — a few f32 ulps of drift is legitimate (f32 eps 1.2e-7)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(state.logl),
                               rtol=2e-6)
    lp, *_ = make_logpr_fn_mig(eng.ctx, eng.routes)(
        state.gt, state.sp, state.mig, state.subst.heredity)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(state.logpr),
                               rtol=1e-8)


@pytest.mark.slow
def test_mig_relaxed_lengths_match_plain_when_eventfree():
    """With no migration events and all rates == r, the migration-aware
    relaxed lengths must equal r * (plain age differences)."""
    import numpy as np

    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine
    from bpp_tpu.core import felsenstein as fe
    from bpp_tpu.trees import migration as mg

    cfg = parse_ctl_lines(MIG_CLOCK_CTL.strip().splitlines())
    import jax.numpy as jnp

    eng = Engine(load_run(cfg), seed=7)
    state = eng.init_state()           # starts event-free
    gt, sp, mig = state.gt, state.sp, state.mig
    r = 1.37
    brate = jnp.full_like(state.clock.brate, r)
    pops = mg.assign_populations_mig(gt, sp, eng.ctx.tip_pop, mig,
                                     eng.ctx.n_seq)
    got = mg.relaxed_branch_lengths_mig(gt, sp, mig, pops, eng.ctx.n_seq,
                                        brate)
    want = fe.branch_lengths(gt, jnp.full((gt.n_loci,), r,
                                          state.clock.brate.dtype))
    # only real (non-padded) nodes participate
    N = gt.n_nodes
    T = gt.n_tips
    nodes = np.arange(N)[None, :]
    ns = np.asarray(eng.ctx.n_seq)[:, None]
    validn = (nodes < ns) | ((nodes >= T) & (nodes < T + ns - 1))
    # float32 state: the per-population segment sum associates
    # differently from the direct age difference (~1 ulp)
    np.testing.assert_allclose(np.asarray(got)[validn],
                               np.asarray(want)[validn],
                               rtol=1e-5, atol=1e-12)


@pytest.mark.slow
def test_tau_prior_tail_mobility_under_migration():
    """usedata=0 with migration events present: the tau_root marginal
    must reach its InvG(3, 0.04) upper tail (P[tau > 0.035] ~ 0.105
    exactly).  Regression for the round-3 IM rubber-band: the earlier
    plain tau slide could not cross event/coalescent times, so 20000-
    sample chains showed sd 0.008 vs the exact 0.02 and ~zero mass
    above 0.035 (see VALIDATION.md round 3)."""
    import jax

    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine

    import tempfile, pathlib
    tmp = pathlib.Path(tempfile.mkdtemp())
    (tmp / "d.txt").write_text("\n\n".join(
        "12 24\n" + "\n".join(
            f"{s_}^{s_.lower()}{i}  " + "ACGTACGTACGTACGTACGTACGT"
            for s_ in "AB" for i in range(6))
        for _ in range(50)) + "\n")
    (tmp / "d.imap").write_text("".join(
        f"{s_.lower()}{i}\t{s_}\n" for s_ in "AB" for i in range(6)))
    ctl = f"""
seed = 13
seqfile = {tmp}/d.txt
Imapfile = {tmp}/d.imap
jobname = out
species&tree = 2 A B
                 6 6
                (A, B);
usedata = 0
nloci = 50
thetaprior = invgamma 3 0.02
tauprior = invgamma 3 0.04
wprior = 2 1
migration = 2
  A B
  B A
finetune = 1
burnin = 1000
sampfreq = 1
nsample = 10000
"""
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=13)
    state = eng.init_state()
    key = jax.random.PRNGKey(13)
    for q in range(4):
        key, sub = jax.random.split(key)
        state, stats = eng.chunk_step(state, sub, 250)
        state = eng._reset_finetune(state, np.asarray(stats, np.float64))
    taus = []
    for _ in range(5):
        key, sub = jax.random.split(key)
        state, _, tr = eng.chunk_step_traced(state, sub, 2000)
        taus.append(np.asarray(tr["tau"])[:, 2])
    tau = np.concatenate(taus)
    frac_tail = float((tau > 0.035).mean())
    assert frac_tail > 0.02, (frac_tail, tau.mean(), tau.std())
    assert 0.012 < tau.mean() < 0.032, (tau.mean(), tau.std())
