"""Pallas Felsenstein kernel vs the XLA engine (interpreter mode).

The TPU hot path (core/pallas_fels.py) must produce the same per-locus
log-likelihoods as the reference-validated XLA engine
(core/felsenstein.loglikelihood); on CPU the kernel runs under
``interpret=True``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.config import SubstModel
from bpp_tpu.core import felsenstein as fe
from bpp_tpu.core.pallas_fels import site_logl_pallas
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.mcmc.state import compute_pmats
from bpp_tpu.testing import synthetic_run
from bpp_tpu.trees.gtree import inner_order


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("BPP_TPU_PALLAS", "interpret")
    # these tests pin the PER-LOCUS kernel (the diploid-run path);
    # the lane-packed kernel has its own suite (test_pallas_pack.py)
    monkeypatch.setenv("BPP_TPU_PACK", "0")


def _pallas_vs_xla(eng, state, model, n_cats=1, rtol=2e-5, atol=2e-4):
    gt, subst, ctx = state.gt, state.subst, eng.ctx
    rk = jnp.concatenate(
        [subst.rates, subst.kappa1[:, None], subst.kappa2[:, None]], axis=1)
    site_logl = site_logl_pallas(
        inner_order(gt), gt.left, gt.right, gt.parent, ctx.n_seq, gt.age,
        subst.mu, rk, subst.freqs, subst.eigw, subst.eigT, subst.eigTi,
        ctx.tips_am, model=model, n_cats=n_cats)
    ll_pallas = fe.reduce_root(site_logl.astype(ctx.weights.dtype),
                               ctx.weights, ctx.res_map, ctx.res_count)

    pmats = compute_pmats(gt, subst, model)
    cw = jnp.full((n_cats,), 1.0 / n_cats, ctx.weights.dtype)
    ll_xla = fe.loglikelihood(gt, ctx.tip_partials, ctx.weights, ctx.n_seq,
                              pmats, subst.freqs, cw, res_map=ctx.res_map,
                              res_count=ctx.res_count)
    np.testing.assert_allclose(np.asarray(ll_pallas), np.asarray(ll_xla),
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("n_seq", [2, 6, 16])
def test_pallas_matches_xla_jc69(n_seq):
    run = synthetic_run(n_loci=5, n_seq=n_seq, n_patterns=40, n_species=3,
                        seed=3)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=1)
    assert eng.ctx.tips_am is not None, "pallas path not active"
    state = eng.init_state()
    _pallas_vs_xla(eng, state, SubstModel.JC69)


@pytest.mark.slow
def test_pallas_deep_tree_no_underflow():
    """Many sequences + divergent branch lengths: the per-level
    rescaling must keep f32 CLVs in range (an every-other-level scheme
    underflows here; ADVICE r1 finding)."""
    run = synthetic_run(n_loci=3, n_seq=48, n_patterns=40, n_species=3,
                        seed=7)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=1)
    state = eng.init_state()
    # stretch all inner-node ages so every branch is long and each
    # pruning step shrinks CLV magnitudes hard
    T = state.gt.n_tips
    age = state.gt.age.at[:, T:].multiply(400.0)
    state = state._replace(gt=state.gt._replace(age=age))
    _pallas_vs_xla(eng, state, SubstModel.JC69, rtol=2e-4, atol=2e-3)
    # and the absolute values must be finite (no silent 1e-30 flooring)
    gt, subst, ctx = state.gt, state.subst, eng.ctx
    rk = jnp.concatenate(
        [subst.rates, subst.kappa1[:, None], subst.kappa2[:, None]], axis=1)
    site_logl = site_logl_pallas(
        inner_order(gt), gt.left, gt.right, gt.parent, ctx.n_seq, gt.age,
        subst.mu, rk, subst.freqs, subst.eigw, subst.eigT, subst.eigTi,
        ctx.tips_am, model=SubstModel.JC69, n_cats=1)
    assert np.isfinite(np.asarray(site_logl)).all()


@pytest.mark.parametrize("model", [SubstModel.HKY, SubstModel.TN93,
                                   SubstModel.F81])
@pytest.mark.slow
def test_pallas_matches_xla_tn93_family(model):
    run = synthetic_run(n_loci=4, n_seq=8, n_patterns=40, n_species=3,
                        seed=5, model=model)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=2)
    assert eng.ctx.tips_am is not None
    state = eng.init_state()
    # the kernel's 4-eigenvalue TN93 factorization and the XLA P-matrix
    # path round differently in f32 (~1e-4 relative per site); the
    # kernel-vs-kernel MH deltas are unaffected
    _pallas_vs_xla(eng, state, model, rtol=2e-4, atol=2e-3)


@pytest.mark.slow
def test_pallas_matches_xla_gtr():
    run = synthetic_run(n_loci=4, n_seq=8, n_patterns=40, n_species=3,
                        seed=5, model=SubstModel.GTR)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=2)
    assert eng.ctx.tips_am is not None
    state = eng.init_state()
    _pallas_vs_xla(eng, state, SubstModel.GTR)


def test_pallas_heterogeneous_pattern_counts():
    """Tile-skip correctness: loci whose pattern count ends before the
    batch pad must give the same logl — skipped tiles write zeros and
    only zero-weight columns fall in them (the zigzag-load-balance
    analog; threads.c:265)."""
    run = synthetic_run(n_loci=3, n_seq=6, n_patterns=[200, 30, 130],
                        n_species=3, seed=9)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=1)
    assert eng.ctx.tips_am is not None
    # batch pads to >= 200 patterns -> 256 kernel columns; locus 1 (30
    # patterns) skips tile 1 entirely, locus 2 (130) computes both
    assert eng.ctx.tips_am.shape[-1] == 256
    state = eng.init_state()
    _pallas_vs_xla(eng, state, SubstModel.JC69)


@pytest.mark.parametrize("model", [SubstModel.JC69, SubstModel.HKY])
def test_pallas_relaxed_clock_matches_xla(model):
    """clock=2 rides the same kernel with precomputed branch lengths
    (mcmc.state.make_logl_fn relaxed branch, VERDICT r2 missing #1)."""
    from bpp_tpu.config import Clock
    run = synthetic_run(n_loci=4, n_seq=8, n_patterns=40, n_species=3,
                        seed=11, model=model, clock=Clock.IID,
                        clock_vbar_a=10.0, clock_vbar_b=50.0,
                        clock_vi_alpha=10.0)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=4)
    assert eng.ctx.tips_am is not None, "pallas path not active"
    state = eng.init_state()
    assert state.clock is not None
    gt, subst, sp, ctx = state.gt, state.subst, state.sp, eng.ctx
    ll_pallas = eng._logl_fn(gt, subst, sp=sp, clock=state.clock)

    from bpp_tpu.trees.gtree import assign_populations
    pops = assign_populations(gt, sp, ctx.tip_pop)
    blen = fe.relaxed_branch_lengths(gt, sp, pops, state.clock.brate)
    pmats = compute_pmats(gt, subst, model, blen=blen)
    cw = jnp.full((1,), 1.0, ctx.weights.dtype)
    ll_xla = fe.loglikelihood(gt, ctx.tip_partials, ctx.weights, ctx.n_seq,
                              pmats, subst.freqs, cw, res_map=ctx.res_map,
                              res_count=ctx.res_count)
    mask = np.asarray(ctx.locus_mask)
    np.testing.assert_allclose(np.asarray(ll_pallas)[mask],
                               np.asarray(ll_xla)[mask],
                               rtol=2e-4, atol=2e-3)


@pytest.mark.slow
def test_pallas_gamma_cats():
    from bpp_tpu.config import Prior, PriorDist
    run = synthetic_run(n_loci=4, n_seq=8, n_patterns=40, n_species=3,
                        seed=5,
                        alphaprior=Prior(PriorDist.GAMMA, 2.0, 4.0),
                        alpha_cats=4)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=2)
    state = eng.init_state()
    _pallas_vs_xla(eng, state, SubstModel.JC69, n_cats=4)
