"""Pallas Felsenstein kernel vs the XLA engine (interpreter mode).

The TPU hot path (core/pallas_fels.py) must produce the same per-locus
log-likelihoods as the reference-validated XLA engine
(core/felsenstein.loglikelihood); on CPU the kernel runs under
``interpret=True``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.config import SubstModel
from bpp_tpu.core import felsenstein as fe
from bpp_tpu.core.pallas_fels import site_logl_pallas
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.mcmc.state import compute_pmats, make_logl_fn
from bpp_tpu.testing import synthetic_run
from bpp_tpu.trees.gtree import inner_order


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("BPP_TPU_PALLAS", "interpret")


@pytest.mark.parametrize("n_seq", [2, 6, 16])
def test_pallas_matches_xla_jc69(n_seq):
    run = synthetic_run(n_loci=5, n_seq=n_seq, n_patterns=40, n_species=3,
                        seed=3)
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=1)
    assert eng.ctx.tips_am is not None, "pallas path not active"
    state = eng.init_state()
    gt, subst, ctx = state.gt, state.subst, eng.ctx

    rk = jnp.concatenate(
        [subst.rates, subst.kappa1[:, None], subst.kappa2[:, None]], axis=1)
    site_logl = site_logl_pallas(
        inner_order(gt), gt.left, gt.right, ctx.n_seq, gt.age, subst.mu,
        rk, subst.freqs, subst.eigw, subst.eigT, subst.eigTi, ctx.tips_am,
        model=SubstModel.JC69, n_cats=1)
    ll_pallas = fe.reduce_root(site_logl.astype(ctx.weights.dtype),
                               ctx.weights, ctx.res_map, ctx.res_count)

    pmats = compute_pmats(gt, subst, SubstModel.JC69)
    cw = jnp.ones((1,), ctx.weights.dtype)
    ll_xla = fe.loglikelihood(gt, ctx.tip_partials, ctx.weights, ctx.n_seq,
                              pmats, subst.freqs, cw, res_map=ctx.res_map,
                              res_count=ctx.res_count)
    np.testing.assert_allclose(np.asarray(ll_pallas), np.asarray(ll_xla),
                               rtol=2e-5, atol=2e-4)
