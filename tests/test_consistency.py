"""Cached-state consistency under long float32 runs.

The TPU engine carries cached per-locus logl/logpr across moves (the
analog of the reference's gtree->logl bookkeeping, validated there by
CHECK_LOGL/check_logl method.c:4699).  A float32 regression: proposals
landing exactly on an age bound created parent==child age ties that
broke the age-sorted traversal (fixed via nextafter-reflect +
depth-tie-broken inner_order).  This test runs a few hundred float32
iterations and asserts the caches never drift from a fresh recompute.
"""

import jax
import numpy as np
import pytest

from bpp_tpu.config import Prior, PriorDist, SubstModel
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.mcmc.state import make_logl_fn, make_logpr_fn
from bpp_tpu.testing import synthetic_run


@pytest.mark.smoke
def test_no_cache_drift_float32():
    run = synthetic_run(n_loci=6, n_seq=12, n_patterns=24, n_species=4,
                        seed=17, dtype="float32", model=SubstModel.GTR,
                        alphaprior=Prior(PriorDist.GAMMA, 2.0, 4.0),
                        alpha_cats=2)
    eng = Engine(run, seed=2046723445)
    state = eng.init_state()
    key = jax.random.PRNGKey(eng.seed)
    logl_fn = jax.jit(make_logl_fn(eng.ctx, run.cfg))
    logpr_fn = jax.jit(
        lambda gt, sp, h: make_logpr_fn(eng.ctx)(gt, sp, h)[0])

    for chunk in range(10):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 30)
        fresh = np.asarray(logl_fn(state.gt, state.subst))
        cached = np.asarray(state.logl)
        drift = np.abs(fresh - cached).max()
        assert drift < 0.05, f"logl cache drift {drift} after {30*(chunk+1)}"
        fp = np.asarray(logpr_fn(state.gt, state.sp, state.subst.heredity))
        dp = np.abs(fp - np.asarray(state.logpr)).max()
        assert dp < 0.05, f"logpr cache drift {dp} after {30*(chunk+1)}"


def test_inner_order_breaks_ties_by_depth():
    import jax.numpy as jnp

    from bpp_tpu.trees.gtree import GTrees, inner_order, node_depths

    left = jnp.array([[-1, -1, -1, 0, 3]], jnp.int32)
    right = jnp.array([[-1, -1, -1, 1, 2]], jnp.int32)
    par = jnp.array([[3, 3, 4, 4, -1]], jnp.int32)
    age = jnp.array([[0, 0, 0, 0.5, 0.5]], jnp.float32)  # parent==child tie
    gt = GTrees(left=left, right=right, parent=par, age=age)
    assert node_depths(gt).tolist() == [[2, 2, 1, 1, 0]]
    assert inner_order(gt).tolist() == [[3, 4]]  # child before parent
