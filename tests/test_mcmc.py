import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.loader import load_run_from_ctl
from bpp_tpu.mcmc.driver import Engine

EX = "/root/reference/examples"


def validate_gtrees(state, ctx):
    """Structural invariants of the batched gene trees."""
    gt = state.gt
    left = np.asarray(gt.left)
    right = np.asarray(gt.right)
    parent = np.asarray(gt.parent)
    age = np.asarray(gt.age)
    n_seq = np.asarray(ctx.n_seq)
    mask = np.asarray(ctx.locus_mask)
    L, N = left.shape
    T = (N + 1) // 2
    for li in range(L):
        if not mask[li]:
            continue
        n = n_seq[li]
        valid = list(range(n)) + list(range(T, T + n - 1))
        roots = [u for u in valid if parent[li, u] == -1]
        assert len(roots) == 1, f"locus {li}: roots={roots}"
        for u in valid:
            p = parent[li, u]
            if p != -1:
                assert p in valid, (li, u, p)
                assert u in (left[li, p], right[li, p]), (li, u, p)
                assert age[li, p] > age[li, u], (li, u, p, age[li, p], age[li, u])
        for u in range(T, T + n - 1):
            lc, rc = left[li, u], right[li, u]
            assert parent[li, lc] == u and parent[li, rc] == u, (li, u)
        # connectivity: all valid nodes reachable from root
        seen = set()
        stack = [roots[0]]
        while stack:
            u = stack.pop()
            seen.add(u)
            if u >= T:
                stack.extend([left[li, u], right[li, u]])
        assert seen == set(valid), (li, sorted(seen), valid)


def check_caches(eng, state, tol=1e-8):
    ll = eng._logl_fn(state.gt, state.subst)
    lp, _, _ = eng._logpr_fn(state.gt, state.sp, state.subst.heredity)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(state.logl), atol=tol)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(state.logpr), atol=tol)


@pytest.fixture(scope="module")
def frogs_engine():
    run = load_run_from_ctl(f"{EX}/frogs/A00.bpp.ctl")
    run.cfg = run.cfg.replace(dtype="float64")
    return Engine(run, seed=11)


def test_frogs_init(frogs_engine):
    eng = frogs_engine
    state = eng.init_state()
    assert np.isfinite(np.asarray(state.logl)).all()
    assert np.isfinite(np.asarray(state.logpr)).all()
    validate_gtrees(state, eng.ctx)
    # species tree: 4 tips, 3 inner with decreasing-from-root taus
    tau = np.asarray(state.sp.tau)
    assert (tau[:4] == 0).all() and (tau[4:] > 0).all()


def test_frogs_mcmc_invariants(frogs_engine):
    eng = frogs_engine
    state = eng.init_state()
    key = jax.random.PRNGKey(3)
    for it in range(5):
        key, sub = jax.random.split(key)
        state, stats = eng.step(state, sub)
    validate_gtrees(state, eng.ctx)
    check_caches(eng, state)
    s = np.asarray(stats)
    # age + spr moves proposed on every locus
    assert s[0, 0] > 0 and s[1, 0] > 0
    # theta move proposes for all 7 populations; tau for 3 inner nodes
    assert s[2, 0] == 7
    assert s[3, 0] == 3


def test_frogs_moves_mix(frogs_engine):
    """After some iterations every move family should have accepted > 0."""
    eng = frogs_engine
    state = eng.init_state()
    key = jax.random.PRNGKey(5)
    from bpp_tpu.mcmc.state import N_MOVES
    tot = np.zeros((N_MOVES, 2))
    for it in range(30):
        key, sub = jax.random.split(key)
        state, stats = eng.step(state, sub)
        tot += np.asarray(stats)
    validate_gtrees(state, eng.ctx)
    check_caches(eng, state)
    assert tot[0, 1] > 0, "no age accepts"
    assert tot[1, 1] > 0, "no SPR accepts"
    assert tot[2, 1] > 0, "no theta accepts"
    assert tot[3, 1] > 0, "no tau accepts"
    # logl should be sane
    assert np.isfinite(float(state.logl.sum()))
