"""One-hot indexing helpers + the event-rank MSC stats rewrite.

XLA gathers/scatters serialize pathologically on the target TPU
backend (measured round 4: take_along_axis on [10k, 31] costs ~3 ms
while the one-hot einsum equivalent costs ~16 us), so every hot-path
index op rides one-hot contractions.  These tests pin the helpers
against numpy semantics and the event-rank T2h closed form
(coalescent.per_pop_stats) against the pairwise-coexistence oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.testing import synthetic_run
from bpp_tpu.trees.gtree import (
    assign_populations, gather_rows, lookup2d, scatter_rows, table_rows,
)


def test_scatter_rows_matches_at_set():
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.random((7, 11)))
    col = jnp.asarray(rng.integers(0, 11, 7))
    val = jnp.asarray(rng.random(7))
    ok = jnp.asarray(rng.random(7) < 0.6)
    want = np.asarray(arr).copy()
    for l in range(7):
        if ok[l]:
            want[l, int(col[l])] = float(val[l])
    got = scatter_rows(arr, ok, col, val)
    np.testing.assert_allclose(np.asarray(got), want)


def test_lookup2d_and_table_rows():
    rng = np.random.default_rng(1)
    for dtype in (np.float64, np.int32, bool):
        table = jnp.asarray(rng.integers(0, 5, (9, 9)).astype(dtype))
        i = jnp.asarray(rng.integers(0, 9, (4, 13)))
        j = jnp.asarray(rng.integers(0, 9, (4, 13)))
        got = lookup2d(table, i, j)
        want = np.asarray(table)[np.asarray(i), np.asarray(j)]
        np.testing.assert_array_equal(np.asarray(got), want)
        got_r = table_rows(table, i)
        want_r = np.asarray(table)[np.asarray(i)]
        np.testing.assert_array_equal(np.asarray(got_r), want_r)


def test_event_rank_t2h_matches_pairwise_oracle():
    """per_pop_stats (Abel event-rank form) == the pairwise form on
    random realistic states, including heterogeneous n_seq."""
    from bpp_tpu.trees import coalescent as C

    run = synthetic_run(n_loci=12, n_seq=7, n_species=4, seed=3)
    eng = Engine(run, seed=5)
    state = eng.init_state()
    gt, sp = state.gt, state.sp
    pops = assign_populations(gt, sp, eng.ctx.tip_pop)
    c1, t1, n1 = C.per_pop_stats(gt, sp, pops, eng.ctx.n_seq)
    c2, t2, n2 = C._per_pop_stats_pairwise(gt, sp, pops, eng.ctx.n_seq)
    mask = np.asarray(eng.ctx.locus_mask)
    np.testing.assert_array_equal(np.asarray(c1)[mask], np.asarray(c2)[mask])
    np.testing.assert_array_equal(np.asarray(n1)[mask], np.asarray(n2)[mask])
    np.testing.assert_allclose(np.asarray(t1)[mask], np.asarray(t2)[mask],
                               rtol=1e-4, atol=1e-8)


def test_event_rank_t2h_after_chain_steps():
    """Equality holds on states evolved by real MCMC moves (ties,
    rubber-banded ages, collapsed taus)."""
    from bpp_tpu.trees import coalescent as C

    run = synthetic_run(n_loci=6, n_seq=5, n_species=3, seed=11)
    eng = Engine(run, seed=7)
    state = eng.init_state()
    key = jax.random.PRNGKey(2)
    state, _ = eng.chunk_step(state, key, 5)
    gt, sp = state.gt, state.sp
    pops = assign_populations(gt, sp, eng.ctx.tip_pop)
    _, t1, _ = C.per_pop_stats(gt, sp, pops, eng.ctx.n_seq)
    _, t2, _ = C._per_pop_stats_pairwise(gt, sp, pops, eng.ctx.n_seq)
    mask = np.asarray(eng.ctx.locus_mask)
    np.testing.assert_allclose(np.asarray(t1)[mask], np.asarray(t2)[mask],
                               rtol=1e-4, atol=1e-8)
