"""Per-family fast smokes: one tiny end-to-end chain per feature family
whose full statistical tests live in the slow tier (README two-tier
test policy).  Each test costs ~one step compile on a minimal config
and runs with the runtime invariant check enabled, so cache dishonesty
in any family still fails the FAST tier.
"""

import numpy as np
import pytest

from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.testing import synthetic_run


def _chain(run, n=3):
    run.cfg = run.cfg.replace(burnin=4, nsample=n, sampfreq=1,
                              check_every=5)
    eng = Engine(run, seed=5)
    log = eng.run_mcmc(progress_every=0)
    assert len(log.gen) == n
    assert np.isfinite(log.lnL).all()
    return eng, log


@pytest.mark.smoke
def test_smoke_a11_rj_and_sspr():
    """A11 exercises the rjMCMC split/join AND the species SPR/SNL in
    one compiled step (prop_rj.c + stree.c:7747)."""
    run = synthetic_run(n_loci=3, n_seq=5, n_patterns=16, n_species=3,
                        seed=4, est_delimit=True, est_stree=True,
                        delimit_prior=1)
    _chain(run)


@pytest.mark.smoke
def test_smoke_checkpoint_roundtrip(tmp_path):
    """save -> load -> restore reproduces the exact sampler state
    (dump.c/load.c analog; full byte-identical CLI resume is the slow
    tier's test_resume_byte_identical)."""
    import jax

    from bpp_tpu import checkpoint as ckpt

    run = synthetic_run(n_loci=3, n_seq=5, n_patterns=16, n_species=3,
                        seed=6)
    run.cfg = run.cfg.replace(burnin=2, nsample=2, sampfreq=1)
    eng = Engine(run, seed=6)
    state = eng.init_state()
    key = jax.random.PRNGKey(1)
    state, _ = eng.chunk_step(state, key, 5)
    p = str(tmp_path / "c.chk.npz")
    ckpt.save_checkpoint(p, state, key, 5, np.zeros((2, 2)),
                         cfg_text="x", seed=6, mcmc_offset=0)
    meta, _, arrays = ckpt.load_checkpoint(p)
    state2 = ckpt.restore_state(state, arrays)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["it"] == 5
