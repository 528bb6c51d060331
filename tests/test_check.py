"""Runtime invariant mode (``check = N`` / ``--check N``).

The user-visible analog of the reference's compile-time
CHECK_LOGL/CHECK_LOGPR full recomputation (method.c:4699 check_logl,
debug.c:1688 debug_validate_logpg): every N iterations the cached
per-locus logl/logpr (and the notheta coal/T2h caches) are re-derived
from scratch through the independent full path and drift hard-fails.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.config import Prior, PriorDist
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.testing import synthetic_run


@pytest.mark.smoke
def test_check_passes_on_consistent_chain():
    run = synthetic_run(n_loci=4, n_seq=6, n_patterns=16, n_species=3,
                        seed=2, check_every=5)
    run.cfg = run.cfg.replace(burnin=4, nsample=3, sampfreq=2)
    eng = Engine(run, seed=1)
    log = eng.run_mcmc(progress_every=0)      # raises on drift
    assert len(log.gen) == 3


@pytest.mark.smoke
def test_check_catches_corrupted_logl():
    run = synthetic_run(n_loci=4, n_seq=6, n_patterns=16, n_species=3,
                        seed=2)
    eng = Engine(run, seed=1)
    state = eng.init_state()
    eng.validate_state(state)                 # consistent at init
    bad = state._replace(logl=state.logl + 10.0)
    with pytest.raises(RuntimeError, match="logl drifted"):
        eng.validate_state(bad, it=7)


@pytest.mark.smoke
def test_check_catches_corrupted_logpr_and_notheta_caches():
    run = synthetic_run(n_loci=4, n_seq=6, n_patterns=16, n_species=3,
                        seed=3, theta_integrated=True)
    run.cfg = run.cfg.replace(
        thetaprior=Prior(PriorDist.INVGAMMA, 3.0, 0.02))
    eng = Engine(run, seed=1)
    state = eng.init_state()
    eng.validate_state(state)
    with pytest.raises(RuntimeError, match="K cache"):
        eng.validate_state(state._replace(coal=state.coal + 1))
    with pytest.raises(RuntimeError, match="C cache"):
        eng.validate_state(state._replace(t2h=state.t2h + 5.0))


def test_check_ctl_keyword_parses():
    from bpp_tpu.io.ctl import parse_ctl_lines
    cfg = parse_ctl_lines([
        "seed = 1", "seqfile = x.phy", "jobname = out",
        "species&tree = 1 A", "          8", "usedata = 1", "nloci = 1",
        "thetaprior = 3 0.03", "check = 50 0.25",
    ])
    assert cfg.check_every == 50
    assert cfg.check_tol == 0.25
