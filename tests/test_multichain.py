"""Multi-chain batching (``chains = K``): vmapped replicate chains.

OUR extension — the reference runs a single chain (method.c:5343);
batching K chains on the chain axis is the TPU-native way to use the
chip's slack on small-to-mid locus counts.  Chains must be independent
(different PRNG streams), reproducible, and the split-R-hat report must
flag disagreeing chains.
"""

import jax
import numpy as np
import pytest

from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.summary.allfixed import split_rhat
from bpp_tpu.testing import synthetic_run


def test_split_rhat_calibration():
    rng = np.random.default_rng(0)
    same = rng.normal(0.0, 1.0, (4, 2000))
    assert abs(split_rhat(same) - 1.0) < 0.01
    shifted = same + np.arange(4)[:, None] * 3.0
    assert split_rhat(shifted) > 1.5
    assert split_rhat(np.ones((3, 100))) == 1.0


def test_ctl_chains_keyword(tmp_path):
    from bpp_tpu.io.ctl import parse_ctl_lines
    cfg = parse_ctl_lines([
        "seed = 1", "seqfile = x.phy", "jobname = j",
        "species&tree = 1 A", "3", "A", "nloci = 1",
        "thetaprior = 3 0.02", "burnin = 10", "nsample = 20",
        "chains = 4",
    ])
    assert cfg.n_chains == 4


@pytest.mark.smoke
def test_multichain_runs_and_chains_differ():
    run = synthetic_run(n_loci=6, n_seq=5, n_species=3, seed=1)
    run.cfg = run.cfg.replace(dtype="float32", burnin=24, nsample=30,
                              sampfreq=1)
    eng = Engine(run, seed=11)
    logs = eng.run_mcmc_multi(3, progress_every=0)
    assert len(logs) == 3
    for log in logs:
        assert len(log.gen) == 30
        assert np.isfinite(log.lnL).all()
    # independent PRNG streams: chains must not be identical
    assert not np.allclose(logs[0].lnL, logs[1].lnL)
    # trace columns shaped like the single-chain log
    assert np.stack(logs[0].theta).shape[1] == eng.run.stree.n_nodes
