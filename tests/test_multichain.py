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
def test_multichain_a10_delimitation():
    """chains = K on A10 (VERDICT r4 next #8): the chain batch runs the
    rjMCMC schedule, chains start from independent random delimitations
    and the pooled tau trace carries delimitation jumps."""
    run = synthetic_run(n_loci=4, n_seq=4, n_species=3, seed=2)
    run.cfg = run.cfg.replace(dtype="float32", burnin=60, nsample=120,
                              sampfreq=1, usedata=False, est_delimit=True,
                              rjmcmc_method=0, rjmcmc_epsilon=2.0)
    eng = Engine(run, seed=7)
    logs = eng.run_mcmc_multi(3, progress_every=0)
    NS = run.stree.n_tips
    nsp_all = []
    for log in logs:
        assert len(log.gen) == 120
        tau = np.stack(log.tau)
        nsp_all.append(1 + (tau[:, NS:] > 0).sum(1))
    # prior sampling visits more than one delimitation across the batch
    assert len(np.unique(np.concatenate(nsp_all))) >= 2
    assert not np.allclose(logs[0].lnL, logs[1].lnL) or \
        not np.allclose(np.stack(logs[0].tau), np.stack(logs[1].tau))


@pytest.mark.smoke
def test_multichain_checkpoint_resume(tmp_path):
    """Checkpoint/resume of the chain batch: a run checkpointed mid-way
    and resumed reproduces the full-run sample count, with the
    pre-checkpoint history carried in the checkpoint."""
    from bpp_tpu import checkpoint as ckpt
    from bpp_tpu.mcmc.driver import SampleLog

    run = synthetic_run(n_loci=4, n_seq=4, n_species=3, seed=3)
    run.cfg = run.cfg.replace(dtype="float32", burnin=20, nsample=60,
                              sampfreq=1, checkpoint=(30, 0))
    eng = Engine(run, seed=5)
    saved = {}

    def on_ck(states, key, it, stats_acc, logs):
        path = tmp_path / "batch.chk.npz"
        ckpt.save_checkpoint_multi(path, states, key, it, stats_acc,
                                   logs, cfg_text="ctl", seed=eng.seed)
        saved["path"] = path
        saved["it"] = it

    logs_full = eng.run_mcmc_multi(2, progress_every=0,
                                   on_checkpoint=on_ck)
    assert "path" in saved and saved["it"] >= 30
    meta, ctl_text, arrays = ckpt.load_checkpoint(saved["path"])
    assert meta["multichain"] == 2 and ctl_text == "ctl"
    eng2 = Engine(run, seed=5)
    template = eng2.init_states(2)
    states = ckpt.restore_state(template, arrays)
    import jax.numpy as jnp
    key = jnp.asarray(arrays["prng_key"])
    logs0 = ckpt.restore_logs(arrays, 2, SampleLog)
    assert len(logs0[0].gen) == meta["it"]   # sampfreq 1: 1 sample/gen
    logs_res = eng2.run_mcmc_multi(
        2, progress_every=0,
        resume=(states, key, meta["it"], arrays["stats_acc"], logs0))
    for lf, lr in zip(logs_full, logs_res):
        assert len(lr.gen) == len(lf.gen) == 60
        assert lr.gen == lf.gen
    # resumed continuation equals the uninterrupted run (same PRNG path)
    np.testing.assert_allclose(
        np.stack(logs_res[0].tau), np.stack(logs_full[0].tau),
        rtol=1e-6, atol=1e-8)


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
