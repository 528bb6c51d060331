"""Heredity x migration vs an EXACT posterior (the round-4 referee).

The ancestral-theta discrepancy between this framework and the
reference under heredity x migration (VALIDATION.md round 3) is
settled by a closed-form oracle: 2 species, one A->B route, 2
sequences per locus, per-locus heredity scalars — the pairwise
coalescent-time density is analytic and the exact posterior follows by
4-D Gauss-Legendre quadrature (scripts/hm_oracle.py).

Oracle posterior means (nq=36, nt=600; stable to <0.3% vs nq=24):
  theta_A 0.020072 | theta_AB 0.016726 | tau 0.018986 | W 0.985400

Head-to-head on this dataset (50000 samples each, 2026-08-20):
  ours       theta_AB 0.01666, tau 0.01903  -> matches the oracle
  reference  theta_AB 0.02048, tau 0.01739  -> 22% off on theta_AB
confirming the round-3 attribution of the heredity x IM divergence to
the reference (whose own prior chain also crashes there,
gtree.c:4720).  This test pins OUR sampler to the oracle with gates
far tighter than the reference's error.
"""

import numpy as np
import pytest

ORACLE = {"theta_A": 0.020072, "theta_AB": 0.016726,
          "tau": 0.018986, "W": 0.985400}
REF_THETA_AB = 0.02048      # the reference's (wrong) value, for margin


@pytest.mark.slow
def test_heredity_migration_matches_exact_posterior(tmp_path):
    import jax

    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine
    from bpp_tpu.testing import generate_hm_oracle_case

    generate_hm_oracle_case(str(tmp_path))
    ctl = f"""
seed = 101
seqfile = {tmp_path}/hm.phy
Imapfile = {tmp_path}/Imap.txt
jobname = {tmp_path}/hm
species&tree = 2 A B
                 1 1
                (A, B);
usedata = 1
nloci = 8
cleandata = 0
model = 0
heredity = 2 {tmp_path}/heredity.txt
migration = 1
  A B
wprior = 2 2
thetaprior = 3 0.04
tauprior = 3 0.04
finetune = 1
print = 1 0 0 0
burnin = 2000
sampfreq = 1
nsample = 12000
"""
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=31)
    log = eng.run_mcmc(progress_every=0)
    theta = np.stack(log.theta)
    tau = np.stack(log.tau)
    # node order: 0=A, 1=B, 2=AB root
    got = {"theta_A": theta[:, 0].mean(), "theta_AB": theta[:, 2].mean(),
           "tau": tau[:, 2].mean()}
    # MC error at 12000 correlated samples is ~0.0004 on theta_AB;
    # the reference's error is 0.0038 — gates at 0.0012 separate them
    # decisively while leaving 3x seed-to-seed headroom
    assert abs(got["theta_A"] - ORACLE["theta_A"]) < 0.0015, got
    assert abs(got["theta_AB"] - ORACLE["theta_AB"]) < 0.0012, got
    assert abs(got["tau"] - ORACLE["tau"]) < 0.0012, got
    # the gate must exclude the reference's value
    assert abs(got["theta_AB"] - REF_THETA_AB) > 0.0012, got
    # theta_B is data-free in this design: posterior == prior
    # (invgamma(3, 0.04) mean 0.02) — a built-in control
    assert abs(theta[:, 1].mean() - 0.02) < 0.0020, theta[:, 1].mean()
