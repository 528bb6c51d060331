"""Geneflow rjMCMC (migration-route add/remove/flip) tests.

Reference: stree_migration_rj stree.c:15419, flip wrapper :15204,
dispatched method.c:5658-5695.  The TPU build re-expresses the
dimension jump as activation toggles on a saturated candidate-route
table (Carlin & Chib pseudo-prior = prior, matching the reference's
prior-matched rate draw, stree.c:14229-14233).

Oracle: with usedata = 0 the chain samples the PRIOR over migration
models, which is uniform over route sets — for 2 species the four
models {}, {A->B}, {B->A}, {A->B, B->A} must each get ~1/4 occupancy
(this is exactly the reference's own geneflow validation: its
model_count debug tally, method.c:5663-5684).
"""

import jax
import numpy as np
import pytest

from bpp_tpu.io.ctl import parse_ctl_lines
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine

CTL = """
seed = 9
seqfile = {seq}
Imapfile = {imap}
jobname = out
species&tree = 2 A B
               4 4
               (A, B);
usedata = 0
nloci = 2
thetaprior = invgamma 3 0.01
tauprior = invgamma 3 0.02
wprior = 2 10
geneflow = 1
finetune = 1
burnin = 500
sampfreq = 2
nsample = 500
"""


def _write_data(tmp_path):
    seq = tmp_path / "d.txt"
    seq.write_text("\n\n".join(
        "8 24\n" + "\n".join(
            f"{s}^{s.lower()}{i}  " + "ACGTACGTACGTACGTACGTACGT"
            for s in "AB" for i in range(4))
        for _ in range(2)) + "\n")
    imap = tmp_path / "d.imap"
    imap.write_text("".join(f"{s.lower()}{i}\t{s}\n"
                            for s in "AB" for i in range(4)))
    return seq, imap


@pytest.mark.smoke
def test_geneflow_saturated_table(tmp_path):
    seq, imap = _write_data(tmp_path)
    cfg = parse_ctl_lines(
        CTL.format(seq=seq, imap=imap).strip().splitlines())
    assert cfg.geneflow and cfg.migration
    eng = Engine(load_run(cfg), seed=3)
    # 2 species: exactly the two tip-pair routes, both starting off
    assert eng.routes.n_routes == 2
    st = eng.init_state()
    assert st.mig.on is not None
    assert not bool(np.asarray(st.mig.on).any())


@pytest.mark.slow
def test_geneflow_prior_model_occupancy(tmp_path):
    """usedata=0: route-set occupancy must be uniform over the 4
    models (the prior).  The on-device trace records every iteration
    (mig.on rides the migM trace: inactive routes log 0), so the whole
    12000-iteration chain costs 6 dispatches and the gate tightens to
    +-0.10 around the exact 0.25 (VERDICT r2 weak #4: the old
    0.08-0.50 band would have passed a 2x systematic bias)."""
    seq, imap = _write_data(tmp_path)
    cfg = parse_ctl_lines(
        CTL.format(seq=seq, imap=imap).strip().splitlines())
    eng = Engine(load_run(cfg), seed=3)
    state = eng.init_state()
    key = jax.random.PRNGKey(3)
    state, _ = eng.chunk_step(state, key, 400)
    counts = np.zeros(4)
    for i in range(6):
        key, sub = jax.random.split(key)
        state, _, trace = eng.chunk_step_traced(state, sub, 2000)
        on = np.asarray(trace["migM"]) > 0.0            # [n, 2]
        idx = on[:, 0].astype(int) + 2 * on[:, 1].astype(int)
        counts += np.bincount(idx, minlength=4)
    freq = counts / counts.sum()
    assert (np.abs(freq - 0.25) <= 0.10).all(), freq


@pytest.mark.slow
def test_geneflow_with_data_smoke(tmp_path):
    seq, imap = _write_data(tmp_path)
    ctl = CTL.format(seq=seq, imap=imap).replace(
        "usedata = 0", "usedata = 1")
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=5)
    state = eng.init_state()
    key = jax.random.PRNGKey(5)
    state, stats = eng.chunk_step(state, key, 60)
    assert np.isfinite(float(np.asarray(state.logl).sum()))
    assert np.isfinite(float(np.asarray(state.logpr).sum()))
    # cache honesty through rj toggles
    from bpp_tpu.mcmc.mig_moves import make_logpr_fn_mig
    lp, *_ = make_logpr_fn_mig(eng.ctx, eng.routes)(
        state.gt, state.sp, state.mig, state.subst.heredity)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(state.logpr),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_geneflow_mcmc_output_zeroes_inactive_routes(tmp_path):
    """The mcmc.txt W columns must log 0 for inactive candidate routes
    (their M slot holds a Carlin-Chib pseudo-prior draw, not a
    posterior rate).  Regression: the CLI's legacy per-sample path once
    wrote raw M, which poisoned P(route on) and E[W | on] estimates
    read off the trace."""
    import subprocess
    import sys

    seq, imap = _write_data(tmp_path)
    ctl = tmp_path / "gf.ctl"
    ctl.write_text(CTL.format(seq=seq, imap=imap).replace(
        "burnin = 500", "burnin = 50").replace("nsample = 500",
                                               "nsample = 150"))
    r = subprocess.run(
        [sys.executable, "-m", "bpp_tpu", "--cfile", str(ctl), "--cpu"],
        cwd=tmp_path, capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    rows = (tmp_path / "out.mcmc.txt").read_text().strip().splitlines()
    hdr = rows[0].split("\t")
    wcols = [i for i, h in enumerate(hdr) if h.startswith("W:")]
    assert len(wcols) == 2
    vals = np.array([[float(r.split("\t")[i]) for i in wcols]
                     for r in rows[1:]])
    # prior occupancy is 1/4 per model: plenty of off samples expected
    assert (vals == 0).any(), "no zero W samples: inactive routes not zeroed"
    assert (vals > 0).any()


@pytest.mark.slow
def test_geneflow_conditional_matches_fixed_route(tmp_path):
    """rj conditional posteriors == fixed-route posteriors (in-house
    version of the reference cross-check, VALIDATION.md round 4): the
    chain's samples restricted to the all-on model must match a run
    with both routes permanently on — same data, same priors.  The
    full 4-model reference-binary comparison lives in
    scripts/geneflow_xcheck.py + VALIDATION.md."""
    from bpp_tpu.sim.simulate import run_simulation

    sim = f"""\
seed = 77
seqfile = {tmp_path}/gf.phy
treefile = {tmp_path}/gf.tre
Imapfile = {tmp_path}/Imap.txt
species&tree = 2 A B
                 4 4
                (A #0.01, B #0.01) :0.015 #0.02;
migration = 1
  A B 1.5
loci&length = 12 300
model = 0
"""
    (tmp_path / "sim.ctl").write_text(sim)
    run_simulation(str(tmp_path / "sim.ctl"))
    base = f"""\
seed = 101
seqfile = {tmp_path}/gf.phy
Imapfile = {tmp_path}/Imap.txt
jobname = {tmp_path}/out
species&tree = 2 A B
                 4 4
                (A, B);
usedata = 1
nloci = 12
thetaprior = invgamma 3 0.03
tauprior = invgamma 3 0.03
wprior = 2 2
finetune = 1
burnin = 1500
sampfreq = 1
nsample = 9000
"""
    rj_ctl = base + "geneflow = 1\nmigration = 2\n  A B\n  B A\n"
    fx_ctl = base + "migration = 2\n  A B\n  B A\n"
    cfg_rj = parse_ctl_lines(rj_ctl.strip().splitlines())
    cfg_fx = parse_ctl_lines(fx_ctl.strip().splitlines())
    eng1 = Engine(load_run(cfg_rj), seed=19)
    log1 = eng1.run_mcmc(progress_every=0)
    eng2 = Engine(load_run(cfg_fx), seed=29)
    log2 = eng2.run_mcmc(progress_every=0)
    M1 = np.stack(log1.migM)
    sel = (M1 > 0).all(1)
    assert sel.sum() > 500, sel.sum()          # all-on occupancy
    th1 = np.stack(log1.theta)[sel]
    th2 = np.stack(log2.theta)

    def se(x, nb=16):
        n = len(x) // nb * nb
        return x[:n].reshape(nb, -1).mean(1).std(ddof=1) / np.sqrt(nb)

    for j in range(3):
        tol = 4 * np.hypot(se(th1[:, j]), se(th2[:, j])) \
            + 0.08 * abs(th2[:, j].mean())
        assert abs(th1[:, j].mean() - th2[:, j].mean()) < tol, \
            (j, th1[:, j].mean(), th2[:, j].mean(), tol)
