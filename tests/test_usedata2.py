"""usedata = 2 — fixed gene trees (cfile.c:3127-3135
``opt_usedata_fix_gtree``; move gating method.c:5490-5600; A00-only
guard method.c:3279).

The mode freezes gene trees (and taus) at their MSC-prior
initialization and turns off the sequence likelihood; only the
theta (and migration-rate) samplers run.  That makes the theta
posterior EXACTLY conjugate — with thetaprior = invgamma(a, b),

  theta_h | G  ~  InvGamma(a + K_h, b + C_h)

with K_h / C_h the frozen per-population coalescent counts /
waiting-time sums — which is the sharpest possible validation of the
theta Gibbs conditional (the reference uses the mode for exactly
this, hence "the standard method-validation tool", VERDICT r4 #2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.io.ctl import parse_ctl_lines
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine

CTL = """
seed = 7
seqfile = /root/reference/examples/frogs/frogs.txt
Imapfile = /root/reference/examples/frogs/frogs.Imap.txt
jobname = out
species&tree = 4 K C L H
                9 7 14 2
               (((K, C), L), H);
usedata = 2
nloci = 5
cleandata = 0
thetaprior = invgamma 3 0.002
tauprior = invgamma 3 0.03
finetune = 1
burnin = 200
sampfreq = 1
nsample = 2000
"""


def test_parse_usedata_values():
    cfg = parse_ctl_lines(CTL.strip().splitlines())
    assert cfg.usedata is False and cfg.usedata_fix_gtree is True
    cfg1 = parse_ctl_lines(
        CTL.replace("usedata = 2", "usedata = 1").strip().splitlines())
    assert cfg1.usedata is True and cfg1.usedata_fix_gtree is False
    cfg0 = parse_ctl_lines(
        CTL.replace("usedata = 2", "usedata = 0").strip().splitlines())
    assert cfg0.usedata is False and cfg0.usedata_fix_gtree is False
    with pytest.raises(ValueError):
        parse_ctl_lines(
            CTL.replace("usedata = 2", "usedata = 3").strip().splitlines())


def test_guard_a00_only():
    ctl = CTL + "speciesdelimitation = 1 1 2 1\n"
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    with pytest.raises(NotImplementedError, match="usedata = 2"):
        Engine(load_run(cfg), seed=1)


@pytest.mark.slow
def test_fixed_gtrees_conjugate_theta_posterior():
    cfg = parse_ctl_lines(CTL.strip().splitlines())
    run = load_run(cfg)
    eng = Engine(run, seed=3)
    state = eng.init_state()
    age0 = np.asarray(state.gt.age).copy()
    par0 = np.asarray(state.gt.parent).copy()
    tau0 = np.asarray(state.sp.tau).copy()
    # frozen per-population coalescent stats (the coal/t2h state cache
    # only exists on the theta-integrated path)
    from bpp_tpu.trees import coalescent as coalmod
    from bpp_tpu.trees.gtree import assign_populations
    pops = assign_populations(state.gt, state.sp,
                              jnp.asarray(run.batch.tip_pop))
    c0, t0, _ = coalmod.per_pop_stats(state.gt, state.sp, pops,
                                      jnp.asarray(run.batch.n_seq))
    mask = np.asarray(run.batch.locus_mask)[:, None]
    coal0 = np.asarray(c0) * mask
    t2h0 = np.asarray(t0) * mask

    key = jax.random.PRNGKey(11)
    state, _ = eng.chunk_step(state, key, 200)
    thetas = []
    for i in range(400):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 5)
        thetas.append(np.asarray(state.sp.theta))
    thetas = np.asarray(thetas)                       # [M, H]

    # the frozen state really is frozen
    np.testing.assert_array_equal(np.asarray(state.gt.age), age0)
    np.testing.assert_array_equal(np.asarray(state.gt.parent), par0)
    np.testing.assert_array_equal(np.asarray(state.sp.tau), tau0)
    assert float(np.abs(np.asarray(state.logl)).max()) == 0.0

    # exact conjugate marginal: InvGamma(a + K_h, b + C_h)
    a, b = cfg.thetaprior.alpha, cfg.thetaprior.beta
    K = coal0.sum(axis=0)                             # [H]
    C = t2h0.sum(axis=0)
    H = run.stree.n_nodes
    for h in range(H):
        want_mean = (b + C[h]) / (a + K[h] - 1.0)
        want_sd = want_mean / np.sqrt(a + K[h] - 2.0)
        got = thetas[:, h]
        # 2000 correlated-ish draws; Gibbs here is nearly iid so the
        # MC error of the mean is ~sd/sqrt(M)
        assert abs(got.mean() - want_mean) < 5.0 * want_sd / np.sqrt(200), (
            h, got.mean(), want_mean)
        assert abs(got.std() / want_sd - 1.0) < 0.25, (h, got.std(), want_sd)


@pytest.mark.slow
def test_fixed_gtrees_conjugate_migration_rates(tmp_path):
    """usedata = 2 x MSC-M (the reference supports the combination —
    method.c:2786 even special-cases spec->M under fix_gtree): with
    gene trees frozen EVENT-FREE (init state; the sim-SPR that creates
    events is disabled), the migration-rate posterior is exactly
    conjugate, W_k ~ Gamma(alpha, beta + sum_l W_lk) with W_lk the
    frozen lineage-time overlaps."""
    import textwrap

    (tmp_path / "d.txt").write_text(
        "\n".join(["8 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                              for s in "AB" for i in range(4)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "AB" for i in range(4)))
    ctl = textwrap.dedent(f"""\
        seed = 7
        seqfile = {tmp_path / 'd.txt'}
        Imapfile = {tmp_path / 'd.imap'}
        jobname = {tmp_path}/out
        species&tree = 2 A B
                        4 4
                       (A, B);
        usedata = 2
        nloci = 6
        thetaprior = invgamma 3 0.008
        tauprior = invgamma 3 0.04
        migration = 2
        A B
        B A
        wprior = 2 5
        finetune = 1
        burnin = 100
        sampfreq = 1
        nsample = 1500
    """)
    cfg = parse_ctl_lines(ctl.splitlines())
    run = load_run(cfg)
    eng = Engine(run, seed=3)
    state = eng.init_state()
    assert int(np.asarray(state.mig.count()).sum()) == 0  # event-free
    from bpp_tpu.mcmc.mig_moves import make_logpr_fn_mig
    logpr_fn = make_logpr_fn_mig(eng.ctx, eng.routes)
    _, _, _, W0, mc0, _ = logpr_fn(state.gt, state.sp, state.mig,
                                   state.subst.heredity)
    mask = np.asarray(run.batch.locus_mask)
    Wsum = (np.asarray(W0) * mask[:, None]).sum(0)       # [K]
    assert (np.asarray(mc0) == 0).all()

    key = jax.random.PRNGKey(5)
    state, _ = eng.chunk_step(state, key, 100)
    Ws = []
    for _ in range(300):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 5)
        Ws.append(np.asarray(state.mig.M))
    Ws = np.asarray(Ws)                                   # [M, K]
    # frozen gene trees: W stats must not have moved
    _, _, _, W1, mc1, _ = logpr_fn(state.gt, state.sp, state.mig,
                                   state.subst.heredity)
    np.testing.assert_allclose(
        (np.asarray(W1) * mask[:, None]).sum(0), Wsum, rtol=1e-9)
    a, b = 2.0, 5.0
    for k in range(2):
        want_mean = a / (b + Wsum[k])
        want_sd = np.sqrt(a) / (b + Wsum[k])
        got = Ws[:, k]
        assert abs(got.mean() - want_mean) < 5 * want_sd / np.sqrt(100), (
            k, got.mean(), want_mean)
        assert abs(got.std() / want_sd - 1.0) < 0.3, (k, got.std(), want_sd)


@pytest.mark.smoke
def test_cli_usedata2_runs(tmp_path):
    import subprocess
    import sys
    ctl = tmp_path / "run.ctl"
    ctl.write_text(CTL.replace("jobname = out",
                               f"jobname = {tmp_path}/out")
                   .replace("nsample = 2000", "nsample = 50")
                   .replace("burnin = 200", "burnin = 20"))
    r = subprocess.run(
        [sys.executable, "-m", "bpp_tpu", "--cfile", str(ctl), "--quiet"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    mcmc = (tmp_path / "out.mcmc.txt").read_text().strip().splitlines()
    assert len(mcmc) == 51  # header + samples
    # lnL column absent or zero under usedata = 2 (likelihood off)
    hdr = mcmc[0].split("\t")
    if "lnL" in hdr:
        col = hdr.index("lnL")
        vals = {float(ln.split("\t")[col]) for ln in mcmc[1:]}
        assert vals == {0.0}
