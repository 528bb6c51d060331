"""A10 rjMCMC species delimitation.

1. Prior sampling (usedata=0, speciesmodelprior=1): the three up-closed
   delimitations of a 3-species guide tree must be ~equally probable.
2. Signal: clearly diverged simulated data -> high P(3 species);
   panmictic data (one population relabeled into 3) -> collapsed models
   dominate.
3. Consistency under split/join: cached logl/logpr never drift.
"""

import textwrap

import jax
import numpy as np

from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.mcmc.state import make_logl_fn, make_logpr_fn
from bpp_tpu.summary.delimit_summary import n_species, summarize_delimitations


def _write_ctl(tmp_path, seqfile, imap, usedata, nloci, burnin, nsample,
               seed, guide="((A,B),C)"):
    ctl = tmp_path / "a10.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = {seed}
        seqfile = {seqfile}
        Imapfile = {imap}
        jobname = out
        speciesdelimitation = 1 0 2
        species&tree = 3 A B C
                       4 4 4
                       {guide};
        usedata = {1 if usedata else 0}
        nloci = {nloci}
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        finetune = 1
        burnin = {burnin}
        sampfreq = 2
        nsample = {nsample}
    """))
    return str(ctl)


def _run(tmp_path, ctl, seed):
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    cfg = parse_ctl(ctl)
    run = load_run(cfg)
    eng = Engine(run, seed=seed)
    log = eng.run_mcmc(progress_every=0)
    return eng, log, run


def _sim(tmp_path, tau_ab, tau_root, n_loci=8, length=300, seed=5):
    ctl = tmp_path / "sim.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = {seed}
        seqfile = sim.txt
        Imapfile = sim.imap
        species&tree = 3 A B C
                        4 4 4
                        ((A #0.002, B #0.002) :{tau_ab} #0.002,
                          C #0.002) :{tau_root} #0.002;
        loci&length = {n_loci} {length}
        model = 0
    """))
    import os

    from bpp_tpu.sim.simulate import run_simulation
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_simulation(str(ctl))
    finally:
        os.chdir(cwd)
    return "sim.txt", "sim.imap"


def test_a10_prior_delimitation_frequencies(tmp_path):
    (tmp_path / "d.txt").write_text(
        "\n".join(["12 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                               for s in "ABC" for i in range(4)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC" for i in range(4)))
    ctl = _write_ctl(tmp_path, "d.txt", "d.imap", usedata=False, nloci=1,
                     burnin=300, nsample=800, seed=17)
    eng, log, run = _run(tmp_path, ctl, 17)
    models, nsp = summarize_delimitations(np.stack(log.tau), run.stree)
    total = sum(nsp.values())
    assert set(nsp) == {1, 2, 3}, nsp
    for k in (1, 2, 3):
        assert 0.15 < nsp[k] / total < 0.55, nsp


def test_a10_detects_distinct_species(tmp_path):
    _sim(tmp_path, tau_ab=0.008, tau_root=0.02)
    ctl = _write_ctl(tmp_path, "sim.txt", "sim.imap", usedata=True, nloci=8,
                     burnin=150, nsample=200, seed=23)
    eng, log, run = _run(tmp_path, ctl, 23)
    models, nsp = summarize_delimitations(np.stack(log.tau), run.stree)
    total = sum(nsp.values())
    assert nsp.get(3, 0) / total > 0.85, nsp


def test_a10_collapses_panmictic_data(tmp_path):
    # one population: negligible divergence between "species"
    _sim(tmp_path, tau_ab=1e-6, tau_root=2e-6, n_loci=8, seed=9)
    ctl = _write_ctl(tmp_path, "sim.txt", "sim.imap", usedata=True, nloci=8,
                     burnin=150, nsample=200, seed=29)
    eng, log, run = _run(tmp_path, ctl, 29)
    models, nsp = summarize_delimitations(np.stack(log.tau), run.stree)
    total = sum(nsp.values())
    assert nsp.get(3, 0) / total < 0.5, nsp


def test_a10_no_cache_drift(tmp_path):
    _sim(tmp_path, tau_ab=0.004, tau_root=0.01, n_loci=4, length=200)
    ctl = _write_ctl(tmp_path, "sim.txt", "sim.imap", usedata=True, nloci=4,
                     burnin=2, nsample=2, seed=31)
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    cfg = parse_ctl(ctl).replace(dtype="float32")
    run = load_run(cfg)
    eng = Engine(run, seed=31)
    state = eng.init_state()
    key = jax.random.PRNGKey(31)
    logl_fn = jax.jit(make_logl_fn(eng.ctx, cfg))
    logpr_fn = jax.jit(lambda gt, sp, h: make_logpr_fn(eng.ctx)(gt, sp, h)[0])
    for chunk in range(6):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, 25)
        fresh = np.asarray(logl_fn(state.gt, state.subst))
        d = np.abs(fresh - np.asarray(state.logl)).max()
        assert d < 0.05, f"logl drift {d}"
        fp = np.asarray(logpr_fn(state.gt, state.sp, state.subst.heredity))
        dp = np.abs(fp - np.asarray(state.logpr)).max()
        assert dp < 0.05, f"logpr drift {dp}"
