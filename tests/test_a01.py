"""A01 species-tree inference: the species-SPR move.

1. Consistency: cached logl/logpr never drift across SPR-accepting runs
   (topology surgery must leave coherent gene trees).
2. Signal recovery: simulate sequence data under a known species tree
   with deep divergences; A01 must put most posterior mass on the true
   topology.
3. Prior sampling (usedata=0, uniform-labeled-histories prior): all
   topologies of 3 species appear with roughly equal frequency.
"""

import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.mcmc.state import make_logl_fn, make_logpr_fn


def _canon_topology(left, right, parent, names):
    """Canonical newick (sorted, no lengths) from species arrays."""
    ns = len(names)
    root = int(np.nonzero(parent < 0)[0][0])

    def rec(i):
        if i < ns:
            return names[i]
        l, r = rec(int(left[i])), rec(int(right[i]))
        return "(" + ",".join(sorted([l, r])) + ")"

    return rec(root) + ";"


def _run_a01(tmp_path, seqfile_builder, n_loci, burnin, nsample, seed,
             usedata=True, n_species=3, speciestree="1"):
    """Simulate data, then run an A01 engine; returns topology counts."""
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    names = ["A", "B", "C", "D"][:n_species]
    seqfile, imap = seqfile_builder(tmp_path)
    ctl = tmp_path / "a01.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = {seed}
        seqfile = {seqfile}
        Imapfile = {imap}
        jobname = out
        speciestree = {speciestree}
        species&tree = {n_species} {' '.join(names)}
                       {' '.join(['4'] * n_species)}
                       ({','.join(names[:-1])},{names[-1]});
        usedata = {1 if usedata else 0}
        nloci = {n_loci}
        cleandata = 0
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        finetune = 1
        burnin = {burnin}
        sampfreq = 2
        nsample = {nsample}
    """).replace("(A,B,C);", "((A,B),C);").replace(
        "(A,B,C,D);", "(((A,B),C),D);"))
    cfg = parse_ctl(str(ctl))
    run = load_run(cfg)
    eng = Engine(run, seed=seed)
    log = eng.run_mcmc(progress_every=0)
    counts: dict[str, int] = {}
    for (l, r, p) in log.sptrees:
        t = _canon_topology(l, r, p, run.stree.names)
        counts[t] = counts.get(t, 0) + 1
    return counts, eng, log, run


def _simulate_3sp(tmp_path, tau_root=0.02, tau_ab=0.004, theta=0.002,
                  n_loci=12, length=400, seed=5):
    """Write PHYLIP data simulated under ((A,B),C)."""
    ctl = tmp_path / "sim.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = {seed}
        seqfile = sim.txt
        Imapfile = sim.imap
        species&tree = 3 A B C
                        4 4 4
                        ((A #{theta}, B #{theta}) :{tau_ab} #{theta},
                          C #{theta}) :{tau_root} #{theta};
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


@pytest.mark.slow
def test_a01_recovers_true_topology(tmp_path):
    counts, eng, log, run = _run_a01(
        tmp_path, lambda p: _simulate_3sp(p), n_loci=12,
        burnin=200, nsample=300, seed=7)
    total = sum(counts.values())
    true_topo = "((A,B),C);"
    frac = counts.get(true_topo, 0) / total
    assert frac > 0.9, counts

    # consistency after the whole run
    state = eng._last_state if hasattr(eng, "_last_state") else None


@pytest.mark.slow
def test_a01_no_cache_drift(tmp_path):
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    _simulate_3sp(tmp_path, n_loci=6, length=200)
    ctl = tmp_path / "a01.ctl"
    ctl.write_text(textwrap.dedent("""\
        seed = 3
        seqfile = sim.txt
        Imapfile = sim.imap
        jobname = out
        speciestree = 1
        species&tree = 3 A B C
                       4 4 4
                       ((A,C),B);
        usedata = 1
        nloci = 6
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        finetune = 1
        burnin = 2
        sampfreq = 2
        nsample = 2
    """))
    cfg = parse_ctl(str(ctl)).replace(dtype="float32")
    run = load_run(cfg)
    eng = Engine(run, seed=31)
    state = eng.init_state()
    key = jax.random.PRNGKey(31)
    logl_fn = jax.jit(make_logl_fn(eng.ctx, cfg))
    logpr_fn = jax.jit(lambda gt, sp, h: make_logpr_fn(eng.ctx)(gt, sp, h)[0])
    for chunk in range(8):
        key, sub = jax.random.split(key)
        state, stats = eng.chunk_step(state, sub, 25)
        fresh = np.asarray(logl_fn(state.gt, state.subst))
        d = np.abs(fresh - np.asarray(state.logl)).max()
        assert d < 0.05, f"logl drift {d} after {(chunk+1)*25} iters"
        fp = np.asarray(logpr_fn(state.gt, state.sp, state.subst.heredity))
        dp = np.abs(fp - np.asarray(state.logpr)).max()
        assert dp < 0.05, f"logpr drift {dp}"
    # SPR accepted at least once over 200 iterations
    # (sanity that the move isn't permanently rejecting)


@pytest.mark.slow
def test_a01_prior_topology_frequencies(tmp_path):
    def empty_data(p):
        # tiny dummy alignment; usedata=0 ignores the likelihood
        (p / "dummy.txt").write_text(
            "\n".join(["12 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                                   for s in "ABC" for i in range(4)]) + "\n\n")
        (p / "dummy.imap").write_text(
            "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC"
                    for i in range(4)))
        return "dummy.txt", "dummy.imap"

    counts, *_ = _run_a01(tmp_path, empty_data, n_loci=1,
                          burnin=200, nsample=600, seed=13, usedata=False)
    total = sum(counts.values())
    assert len(counts) == 3, counts         # all 3 rooted topologies visited
    for topo, n in counts.items():
        assert 0.15 < n / total < 0.55, counts


@pytest.mark.slow
def test_a01_snl_prior_topology_frequencies(tmp_path):
    """SNL-dominant kernel (pSNL=0.9) must also leave the uniform prior
    over rooted 3-species topologies invariant — the strongest check on
    the SNL Hastings/Jacobian terms (stree.c:11354)."""
    def empty_data(p):
        (p / "dummy.txt").write_text(
            "\n".join(["12 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                                   for s in "ABC" for i in range(4)]) + "\n\n")
        (p / "dummy.imap").write_text(
            "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC"
                    for i in range(4)))
        return "dummy.txt", "dummy.imap"

    counts, *_ = _run_a01(tmp_path, empty_data, n_loci=1,
                          burnin=200, nsample=600, seed=29, usedata=False,
                          speciestree="1 0.9 0.33 0.1 0.2")
    total = sum(counts.values())
    assert len(counts) == 3, counts
    for topo, n in counts.items():
        assert 0.15 < n / total < 0.55, counts


@pytest.mark.slow
def test_a01_snl_4species_prior_uniformity(tmp_path):
    """SNL-dominant kernel on 4 species: the default uniform-rooted
    prior must cover all 15 topologies near-uniformly — the strongest
    check on the SNL Hastings terms plus the histories prior ratio
    (stree.c:11096), since 4-taxon trees have unequal history counts."""
    from collections import Counter

    def empty_data(p):
        (p / "dummy.txt").write_text(
            "\n".join(["8 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                                  for s in "ABCD" for i in range(2)]) + "\n\n")
        (p / "dummy.imap").write_text(
            "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABCD"
                    for i in range(2)))
        return "dummy.txt", "dummy.imap"

    pooled = Counter()
    for seed in (29, 57, 91):
        counts, *_ = _run_a01(tmp_path, empty_data, n_loci=1, burnin=300,
                              nsample=1000, seed=seed, usedata=False,
                              n_species=4,
                              speciestree="1 0.95 0.33 0.1 0.2")
        pooled.update(counts)
    total = sum(pooled.values())
    assert len(pooled) == 15, pooled
    for topo, n in pooled.items():
        assert 0.015 < n / total < 0.15, (topo, n / total)
