"""Simulator statistical validation + summary-stat unit tests.

The simulator check mirrors the reference's test/anna strategy
(test/anna/testProgram.R): simulate many single-population gene trees
and compare empirical coalescent-time means against closed-form MSC
expectations (E[T_k->k-1] = theta / (k(k-1))).
"""

import subprocess
import sys
import textwrap

import numpy as np
import pytest


def test_simulator_coalescent_time_means(tmp_path):
    theta = 0.04
    ctl = tmp_path / "sim.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = 7
        seqfile = sim.txt
        treefile = sim_trees.txt
        species&tree = 1 A
                        3
                        A #{theta};
        loci&length = 2000 10
        model = 0
    """))
    from bpp_tpu.sim.simulate import run_simulation
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_simulation(str(ctl))
    finally:
        os.chdir(cwd)

    # parse gene-tree node ages from the newick output
    from bpp_tpu.io.newick import parse_newick
    t_first, t_second = [], []
    for line in (tmp_path / "sim_trees.txt").read_text().splitlines():
        root = parse_newick(line)
        # node age = distance from any leaf below it
        ages = []

        def depth_below(n):
            d = 0.0
            while n.children:
                d += n.children[0].length
                n = n.children[0]
            return d

        inner = [n for n in root.walk() if n.children]
        ages = sorted(depth_below(n) for n in inner)
        t_first.append(ages[0])
        t_second.append(ages[1])

    t_first = np.asarray(t_first)
    t_second = np.asarray(t_second)
    e1 = theta / 6  # 3 lineages: rate 3*2/theta
    e2 = e1 + theta / 2  # then 2 lineages: rate 2/theta
    assert abs(t_first.mean() - e1) < 4 * t_first.std() / np.sqrt(len(t_first))
    assert abs(t_second.mean() - e2) < 4 * t_second.std() / np.sqrt(len(t_second))


def test_simulator_jc69_site_divergence(tmp_path):
    """Observed p-distance between two tips matches JC69 expectation."""
    import os
    ctl = tmp_path / "sim.ctl"
    # two species, one sequence each, deep split -> known divergence 2*tau
    tau, theta = 0.05, 1e-6
    ctl.write_text(textwrap.dedent(f"""\
        seed = 11
        seqfile = sim.txt
        Imapfile = sim.imap
        species&tree = 2 A B
                        1 1
                        (A #{theta}, B #{theta}) #{theta} :{tau};
        loci&length = 40 500
        model = 0
    """))
    from bpp_tpu.sim.simulate import run_simulation
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_simulation(str(ctl))
    finally:
        os.chdir(cwd)
    from bpp_tpu.io.phylip import parse_phylip
    loci = parse_phylip(str(tmp_path / "sim.txt"))
    diffs, total = 0, 0
    for msa in loci:
        a, b = msa.sequences
        diffs += sum(x != y for x, y in zip(a, b))
        total += len(a)
    p = diffs / total
    d = 2 * tau  # expected substitutions per site between the two tips
    p_expected = 0.75 * (1 - np.exp(-4.0 / 3.0 * d))
    assert abs(p - p_expected) < 0.015, (p, p_expected)


def test_hpd_and_ess():
    from bpp_tpu.summary.allfixed import eff_ict, hpd_interval

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 20000)
    lo, hi = hpd_interval(x)
    assert abs(lo + 1.96) < 0.1 and abs(hi - 1.96) < 0.1
    tint, rho1 = eff_ict(x)
    assert 0.5 < tint < 2.0 and abs(rho1) < 0.05

    # AR(1) with rho=0.9 -> tint ~ (1+rho)/(1-rho) = 19
    y = np.empty(40000)
    y[0] = 0
    eps = rng.normal(0, 1, 40000)
    for i in range(1, len(y)):
        y[i] = 0.9 * y[i - 1] + eps[i]
    tint, rho1 = eff_ict(y)
    assert 10 < tint < 30 and 0.85 < rho1 < 0.95


@pytest.mark.smoke
def test_cli_end_to_end(tmp_path):
    """Smoke-test `python -m bpp_tpu --cfile` on the yu2001 example."""
    import shutil

    src = "/root/reference/examples/yu2001"
    shutil.copy(f"{src}/yu2001.txt", tmp_path)
    ctl = tmp_path / "run.ctl"
    ctl.write_text(textwrap.dedent("""\
        seed = 5
        seqfile = yu2001.txt
        jobname = out
        species&tree = 1 H
                       61
        usedata = 1
        nloci = 1
        cleandata = 0
        thetaprior = gamma 2 2000
        finetune = 1
        print = 1 0 0 0
        burnin = 10
        sampfreq = 2
        nsample = 20
    """))
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo",
           "PATH": "/usr/bin:/bin"}
    r = subprocess.run(
        [sys.executable, "-m", "bpp_tpu", "--cfile", "run.ctl", "--quiet"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    mcmc = (tmp_path / "out.mcmc.txt").read_text().splitlines()
    assert mcmc[0].startswith("Gen\ttheta")
    assert len(mcmc) == 21  # header + 20 samples
    assert (tmp_path / "out.txt").exists()


def test_sim_seqerr_machine(tmp_path):
    """seqerr (sequencing_machine, simulate.c:1081): the .seqerr copy
    differs from the clean unphased output at a plausible rate and only
    at diploid rows."""
    import numpy as np
    from bpp_tpu.sim.simulate import run_simulation, sequencing_machine
    ctl = tmp_path / "sim.ctl"
    ctl.write_text(f"""seed = 3
seqfile = {tmp_path}/s.txt
species&tree = 2 A B
               3 3
               (A #0.004 :0.01, B #0.004 :0.01) #0.004 :0.02;
phase = 1 1
loci&length = 4 200
model = JC69
seqerr = 5 0.05 2 2
""")
    run_simulation(str(ctl))
    a = [t for t in open(tmp_path / "s.txt").read().split() if len(t) == 200]
    b = [t for t in open(tmp_path / "s.txt.seqerr").read().split()
         if len(t) == 200]
    assert len(a) == len(b) == 24
    nd = sum(cx != cy for x, y in zip(a, b) for cx, cy in zip(x, y))
    assert 0.005 < nd / (24 * 200) < 0.25

    # unit-level: with eps tiny and high depth, no calls flip
    rng = np.random.default_rng(0)
    masks = np.array([1, 2, 4, 8, 3, 5], np.uint8)
    out, e01, e10 = sequencing_machine(rng, masks, 0.99, 1e-9, 100.0,
                                       dmin=50, dmax=60)
    assert (out == masks).all() and e01 == 0 and e10 == 0
