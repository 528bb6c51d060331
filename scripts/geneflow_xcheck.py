"""Geneflow rjMCMC cross-check via fixed-route conditionals (VERDICT
r3 missing #8 / next #8).

The reference's own `geneflow = 1` run crashes at its first sample
(method.c:4889, verified round 3), so the rj posterior cannot be
compared directly.  But conditional posteriors can: our rj chain's
samples RESTRICTED to route-model m should match a reference A00 run
with exactly m's routes fixed on (same data, same priors) — for each
of the 4 route sets on a 2-species problem.

Usage: gen | ours | ref | compare
"""
import os
import subprocess
import sys

import numpy as np

OUT = "/tmp/gfx"
BPP = "/tmp/bppbuild/src/bpp"
ROUTES = {"none": [], "ab": [("A", "B")], "ba": [("B", "A")],
          "both": [("A", "B"), ("B", "A")]}

BASE = """\
seed = {seed}
seqfile = {out}/gf.phy
Imapfile = {out}/Imap.txt
jobname = {job}
species&tree = 2 A B
                 4 4
                (A, B);
usedata = 1
nloci = 24
cleandata = 0
thetaprior = invgamma 3 0.03
tauprior = invgamma 3 0.03
wprior = 2 2
finetune = 1
print = 1 0 0 0
burnin = {burn}
sampfreq = {sf}
nsample = {ns}
"""


def gen():
    """Simulate 24 loci with one-way A->B migration via OUR simulator
    (host structured-coalescent, validated against theory in
    tests/test_migration.py)."""
    sys.path.insert(0, "/root/repo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.makedirs(OUT, exist_ok=True)
    sim = f"""\
seed = 77
seqfile = {OUT}/gf.phy
treefile = {OUT}/gf.tre
Imapfile = {OUT}/Imap.txt
species&tree = 2 A B
                 4 4
                (A #0.01, B #0.01) :0.015 #0.02;
migration = 1
  A B 1.5
loci&length = 24 400
model = 0
"""
    with open(f"{OUT}/sim.ctl", "w") as f:
        f.write(sim)
    from bpp_tpu.sim.simulate import run_simulation
    run_simulation(f"{OUT}/sim.ctl")
    print("simulated", flush=True)


def ours():
    sys.path.insert(0, "/root/repo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    from bpp_tpu.mcmc.driver import Engine

    ctl = BASE.format(seed=101, out=OUT, job=f"{OUT}/ours", burn=4000,
                      sf=1, ns=40000) + "geneflow = 1\nmigration = 2\n" \
        "  A B\n  B A\n"
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=19)
    log = eng.run_mcmc(progress_every=0)
    theta = np.stack(log.theta)
    tau = np.stack(log.tau)
    M = np.stack(log.migM)
    np.savez(f"{OUT}/ours.npz", theta=theta, tau=tau, M=M)
    on = M > 0
    for name, rts in ROUTES.items():
        want = np.array([("A", "B") in rts, ("B", "A") in rts])
        sel = (on == want[None, :]).all(1)
        print(f"{name}: occupancy {sel.mean():.3f} n={sel.sum()}",
              flush=True)


def ref():
    for name, rts in ROUTES.items():
        d = f"{OUT}/ref_{name}"
        os.makedirs(d, exist_ok=True)
        ctl = BASE.format(seed=31, out=OUT, job=f"{d}/ref", burn=4000,
                          sf=1, ns=30000)
        if rts:
            ctl += f"migration = {len(rts)}\n"
            for s, t in rts:
                ctl += f"  {s} {t}\n"
        with open(f"{d}/ref.ctl", "w") as f:
            f.write(ctl)
        r = subprocess.run([BPP, "--cfile", f"{d}/ref.ctl"], cwd=d,
                           capture_output=True, text=True, timeout=3000)
        ok = os.path.exists(f"{d}/ref.mcmc.txt")
        print(f"ref {name}: rc={r.returncode} mcmc={ok}", flush=True)


def _ref_means(name):
    d = f"{OUT}/ref_{name}"
    rows = open(f"{d}/ref.mcmc.txt").read().strip().splitlines()
    hdr = rows[0].split("\t")[1:]
    dat = np.array([[float(x) for x in r.split("\t")[1:]]
                    for r in rows[1:]])
    return dict(zip(hdr, dat.T))


def _se(x, nb=20):
    n = len(x) // nb * nb
    if n < nb:
        return float("inf")
    bm = x[:n].reshape(nb, -1).mean(1)
    return bm.std(ddof=1) / np.sqrt(nb)


def compare():
    z = np.load(f"{OUT}/ours.npz")
    theta, tau, M = z["theta"], z["tau"], z["M"]
    on = M > 0
    print(f"{'model':<6} {'param':<10} {'ours':>9} {'ref':>9} "
          f"{'tol':>8} ok")
    for name, rts in ROUTES.items():
        want = np.array([("A", "B") in rts, ("B", "A") in rts])
        sel = (on == want[None, :]).all(1)
        if sel.sum() < 400:
            print(f"{name}: occupancy too low ({sel.sum()}) — skipped")
            continue
        ref = _ref_means(name)
        pairs = [("theta:1:A", theta[sel, 0]),
                 ("theta:2:B", theta[sel, 1]),
                 ("theta:3:A,B", theta[sel, 2]),
                 ("tau:3:A,B", tau[sel, 2])]
        if ("A", "B") in rts:
            pairs.append(("W:1->2:A->B", M[sel, 0]))
        if ("B", "A") in rts:
            key = "W:2->1:B->A"
            col = 1
            pairs.append((key, M[sel, col]))
        for key, ours_v in pairs:
            rv = ref.get(key)
            if rv is None:
                print(f"  missing ref column {key}")
                continue
            tol = 4.0 * np.hypot(_se(ours_v), _se(rv)) \
                + 0.05 * abs(rv.mean())
            ok = abs(ours_v.mean() - rv.mean()) < tol
            print(f"{name:<6} {key:<10} {ours_v.mean():>9.5f} "
                  f"{rv.mean():>9.5f} {tol:>8.5f} {'OK' if ok else 'XX'}")


if __name__ == "__main__":
    {"gen": gen, "ours": ours, "ref": ref, "compare": compare}[sys.argv[1]]()
