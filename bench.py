"""Benchmark: MCMC iterations/sec on a 1000-locus A00 analysis.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload (the BASELINE.json "iters/sec at 1/100/10k loci" north star,
sized to a realistic phylogenomic dataset): 4 species, 1000 loci,
4 sequences/species (16 per locus), 500 sites, JC69, A00 parameter
estimation (gene ages + gene SPR + theta/tau Gibbs-and-slide + mixing).
The dataset is regenerated deterministically with the built-in
coalescent simulator (seed 137), so the benchmark is self-contained.

Baseline: the reference C binary (BPP 4.8.7, -O3 AVX2) on the SAME
generated dataset and priors, best of 1/4 threads on this container's
4-core host CPU: 400 iterations in 24.0 s of MCMC with `threads = 4`
(16.7 iters/sec; single-thread was 12.5/s), measured 2026-08-18 from
/tmp/bppbuild (sources /root/reference/src, plain `make`).
vs_baseline = ours / reference.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REFERENCE_ITERS_PER_SEC = 16.7

SIM_CTL = """\
seed = 137
seqfile = sim.phy
treefile = sim.tre
Imapfile = sim.Imap.txt
modelparafile = sim.para.txt
species&tree = 4 A B C D
                 4 4 4 4
                ((A #0.01, B #0.01) :0.01 #0.01, (C #0.01, D #0.01) :0.012 #0.01) :0.02 #0.01;
loci&length = 1000 500
model = 0
"""

RUN_CTL = """\
seed = 11
seqfile = sim.phy
Imapfile = sim.Imap.txt
jobname = out
species&tree = 4 A B C D
                 4 4 4 4
                ((A, B), (C, D));
usedata = 1
nloci = 1000
cleandata = 0
thetaprior = 3 0.03
tauprior = 3 0.06
finetune = 1
print = 1 0 0 0
burnin = 20
sampfreq = 1
nsample = 80
"""


def main():
    # the axon TPU tunnel can wedge (backend init blocks forever); emit
    # a diagnostic line instead of hanging the driver
    import signal

    def _bail(signum, frame):
        print(json.dumps({
            "metric": "mcmc_iterations_per_sec_A00_1000loci",
            "value": 0.0,
            "unit": "iters/s",
            "vs_baseline": 0.0,
            "error": "TPU backend unavailable/compile timeout",
        }))
        sys.stdout.flush()
        os._exit(1)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(1500)

    import jax

    from bpp_tpu.loader import load_run_from_ctl
    from bpp_tpu.mcmc.driver import Engine
    from bpp_tpu.sim.simulate import run_simulation

    workdir = tempfile.mkdtemp(prefix="bpp_bench_")
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        with open("sim.ctl", "w") as f:
            f.write(SIM_CTL)
        with open("run.ctl", "w") as f:
            f.write(RUN_CTL)
        run_simulation("sim.ctl")

        run = load_run_from_ctl("run.ctl")
        run.cfg = run.cfg.replace(dtype="float32")
        eng = Engine(run, seed=1)
        state = eng.init_state()
        key = jax.random.PRNGKey(0)

        # chunked dispatch: n iterations per device call (lax.scan
        # megastep), amortizing the host<->device round trip
        chunk = 50
        state, _ = eng.chunk_step(state, key, chunk)   # warmup/compile
        jax.block_until_ready(state.logl)

        n_chunks = 4
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            key, sub = jax.random.split(key)
            state, _ = eng.chunk_step(state, sub, chunk)
        jax.block_until_ready(state.logl)
        dt = time.perf_counter() - t0
    finally:
        os.chdir(cwd)

    ips = n_chunks * chunk / dt
    print(json.dumps({
        "metric": "mcmc_iterations_per_sec_A00_1000loci",
        "value": round(ips, 3),
        "unit": "iters/s",
        "vs_baseline": round(ips / REFERENCE_ITERS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
