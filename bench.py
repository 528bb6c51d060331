"""Benchmark: MCMC iterations/sec on A00 parameter estimation.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
The headline metric is the 1000-locus workload; the BASELINE.md
north-star sweep (1 / 100 / 1000 / 10000 loci, CLV site-updates/s,
engaged kernel path, padding waste) rides along under "extra".

Workload (sized to a realistic phylogenomic dataset): 4 species,
4 sequences/species (16 per locus), 500 sites, JC69, A00 parameter
estimation (gene ages + gene SPR + theta/tau Gibbs-and-slide +
mixing).  The dataset is regenerated deterministically with the
built-in coalescent simulator (seed 137), so the benchmark is
self-contained.

Baseline: the reference C binary (BPP 4.8.7, -O3 AVX2) on the SAME
generated 1000-locus dataset and priors, best of 1/4 threads on this
container's 4-core host CPU: 400 iterations in 24.0 s of MCMC with
`threads = 4` (16.7 iters/sec; single-thread was 12.5/s), measured
2026-08-18 from /tmp/bppbuild (sources /root/reference/src, plain
`make`).  vs_baseline = ours / reference.
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
loci&length = {nloci} 500
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
nloci = {nloci}
cleandata = 0
thetaprior = 3 0.03
tauprior = 3 0.06
finetune = 1
print = 1 0 0 0
burnin = 20
sampfreq = 1
nsample = 80
"""

# likelihood passes per A00 iteration (age 2 phases + 3 SPR rounds +
# tau 2 phases + mixing 1); used for the CLV site-updates/s metric
PASSES_PER_ITER = 8


def _bench_one(n_loci: int, chunk: int, n_chunks: int, deadline: float):
    """(iters/s, clv_site_updates/s, pad_waste, kernel) for one size."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bpp_tpu.loader import load_run_from_ctl
    from bpp_tpu.mcmc.driver import Engine
    from bpp_tpu.sim.simulate import run_simulation

    with open("sim.ctl", "w") as f:
        f.write(SIM_CTL.format(nloci=n_loci))
    with open("run.ctl", "w") as f:
        f.write(RUN_CTL.format(nloci=n_loci))
    run_simulation("sim.ctl")

    run = load_run_from_ctl("run.ctl")
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=1)
    state = eng.init_state()
    key = jax.random.PRNGKey(0)

    # chunked dispatch: n iterations per device call (lax.scan
    # megastep), amortizing the host<->device round trip.  NB: on the
    # axon tunnel jax.block_until_ready can return before the remote
    # computation finishes; a host transfer (float()) cannot, so every
    # sync point materializes a scalar
    state, _ = eng.chunk_step(state, key, chunk)   # warmup/compile
    float(jnp.sum(state.logl))

    done = 0
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, chunk)
        done += chunk
        if time.perf_counter() > deadline:
            break
    float(jnp.sum(state.logl))
    dt = time.perf_counter() - t0
    ips = done / dt

    b = run.batch
    mask = np.asarray(b.locus_mask)
    n_seq = np.asarray(b.n_seq)[mask]
    # real site patterns per locus (weights > 0)
    real_pat = (np.asarray(b.weights) > 0).sum(1)[mask]
    site_updates = PASSES_PER_ITER * float(((n_seq - 1) * real_pat).sum())
    pad = b.weights.shape[1] * mask.sum()
    waste = 1.0 - float(real_pat.sum()) / float(pad)
    kernel = "pallas" if eng.ctx.tips_am is not None else "xla"
    return ips, ips * site_updates, waste, kernel


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
    t_start = time.perf_counter()

    cwd = os.getcwd()
    extra = {}
    with tempfile.TemporaryDirectory(prefix="bpp_bench_") as workdir:
        os.chdir(workdir)
        try:
            # headline: 1000 loci.  chunk=200 amortizes the axon
            # tunnel's ~250 ms per-dispatch overhead (measured: 45.7
            # it/s at chunk=50 vs 60.4 at chunk=200, device-bound)
            ips, su, waste, kernel = _bench_one(
                1000, chunk=200, n_chunks=3, deadline=t_start + 900)
            extra["kernel_path"] = kernel
            extra["clv_site_updates_per_sec"] = round(su, 0)
            extra["pattern_padding_waste"] = round(waste, 4)
            # north-star sweep at other sizes, best-effort in the
            # remaining time budget (each adds a fresh compile)
            for n, name in ((1, "iters_per_sec_1locus"),
                            (100, "iters_per_sec_100loci"),
                            (10000, "iters_per_sec_10000loci")):
                if time.perf_counter() - t_start > 1000:
                    break
                try:
                    ips_n, _, _, _ = _bench_one(
                        n, chunk=200 if n <= 1000 else 50, n_chunks=2,
                        deadline=t_start + 1200)
                    extra[name] = round(ips_n, 2)
                except Exception as e:      # noqa: BLE001 - best effort
                    extra[name] = f"error: {type(e).__name__}"
        finally:
            os.chdir(cwd)
    signal.alarm(0)

    print(json.dumps({
        "metric": "mcmc_iterations_per_sec_A00_1000loci",
        "value": round(ips, 3),
        "unit": "iters/s",
        "vs_baseline": round(ips / REFERENCE_ITERS_PER_SEC, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
