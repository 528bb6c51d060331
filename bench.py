"""Benchmark: MCMC iterations/sec on A00 parameter estimation.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
The headline metric is the 1000-locus workload; north-star extras
(CLV site-updates/s, engaged kernel path, padding waste, weak-scaling
efficiency over a virtual device mesh, the 1/100/10000-locus sweep)
ride along under "extra", each guarded by a wall-clock deadline so the
headline line is ALWAYS emitted:

  * the headline JSON is printed the moment the last stage that can
    still make its deadline finishes — never blocked on a slow sweep;
  * SIGTERM/SIGALRM emit the current best payload, so even a timeout
    kill records the headline measurement (round-2 lost its number to
    exactly this, BENCH_r02.json rc=124/parsed=null);
  * stages are ordered cheapest-information-first and each stage
    records WHY it was skipped when its deadline cannot be met (the
    TPU tunnel's remote compile is ~15 min cold, ~1 min when the
    compile-service cache is warm — measured 2026-08-20).

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
import signal
import subprocess
import sys
import tempfile
import time

REFERENCE_ITERS_PER_SEC = 16.7

# total wall budget this script allows itself; the driver's own timeout
# is unknown but round 2 was killed somewhere <= 1500 s
ALARM_S = 1080

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

T_START = time.perf_counter()
PAYLOAD: dict = {
    "metric": "mcmc_iterations_per_sec_A00_1000loci",
    "value": 0.0,
    "unit": "iters/s",
    "vs_baseline": 0.0,
    "error": "headline not yet measured",
}
_EMITTED = False


def emit():
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    PAYLOAD.setdefault("extra", {})["bench_wall_s"] = round(
        time.perf_counter() - T_START, 1)
    print(json.dumps(PAYLOAD))
    sys.stdout.flush()


def _on_kill(signum, frame):
    # driver timeout / internal alarm: flush the best payload we have
    PAYLOAD.setdefault("extra", {})["killed_by"] = (
        "alarm" if signum == signal.SIGALRM else f"signal {signum}")
    emit()
    os._exit(0 if "error" not in PAYLOAD else 1)


def elapsed():
    return time.perf_counter() - T_START


def _bench_one(n_loci: int, chunk: int, n_chunks: int, deadline: float):
    """(iters/s, clv_site_updates/s, pad_waste, kernel, compile_s)."""
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
    tc0 = time.perf_counter()
    state, _ = eng.chunk_step(state, key, chunk)   # warmup/compile
    float(jnp.sum(state.logl))
    compile_s = time.perf_counter() - tc0

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
    kernel = ("pallas-packed" if eng.ctx.pack is not None else
              "pallas" if eng.ctx.tips_am is not None else "xla")
    return ips, ips * site_updates, waste, kernel, compile_s


def weakscale_child():
    """Subprocess mode: weak-scaling iters/s on a virtual CPU mesh
    (BASELINE.md north star; the reference has NO multi-device story to
    compare against — threads.c is single-host pthreads).

    Two views, because the 8 virtual devices SHARE this host's 4
    physical cores (so raw flat-iters/s weak scaling is physically
    impossible here — it measures core oversubscription):
      * per-device-constant sweep (64 loci/device at 1/2/4/8 devices);
      * sharding_overhead_8dev: the same 512-locus workload, sharded
        over 8 devices vs 1 — ≈1.0 means the mesh partitioning +
        collectives add no cost, which is the component of weak-scaling
        efficiency the framework (not the hardware) controls.
    Prints one JSON dict."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bpp_tpu.loader import load_run_from_ctl
    from bpp_tpu.mcmc.driver import Engine
    from bpp_tpu.parallel.mesh import make_mesh, shard_pytree_by_locus
    from bpp_tpu.sim.simulate import run_simulation

    per_dev = 64
    out = {}
    with open("sim.ctl", "w") as f:
        f.write(SIM_CTL.format(nloci=512))
    run_simulation("sim.ctl")
    # (devices, loci): per-device-constant sweep + the 512@1 reference
    # point for the sharding-overhead ratio
    configs = [(1, 64), (2, 128), (4, 256), (8, 512), (4, 512), (1, 512)]
    for nd, L in configs:
        with open("run.ctl", "w") as f:
            f.write(RUN_CTL.format(nloci=L))
        run = load_run_from_ctl("run.ctl")
        run.cfg = run.cfg.replace(dtype="float32")
        mesh = make_mesh(nd)
        eng = Engine(run, seed=1)
        state = eng.init_state()
        Lp = int(eng.ctx.locus_mask.shape[0])
        eng.ctx = shard_pytree_by_locus(eng.ctx, mesh, Lp)
        state = shard_pytree_by_locus(state, mesh, Lp)
        key = jax.random.PRNGKey(0)
        # warm with the SAME static chunk length as the timed calls:
        # n is a static jit arg, so a different n would put a fresh
        # XLA compile inside the timed region
        state, _ = eng.chunk_step(state, key, 15)          # compile
        float(jnp.sum(state.logl))
        t0 = time.perf_counter()
        for _ in range(2):
            key, sub = jax.random.split(key)
            state, _ = eng.chunk_step(state, sub, 15)
        float(jnp.sum(state.logl))
        ips = 30 / (time.perf_counter() - t0)
        out[f"{nd}dev_{L}loci"] = round(ips, 2)
    ref = out.get("1dev_512loci", 0.0)
    if ref:
        out["sharding_overhead_8dev"] = round(
            out["8dev_512loci"] / ref, 3)
        out["sharding_overhead_4dev"] = round(
            out["4dev_512loci"] / ref, 3)
    out["note"] = (
        "virtual CPU devices: n-device SPMD on one process serializes "
        "per-device dispatch and shares 4 physical cores, so these "
        "ratios are a LOWER bound on real multi-chip efficiency (TPU "
        "collectives ride ICI; the sharded step itself is validated by "
        "the sharded==unsharded equality tests + dryrun_multichip)")
    print("WEAKSCALE " + json.dumps(out))
    sys.stdout.flush()


def main():
    signal.signal(signal.SIGALRM, _on_kill)
    signal.signal(signal.SIGTERM, _on_kill)
    signal.alarm(ALARM_S)

    cwd = os.getcwd()
    extra: dict = {}
    PAYLOAD["extra"] = extra
    with tempfile.TemporaryDirectory(prefix="bpp_bench_") as workdir:
        os.chdir(workdir)
        try:
            # headline: 1000 loci.  chunk=400 amortizes the axon
            # tunnel's per-dispatch overhead (measured 2026-08-20:
            # 45.7 it/s at chunk=50, 51-60 at 200, 60.0 at 400 and
            # 800 -- device-bound plateau at 400)
            ips, su, waste, kernel, comp = _bench_one(
                1000, chunk=400, n_chunks=2, deadline=T_START + 950)
            PAYLOAD["value"] = round(ips, 3)
            PAYLOAD["vs_baseline"] = round(ips / REFERENCE_ITERS_PER_SEC, 4)
            PAYLOAD.pop("error", None)
            extra["kernel_path"] = kernel
            extra["clv_site_updates_per_sec"] = round(su, 0)
            extra["pattern_padding_waste"] = round(waste, 4)
            extra["compile_s_1000loci"] = round(comp, 1)

            # weak scaling on a virtual CPU mesh (subprocess so the
            # TPU backend in this process is untouched)
            budget = ALARM_S - 30 - elapsed()
            if budget > 240:
                try:
                    env = dict(os.environ, JAX_PLATFORMS="cpu",
                               XLA_FLAGS="--xla_force_host_platform_device_count=8")
                    r = subprocess.run(
                        [sys.executable, os.path.join(cwd, "bench.py"),
                         "--weakscale"],
                        capture_output=True, text=True,
                        timeout=min(budget - 60, 480), env=env,
                        cwd=workdir)
                    for ln in r.stdout.splitlines():
                        if ln.startswith("WEAKSCALE "):
                            extra["weak_scaling_iters_per_sec"] = \
                                json.loads(ln[len("WEAKSCALE "):])
                            break
                    else:
                        extra["weak_scaling_iters_per_sec"] = \
                            f"error: rc={r.returncode}"
                except subprocess.TimeoutExpired:
                    extra["weak_scaling_iters_per_sec"] = "skipped: timeout"
            else:
                extra["weak_scaling_iters_per_sec"] = \
                    "skipped: wall budget exhausted by cold compile"

            # north-star sweep at other sizes, best-effort (each size
            # is a fresh compile: ~1 min warm / ~15 min cold on the
            # tunnel — only attempted when the budget still fits)
            for n, ch, name, need in ((100, 200, "iters_per_sec_100loci", 200),
                                      (1, 200, "iters_per_sec_1locus", 170),
                                      (10000, 50, "iters_per_sec_10000loci", 400)):
                left = ALARM_S - 30 - elapsed()
                if left < need:
                    extra[name] = "skipped: wall budget (cold compile)"
                    continue
                try:
                    ips_n, _, waste_n, _, comp_n = _bench_one(
                        n, chunk=ch, n_chunks=2,
                        deadline=T_START + ALARM_S - 60)
                    extra[name] = round(ips_n, 2)
                    if n == 10000:
                        extra["pattern_padding_waste_10000loci"] = \
                            round(waste_n, 4)
                except Exception as e:      # noqa: BLE001 - best effort
                    extra[name] = f"error: {type(e).__name__}"
        except Exception as e:              # noqa: BLE001
            PAYLOAD["error"] = f"{type(e).__name__}: {e}"
        finally:
            os.chdir(cwd)
    signal.alarm(0)
    emit()
    sys.exit(0 if "error" not in PAYLOAD else 1)


if __name__ == "__main__":
    if "--weakscale" in sys.argv:
        weakscale_child()
    else:
        main()
