"""Benchmark: MCMC iterations/sec on the yu2001 example (A00, JC69).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C binary (BPP 4.8.7, -O3 AVX2, single thread)
runs the same config (61 sequences, 1 locus, ~113 site patterns after
JC69 folding, moves gtage+gtspr+theta+mix) at ~846 iterations/sec on
this container's host CPU (measured: 44,200 iterations in 52.2 s,
/tmp/oracle/yu2001 run of 2026-08-17).  vs_baseline is ours/reference.
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_ITERS_PER_SEC = 846.0


def main():
    # the axon TPU tunnel can wedge (backend init blocks forever); emit
    # a diagnostic line instead of hanging the driver
    import signal

    def _bail(signum, frame):
        print(json.dumps({
            "metric": "mcmc_iterations_per_sec_yu2001",
            "value": 0.0,
            "unit": "iters/s",
            "vs_baseline": 0.0,
            "error": "TPU backend unavailable/compile timeout",
        }))
        sys.stdout.flush()
        raise SystemExit(1)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(1500)

    import jax

    from bpp_tpu.loader import load_run_from_ctl
    from bpp_tpu.mcmc.driver import Engine

    run = load_run_from_ctl("/root/reference/examples/yu2001/yu2001.bpp.ctl")
    run.cfg = run.cfg.replace(dtype="float32")
    eng = Engine(run, seed=1)
    state = eng.init_state()
    key = jax.random.PRNGKey(0)

    # chunked dispatch: n iterations per device call (lax.scan megastep),
    # amortizing the host<->device round trip that otherwise dominates
    chunk = 250
    # warmup/compile
    state, _ = eng.chunk_step(state, key, chunk)
    jax.block_until_ready(state.logl)

    n_chunks = 4
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, sub = jax.random.split(key)
        state, _ = eng.chunk_step(state, sub, chunk)
    jax.block_until_ready(state.logl)
    dt = time.perf_counter() - t0

    ips = n_chunks * chunk / dt
    print(json.dumps({
        "metric": "mcmc_iterations_per_sec_yu2001",
        "value": round(ips, 3),
        "unit": "iters/s",
        "vs_baseline": round(ips / REFERENCE_ITERS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
