"""Command-line interface (the reference's bpp.c main analog).

Usage: python -m bpp_tpu --cfile run.ctl [--seed N] [--threads ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="bpp-tpu",
        description="TPU-native Bayesian multispecies-coalescent inference")
    ap.add_argument("--cfile", help="inference control file")
    ap.add_argument("--simulate", help="simulation control file")
    ap.add_argument("--seed", type=int, default=None, help="override seed")
    ap.add_argument("--x64", action="store_true",
                    help="run in float64 (oracle-comparison mode)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--quiet", action="store_true")
    return ap


def cmd_run(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    from .io.ctl import parse_ctl
    from .loader import load_run
    from .mcmc.driver import Engine
    from .output import A01McmcWriter, McmcWriter, a00_summary

    cfg = parse_ctl(args.cfile)
    if args.x64:
        cfg = cfg.replace(dtype="float64")
    run = load_run(cfg)
    eng = Engine(run, seed=args.seed)
    if not args.quiet:
        b = run.batch
        print(f"bpp_tpu: {len(run.loci)} loci | max seqs {b.max_tips} | "
              f"max patterns {b.max_patterns} | species {run.stree.n_tips} | "
              f"method {cfg.method.name} | seed {eng.seed}",
              file=sys.stderr)

    mcmc_path = cfg.mcmcfile or f"{cfg.jobname}.mcmc.txt"
    if cfg.est_stree:
        writer = A01McmcWriter(mcmc_path, cfg, run.stree)

        def on_sample(gen, state):
            writer.write_sample(
                gen, np.asarray(state.sp.left), np.asarray(state.sp.right),
                np.asarray(state.sp.parent), np.asarray(state.sp.tau))
    else:
        writer = McmcWriter(mcmc_path, cfg, run.stree)

        def on_sample(gen, state):
            writer.write_sample(
                gen, np.asarray(state.sp.theta), np.asarray(state.sp.tau),
                float(np.asarray(state.logl).sum()))

    t0 = time.time()
    log = eng.run_mcmc(progress_every=0 if args.quiet else 1000,
                       on_sample=on_sample)
    writer.close()

    gen, theta, tau, lnl, logpr = log.arrays()
    if cfg.est_stree:
        from .summary.stree_summary import (
            format_a01_summary, summarize_sptrees,
        )
        topo, clades, n = summarize_sptrees(log.sptrees, run.stree.names)
        report = format_a01_summary(topo, clades, n, run.stree.names)
    elif cfg.est_delimit:
        from .summary.delimit_summary import (
            format_a10_summary, summarize_delimitations,
        )
        models, nsp = summarize_delimitations(tau, run.stree)
        report = format_a10_summary(models, nsp, len(gen), run.stree)
    else:
        report = a00_summary(cfg, run.stree, gen, theta, tau, lnl)
    out_path = f"{cfg.jobname}.txt"
    with open(out_path, "w") as fh:
        fh.write(f"bpp_tpu {cfg.method.name} run summary ({len(gen)} "
                 f"samples, {time.time()-t0:.1f}s)\n\n")
        fh.write(report + "\n")
    if not args.quiet:
        print(report)
        print(f"\nwrote {mcmc_path}, {out_path}", file=sys.stderr)
    return 0


def cmd_simulate(args) -> int:
    from .sim.simulate import run_simulation

    return run_simulation(args.simulate, seed=args.seed)


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.cfile:
        return cmd_run(args)
    if args.simulate:
        return cmd_simulate(args)
    build_argparser().print_help()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
