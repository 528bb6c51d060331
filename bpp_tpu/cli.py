"""Command-line interface (the reference's bpp.c main analog).

Usage:
  python -m bpp_tpu --cfile run.ctl [--seed N]
  python -m bpp_tpu --resume jobname.chk.npz
  python -m bpp_tpu --simulate sim.ctl
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
    ap.add_argument("--msci-create", dest="msci_create",
                    help="MSC-I network definitions file -> extended newick")
    ap.add_argument("--bfdriver", help="control file: emit K power-posterior "
                    "ctl files + betaweights.csv for marginal-likelihood "
                    "estimation (bfdriver.c:1161)")
    ap.add_argument("--points", type=int, default=8,
                    help="Gauss-Legendre points for --bfdriver (even)")
    ap.add_argument("--resume", help="checkpoint file (.chk.npz) to resume; "
                    "data files must still be at their original paths")
    ap.add_argument("--extend", type=int, default=0,
                    help="with --resume: add N more samples to a finished "
                    "run (bpp.c:936, method.c:3194)")
    ap.add_argument("--summary", help="control file: skip MCMC and re-run "
                    "posterior summarization on the existing mcmc file "
                    "(bpp.c:871 opt_onlysummary)")
    ap.add_argument("--seed", type=int, default=None, help="override seed")
    ap.add_argument("--x64", action="store_true",
                    help="run in float64 (oracle-comparison mode)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--multihost", default=None, metavar="SPEC",
                    help="run as one process of a multi-host cluster: "
                    "'coordinator:port,num_processes,process_id' (or "
                    "'auto' to use JAX_COORDINATOR_ADDRESS / "
                    "JAX_NUM_PROCESSES / JAX_PROCESS_ID).  Loci are "
                    "sharded over the GLOBAL device mesh; process 0 "
                    "writes the output files.")
    ap.add_argument("--check", type=int, default=None, metavar="N",
                    help="runtime invariant mode: every N iterations "
                    "recompute the cached logl/logpr (and notheta/trait "
                    "caches) from scratch and abort on drift (the "
                    "reference's CHECK_LOGL/CHECK_LOGPR, method.c:4699; "
                    "equivalent to 'check = N' in the control file)")
    ap.add_argument("--chains", type=int, default=None, metavar="K",
                    help="run K replicate chains batched on one chip "
                    "(vmap over the chain axis; reports between-chain "
                    "split-R-hat). Overrides the ctl `chains` keyword.")
    ap.add_argument("--quiet", action="store_true")
    return ap


def cmd_run(args) -> int:
    import jax

    # honor JAX_PLATFORMS=cpu too: the axon TPU plugin overrides the
    # env var at import, so only this explicit config reliably forces
    # the CPU backend
    if args.cpu or os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    mesh = None
    is_main = True
    if args.multihost:
        from .parallel.multihost import MultihostSpec, init_multihost
        mesh = init_multihost(MultihostSpec.parse(args.multihost))
        is_main = jax.process_index() == 0
        if not args.quiet and is_main:
            print(f"bpp_tpu multihost: {jax.process_count()} processes, "
                  f"{jax.device_count()} devices "
                  f"({jax.local_device_count()} local)", file=sys.stderr)

    from . import checkpoint as ckpt
    from .io.ctl import parse_ctl
    from .loader import load_run
    from .mcmc.driver import Engine
    from .output import (
        A01McmcWriter, McmcWriter, a00_summary, read_mcmc_samples,
    )

    resume_state = None
    if args.resume:
        meta, ctl_text, arrays = ckpt.load_checkpoint(args.resume)
        ctl_path = ".bpp_tpu_resume.ctl"
        with open(ctl_path, "w") as fh:
            fh.write(ctl_text)
        cfg = parse_ctl(ctl_path)
        cfg_text = ctl_text
        seed = meta["seed"]
        if args.extend:
            # method.c:3194-3200: lengthen a finished run
            if args.extend < 1:
                print("--extend must be positive", file=sys.stderr)
                return 1
            cfg = cfg.replace(nsample=cfg.nsample + args.extend)
    else:
        cfg = parse_ctl(args.cfile)
        with open(args.cfile) as fh:
            cfg_text = fh.read()
        seed = args.seed
    if args.x64:
        cfg = cfg.replace(dtype="float64")
    if args.check is not None:
        cfg = cfg.replace(check_every=args.check)
    if args.chains is not None:
        cfg = cfg.replace(n_chains=args.chains)

    run = load_run(cfg)
    eng = Engine(run, seed=seed)
    if not args.quiet:
        b = run.batch
        print(f"bpp_tpu: {len(run.loci)} loci | max seqs {b.max_tips} | "
              f"max patterns {b.max_patterns} | species {run.stree.n_tips} | "
              f"method {cfg.method.name} | seed {eng.seed}"
              + (f" | RESUMED at it {meta['it']}" if args.resume else ""),
              file=sys.stderr)

    if mesh is not None:
        # non-main processes participate in all device collectives but
        # never touch the (shared) filesystem; per-locus file logs,
        # a1b1 and checkpointing need host access to sharded arrays and
        # are disabled under multihost for now
        if cfg.checkpoint and is_main:
            print("multihost: checkpointing disabled (sharded state is "
                  "not host-addressable)", file=sys.stderr)
        cfg = cfg.replace(checkpoint=None, print_genetrees=False,
                          print_locusrate=False, print_hscalars=False,
                          print_rates=False)
        if args.resume:
            print("--multihost cannot resume yet", file=sys.stderr)
            return 1

    mcmc_path = cfg.mcmcfile or f"{cfg.jobname}.mcmc.txt"
    if cfg.n_chains > 1:
        return _run_multichain(args, cfg, run, eng, mcmc_path, is_main,
                               cfg_text)
    if args.resume:
        # exactly-once logging: truncate to the checkpointed offset
        ckpt.truncate_file(mcmc_path, meta["mcmc_offset"])
        template = eng.init_state()
        state = ckpt.restore_state(template, arrays)
        key = jax.numpy.asarray(arrays["prng_key"])
        resume_state = (state, key, meta["it"], arrays["stats_acc"])

    a1b1 = None
    if cfg.est_stree:
        writer = A01McmcWriter(mcmc_path, cfg, run.stree,
                               append=bool(args.resume)) if is_main else None

        def on_sample(gen, state):
            if writer is None:
                return
            writer.write_sample(
                gen, np.asarray(state.sp.left), np.asarray(state.sp.right),
                np.asarray(state.sp.parent), np.asarray(state.sp.tau))
    else:
        writer = McmcWriter(mcmc_path, cfg, run.stree,
                            append=bool(args.resume)) if is_main else None

        # conditional (a1,b1) log + Rao-Blackwellized summary
        # (method.c:3838 opt_print_a1b1: A00 + data + estimated thetas)
        if (cfg.usedata and not cfg.theta_integrated
                and not cfg.est_delimit and mesh is None
                and not args.resume and run.stree.n_hybrids == 0):
            from .config import PriorDist
            from .summary.a1b1 import DIST_GAMMA, DIST_INVGAMMA, A1b1Writer
            tdist = (DIST_GAMMA if cfg.thetaprior.dist == PriorDist.GAMMA
                     else DIST_INVGAMMA)
            labels = [(c, tdist)
                      for c in writer.columns if c.startswith("theta")]
            labels += [(c, DIST_GAMMA)
                       for c in writer.columns if c.startswith("W:")]
            if labels:
                a1b1 = A1b1Writer(f"{cfg.jobname}.conditional_a1b1.txt",
                                  labels)

        # optional per-sample gene-tree / per-locus parameter logs
        # (print flags, method.c:2933 %s.gtree.L%d and
        # method.c:59 %s.locus_%d_params_sample.txt)
        real = [i for i in range(run.batch.n_loci)
                if run.batch.locus_mask[i]]
        if cfg.print_locus:
            # printlocus = N i1..iN (1-based; cfile.c:2169)
            real = [i for i in real if i + 1 in cfg.print_locus]
        gtree_fps = None
        if cfg.print_genetrees and not args.resume:
            gtree_fps = {i: open(f"{cfg.jobname}.gtree.L{i+1}", "w")
                         for i in real}
        want_params = ((cfg.print_locusrate and cfg.est_locusrate)
                       or (cfg.print_hscalars and cfg.est_heredity)
                       or cfg.print_rates)
        locus_fps = None
        if want_params and not args.resume:
            locus_fps = {i: open(
                f"{cfg.jobname}.locus_{i+1}_params_sample.txt", "w")
                for i in real}

        from .config import Clock

        def log_locus_files(state):
            if gtree_fps is not None:
                from .output import gene_tree_newick
                gl = np.asarray(state.gt.left)
                gr = np.asarray(state.gt.right)
                gp = np.asarray(state.gt.parent)
                ga = np.asarray(state.gt.age)
                for i in real:
                    ns = int(run.batch.n_seq[i])
                    gtree_fps[i].write(gene_tree_newick(
                        gl[i], gr[i], gp[i], ga[i],
                        run.batch.labels[i], ns) + "\n")
            if locus_fps is not None:
                h = np.asarray(state.subst.heredity)
                mu = np.asarray(state.subst.mu)
                nu = br = None
                if state.clock is not None and cfg.clock != Clock.GLOBAL:
                    nu = np.asarray(state.clock.nu)
                    br = np.asarray(state.clock.brate)
                for i in real:
                    vals = []
                    if cfg.print_hscalars and cfg.est_heredity:
                        vals.append(f"{h[i]:.6f}")
                    if cfg.print_locusrate and cfg.est_locusrate:
                        vals.append(f"{mu[i]:.6f}")
                    if cfg.print_rates and nu is not None:
                        vals.append(f"{nu[i]:.6f}")
                        vals += [f"{x:.6f}"
                                 for x in br[min(i, br.shape[0] - 1)]]
                    locus_fps[i].write("\t".join(vals) + "\n")

        def on_sample(gen, state):
            # the logl sum is a cross-process collective under
            # multihost: EVERY process must execute it (before the
            # main-process file gate)
            lnl = float(jax.numpy.sum(state.logl))
            if writer is None:
                return
            writer.write_sample(
                gen, np.asarray(state.sp.theta), np.asarray(state.sp.tau),
                lnl,
                phi=None if state.sp.phi is None
                else np.asarray(state.sp.phi),
                # geneflow rjMCMC: inactive candidate routes must log 0
                # (their M slot carries a Carlin-Chib pseudo-prior draw,
                # not a posterior rate) — same zeroing as the device
                # trace path (driver._trace_of)
                migM=None if state.mig is None
                else np.asarray(state.mig.M if state.mig.on is None
                                else np.where(np.asarray(state.mig.on),
                                              np.asarray(state.mig.M), 0.0)),
                mubar=None if state.mubar is None
                else float(np.asarray(state.mubar)),
                # gate the device->host transfers on the writer's
                # column flags: strict-clock runs with hierarchical
                # locus rates still carry a ClockState, and pulling
                # [L, H] brate per sample would stall the hot path
                mubar_h=float(np.asarray(state.clock.mubar))
                if (writer.mubar_h and state.clock is not None) else None,
                nu_col=None if (state.clock is None
                                or not writer.clock_relaxed
                                or writer.clock_simple) else (
                    float(np.asarray(state.clock.nubar))
                    if cfg.locusrate_prior == 1
                    else float(np.asarray(state.clock.nu)[
                        np.asarray(eng.ctx.locus_mask)].mean())),
                brate0=np.asarray(state.clock.brate[0])
                if (state.clock is not None and writer.clock_simple)
                else None)
            log_locus_files(state)
            if a1b1 is not None:
                a1, b1, wa1, wb1 = eng.a1b1_stats(state)
                av = [float(a1[i]) for i in writer.theta_nodes]
                bv = [float(b1[i]) for i in writer.theta_nodes]
                if wa1 is not None:
                    av += list(np.asarray(wa1))
                    bv += list(np.asarray(wb1))
                a1b1.write_sample(gen, av, bv)

    chk_path = f"{cfg.jobname}.chk.npz"

    def on_checkpoint(state, key, it, stats_acc):
        writer.fp.flush()
        ckpt.save_checkpoint(
            chk_path, state, key, it, stats_acc, cfg_text=cfg_text,
            seed=eng.seed, mcmc_offset=writer.fp.tell())
        if not args.quiet:
            print(f"  checkpoint -> {chk_path} (it {it})", file=sys.stderr)

    t0 = time.time()
    log = eng.run_mcmc(progress_every=0 if args.quiet or not is_main
                       else 1000,
                       on_sample=on_sample, resume=resume_state,
                       on_checkpoint=on_checkpoint if cfg.checkpoint else None,
                       mesh=mesh)
    if writer is None:
        return 0      # multihost non-main process: no output files
    writer.close()
    for fps in (locals().get("gtree_fps"), locals().get("locus_fps")):
        if fps:
            for fp in fps.values():
                fp.close()

    if args.resume:
        # summaries must cover pre-checkpoint samples: read them back
        gen, theta, tau, lnl, sptrees, phi_rs = read_mcmc_samples(
            cfg, run.stree, mcmc_path)
    else:
        gen, theta, tau, lnl, logpr = log.arrays()
        sptrees = log.sptrees
    if cfg.est_stree and cfg.est_delimit:
        from .summary.mixed_summary import format_a11_summary, summarize_mixed
        trees, nsp = summarize_mixed(sptrees, tau, run.stree.names)
        report = format_a11_summary(trees, nsp, len(gen))
    elif cfg.est_stree:
        from .summary.stree_summary import (
            format_a01_summary, summarize_sptrees,
        )
        topo, clades, n = summarize_sptrees(sptrees, run.stree.names)
        report = format_a01_summary(topo, clades, n, run.stree.names)
    elif cfg.est_delimit:
        from .summary.delimit_summary import (
            format_a10_summary, summarize_delimitations,
        )
        models, nsp = summarize_delimitations(tau, run.stree)
        report = format_a10_summary(models, nsp, len(gen), run.stree)
    else:
        if args.resume:
            phi = phi_rs
            migM = None
        else:
            phi = np.stack(log.phi) if log.phi else None
            migM = np.stack(log.migM) if log.migM else None
        # BDI label-switching correction (lswitch.c:336, called from
        # allfixed.c:1853): relabel samples per BDI pair, write the
        # processed trace, and summarize the PROCESSED samples
        from .summary.lswitch import bdi_pairs_of
        if phi is not None and bdi_pairs_of(run.stree) and len(gen):
            from .summary.lswitch import lswitch_samples
            lines = []
            lswitch_samples(run.stree, theta, phi,
                            est_theta=not cfg.theta_integrated,
                            log=lines.append)
            proc = McmcWriter(mcmc_path + ".processed", cfg, run.stree)
            for k, g in enumerate(gen):
                proc.write_sample(int(g), theta[k], tau[k], float(lnl[k]),
                                  phi=phi[k])
            proc.close()
            if not args.quiet:
                print("\n".join(lines), file=sys.stderr)
                print(f"Printing processed sample into "
                      f"{mcmc_path}.processed", file=sys.stderr)
        report = a00_summary(cfg, run.stree, gen, theta, tau, lnl, phi=phi,
                             migM=migM,
                             mubar=None if args.resume else log.mubar)
    a1b1_report = ""
    if a1b1 is not None:
        a1b1.close()
        a1b1_report = a1b1.summary()

    # FigTree.tre (allfixed.c:571): A00 fixed multi-species tree only
    if (not cfg.est_stree and not cfg.est_delimit and run.stree.n_tips > 1
            and run.stree.n_hybrids == 0 and len(gen)):
        from .output import figtree_export
        from .summary.allfixed import hpd_interval
        H = run.stree.n_nodes
        tau_m = tau.mean(0)
        th_m = theta.mean(0) if theta.size else np.zeros(H)
        lo = np.zeros(H)
        hi = np.zeros(H)
        for i in range(run.stree.n_tips, H):
            lo[i], hi[i] = hpd_interval(tau[:, i])
        with open(f"{cfg.jobname}.FigTree.tre", "w") as fh:
            fh.write(figtree_export(run.stree, tau_m, lo, hi, th_m))
    # species-tree PDF (visual.c stree_export_pdf, method.c:6528): A00
    if not cfg.est_stree and not cfg.est_delimit and run.stree.n_tips > 1 \
            and len(gen):
        from .visual import stree_export_pdf
        stree_export_pdf(
            run.stree, f"{cfg.jobname}.pdf",
            tau=tau.mean(0) if tau.size else None,
            theta=theta.mean(0) if theta.size else None,
            cmdline="bpp_tpu --cfile " + (args.cfile or ""))
    out_path = f"{cfg.jobname}.txt"
    with open(out_path, "w") as fh:
        fh.write(f"bpp_tpu {cfg.method.name} run summary ({len(gen)} "
                 f"samples, {time.time()-t0:.1f}s)\n\n")
        fh.write(report + "\n")
        if a1b1_report:
            fh.write("\nSummarizing parameter estimates using file "
                     f"{cfg.jobname}.conditional_a1b1.txt ...\n\n")
            fh.write(a1b1_report + "\n")
    if not args.quiet:
        print(report)
        print(f"\nwrote {mcmc_path}, {out_path}", file=sys.stderr)
    return 0


def _run_multichain(args, cfg, run, eng, mcmc_path, is_main,
                    cfg_text="") -> int:
    """``chains = K``: K replicate chains batched on one chip (vmap over
    the chain axis — OUR extension; the reference runs one chain,
    method.c:5343).  Chain 1 writes the normal mcmc file, chains 2..K
    write ``<jobname>.c<k>.mcmc.txt``; the summary pools all chains and
    a between-chain split-R-hat table is reported.  Supports A00 and
    A10 delimitation (the posterior that most needs replicate-chain
    diagnostics), plus checkpoint/resume of the whole batch."""
    import time as _time

    import numpy as np

    from . import checkpoint as ckpt
    from .config import Clock
    from .output import McmcWriter
    from .summary.allfixed import format_summary, split_rhat, summary_table

    K = cfg.n_chains
    if cfg.est_stree:
        print("chains > 1 supports A00/A10 (fixed guide tree); species-"
              "tree search logs newick traces the chain batch does not "
              "carry yet", file=sys.stderr)
        return 1
    if cfg.check_every:
        print("chains > 1 cannot be combined with check = N "
              "(run chains = 1 for the validation mode)", file=sys.stderr)
        return 1
    if cfg.clock != Clock.GLOBAL:
        # SampleLog does not carry the nu/branch-rate columns; a chain
        # batch would silently log 'nan' clock columns
        print("chains > 1 does not support relaxed clocks yet "
              "(clock = 1 only)", file=sys.stderr)
        return 1
    resume_state = None
    if args.resume:
        import jax

        from .mcmc.driver import SampleLog
        meta, ctl_text, arrays = ckpt.load_checkpoint(args.resume)
        if meta.get("multichain") != K:
            print(f"checkpoint holds {meta.get('multichain')} chains, "
                  f"ctl wants {K}", file=sys.stderr)
            return 1
        template = eng.init_states(K)
        states = ckpt.restore_state(template, arrays)
        key = jax.numpy.asarray(arrays["prng_key"])
        logs0 = ckpt.restore_logs(arrays, K, SampleLog)
        resume_state = (states, key, meta["it"], arrays["stats_acc"],
                        logs0)
    chk_path = f"{cfg.jobname}.chk.npz"

    def on_checkpoint(states, key, it, stats_acc, logs):
        ckpt.save_checkpoint_multi(
            chk_path, states, key, it, stats_acc, logs,
            cfg_text=cfg_text, seed=eng.seed)
        if not args.quiet:
            print(f"  checkpoint -> {chk_path} (it {it}, {K} chains)",
                  file=sys.stderr)

    t0 = _time.time()
    logs = eng.run_mcmc_multi(
        K, progress_every=0 if args.quiet else 1000, resume=resume_state,
        on_checkpoint=on_checkpoint if cfg.checkpoint else None)
    wall = _time.time() - t0
    if not is_main:
        # --multihost: replicas run the same batch (same RNG keys);
        # only process 0 writes the mcmc/summary files
        return 0
    writers = []
    for c in range(K):
        path = mcmc_path if c == 0 else f"{cfg.jobname}.c{c+1}.mcmc.txt"
        writers.append(McmcWriter(path, cfg, run.stree))
    series_per_chain = []
    for c, (log, w) in enumerate(zip(logs, writers)):
        for i, g in enumerate(log.gen):
            w.write_sample(g, log.theta[i], log.tau[i], log.lnL[i],
                           phi=log.phi[i] if log.phi else None,
                           migM=log.migM[i] if log.migM else None,
                           mubar=log.mubar[i] if log.mubar else None)
        w.close()
        cols = {"lnL": np.asarray(log.lnL)}
        th = np.stack(log.theta)
        tu = np.stack(log.tau)
        tcols = [c0 for c0 in w.columns if c0.startswith("theta:")]
        for name, node in zip(tcols, w.theta_nodes):
            cols[name] = th[:, node]
        ucols = [c0 for c0 in w.columns if c0.startswith("tau:")]
        for name, node in zip(ucols, w.tau_nodes):
            cols[name] = tu[:, node]
        series_per_chain.append(cols)
    pooled = {k: np.concatenate([sc[k] for sc in series_per_chain])
              for k in series_per_chain[0]}
    rows = summary_table(pooled)
    rhat = {k: split_rhat(np.stack([sc[k] for sc in series_per_chain]))
            for k in series_per_chain[0]}
    total_iters = (cfg.burnin + cfg.nsample * cfg.sampfreq) * K
    lines = [format_summary(rows),
             "",
             f"Between-chain split-R-hat over {K} chains "
             "(values near 1 = converged):"]
    lines += [f"  {k:<12s} {v:8.4f}" for k, v in rhat.items()]
    if cfg.est_delimit:
        # pooled delimitation posterior + per-chain P(#species) spread
        # (the replicate-chain diagnostic the rjMCMC posterior needs)
        from .summary.delimit_summary import (
            format_a10_summary, n_species, summarize_delimitations,
        )
        tau_pool = np.concatenate([np.stack(lg.tau) for lg in logs])
        models, nsp = summarize_delimitations(tau_pool, run.stree)
        lines += ["", format_a10_summary(models, nsp, len(tau_pool),
                                         run.stree)]
        lines += ["Per-chain P(#species):"]
        for c, lg in enumerate(logs):
            ns = np.asarray([n_species(t, run.stree) for t in lg.tau])
            probs = " ".join(
                f"{k}:{float((ns == k).mean()):.3f}"
                for k in range(1, run.stree.n_tips + 1))
            lines.append(f"  chain {c + 1}: {probs}")
    lines += ["",
              f"{K} chains x {cfg.nsample} samples in {wall:.1f} s "
              f"({total_iters / wall:.1f} aggregate iters/s)"]
    out_txt = "\n".join(lines)
    with open(f"{cfg.jobname}.txt", "w") as fh:
        fh.write(out_txt + "\n")
    if not args.quiet:
        print(out_txt, file=sys.stderr)
        print(f"wrote {mcmc_path} (+{K-1} chain files), {cfg.jobname}.txt",
              file=sys.stderr)
    return 0


def cmd_summary(args) -> int:
    """--summary: re-run posterior summarization on an existing mcmc
    file without sampling (bpp.c:871-874 opt_onlysummary)."""
    from .io.ctl import parse_ctl
    from .loader import build_species_tree
    from .output import a00_summary, read_mcmc_samples

    cfg = parse_ctl(args.summary)
    st = build_species_tree(cfg)
    mcmc_path = cfg.mcmcfile or f"{cfg.jobname}.mcmc.txt"
    if not os.path.exists(mcmc_path):
        print(f"no mcmc file {mcmc_path!r} to summarize", file=sys.stderr)
        return 1
    gen, theta, tau, lnl, sptrees, phi = read_mcmc_samples(cfg, st,
                                                           mcmc_path)
    if cfg.est_stree and cfg.est_delimit:
        from .summary.mixed_summary import format_a11_summary, summarize_mixed
        trees, nsp = summarize_mixed(sptrees, tau, st.names)
        report = format_a11_summary(trees, nsp, len(gen))
    elif cfg.est_stree:
        from .summary.stree_summary import (
            format_a01_summary, summarize_sptrees,
        )
        topo, clades, n = summarize_sptrees(sptrees, st.names)
        report = format_a01_summary(topo, clades, n, st.names)
    elif cfg.est_delimit:
        from .summary.delimit_summary import (
            format_a10_summary, summarize_delimitations,
        )
        models, nsp = summarize_delimitations(tau, st)
        report = format_a10_summary(models, nsp, len(gen), st)
    else:
        report = a00_summary(cfg, st, gen, theta, tau, lnl, phi=phi)
    out_path = f"{cfg.jobname}.txt"
    with open(out_path, "w") as fh:
        fh.write(f"bpp_tpu {cfg.method.name} summary-only re-run "
                 f"({len(gen)} samples)\n\n")
        fh.write(report + "\n")
    if not args.quiet:
        print(report)
        print(f"\nwrote {out_path}", file=sys.stderr)
    return 0


def cmd_simulate(args) -> int:
    from .sim.simulate import run_simulation

    return run_simulation(args.simulate, seed=args.seed)


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.extend and not args.resume:
        print("--extend can only be used with --resume", file=sys.stderr)
        return 1
    if args.summary:
        return cmd_summary(args)
    if args.cfile or args.resume:
        return cmd_run(args)
    if args.simulate:
        return cmd_simulate(args)
    if args.msci_create:
        from .tools.msci_create import cmd_msci_create
        return cmd_msci_create(args.msci_create)
    if args.bfdriver:
        from .tools.bfdriver import cmd_bfdriver
        return cmd_bfdriver(args.bfdriver, args.points)
    build_argparser().print_help()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
