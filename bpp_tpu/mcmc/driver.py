"""MCMC driver: the cmd_run equivalent (src/method.c:4939).

Composes the per-iteration move schedule (method.c:5343-6275 order),
auto-tunes step lengths during burn-in (reset_finetune,
method.c:1122-1204), logs samples to ``<jobname>.mcmc.txt`` and returns
posterior sample arrays.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BppConfig, Method
from ..core import felsenstein as fe
from ..core import incremental
from ..loader import RunData, init_tau_theta
from ..trees import coalescent as coalmod
from ..trees.gtree import GTrees, init_gtrees, species_arrays
from . import moves
from .state import (
    Ctx, FT_GTAGE, FT_GTSPR, FT_MIX, FT_TAU, FT_THETA, MV_GTAGE, MV_GTSPR,
    MV_MIX, MV_TAU, MV_THETA, N_MOVES, McmcState, SubstState, finetune_array,
    make_logl_fn, make_logpr_fn,
)

PJ_OPTIMUM = 0.30     # method.c:45 target pjump
MOVE_TO_FT = {
    MV_GTAGE: FT_GTAGE,
    MV_GTSPR: FT_GTSPR,
    MV_THETA: FT_THETA,
    MV_TAU: FT_TAU,
    MV_MIX: FT_MIX,
}


def reset_finetune_onestep(pjump: float, val: float) -> float:
    """method.c:1122 reset_finetune_onestep."""
    maxstep = 99.0
    if pjump < 0.001:
        return val / 100.0
    if pjump > 0.999:
        return min(maxstep, val * 100.0)
    return min(maxstep, val * np.tan(np.pi / 2 * pjump)
               / np.tan(np.pi / 2 * PJ_OPTIMUM))


@dataclass
class SampleLog:
    """Posterior samples collected on host."""

    gen: list = field(default_factory=list)
    theta: list = field(default_factory=list)     # [H]
    tau: list = field(default_factory=list)       # [H]
    lnL: list = field(default_factory=list)
    logpr: list = field(default_factory=list)

    def arrays(self):
        return (np.asarray(self.gen), np.stack(self.theta),
                np.stack(self.tau), np.asarray(self.lnL),
                np.asarray(self.logpr))


class Engine:
    """Owns device data + jitted step for one inference run."""

    def __init__(self, run: RunData, seed: int | None = None):
        self.run = run
        self.cfg = run.cfg
        cfg = self.cfg
        self.seed = seed if seed is not None else (
            cfg.seed if cfg.seed > 0 else np.random.SeedSequence().entropy % (2**31))
        batch = run.batch

        dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        self.dtype = dtype
        self.ctx = Ctx(
            tip_partials=fe.tip_partials_from_codes(
                jnp.asarray(batch.tip_codes), dtype=dtype),
            weights=jnp.asarray(batch.weights, dtype),
            res_map=jnp.asarray(batch.res_map),
            res_count=jnp.asarray(batch.res_count),
            n_seq=jnp.asarray(batch.n_seq),
            tip_pop=jnp.asarray(batch.tip_pop),
            locus_mask=jnp.asarray(batch.locus_mask),
        )
        self._logl_fn = make_logl_fn(self.ctx, cfg)
        self._logpr_fn = make_logpr_fn(self.ctx)
        self._step_jit = jax.jit(self._step)

    # --- state construction ---------------------------------------------------

    def init_state(self) -> McmcState:
        cfg, run = self.cfg, self.run
        rng = np.random.default_rng(self.seed)
        init_tau_theta(cfg, run.stree, rng)
        gt = init_gtrees(int(rng.integers(2**31)), run.batch, run.stree,
                         dtype=self.dtype)
        sp = species_arrays(run.stree, dtype=self.dtype)
        L = run.batch.n_loci
        C = cfg.gamma_cats
        subst = SubstState(
            freqs=jnp.full((L, 4), 0.25, self.dtype),
            kappa1=jnp.full((L,), 2.0, self.dtype),
            kappa2=jnp.full((L,), 2.0, self.dtype),
            qrates=jnp.full((L, 6), 1.0, self.dtype),
            alpha=jnp.full(
                (L,),
                cfg.alphaprior.mean() if cfg.alphaprior else 0.0, self.dtype),
            rates=jnp.ones((L, C), self.dtype),
            mu=jnp.ones((L,), self.dtype),
            heredity=jnp.ones((L,), self.dtype),
        )
        logl = self._logl_fn(gt, subst)
        logpr, _, _ = self._logpr_fn(gt, sp, subst.heredity)
        return McmcState(
            gt=gt, sp=sp, subst=subst, logl=logl, logpr=logpr,
            finetune=finetune_array(cfg, self.dtype))

    # --- one iteration --------------------------------------------------------

    def _step(self, state: McmcState, key):
        cfg, ctx = self.cfg, self.ctx
        stats = jnp.zeros((N_MOVES, 2), jnp.int32)
        keys = jax.random.split(key, 8)

        # CLV cache for the incremental path-update sweeps; invalidated by
        # the global-age moves (tau/mixing) below, so rebuilt per iteration
        cache = incremental.build_cache(
            state.gt, state.sp, ctx.tip_partials, ctx.tip_pop, ctx.n_seq,
            state.subst, cfg.model)

        state, (p, a), cache = moves.age_sweep(ctx, cfg, state, keys[0], cache)
        stats = stats.at[MV_GTAGE].add(jnp.stack([p, a]))

        state, (p, a), cache = moves.spr_sweep(ctx, cfg, state, keys[1], cache)
        stats = stats.at[MV_GTSPR].add(jnp.stack([p, a]))

        state, (p, a) = moves.theta_move(ctx, cfg, state, keys[2])
        stats = stats.at[MV_THETA].add(jnp.stack([p, a]))

        state, (p, a) = moves.tau_move(ctx, cfg, state, keys[3])
        stats = stats.at[MV_TAU].add(jnp.stack([p, a]))

        state, (p, a) = moves.mixing_move(ctx, cfg, state, keys[4])
        stats = stats.at[MV_MIX].add(jnp.stack([p, a]))

        return state, stats

    def step(self, state: McmcState, key):
        return self._step_jit(state, key)

    # --- full run -------------------------------------------------------------

    def run_mcmc(self, progress_every: int = 1000, log_fp=None,
                 on_sample=None) -> SampleLog:
        cfg = self.cfg
        state = self.init_state()
        key = jax.random.PRNGKey(self.seed)
        log = SampleLog()

        total_burn = cfg.burnin
        total_main = cfg.nsample * cfg.sampfreq
        stats_acc = np.zeros((N_MOVES, 2), np.float64)
        finetune_marks = {total_burn // 4, total_burn // 2,
                          3 * total_burn // 4} if (
            cfg.finetune.auto and total_burn >= 8) else set()

        t0 = time.time()
        it = -total_burn
        while it < total_main:
            key, sub = jax.random.split(key)
            state, stats = self.step(state, sub)
            it += 1

            burn_step = it <= 0
            if burn_step:
                stats_acc += np.asarray(stats)
                if cfg.finetune.auto and (it + total_burn) in finetune_marks:
                    state = self._reset_finetune(state, stats_acc)
                    stats_acc[:] = 0.0
            else:
                stats_acc += np.asarray(stats)

            if (not burn_step) and it % cfg.sampfreq == 0:
                sp = state.sp
                log.gen.append(it)
                log.theta.append(np.asarray(sp.theta))
                log.tau.append(np.asarray(sp.tau))
                mask = np.asarray(self.ctx.locus_mask)
                log.lnL.append(float(np.asarray(state.logl).sum()))
                log.logpr.append(float(np.asarray(state.logpr).sum()))
                if on_sample is not None:
                    on_sample(it, state)

            if progress_every and it % progress_every == 0:
                with np.errstate(invalid="ignore", divide="ignore"):
                    pj = stats_acc[:, 1] / np.maximum(stats_acc[:, 0], 1)
                msg = (f"  it {it:>8d}  lnL {float(np.sum(np.asarray(state.logl))):.4f}"
                       f"  pjump " + " ".join(f"{x:.2f}" for x in pj[:5])
                       + f"  [{time.time()-t0:.1f}s]")
                print(msg, file=log_fp or sys.stderr)

        return log

    def _reset_finetune(self, state: McmcState, stats_acc) -> McmcState:
        ft = np.array(state.finetune)
        for mv, fti in MOVE_TO_FT.items():
            prop, acc = stats_acc[mv]
            if prop > 0:
                ft[fti] = reset_finetune_onestep(acc / prop, ft[fti])
        return state._replace(finetune=jnp.asarray(ft, self.dtype))
