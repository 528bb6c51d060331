"""Trait branch-rate moves (prop_branch_rates_trait, morph.c:1177).

Under the strict clock each trait partition carries ONE rate shared by
every species branch (prop_branch_rates_strict morph.c:1100); under a
relaxed clock every (partition, branch) has its own rate with an iid
Gamma(a, b) prior (prop_branch_rates_relax morph.c:1032).  Both are
log-scale Bactrian slides reflected into [-99, 99].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BppConfig, Clock
from . import rng
from .clock_moves import _logslide
from .state import FT_BRATE_M, Ctx, McmcState


def trait_brate_move(ctx: Ctx, cfg: BppConfig, state: McmcState, key):
    if ctx.trait_fn is not None:
        tfn = ctx.trait_fn
    else:
        sp = state.sp

        def tfn(tau, brate):
            return ctx.trait_fn_topo(sp.left, sp.right, sp.parent, tau,
                                     brate)
    brate = state.trait.brate
    tlogl = state.trait.logl
    n_part, H = brate.shape
    a = cfg.trait_brate_alpha
    b = cfg.trait_brate_beta
    eps = state.finetune[FT_BRATE_M]
    tau = state.sp.tau
    nonroot = state.sp.parent >= 0
    nprop = jnp.zeros((), jnp.int32)
    nacc = jnp.zeros((), jnp.int32)

    if cfg.clock == Clock.GLOBAL:
        # one shared rate per partition (morph.c:1100); the prior term
        # enters once like the reference's single-parameter treatment
        keys = jax.random.split(key, n_part)
        for n in range(n_part):
            k1, k2 = jax.random.split(keys[n])
            old = brate[n, 0]
            new, dlog = _logslide(k1, old, eps)
            brate_new = brate.at[n].set(jnp.full((H,), new, brate.dtype))
            tl_new = tfn(tau, brate_new)
            lnacc = (dlog + (a - 1.0) * jnp.log(new / old)
                     - b * (new - old) + tl_new[n] - tlogl[n])
            accept = rng.mh_accept(k2, lnacc)
            brate = jnp.where(accept, brate_new, brate)
            tlogl = jnp.where(accept, tl_new, tlogl)
            nprop = nprop + 1
            nacc = nacc + accept.astype(jnp.int32)
    else:
        # per-(partition, branch) rates (morph.c:1032)
        keys = jax.random.split(key, n_part)
        for n in range(n_part):

            def body(h, carry, n=n):
                brate, tlogl, kkey, nprop, nacc = carry
                kkey, k1, k2 = jax.random.split(kkey, 3)
                active = nonroot[h]
                old = brate[n, h]
                new, dlog = _logslide(k1, old, eps)
                new = jnp.where(active, new, old)
                brate_new = brate.at[n, h].set(new)
                tl_new = tfn(tau, brate_new)
                lnacc = (dlog + (a - 1.0) * jnp.log(new / old)
                         - b * (new - old) + tl_new[n] - tlogl[n])
                accept = rng.mh_accept(k2, lnacc) & active
                brate = jnp.where(accept, brate_new, brate)
                tlogl = jnp.where(accept, tl_new, tlogl)
                nprop = nprop + active.astype(jnp.int32)
                nacc = nacc + accept.astype(jnp.int32)
                return (brate, tlogl, kkey, nprop, nacc)

            brate, tlogl, _, nprop, nacc = jax.lax.fori_loop(
                0, H, body, (brate, tlogl, keys[n], nprop, nacc))

    new_state = state._replace(
        trait=state.trait._replace(brate=brate, logl=tlogl))
    return new_state, (nprop, nacc)
