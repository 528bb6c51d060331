"""theta-integrated-out ("notheta") MSC density machinery.

Reference: ``thetaprior = invgamma a b e`` integrates every population's
theta out of the MSC density analytically under its conjugate
inverse-gamma prior (gtree.c:3780 ``update_logpg_contrib``; state kept
in ``stree->notheta_logpr`` bpp.h:646).  The total density no longer
factorizes over loci — each population's term couples all loci through
the aggregated coalescent counts K_h and waiting-time sums C_h:

  logPG = sum_h [ K_h log 2 - sum_l k_lh log(h_l)
                  + a log b - lgamma(a)
                  + lgamma(a + K_h) - (a + K_h) log(b + C_h) ]

with k_lh the coalescent count of locus l in population h, h_l the
locus heredity scalar, and C_h = sum_l T2_lh / h_l.

Because of the coupling, the reference forces the gene-tree sweeps
serial over loci in this mode (method.c:5490 "call serial version when
thetas are integrated out").  Here batched proposals stay batched — the
likelihood deltas and candidate (k, T2) rows are computed for all loci
in parallel — and only the accept decisions run as an exact serial
chain over loci (``lax.scan`` carrying the running K/C sums), which is
the same Markov chain the reference simulates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..trees import coalescent as coalmod


def total_integrated(cfg, coal, t2h, heredity, locus_mask):
    """Scalar integrated logPG over all loci (notheta_logpr)."""
    return coalmod.msc_logprob_integrated(
        coal, t2h, heredity, cfg.thetaprior.alpha, cfg.thetaprior.beta,
        locus_mask)


def pop_sums(coal, t2h, heredity, locus_mask):
    """Aggregated (K [H], C [H]) over loci from per-locus caches."""
    mask = locus_mask[:, None]
    K = jnp.sum(jnp.where(mask, coal, 0), axis=0).astype(t2h.dtype)
    C = jnp.sum(jnp.where(mask, t2h / heredity[:, None], 0.0), axis=0)
    return K, C


def scan_accept(key, cfg, dother, coal_o, t2_o, h_o, coal_n, t2_n, h_n,
                mask, locus_mask):
    """Exact serial MH accept chain over loci for per-locus proposals.

    Args:
      dother: [L] the locus-factorizing part of ln acceptance
        (likelihood delta + proposal asymmetry + per-locus priors).
      coal_o/t2_o/h_o: current per-locus stats [L,H]/[L,H]/[L].
      coal_n/t2_n/h_n: candidate stats (rows where ``mask`` is False
        must equal the old rows).
      mask: [L] which loci actually propose.
      locus_mask: [L] real (non-padded) loci.

    Returns (accept [L] bool).
    """
    a = jnp.asarray(cfg.thetaprior.alpha, t2_o.dtype)
    b = jnp.asarray(cfg.thetaprior.beta, t2_o.dtype)
    t2c_o = t2_o / h_o[:, None]
    t2c_n = t2_n / h_n[:, None]
    K0, C0 = pop_sums(coal_o, t2_o, h_o, locus_mask)
    # per-locus heredity/log2 term delta: sum_h [k' log(2/h') - k log(2/h)]
    dh = (jnp.sum(coal_n, axis=1) * jnp.log(2.0 / h_n)
          - jnp.sum(coal_o, axis=1) * jnp.log(2.0 / h_o))
    us = jax.random.uniform(key, (dother.shape[0],))

    def body(carry, inp):
        K, C = carry
        co, cn, to, tn, dot, dhl, u, m = inp
        Kn = K + (cn - co).astype(K.dtype)
        Cn = C + (tn - to)
        dlg = jnp.sum(jax.lax.lgamma(a + Kn) - (a + Kn) * jnp.log(b + Cn)
                      - jax.lax.lgamma(a + K) + (a + K) * jnp.log(b + C))
        acc = (jnp.log(u) < dot + dhl + dlg) & m
        K = jnp.where(acc, Kn, K)
        C = jnp.where(acc, Cn, C)
        return (K, C), acc

    (_, _), accept = jax.lax.scan(
        body, (K0, C0),
        (coal_o, coal_n, t2c_o, t2c_n, dother, dh, us, mask))
    return accept
