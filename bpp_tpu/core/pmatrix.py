"""Batched transition-probability matrices P(t).

TPU-native replacement for the reference's per-branch pmatrix code
(``src/core_pmatrix.c``): closed forms for JC69/K80/F81/HKY/TN93
(``core_pmatrix.c:299-587``) vectorized over arbitrary leading batch
dims, and the eigendecomposition path for GTR
(``pll_update_eigen`` ``core_pmatrix.c:239``,
``P = V·expm1(Λrt)·V⁻¹ + I`` ``core_pmatrix.c:785-872``).

State order is A, C, G, T (bit order of the ambiguity masks).
Branch lengths are expected substitutions per site; matrices are rate-
normalized so that ``-Σ π_i Q_ii = 1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pmatrix_jc69(t):
    """JC69 P(t); t is any-shaped array -> [..., 4, 4]."""
    e = jnp.exp(-4.0 / 3.0 * t)[..., None, None]
    eye = jnp.eye(4, dtype=e.dtype)
    return 0.25 + 0.75 * e * eye - 0.25 * e * (1.0 - eye)


def pmatrix_tn93(t, freqs, kappa1, kappa2):
    """TN93 P(t) closed form; HKY when kappa1==kappa2, F81 at kappa=1.

    Args:
      t: branch lengths ``[...]``.
      freqs: equilibrium frequencies ``[..., 4]`` broadcastable to t.
      kappa1: purine transition/transversion ratio (A<->G), ``[...]``.
      kappa2: pyrimidine ratio (C<->T), ``[...]``.
    """
    pa, pc, pg, pt = (freqs[..., i] for i in range(4))
    R = pa + pg
    Y = pc + pt
    # mean rate for normalization (beta = 1 unit): m = 2 pA pG k1 + 2 pC pT k2
    #   + 2 (pR pY) * 1
    m = 2.0 * (pa * pg * kappa1 + pc * pt * kappa2 + R * Y)
    ts = t / m
    e2 = jnp.exp(-ts)
    e3 = jnp.exp(-(R * kappa1 + Y) * ts)
    e4 = jnp.exp(-(Y * kappa2 + R) * ts)

    def same(pi, pother, pgroup, egroup):
        return pi + pi * (1.0 - pgroup) / pgroup * e2 + pother / pgroup * egroup

    def within(pj, pgroup, egroup):
        # i -> j, both in the same group (i != j)
        return pj + pj * (1.0 - pgroup) / pgroup * e2 - pj / pgroup * egroup

    cross = 1.0 - e2  # multiplied by target freq

    paa = same(pa, pg, R, e3)
    pgg = same(pg, pa, R, e3)
    pcc = same(pc, pt, Y, e4)
    ptt = same(pt, pc, Y, e4)
    pag = within(pg, R, e3)
    pga = within(pa, R, e3)
    pct = within(pt, Y, e4)
    ptc = within(pc, Y, e4)

    row_a = jnp.stack([paa, pc * cross, pag, pt * cross], axis=-1)
    row_c = jnp.stack([pa * cross, pcc, pg * cross, pct], axis=-1)
    row_g = jnp.stack([pga, pc * cross, pgg, pt * cross], axis=-1)
    row_t = jnp.stack([pa * cross, ptc, pg * cross, ptt], axis=-1)
    return jnp.stack([row_a, row_c, row_g, row_t], axis=-2)


def pmatrix_hky(t, freqs, kappa):
    return pmatrix_tn93(t, freqs, kappa, kappa)


def pmatrix_k80(t, kappa):
    q = jnp.full(jnp.shape(t) + (4,), 0.25, dtype=jnp.result_type(t, 0.1))
    return pmatrix_tn93(t, q, kappa, kappa)


def pmatrix_f81(t, freqs):
    one = jnp.ones_like(t)
    return pmatrix_tn93(t, freqs, one, one)


def gtr_eigen(freqs, rates):
    """Eigendecomposition of a reversible rate matrix.

    Args:
      freqs: ``[..., S]`` equilibrium frequencies.
      rates: ``[..., S*(S-1)/2]`` upper-triangle exchangeabilities, row
        major — for DNA: (AC, AG, AT, CG, CT, GT), matching the
        reference's qrates order.

    Returns:
      (eigvals ``[..., S]``, T ``[..., S, S]``, Tinv) such that
      ``Q = T diag(eigvals) Tinv`` and ``-Σ π_i Q_ii = 1``.
    """
    S = freqs.shape[-1]
    iu = jnp.triu_indices(S, 1)
    shape = jnp.broadcast_shapes(freqs.shape[:-1], rates.shape[:-1])
    R = jnp.zeros(shape + (S, S), dtype=freqs.dtype)
    R = R.at[..., iu[0], iu[1]].set(rates)
    R = R + jnp.swapaxes(R, -1, -2)
    Q = R * freqs[..., None, :]
    diag = -Q.sum(-1)
    Q = Q + diag[..., None] * jnp.eye(S, dtype=Q.dtype)
    # normalize mean rate to 1
    mu = (freqs * -diag).sum(-1)          # sum pi_i * (-Q_ii)
    Q = Q / mu[..., None, None]
    # symmetrize: B = diag(sqrt(pi)) Q diag(1/sqrt(pi)) is symmetric
    sq = jnp.sqrt(freqs)
    B = sq[..., :, None] * Q / sq[..., None, :]
    w, V = jnp.linalg.eigh(B)
    T = V / sq[..., :, None]
    Tinv = jnp.swapaxes(V, -1, -2) * sq[..., None, :]
    return w, T, Tinv


def pmatrix_eigen(t, eigvals, T, Tinv):
    """P(t) = T expm1(Λt) Tinv + I (expm1 trick of core_pmatrix.c:834)."""
    em1 = jnp.expm1(eigvals[..., None, :] * t[..., None, None])  # [...,1,S]
    # VPU broadcast-sum, not einsum: a 4-wide matmul would hit the MXU's
    # bf16 default and inject noise into every P(t)
    P = jnp.sum(T[..., :, None, :] * em1[..., 0, None, None, :]
                * jnp.swapaxes(Tinv, -1, -2)[..., None, :, :], axis=-1)
    S = T.shape[-1]
    P = P + jnp.eye(S, dtype=P.dtype)
    return P


# --- empirical amino-acid models (locus.c:985-1110 model table) --------------

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def aa_eigen(model_name: str):
    """Constant eigensystem of an empirical AA model (float64 numpy).

    Returns (w, T, Tinv, freqs) with Q = T diag(w) Tinv, mean rate 1.
    Symmetrized decomposition as in pll_update_eigen
    (core_pmatrix.c:239): B = D^1/2 Q D^-1/2 is symmetric for a
    reversible Q, so eigh is exact and stable.
    """
    from .aa_matrices import AA_MODELS, aa_qmatrix

    rates, freqs = AA_MODELS[model_name]
    Q = aa_qmatrix(rates, freqs)
    sq = np.sqrt(freqs)
    B = sq[:, None] * Q / sq[None, :]
    w, V = np.linalg.eigh((B + B.T) / 2.0)
    T = V / sq[:, None]
    Tinv = V.T * sq[None, :]
    return w, T, Tinv, freqs


def pmatrix_aa(t_eff, model_name: str):
    """P(t) for an empirical AA model: ``t_eff [...]`` -> ``[..., 20, 20]``.

    20-wide contraction runs as one fp32 matmul on the MXU
    (precision=HIGHEST keeps the f32x3 path, not bf16).
    """
    dtype = t_eff.dtype
    w, T, Tinv, _ = aa_eigen(model_name)
    wj = jnp.asarray(w, dtype)
    Tj = jnp.asarray(T, dtype)
    Tij = jnp.asarray(Tinv, dtype)
    em1 = jnp.expm1(t_eff[..., None] * wj)               # [..., A]
    tmp = Tj * em1[..., None, :]                         # [..., A(a), A(j)]
    P = jnp.einsum("...aj,jk->...ak", tmp, Tij,
                   precision=jax.lax.Precision.HIGHEST)
    return P + jnp.eye(20, dtype=dtype)
