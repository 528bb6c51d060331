"""Pallas TPU kernel for the batched Felsenstein pruning pass.

The XLA version (felsenstein.loglikelihood) pays ~100us of gather
overhead per level step because every CLV select crosses HBM with
per-locus indices.  Here each grid cell owns ONE locus (x one pattern
tile) and keeps the whole CLV table in VMEM scratch, where dynamic
node indexing is cheap:

  grid (L, S_tiles); scratch clv[(N, C, A, S_tile)] ~ 254 KB max
  per level: P(t) entries computed as scalars from SMEM ages; the 4x4
  contraction is 16 unrolled scalar*vector FMAs over [S] lanes (VPU).

The kernel emits per-pattern site log-likelihoods [L, S]; pattern
weighting and diploid resolution-averaging stay in XLA (reduce_root).

Models: JC69, K80/F81/HKY/T92/F84 (TN93 closed form), GTR (cached
eigendecomposition).  Gamma rate categories loop statically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SubstModel

S_TILE = 128


def _p_entries_jc69(t):
    """Return P as a 4x4 nested tuple of scalars for branch length t."""
    e = jnp.exp(-4.0 / 3.0 * t)
    diag = 0.25 + 0.75 * e
    off = 0.25 - 0.25 * e
    return tuple(tuple(diag if i == j else off for j in range(4))
                 for i in range(4))


def _p_entries_tn93(t, fr, kappa1, kappa2):
    """TN93 closed form as scalars; fr is a tuple of 4 scalars."""
    pa, pc, pg, pt = fr
    R = pa + pg
    Y = pc + pt
    m = 2.0 * (pa * pg * kappa1 + pc * pt * kappa2 + R * Y)
    ts = t / m
    e2 = jnp.exp(-ts)
    e3 = jnp.exp(-(R * kappa1 + Y) * ts)
    e4 = jnp.exp(-(Y * kappa2 + R) * ts)
    cross = 1.0 - e2

    def same(pi, pother, pgroup, eg):
        return pi + pi * (1.0 - pgroup) / pgroup * e2 + pother / pgroup * eg

    def within(pj, pgroup, eg):
        return pj + pj * (1.0 - pgroup) / pgroup * e2 - pj / pgroup * eg

    paa = same(pa, pg, R, e3)
    pgg = same(pg, pa, R, e3)
    pcc = same(pc, pt, Y, e4)
    ptt = same(pt, pc, Y, e4)
    pag = within(pg, R, e3)
    pga = within(pa, R, e3)
    pct = within(pt, Y, e4)
    ptc = within(pc, Y, e4)
    return ((paa, pc * cross, pag, pt * cross),
            (pa * cross, pcc, pg * cross, pct),
            (pga, pc * cross, pgg, pt * cross),
            (pa * cross, ptc, pg * cross, ptt))


def _p_entries_gtr(t, eigw, eigT, eigTi):
    """P(t) = T expm1(w t) Ti + I with per-locus eigens (scalars)."""
    em = [jnp.expm1(eigw[k] * t) for k in range(4)]
    P = []
    for i in range(4):
        row = []
        for j in range(4):
            acc = 1.0 if i == j else 0.0
            for k in range(4):
                acc = acc + eigT[i][k] * em[k] * eigTi[k][j]
            row.append(acc)
        P.append(tuple(row))
    return tuple(P)


def _make_kernel(T: int, N: int, C: int, model: SubstModel, tiny: float):
    """Kernel body; per-locus parameters arrive as [1, 1, X] SMEM blocks
    (one locus row each; whole-array SMEM prefetch would blow the 1 MB
    SMEM budget past a few hundred loci)."""

    def kernel(order_ref, left_ref, right_ref, n_seq_ref, age_ref, mu_ref,
               rates_ref, freqs_ref, eigw_ref, eigT_ref, eigTi_ref,
               tips_ref, out_ref, clv, cum):
        nseq = n_seq_ref[0, 0, 0]
        mu = mu_ref[0, 0, 0]
        fr = tuple(freqs_ref[0, 0, a] for a in range(4))

        # load tips into scratch: tips_ref block is [1, T, A, S_tile];
        # broadcast over the category axis of the scratch row [C, A, S]
        for t in range(T):
            clv[t] = jnp.broadcast_to(tips_ref[0, t][None],
                                      (C,) + tips_ref.shape[2:])
        cum[:] = jnp.zeros_like(cum)

        def p_entries(t_eff):
            if model == SubstModel.JC69:
                return _p_entries_jc69(t_eff)
            if model == SubstModel.GTR:
                eigw = tuple(eigw_ref[0, 0, k] for k in range(4))
                eigT = tuple(tuple(eigT_ref[0, 0, i * 4 + k]
                                   for k in range(4)) for i in range(4))
                eigTi = tuple(tuple(eigTi_ref[0, 0, k * 4 + j]
                                    for j in range(4)) for k in range(4))
                return _p_entries_gtr(t_eff, eigw, eigT, eigTi)
            k1 = rates_ref[0, 0, C]  # kappa1/kappa2 appended after rates
            k2 = rates_ref[0, 0, C + 1]
            return _p_entries_tn93(t_eff, fr, k1, k2)

        for k in range(T - 1):      # static unroll over levels
            @pl.when(k < nseq - 1)
            def _():
                node = order_ref[0, 0, k]
                lc = left_ref[0, 0, node]
                rc = right_ref[0, 0, node]
                na = age_ref[0, 0, node]
                tl = jnp.maximum(na - age_ref[0, 0, lc], 0.0) * mu
                tr = jnp.maximum(na - age_ref[0, 0, rc], 0.0) * mu

                xl = clv[lc]                              # [C, A, S]
                xr = clv[rc]
                ys = []
                for c in range(C):
                    rate = rates_ref[0, 0, c]
                    Pl = p_entries(tl * rate)
                    Pr = p_entries(tr * rate)
                    # vectorize the 4-state contraction over the output
                    # state axis: 4 broadcast-FMAs of [A, S] shape (full
                    # sublane use) instead of 16 one-sublane [S] ops
                    yl = yr = None
                    for b in range(4):
                        cl = jnp.stack([Pl[a][b] for a in range(4)]
                                       ).reshape(4, 1)
                        cr = jnp.stack([Pr[a][b] for a in range(4)]
                                       ).reshape(4, 1)
                        yl = cl * xl[c, b][None, :] + (0.0 if yl is None
                                                       else yl)
                        yr = cr * xr[c, b][None, :] + (0.0 if yr is None
                                                       else yr)
                    ys.append(yl * yr)
                y = jnp.stack(ys)                         # [C, A, S]
                # rescale every 2nd level: the f32 exponent headroom
                # comfortably covers two unscaled 4-state pruning steps
                if k % 2 == 1 or k == T - 2:
                    m = jnp.maximum(jnp.max(y, axis=(0, 1), keepdims=True),
                                    tiny)
                    clv[node] = y / m
                    cum[0] = cum[0] + jnp.log(m[0, 0])
                else:
                    clv[node] = y

        # root = order[nseq - 2] (or tip 0 for single-sequence loci)
        root = jnp.where(nseq >= 2,
                         order_ref[0, 0, jnp.maximum(nseq - 2, 0)], 0)
        slab = clv[root]                                   # [C, A, S]
        acc = jnp.zeros_like(slab[0, 0])
        for c in range(C):
            for a in range(4):
                acc = acc + fr[a] * slab[c, a]
        acc = acc * (1.0 / C)
        out_ref[0, 0] = jnp.log(jnp.maximum(acc, tiny)) + cum[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("model", "n_cats"))
def site_logl_pallas(order, left, right, n_seq, age, mu, rates_kappa,
                     freqs, eigw, eigT, eigTi, tips, *, model: SubstModel,
                     n_cats: int):
    """Per-pattern site log-likelihoods [L, S] via the VMEM kernel.

    ``tips`` must be [L, T, A, S] (A-major layout), S a multiple of 128.
    ``rates_kappa`` is [L, C+2]: category rates with kappa1, kappa2
    appended.
    """
    L, T, A, S = tips.shape
    N = left.shape[1]
    C = n_cats
    tiny = 1e-30
    kernel = _make_kernel(T, N, C, model, tiny)
    n_tiles = S // S_TILE

    # per-locus parameter arrays are reshaped [L, 1, X] and fed as
    # (1, 1, X) SMEM blocks: block dims (1, X) match the trailing array
    # dims exactly, satisfying the TPU "(8, 128)-divisible or full-dim"
    # rule, and SMEM holds only one locus row per grid cell (whole-array
    # scalar prefetch blows the 1 MB SMEM budget past ~500 loci)
    def smem_spec(x):
        return pl.BlockSpec((1, 1, x.shape[2]), lambda l, s: (l, 0, 0),
                            memory_space=pltpu.SMEM)

    def r3(a):
        return a.reshape(L, 1, -1)

    smem_args = [r3(order.astype(jnp.int32)), r3(left.astype(jnp.int32)),
                 r3(right.astype(jnp.int32)), r3(n_seq.astype(jnp.int32)),
                 r3(age), r3(mu), r3(rates_kappa), r3(freqs), r3(eigw),
                 r3(eigT), r3(eigTi)]
    in_specs = [smem_spec(a) for a in smem_args] + [
        pl.BlockSpec((1, T, A, S_TILE), lambda l, s: (l, 0, 0, s)),
    ]

    import os
    interpret = os.environ.get("BPP_TPU_PALLAS") == "interpret"
    out = pl.pallas_call(
        kernel,
        grid=(L, n_tiles),
        in_specs=in_specs,
        # out is [L, 1, S]: a (1, 1, S_TILE) block satisfies the tiling
        # rule where a 2-D (1, S_TILE) cannot
        out_specs=pl.BlockSpec((1, 1, S_TILE), lambda l, s: (l, 0, s)),
        out_shape=jax.ShapeDtypeStruct((L, 1, S), tips.dtype),
        scratch_shapes=[
            pltpu.VMEM((N, C, 4, S_TILE), tips.dtype),
            pltpu.VMEM((1, S_TILE), tips.dtype),
        ],
        interpret=interpret,
    )(*smem_args, tips)
    return out.reshape(L, S)
