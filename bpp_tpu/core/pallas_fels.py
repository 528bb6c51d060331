"""Pallas TPU kernel for the batched Felsenstein pruning pass.

The XLA version (felsenstein.loglikelihood) pays ~10-20us of fixed
per-op overhead for every per-locus gather in its level scan.  Here
each grid cell owns ONE locus (x one pattern tile) and keeps the whole
CLV table in VMEM scratch, where dynamic node indexing is a cheap
address computation.

v2 design notes (the v1 kernel spent ~8 Mosaic ops per scalar stack
building P(t) columns in vector registers):

  * All transcendentals are hoisted OUT of the kernel: XLA precomputes
    the per-(node, category) exponential factors (exp for JC69/TN93,
    expm1(w t) for GTR) in one fused elementwise op and passes them as
    SMEM scalars.
  * The 4x4 contraction uses the spectral structure of each model
    family instead of 16 generic FMAs: JC69 needs 2 vector ops + a
    3-add row reduction; TN93 (covers K80/F81/HKY/T92/F84) needs ~15
    row ops via its 4-eigenvalue decomposition; GTR uses the cached
    eigen basis (T (em . (Ti x)) + x).
  * CLVs are rescaled EVERY level by the per-site max (the v1
    every-other-level parity scheme could compound unscaled magnitudes
    along a lineage and underflow f32 on divergent loci).

The kernel emits per-pattern site log-likelihoods [L, S]; pattern
weighting and diploid resolution-averaging stay in XLA (reduce_root).

Replaces the reference's SIMD CLV kernels (src/core_partials_*.c
pll_core_update_partial_ii, src/core_likelihood.c
pll_core_root_loglikelihood) and per-branch P(t) construction
(src/core_pmatrix.c:299-587 closed forms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SubstModel

S_TILE = 128

# number of precomputed exponential factors per (node, category)
_KFAC = {"jc69": 1, "tn93": 3, "gtr": 4}


def model_family(model: SubstModel) -> str:
    if model == SubstModel.JC69:
        return "jc69"
    if model == SubstModel.GTR:
        return "gtr"
    return "tn93"           # K80/F81/HKY/T92/F84/TN93 closed form


def efactors(model: SubstModel, t_eff, freqs, kappa1, kappa2, eigw):
    """Per-(locus, node, cat) exponential factors [L, N, C, K] + the
    per-locus contraction coefficients [L, 10] (TN93 family only).

    ``t_eff [L, N, C]`` are rate-scaled branch lengths.  Computing
    these OUTSIDE the kernel turns per-level scalar transcendental
    chains into one fused XLA elementwise op.
    """
    fam = model_family(model)
    if fam == "jc69":
        e = jnp.exp(-4.0 / 3.0 * t_eff)
        return e[..., None], None
    if fam == "gtr":
        em = jnp.expm1(eigw[:, None, None, :] * t_eff[..., None])
        return em, None
    # TN93 family: eigenvalue factors e2 (any), e3 (purine), e4 (pyr)
    pa, pc, pg, pt = (freqs[:, a] for a in range(4))
    R = pa + pg
    Y = pc + pt
    m = 2.0 * (pa * pg * kappa1 + pc * pt * kappa2 + R * Y)
    ts = t_eff / m[:, None, None]
    e2 = jnp.exp(-ts)
    e3 = jnp.exp(-(R * kappa1 + Y)[:, None, None] * ts)
    e4 = jnp.exp(-(Y * kappa2 + R)[:, None, None] * ts)
    efac = jnp.stack([e2, e3, e4], axis=-1)
    coefs = jnp.stack([
        pa, pc, pg, pt,
        (1.0 - R) / R, (1.0 - Y) / Y,
        pg / R, pa / R, pt / Y, pc / Y,
    ], axis=-1)
    return efac, coefs


def _make_kernel(T: int, N: int, C: int, fam: str, K: int, tiny: float,
                 G: int):
    """Kernel body; per-locus parameters arrive as [1, 1, X] SMEM blocks
    (one locus row each; whole-array SMEM prefetch would blow the 1 MB
    SMEM budget past a few hundred loci).

    Padding is predicated OUT at two granularities, so heterogeneous
    loci cost what their real data costs, not what the global pad shape
    costs (the TPU-native replacement for the reference's zigzag locus
    load balancer, threads.c:265 load_balance_zigzag):
      * levels: the pruning loop body runs only for k < n_seq-1, so a
        4-sequence locus in a batch padded to 16 tips does 3 updates,
        not 15;
      * pattern tiles: a whole (locus, tile) grid cell whose 128-column
        tile lies beyond that locus's real pattern count writes zeros
        and skips the pruning entirely.
    """

    def kernel(order_ref, left_ref, right_ref, n_seq_ref, npat_ref,
               efac_ref, freqs_ref, coef_ref, eigT_ref, eigTi_ref,
               tips_ref, out_ref, clv, cum):
        live = pl.program_id(1) * (G * S_TILE) < npat_ref[0, 0, 0]

        @pl.when(jnp.logical_not(live))
        def _():
            # all-padding tile: the weight vector is 0 there, but the
            # output must still be written (and finite)
            out_ref[0] = jnp.zeros_like(out_ref[0])

        @pl.when(live)
        def _():
            _kernel_body(order_ref, left_ref, right_ref, n_seq_ref,
                         efac_ref, freqs_ref, coef_ref, eigT_ref,
                         eigTi_ref, tips_ref, out_ref, clv, cum)

    def _kernel_body(order_ref, left_ref, right_ref, n_seq_ref, efac_ref,
                     freqs_ref, coef_ref, eigT_ref, eigTi_ref,
                     tips_ref, out_ref, clv, cum):
        nseq = n_seq_ref[0, 0, 0]
        fr = tuple(freqs_ref[0, 0, a] for a in range(4))

        # load tips into scratch: tips_ref block is [1, T, A, S_tile];
        # broadcast over the category axis of the scratch row [C, A, S]
        for t in range(T):
            clv[t] = jnp.broadcast_to(tips_ref[0, t][None],
                                      (C,) + tips_ref.shape[2:])
        cum[:] = jnp.zeros_like(cum)

        if fam == "tn93":
            pa, pc, pg, pt, rR, rY, cA, cG, cC, cT = (
                coef_ref[0, 0, i] for i in range(10))
        if fam == "gtr":
            eigT = tuple(tuple(eigT_ref[0, 0, i * 4 + k]
                               for k in range(4)) for i in range(4))
            eigTi = tuple(tuple(eigTi_ref[0, 0, k * 4 + j]
                                for j in range(4)) for k in range(4))

        def contract(x, node, c):
            """y[a, S] = sum_b P(t_node,c)[a, b] x[b, S] per model family."""
            base = node * (C * K) + c * K
            if fam == "jc69":
                e = efac_ref[0, 0, base]
                s = (x[0] + x[1]) + (x[2] + x[3])        # [S]
                t1 = (0.25 * (1.0 - e)) * s
                return e * x + t1[None, :]               # [A, S]
            if fam == "tn93":
                e2 = efac_ref[0, 0, base]
                e3 = efac_ref[0, 0, base + 1]
                e4 = efac_ref[0, 0, base + 2]
                xA, xC, xG, xT = x[0], x[1], x[2], x[3]
                WR = pa * xA + pg * xG
                WY = pc * xC + pt * xT
                W = WR + WY
                UR = W + e2 * (rR * WR - WY)
                UY = W + e2 * (rY * WY - WR)
                dRG = e3 * (xA - xG)
                dCT = e4 * (xC - xT)
                return jnp.stack([UR + cA * dRG, UY + cC * dCT,
                                  UR - cG * dRG, UY - cT * dCT])
            # gtr: y = T (em . (Ti x)) + x
            em = [efac_ref[0, 0, base + k] for k in range(4)]
            z = [em[k] * (eigTi[k][0] * x[0] + eigTi[k][1] * x[1]
                          + eigTi[k][2] * x[2] + eigTi[k][3] * x[3])
                 for k in range(4)]
            return jnp.stack(
                [x[i] + eigT[i][0] * z[0] + eigT[i][1] * z[1]
                 + eigT[i][2] * z[2] + eigT[i][3] * z[3]
                 for i in range(4)])

        for k in range(T - 1):      # static unroll over levels
            @pl.when(k < nseq - 1)
            def _():
                node = order_ref[0, 0, k]
                lc = left_ref[0, 0, node]
                rc = right_ref[0, 0, node]
                xl = clv[lc]                              # [C, A, S]
                xr = clv[rc]
                ys = []
                for c in range(C):
                    yl = contract(xl[c], lc, c)
                    yr = contract(xr[c], rc, c)
                    ys.append(yl * yr)
                y = jnp.stack(ys) if C > 1 else ys[0][None]  # [C, A, S]
                # rescale every level: per-site max renormalization
                # (core_partials.c:682-755 scaler analog, value-exact)
                m = jnp.maximum(jnp.max(y, axis=(0, 1), keepdims=True),
                                tiny)
                clv[node] = y / m
                cum[0] = cum[0] + jnp.log(m[0, 0])

        # root = order[nseq - 2] (or tip 0 for single-sequence loci)
        root = jnp.where(nseq >= 2,
                         order_ref[0, 0, jnp.maximum(nseq - 2, 0)], 0)
        slab = clv[root]                                   # [C, A, S]
        acc = jnp.zeros_like(slab[0, 0])
        for c in range(C):
            for a in range(4):
                acc = acc + fr[a] * slab[c, a]
        acc = acc * (1.0 / C)
        out_ref[0] = jnp.log(jnp.maximum(acc, tiny)) + cum[0]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("model", "n_cats", "g_pack"))
def site_logl_pallas(order, left, right, parent, n_seq, age, mu,
                     rates_kappa, freqs, eigw, eigT, eigTi, tips, *,
                     model: SubstModel, n_cats: int, blen=None,
                     n_pat=None, g_pack: int = 1):
    """Per-pattern site log-likelihoods [L, S] via the VMEM kernel.

    ``tips`` must be [L, T, A, S] (A-major layout), S a multiple of 128.
    ``rates_kappa`` is [L, C+2]: category rates with kappa1, kappa2
    appended.  ``blen`` (optional, [L, N]) supplies precomputed
    expected-substitutions branch lengths — the relaxed-clock path
    (felsenstein.relaxed_branch_lengths / the migration sub-edge sweep)
    feeds these; when absent, strict-clock lengths are derived from
    node ages scaled by ``mu`` (locus.c:1139-1151 both clock paths feed
    the same CLV kernels in the reference).

    ``g_pack`` (static, must divide S//128) stacks G consecutive
    128-pattern tiles on the vreg SUBLANE axis ([C, A, G, 128] CLVs).
    In production it stays 1: the lane-packed kernel (pallas_pack)
    superseded sublane packing — it fills whole vregs AND removes the
    128-lane padding — so this per-locus kernel now serves only the
    diploid-resolution path, whose res_map gathers need the [L, S]
    per-pattern output this kernel emits.
    """
    L, T, A, S = tips.shape
    N = left.shape[1]
    C = n_cats
    tiny = 1e-30
    fam = model_family(model)
    K = _KFAC[fam]
    G = g_pack
    S128 = S // S_TILE
    if S128 % G != 0:
        raise ValueError(f"g_pack {G} must divide S/128 = {S128}")
    kernel = _make_kernel(T, N, C, fam, K, tiny, G)
    n_tiles = S128 // G

    # rate-scaled branch lengths -> exponential factors, in XLA
    rates = rates_kappa[:, :C]
    kappa1 = rates_kappa[:, C]
    kappa2 = rates_kappa[:, C + 1]
    if blen is None:
        from ..trees.gtree import gather_rows
        page = gather_rows(age, jnp.maximum(parent, 0))
        blen = jnp.where(parent >= 0, jnp.maximum(page - age, 0.0), 0.0) \
            * mu[:, None]
    t_eff = blen[:, :, None] * rates[:, None, :]            # [L, N, C]
    efac, coefs = efactors(model, t_eff, freqs, kappa1, kappa2, eigw)
    efac = efac.reshape(L, 1, N * C * K)
    if coefs is None:
        coefs = jnp.zeros((L, 10), efac.dtype)
    if n_pat is None:
        # no per-locus pattern counts: every tile is live
        n_pat = jnp.full((L,), S, jnp.int32)

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
                 r3(n_pat.astype(jnp.int32)),
                 efac, r3(freqs), r3(coefs), r3(eigT), r3(eigTi)]
    in_specs = [smem_spec(a) for a in smem_args] + [
        # tips viewed [L, T, A, S/128, 128]: each cell takes G stacked
        # lane-tiles on the sublane axis
        pl.BlockSpec((1, T, A, G, S_TILE), lambda l, s: (l, 0, 0, s, 0)),
    ]

    import os
    interpret = os.environ.get("BPP_TPU_PALLAS") == "interpret"
    out = pl.pallas_call(
        kernel,
        grid=(L, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, S_TILE), lambda l, s: (l, s, 0)),
        out_shape=jax.ShapeDtypeStruct((L, S128, S_TILE), tips.dtype),
        scratch_shapes=[
            pltpu.VMEM((N, C, 4, G, S_TILE), tips.dtype),
            pltpu.VMEM((1, G, S_TILE), tips.dtype),
        ],
        interpret=interpret,
    )(*smem_args, tips.reshape(L, T, A, S128, S_TILE))
    return out.reshape(L, S)
