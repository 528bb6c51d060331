"""Lane-packed Pallas likelihood kernel: many loci per 256-lane tile.

The per-locus kernel (pallas_fels) gives every locus its own grid cell
and pads its pattern axis to 128 lanes.  Real multilocus data sits far
from that shape: a 500-site JC69 alignment compresses to ~20-50
patterns, so most of every vector op is padding and the per-cell fixed
cost (grid step + DMA issue + per-level scalar loads) is paid per ~25
real patterns.  This kernel removes both overheads:

  * every locus occupies ``ceil(n_pat / 8)`` consecutive 8-lane
    SEGMENTS; segments from many loci pack into 256-lane tiles
    (2 x 128 lanes) — the memory-side analog of the reference's zigzag
    locus balancer (src/threads.c:265 load_balance_zigzag), with
    < ~15% pad instead of the 60-85% of the per-locus layout;
  * the pruning recursion runs on ``[8, 128]`` slabs (4 states x 2
    lane-groups = full f32 vregs) with per-LANE coefficient vectors,
    so one unrolled instruction stream serves the ~10-40 loci of a
    tile and the per-locus kernel's per-level scalar overhead
    disappears;
  * per-locus topology rides one-hot select chains: children live in
    level-slot rows (tip t -> row t, k-th oldest inner node of a locus
    -> row T+k) and ``x = where(idx == r, clv[r], x)`` over the live
    rows gathers each lane's child — no dynamic addressing at all
    (XLA/Mosaic per-lane gathers measured pathological on this TPU;
    the select chain is pure VPU work);
  * state sums / maxima over the 4 states use circular sublane rolls
    (rows are A-major ``a*2 + g``, so ``x + roll2 + roll4 + roll6``
    broadcasts each lane-group's state sum to every row).

All per-pass per-lane data (exponential factors, child rows, per-locus
contraction coefficients, frequencies) is packed into ONE f32 array
``combo [NT, D, 2, 128]`` built by a single row-gather + broadcast +
transpose in XLA (lane values repeat only 8x per segment, keeping the
duplicated volume ~ the CLV volume).

Replaces the same reference kernels as pallas_fels
(src/core_partials_*.c pll_core_update_partial_*,
src/core_likelihood.c pll_core_root_loglikelihood); the packing pass
replaces src/threads.c:265 load_balance_zigzag.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SubstModel
from .pallas_fels import _KFAC, efactors, model_family

SEG_W = 8            # lanes per segment (packing granularity)
G2 = 2               # 128-lane groups per tile (8 sublanes = 4 states x G2)
SL = 128 * G2        # lanes per tile
SEGS_PER_TILE = SL // SEG_W

# number of [8, 128] per-locus coefficient rows per model family
_NCF = {"jc69": 0, "tn93": 4, "gtr": 8}


def _combo_layout(T: int, C: int, fam: str):
    """Row offsets into the per-pass combo array (per-LANE f32 rows).

    Layout along D (each entry is one [G2, 128] lane row):
      e[k][side][c][j]  (T-1) * 2 * C * K   exponential factors
      idx[k][side]      (T-1) * 2           child level-slot rows (as f32)
      cf[i][a]          NCF * 4             per-locus coefficients, A-indexed
      frq[a]            4                   state frequencies
    """
    K = _KFAC[fam]
    ncf = _NCF[fam]
    off_e = 0
    off_idx = off_e + (T - 1) * 2 * C * K
    off_cf = off_idx + (T - 1) * 2
    off_frq = off_cf + ncf * 4
    D = off_frq + 4
    return dict(K=K, ncf=ncf, off_e=off_e, off_idx=off_idx,
                off_cf=off_cf, off_frq=off_frq, D=D)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("tips8", "w_flat", "statrows", "seg_locus_dev",
                 "bounds", "maxlvl_dev", "seg_table"),
    meta_fields=("n_loci", "n_tips", "n_tiles", "n_seg", "pad_frac"))
@dataclasses.dataclass(frozen=True)
class PackLayout:
    """Static packing of loci into lane segments (a pytree: device
    arrays ride as leaves, the shape-determining ints as treedef
    metadata, so jitted likelihood functions take it as an argument)."""

    n_loci: int
    n_tips: int              # T (tip capacity)
    n_tiles: int
    n_seg: int               # real segments (before tile padding)
    pad_frac: float          # fraction of lanes that are padding
    # device-resident static arrays
    tips8: jax.Array         # [NT, T, 8, 128] packed tip partials
    w_flat: jax.Array        # [NSEGP * SEG_W] pattern weights (0 = pad)
    statrows: jax.Array      # [NT, 2, G2, 128] f32: nlvl, root_row per lane
    seg_locus_dev: jax.Array  # [NSEGP] int32 (clipped to L-1 for gathers)
    bounds: jax.Array        # [L + 1] int32 first segment of each locus
    maxlvl_dev: jax.Array    # [NT, 1, 1] int32 (SMEM block)
    seg_table: jax.Array     # [L, SMAX] int32 segment ids per locus
    #                          (-1 = unused slot)


def build_pack_layout(tip_partials, weights, n_pat, n_seq,
                      locus_mask) -> PackLayout | None:
    """Host-side packing (init-time, numpy).

    ``tip_partials`` [L, T, S, A=4] 0/1 partials, ``weights`` [L, W]
    with W == S (identity pattern resolution — diploid loci use the
    per-locus kernel instead)."""
    tp = np.asarray(tip_partials)
    w = np.asarray(weights)
    n_pat = np.asarray(n_pat)
    n_seq = np.asarray(n_seq)
    mask = np.asarray(locus_mask)
    L, T, S, A = tp.shape
    if A != 4 or w.shape[1] != S:
        return None
    nseg_l = np.maximum(1, -(-np.maximum(n_pat, 1) // SEG_W))
    nseg_l = np.where(mask, nseg_l, 1)
    bounds = np.zeros(L + 1, np.int64)
    np.cumsum(nseg_l, out=bounds[1:])
    n_seg = int(bounds[-1])
    nt = -(-n_seg // SEGS_PER_TILE)
    nsegp = nt * SEGS_PER_TILE
    seg_locus = np.full(nsegp, L, np.int32)
    seg_off = np.zeros(nsegp, np.int32)
    seg_ids = np.arange(n_seg)
    seg_locus[:n_seg] = np.repeat(np.arange(L), nseg_l)
    seg_off[:n_seg] = (seg_ids - bounds[seg_locus[:n_seg]]) * SEG_W

    flat_locus = np.repeat(seg_locus, SEG_W)
    flat_pat = np.repeat(seg_off, SEG_W) + np.tile(np.arange(SEG_W), nsegp)
    live = (flat_locus < L) & (flat_pat < n_pat[np.minimum(flat_locus,
                                                           L - 1)])
    ll = np.minimum(flat_locus, L - 1)

    # tips: padding lanes behave like all-ambiguous sites (all-ones).
    # Index (locus, pattern) jointly — a tp[ll[live]] pre-gather would
    # materialize an [nlive, T, S, 4] intermediate (~2.5 GB at 10k loci)
    tips_lane = np.ones((nsegp * SEG_W, T, 4), np.float32)
    tips_lane[live] = tp[ll[live][:, None],
                         np.arange(T)[None, :],
                         flat_pat[live][:, None], :]
    tl = tips_lane.reshape(nt, SL, T, 4).transpose(0, 2, 3, 1)
    tips8 = np.ascontiguousarray(tl).reshape(nt, T, 8, 128)

    w_flat = np.zeros(nsegp * SEG_W, np.float32)
    w_flat[live] = w[ll[live], flat_pat[live]]

    nlvl_lane = np.zeros(nsegp * SEG_W, np.float32)
    nlvl_lane[live] = (n_seq[ll] - 1)[live]
    root_lane = np.zeros(nsegp * SEG_W, np.float32)
    rr = np.where(n_seq >= 2, T + n_seq - 2, 0).astype(np.float32)
    root_lane[live] = rr[ll][live]
    statrows = np.stack([nlvl_lane, root_lane], 0) \
        .reshape(2, nt, G2, 128).transpose(1, 0, 2, 3)

    tile_maxlvl = nlvl_lane.reshape(nt, SL).max(axis=1).astype(np.int32)
    pad_frac = 1.0 - float(live.sum()) / float(nsegp * SEG_W)

    # per-locus segment-id table for the root reduction: a FLAT sum of
    # <= SMAX values per locus (the old f32 prefix-sum-and-diff lost up
    # to 0.11 lnL to cancellation across loci at L=1000, round 5)
    smax = int(nseg_l.max())
    seg_table = np.full((L, smax), -1, np.int64)
    for li in range(L):
        k = int(nseg_l[li])
        seg_table[li, :k] = np.arange(bounds[li], bounds[li] + k)

    return PackLayout(
        n_loci=L, n_tips=T, n_tiles=nt, n_seg=n_seg, pad_frac=pad_frac,
        tips8=jnp.asarray(tips8),
        w_flat=jnp.asarray(w_flat),
        statrows=jnp.asarray(statrows.astype(np.float32)),
        seg_locus_dev=jnp.asarray(np.minimum(seg_locus, L - 1)),
        bounds=jnp.asarray(bounds.astype(np.int32)),
        maxlvl_dev=jnp.asarray(tile_maxlvl[:, None, None]),
        seg_table=jnp.asarray(seg_table.astype(np.int32)))


# --- per-pass device prep -------------------------------------------------------


def _onehot_gather(values, idx):
    """out[l, k, ...] = values[l, idx[l, k], ...] via one-hot einsum
    (take_along_axis lowers to a pathological serial gather on TPU)."""
    N = values.shape[1]
    oh = (idx[..., None] == jnp.arange(N)).astype(values.dtype)
    return jnp.einsum("lkn,ln...->lk...", oh, values,
                      precision=jax.lax.Precision.HIGHEST)


def _perlocus_rows(order, left, right, efac, coefs, freqs, eigT, eigTi,
                   model, T, C):
    """Per-locus combo rows ``[L, D]`` (f32), in _combo_layout order."""
    fam = model_family(model)
    K = _KFAC[fam]
    L = order.shape[0]
    dt = efac.dtype
    HI = jax.lax.Precision.HIGHEST
    KL = T - 1
    N = left.shape[1]
    lev = order[:, :KL].astype(jnp.int32)                     # [L, KL]
    # batched one-hot contractions: ONE [L,KL,N] one-hot of the level
    # schedule selects both children, ONE [L,2KL,N] one-hot of the
    # stacked children feeds both the level-slot rows and the e-factor
    # gathers, and posk (the inverse of the inner-id permutation) rides
    # a one-hot instead of an argsort — the prep glue was ~2x the
    # kernel's own runtime before this batching (round-5 marginal
    # profile: logl 0.25 ms/call, pallas_call alone 0.085 ms)
    ohlev = (lev[..., None] == jnp.arange(N)).astype(dt)      # [L,KL,N]
    lr = jnp.stack([left, right], axis=-1).astype(dt)         # [L,N,2]
    ch = jnp.round(jnp.einsum("lkn,lnc->lkc", ohlev, lr,
                              precision=HI)).astype(jnp.int32)
    lc, rc = ch[..., 0], ch[..., 1]
    # posk[l, n] = position of inner node (T+n) in lev (= inverse of
    # the permutation lev - T)
    inner_ids = lev - T                                       # in 0..KL-1
    ohinv = (inner_ids[:, :, None] == jnp.arange(KL)).astype(dt)
    posk = jnp.einsum("lkj,k->lj", ohinv,
                      jnp.arange(KL, dtype=dt), precision=HI)  # [L,KL] f
    chs = jnp.concatenate([lc, rc], axis=1)                   # [L, 2KL]
    ohch = (chs[..., None] == jnp.arange(N)).astype(dt)       # [L,2KL,N]
    inner_pos = jnp.einsum("lkj,lj->lk", ohch[:, :, T:T + KL],
                           posk, precision=HI)
    rows2 = jnp.where(chs < T, chs.astype(dt), T + inner_pos)
    rows = jnp.stack([rows2[:, :KL], rows2[:, KL:]], axis=2)  # [L,KL,2]

    # e-factors at the child nodes: [L, KL, 2, C, K]
    ef = efac.reshape(L, efac.shape[1], C * K)
    e2 = jnp.einsum("lkn,lnm->lkm", ohch, ef, precision=HI)   # [L,2KL,CK]
    e_lk = jnp.concatenate(
        [e2[:, :KL].reshape(L, KL, 1, C, K),
         e2[:, KL:].reshape(L, KL, 1, C, K)], axis=2)

    parts = [e_lk.reshape(L, -1), rows.reshape(L, -1)]

    if fam == "tn93":
        pa, pc, pg, pt = (coefs[:, i] for i in range(4))
        rR, rY = coefs[:, 4], coefs[:, 5]
        cA, cG, cC, cT = (coefs[:, i] for i in range(6, 10))
        pi = jnp.stack([pa, pc, pg, pt], 1)                   # [L, 4]
        ry = jnp.stack([rR, rY, rR, rY], 1)
        cs = jnp.stack([cA, cC, cG, cT], 1)
        pur = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 1.0, 0.0], dt),
                               (L, 4))
        parts.append(jnp.stack([pi, ry, cs, pur], 1).reshape(L, -1))
    elif fam == "gtr":
        # banded eigen entries: Ti band j at row k = Ti[k, (k+j)%4],
        # T band j at row a = T[a, (a+j)%4]
        a4 = jnp.arange(4)
        bTi = jnp.stack(
            [eigTi.reshape(L, 4, 4)[:, a4, (a4 + j) % 4] for j in range(4)],
            axis=1)                                           # [L, 4(j), 4(k)]
        bT = jnp.stack(
            [eigT.reshape(L, 4, 4)[:, a4, (a4 + j) % 4] for j in range(4)],
            axis=1)                                           # [L, 4(j), 4(a)]
        parts.append(jnp.concatenate(
            [bTi.reshape(L, -1), bT.reshape(L, -1)], axis=1))

    parts.append(freqs[:, :4].astype(dt))
    return jnp.concatenate(parts, axis=1)                     # [L, D]


def _to_lanes(x_seg):
    """[NSEGP, D] per-segment values -> [NT, D, G2, 128] lane layout."""
    nsegp, D = x_seg.shape
    nt = nsegp // SEGS_PER_TILE
    x = jnp.broadcast_to(x_seg[:, :, None], (nsegp, D, SEG_W))
    x = x.reshape(nt, SEGS_PER_TILE, D, SEG_W).transpose(0, 2, 1, 3)
    return x.reshape(nt, D, G2, 128)


# --- the kernel -----------------------------------------------------------------


def _rollA(x, j):
    """Row (a, g) of the result holds x[(a + j) % 4, g] (A-major [8, 128])."""
    if j % 4 == 0:
        return x
    return pltpu.roll(x, (8 - 2 * (j % 4)) % 8, 0)


def _roll_sum(x):
    return (x + pltpu.roll(x, 2, 0)) + (pltpu.roll(x, 4, 0)
                                        + pltpu.roll(x, 6, 0))


def _roll_max(x):
    return jnp.maximum(jnp.maximum(x, pltpu.roll(x, 2, 0)),
                       jnp.maximum(pltpu.roll(x, 4, 0),
                                   pltpu.roll(x, 6, 0)))


def _bcast8(x2):
    """[G2, 128] -> [8, 128] (replicate across the 4 state rows)."""
    return jnp.concatenate([x2, x2, x2, x2], axis=0)


def _stack8(x4):
    """list of 4 [G2, 128] -> [8, 128] rows (a, g) = a*G2 + g."""
    return jnp.concatenate(x4, axis=0)


def _make_kernel(T: int, C: int, fam: str, tiny: float):
    N = 2 * T - 1
    lay = _combo_layout(T, C, fam)
    K = lay["K"]

    def kernel(maxlvl_ref, combo_ref, stat_ref, tips_ref, out_ref,
               clv, cum):
        for t in range(T):
            row = tips_ref[0, t]
            for c in range(C):
                clv[t, c] = row
        cum[0] = jnp.zeros_like(cum[0])
        nlvl8 = _bcast8(stat_ref[0, 0])

        def crow(d):                       # combo lane row -> [G2, 128]
            return combo_ref[0, d]

        if fam == "tn93":
            cf0 = lay["off_cf"]
            pi8 = _stack8([crow(cf0 + 0 * 4 + a) for a in range(4)])
            ry8 = _stack8([crow(cf0 + 1 * 4 + a) for a in range(4)])
            cs8 = _stack8([crow(cf0 + 2 * 4 + a) for a in range(4)])
            pur8 = _stack8([crow(cf0 + 3 * 4 + a) for a in range(4)])
        if fam == "gtr":
            cf0 = lay["off_cf"]
            bTi = [_stack8([crow(cf0 + j * 4 + k) for k in range(4)])
                   for j in range(4)]
            bT = [_stack8([crow(cf0 + 16 + j * 4 + a) for a in range(4)])
                  for j in range(4)]

        def contract(x, e):
            """y = P(t) x on one [8, 128] slab; e = list of K [G2,128]."""
            if fam == "jc69":
                e1 = _bcast8(e[0])
                s = _roll_sum(x)
                return e1 * x + (0.25 * (1.0 - e1)) * s
            if fam == "tn93":
                e2 = _bcast8(e[0])
                e3 = _bcast8(e[1])
                e4 = _bcast8(e[2])
                px = pi8 * x
                W = _roll_sum(px)
                WR = _roll_sum(px * pur8)
                own = jnp.where(pur8 > 0.5, WR, W - WR)
                U = W + e2 * (ry8 * own - (W - own))
                d = x - _rollA(x, 2)       # (x_a - x_partner) per row
                e34 = jnp.where(pur8 > 0.5, e3, e4)
                return U + cs8 * (e34 * d)
            # gtr: y = x + T (em . (Ti x))
            em8 = _stack8([e[k] for k in range(4)])  # rows (k, g) = em_k
            z = (bTi[0] * x + bTi[1] * _rollA(x, 1)
                 + bTi[2] * _rollA(x, 2) + bTi[3] * _rollA(x, 3))
            z = em8 * z
            y = (bT[0] * z + bT[1] * _rollA(z, 1)
                 + bT[2] * _rollA(z, 2) + bT[3] * _rollA(z, 3))
            return x + y

        off_e, off_idx = lay["off_e"], lay["off_idx"]
        for k in range(T - 1):
            @pl.when(k < maxlvl_ref[0, 0, 0])
            def _():
                il8 = _bcast8(crow(off_idx + 2 * k))
                ir8 = _bcast8(crow(off_idx + 2 * k + 1))
                live8 = (jnp.asarray(float(k), cum[0].dtype)
                         < nlvl8).astype(cum[0].dtype)
                ys = []
                for c in range(C):
                    xl = clv[0, c]
                    xr = clv[0, c]
                    for r in range(1, T + k):
                        row = clv[r, c]
                        rf = float(r)
                        xl = jnp.where(il8 == rf, row, xl)
                        xr = jnp.where(ir8 == rf, row, xr)
                    base = off_e + (k * 2) * C * K
                    el = [crow(base + c * K + j) for j in range(K)]
                    er = [crow(base + C * K + c * K + j) for j in range(K)]
                    ys.append(contract(xl, el) * contract(xr, er))
                # renorm jointly across categories (one scale per site)
                m = _roll_max(ys[0])
                for c in range(1, C):
                    m = jnp.maximum(m, _roll_max(ys[c]))
                m = jnp.maximum(m, tiny)
                inv = 1.0 / m
                for c in range(C):
                    clv[T + k, c] = ys[c] * inv
                cum[0] = cum[0] + live8 * jnp.log(m)

        rr8 = _bcast8(stat_ref[0, 1])
        frq8 = _stack8([crow(lay["off_frq"] + a) for a in range(4)])
        acc = None
        for c in range(C):
            xroot = clv[0, c]
            for r in range(T, N):
                xroot = jnp.where(rr8 == float(r), clv[r, c], xroot)
            lik = _roll_sum(frq8 * xroot)
            acc = lik if acc is None else acc + lik
        if C > 1:
            acc = acc * (1.0 / C)
        out_ref[0] = jnp.log(jnp.maximum(acc, tiny)) + cum[0]

    return kernel


# --- public entry ---------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("model", "n_cats"))
def site_logl_packed(layout: PackLayout, order, left, right, parent,
                     n_seq, age, mu, rates_kappa, freqs, eigw, eigT,
                     eigTi, *, model: SubstModel, n_cats: int,
                     blen=None):
    """Per-locus log-likelihoods [L] via the lane-packed kernel.

    Mirrors site_logl_pallas's argument convention (rate-scaled branch
    lengths from ages unless ``blen`` is given) but returns the REDUCED
    per-locus values: pattern weighting happens in the packed lane
    space (weights are static), so no [L, S] intermediate exists.
    """
    T = layout.n_tips
    C = n_cats
    fam = model_family(model)
    L = left.shape[0]
    tiny = 1e-30

    rates = rates_kappa[:, :C]
    kappa1 = rates_kappa[:, C]
    kappa2 = rates_kappa[:, C + 1]
    if blen is None:
        from ..trees.gtree import gather_rows
        page = gather_rows(age, jnp.maximum(parent, 0))
        blen = jnp.where(parent >= 0, jnp.maximum(page - age, 0.0), 0.0) \
            * mu[:, None]
    t_eff = blen[:, :, None] * rates[:, None, :]              # [L, N, C]
    efac, coefs = efactors(model, t_eff, freqs, kappa1, kappa2, eigw)
    if coefs is None:
        coefs = jnp.zeros((L, 10), efac.dtype)

    rows = _perlocus_rows(order, left, right, efac, coefs, freqs,
                          eigT.reshape(L, -1), eigTi.reshape(L, -1),
                          model, T, C)                        # [L, D]
    # segment -> locus row spread: static-index gather (a one-hot
    # matmul measured the same at L=1000 but its [NSEGP, L] constant
    # is ~0.5 GB at L=10000, round 5)
    seg_rows = rows[layout.seg_locus_dev]                     # [NSEGP, D]
    combo = _to_lanes(seg_rows.astype(jnp.float32))           # [NT, D, 2, 128]

    lay = _combo_layout(T, C, fam)
    D = lay["D"]
    NT = layout.n_tiles
    kernel = _make_kernel(T, C, fam, tiny)

    out = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, D, G2, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, G2, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, T, 8, 128), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * T - 1, C, 8, 128), jnp.float32),
            pltpu.VMEM((1, 8, 128), jnp.float32),
        ],
        interpret=os.environ.get("BPP_TPU_PALLAS") == "interpret",
    )(layout.maxlvl_dev, combo, layout.statrows, layout.tips8)

    # rows 0..G2-1 are the (a=0, g) site rows; lane flat = g*128 + lane
    site_flat = out[:, :G2, :].reshape(-1)                    # [NSEGP * 8]
    wsum = (site_flat * layout.w_flat).reshape(-1, SEG_W).sum(1)
    # per-locus totals as FLAT sums over the static [L, SMAX] segment
    # table — NOT an f32 prefix-sum-and-diff, whose cross-loci partial
    # sums cancel catastrophically (up to 0.11 lnL at L=1000 measured
    # round 5; the same defect class as the pairwise-T2h diagonal note
    # in trees/coalescent.py)
    tbl = layout.seg_table                                    # [L, SMAX]
    per = wsum[jnp.maximum(tbl, 0)] * (tbl >= 0)
    return per.sum(axis=1)                                    # [L]
