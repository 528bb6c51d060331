"""Morphological trait likelihoods (reference: src/morph.c).

Two data types per partition of a ``traitfile``:

* **continuous** — Brownian motion on the species tree scored by
  phylogenetic independent contrasts (``loglikelihood_trait_c_bm``
  morph.c:888, ``trait_update_pic_part`` morph.c:413; Alvarez-Carretero
  et al. 2019 eq. 5).  The data matrix arrives pre-standardized with the
  population variance ``v_pop`` and the log-determinant of the
  shrinkage correlation estimate ``ldetRs`` in the partition header.
* **discrete** — the Mk model (Lewis 2001) with per-character state
  counts and the Mkv variable-only ascertainment correction
  (``loglikelihood_trait_d_mkv`` morph.c:924, transition probabilities
  ``trait_trprob_mk`` morph.c:462).

TPU-first shape: a partition's character pruning vectorizes over
``[nchar, Kmax]`` with the Mk transition applied in closed form
(``P @ cl = pdiff*sum(cl) + (psame-pdiff)*cl``), and the species-tree
recursion is a ``lax.scan`` over a host-precomputed post-order (the
species topology is fixed whenever traits are allowed: A00/A10).
Branch lengths are ``(tau_parent - tau_node) * brate`` so every tau
move re-scores traits through these functions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MISSING = 1023          # '?' / '-' bitmask (all ten states)


class TraitPartition(NamedTuple):
    """Host-side parsed partition (one block of the traitfile)."""
    dtype: str                    # "cont" | "disc"
    labels: list                  # species labels, file order
    values: np.ndarray            # cont: [ntaxa, p] float; disc: [ntaxa, nchar] bitmask int
    v_pop: float                  # cont only: population variance
    ldetRs: float                 # cont only: log|R*|


class TraitPartData(NamedTuple):
    """Device-side per-partition arrays, matched to species order."""
    dtype: str                    # static
    # continuous
    m_tip: jax.Array | None       # [NS, p] trait values
    v_pop: float
    ldetRs: float
    # discrete
    tipprob: jax.Array | None     # [NS, nchar, K] 0/1 compat. indicators
    nstate: jax.Array | None      # [nchar] states per character
    kmax: int                     # static max state count (2..10)


class TraitState(NamedTuple):
    """Per-partition trait branch rates + cached log-likelihoods."""
    brate: jax.Array              # [n_part, H] per-species-branch rates
    logl: jax.Array               # [n_part]


def _state_bin(x: int) -> int:
    return 1 << x


def parse_traitfile(path: str) -> list[TraitPartition]:
    """Parse all partitions (parse_traitfile morph.c:270).

    Header per block: ``ntaxa nchar C v_pop ldetRs`` or ``ntaxa nchar
    D``; then one row per species: ``label v1 v2 ...``.  Discrete
    values are digits 0-9, ``?``/``-`` missing, ``{..}``/``(..)``
    ambiguity sets.
    """
    with open(path) as fh:
        text = fh.read()
    # strip /* */ comments and blank lines (parse_comment)
    import re
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    toks = text.split()
    pos = 0
    parts: list[TraitPartition] = []

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    while pos < len(toks):
        ntaxa, nchar = int(take()), int(take())
        if ntaxa <= 0 or nchar <= 0:
            raise ValueError(f"{path}: bad partition header")
        ty = take().upper()
        if ty == "C":
            v_pop, ldetRs = float(take()), float(take())
            vals = np.zeros((ntaxa, nchar))
            labels = []
            for i in range(ntaxa):
                labels.append(take())
                for j in range(nchar):
                    t = take()
                    vals[i, j] = np.nan if t in ("?", "-") else float(t)
            parts.append(TraitPartition("cont", labels, vals, v_pop, ldetRs))
        elif ty == "D":
            vals = np.zeros((ntaxa, nchar), np.int32)
            labels = []
            for i in range(ntaxa):
                labels.append(take())
                j = 0
                while j < nchar:
                    t = take()
                    # ambiguity sets may arrive as one token "{01}" or
                    # split; re-join until the closing brace
                    if t[0] in "{(":
                        while not t.endswith(("}", ")")):
                            t += take()
                        mask = 0
                        for ch in t[1:-1]:
                            if ch.isdigit():
                                mask |= _state_bin(int(ch))
                        if mask == 0:
                            raise ValueError(
                                f"{path}: empty ambiguity set {t!r}")
                        vals[i, j] = mask
                        j += 1
                    else:
                        for ch in t:
                            if ch.isdigit():
                                vals[i, j] = _state_bin(int(ch))
                            elif ch in "?-":
                                vals[i, j] = MISSING
                            else:
                                raise ValueError(
                                    f"{path}: bad trait value {ch!r}")
                            j += 1
            parts.append(TraitPartition("disc", labels, vals, 0.0, 0.0))
        else:
            raise ValueError(f"{path}: unknown data type {ty!r}")
    return parts


def build_trait_data(parts: list[TraitPartition], st,
                     dtype=jnp.float64) -> tuple[TraitPartData, ...]:
    """Match partition rows to species-tree tips (trait_fill_tip
    morph.c:616) and build device arrays."""
    out = []
    for n, part in enumerate(parts):
        idx = []
        for i in range(st.n_tips):
            name = st.names[i]
            if name not in part.labels:
                raise ValueError(
                    f"species {name!r} not found in trait partition {n+1}")
            idx.append(part.labels.index(name))
        if part.dtype == "cont":
            out.append(TraitPartData(
                dtype="cont",
                m_tip=jnp.asarray(part.values[idx], dtype),
                v_pop=float(part.v_pop), ldetRs=float(part.ldetRs),
                tipprob=None, nstate=None, kmax=0))
        else:
            states = part.values[idx]                    # [NS, nchar]
            ntax, nchar = states.shape
            nstate = np.zeros(nchar, np.int32)
            for j in range(nchar):
                col = states[:, j]
                obs = col[col != MISSING]
                if obs.size and np.all(obs == obs[0]) and \
                        bin(int(obs[0])).count("1") == 1:
                    raise ValueError(
                        f"constant character at column {j+1} of trait "
                        f"partition {n+1} (Mkv needs variable data)")
                max_state = 0
                for v in obs:
                    max_state = max(max_state, int(v).bit_length() - 1)
                nstate[j] = max(2, max_state + 1)
            kmax = int(nstate.max())
            tipprob = np.zeros((ntax, nchar, kmax))
            for x in range(kmax):
                tipprob[:, :, x] = (states & _state_bin(x)) > 0
            out.append(TraitPartData(
                dtype="disc", m_tip=None, v_pop=0.0, ldetRs=0.0,
                tipprob=jnp.asarray(tipprob, dtype),
                nstate=jnp.asarray(nstate), kmax=kmax))
    return tuple(out)


def _postorder(st) -> np.ndarray:
    """Host post-order of inner species nodes (children first)."""
    order = []

    def rec(i):
        if st.left[i] == -1:
            return
        rec(int(st.left[i]))
        rec(int(st.right[i]))
        order.append(i)

    rec(int(st.root))
    return np.asarray(order, np.int32)


def make_trait_logl(st, data: tuple[TraitPartData, ...]):
    """Returns ``trait_logl(tau, brate[n_part, H]) -> [n_part]`` for a
    FIXED species topology (A00/A10 guide trees)."""
    topo = make_trait_logl_topo(st.n_tips, st.n_nodes, data)
    left = jnp.asarray(st.left, jnp.int32)
    right = jnp.asarray(st.right, jnp.int32)
    parent = jnp.asarray(st.parent, jnp.int32)

    def trait_logl(tau, brate):
        return topo(left, right, parent, tau, brate)

    return trait_logl


def make_trait_logl_topo(NS: int, H: int, data: tuple[TraitPartData, ...]):
    """Returns ``trait_logl(left, right, parent, tau, brate) ->
    [n_part]`` over a DEVICE-side species topology — the form the
    species-tree SPR/SNL moves re-score inside their lnacceptance
    (stree.c:727-736 subtracts trait_old_logl and adds
    loglikelihood_trait on the proposed tree).

    The post-order is derived on device: inner nodes sorted by tau
    ascending (children are never older), depth-descending tie-break
    for collapsed taus.  H is tiny (<= 2*NS - 1), so the per-node
    dynamic indexing is negligible.
    """

    def derive(left, right, parent, tau):
        root = jnp.argmin(parent).astype(jnp.int32)   # unique parent == -1
        # depth via pointer-chase (H small; static unroll)
        depth = jnp.zeros((H,), jnp.int32)
        p = parent
        for _ in range(H):
            depth = depth + (p >= 0)
            p = jnp.where(p >= 0, parent[jnp.maximum(p, 0)], p)
        is_inner = left >= 0
        key_tau = jnp.where(is_inner, tau, jnp.inf)
        porder = jnp.lexsort((-depth, key_tau))[: NS - 1].astype(jnp.int32)
        return porder, root

    def one_cont(left, right, parent, porder, root, tau, brate, part):
        p = part.m_tip.shape[1]
        partau = jnp.where(parent >= 0, tau[jnp.maximum(parent, 0)], tau)
        vk = (partau - tau) * brate
        m = jnp.zeros((H, p), tau.dtype).at[:NS].set(
            part.m_tip.astype(tau.dtype))
        brlen = jnp.where(jnp.arange(H) < NS, vk + part.v_pop, 0.0)

        def body(carry, node):
            m, brlen, logl = carry
            lch = left[node]
            rch = right[node]
            v1 = brlen[lch]
            v2 = brlen[rch]
            v12 = v1 + v2
            contrast = m[lch] - m[rch]
            zz = jnp.sum(contrast * contrast)
            logl = logl - 0.5 * (p * jnp.log(2.0 * jnp.pi * v12)
                                 + part.ldetRs + zz / v12)
            m = m.at[node].set((v2 * m[lch] + v1 * m[rch]) / v12)
            brlen = brlen.at[node].set(vk[node] + v1 * v2 / v12)
            return (m, brlen, logl), None

        (_, _, logl), _ = jax.lax.scan(
            body, (m, brlen, jnp.zeros((), tau.dtype)), porder)
        return logl

    def one_disc(left, right, parent, porder, root, tau, brate, part):
        K = part.kmax
        nchar = part.tipprob.shape[1]
        ks = jnp.arange(2, K + 1)                       # [K-1] state counts
        partau = jnp.where(parent >= 0, tau[jnp.maximum(parent, 0)], tau)
        # morph.c:478: v clamped below at 1e-8 (root included)
        v = jnp.maximum((partau - tau) * brate, 1e-8)   # [H]
        kf = ks.astype(tau.dtype)
        e = jnp.exp(-v[:, None] * kf / (kf - 1.0))      # [H, K-1]
        psame = 1.0 / kf + (kf - 1.0) / kf * e          # morph.c:467
        pdiff = 1.0 / kf - 1.0 / kf * e
        xmask = (jnp.arange(K)[None, :]
                 < part.nstate[:, None]).astype(tau.dtype)   # [nchar, K]
        # per-char transition params indexed by that char's k
        kidx = part.nstate - 2                          # [nchar]

        # condprob buffers: real chars [H, nchar, K]; dummy constant
        # chars (one per k, constant at state 0 — symmetry makes all a
        # identical, morph.c:935 sums k copies) [H, K-1, K]
        cl = jnp.zeros((H, nchar, K), tau.dtype).at[:NS].set(
            part.tipprob.astype(tau.dtype) * xmask)
        dmask = (jnp.arange(K)[None, :] < ks[:, None]).astype(tau.dtype)
        dl = jnp.zeros((H, K - 1, K), tau.dtype).at[:NS].set(
            jnp.tile((jnp.arange(K) == 0).astype(tau.dtype)[None, None, :],
                     (NS, K - 1, 1)))

        def prune(cl_child, child, kindex):
            # (P @ cl)[x] = pdiff*S + (psame-pdiff)*cl[x], masked to x<k
            ps = psame[child][kindex]                   # [rows]
            pd = pdiff[child][kindex]
            s = cl_child.sum(-1)
            return pd[:, None] * s[:, None] + (ps - pd)[:, None] * cl_child

        def body(carry, node):
            cl, dl, logl = carry
            lch = left[node]
            rch = right[node]
            clp = (prune(cl[lch] * xmask, lch, kidx)
                   * prune(cl[rch] * xmask, rch, kidx)) * xmask
            dlp = (prune(dl[lch] * dmask, lch, jnp.arange(K - 1))
                   * prune(dl[rch] * dmask, rch,
                           jnp.arange(K - 1))) * dmask
            cl = cl.at[node].set(clp)
            dl = dl.at[node].set(dlp)
            return (cl, dl, logl), None

        (cl, dl, _), _ = jax.lax.scan(
            body, (cl, dl, jnp.zeros((), tau.dtype)), porder)
        kfc = part.nstate.astype(tau.dtype)             # [nchar]
        prob = cl[root].sum(-1) / kfc                   # uniform root
        # p_const(k) = sum_a sum_x rootprob_a[x]/k (morph.c:935); the
        # k dummies (constant at a = 0..k-1) are identical by Mk
        # symmetry, so k * sum_x(dl_root)/k = sum_x(dl_root)
        pconst = dl[root].sum(-1)                       # [K-1]
        pc = pconst[kidx]                               # [nchar]
        return jnp.sum(jnp.log(jnp.maximum(prob, 1e-300))
                       - jnp.log(jnp.maximum(1.0 - pc, 1e-300)))

    def trait_logl(left, right, parent, tau, brate):
        left = left.astype(jnp.int32)
        right = right.astype(jnp.int32)
        parent = parent.astype(jnp.int32)
        porder, root = derive(left, right, parent, tau)
        vals = []
        for n, part in enumerate(data):
            if part.dtype == "cont":
                vals.append(one_cont(left, right, parent, porder, root,
                                     tau, brate[n], part))
            else:
                vals.append(one_disc(left, right, parent, porder, root,
                                     tau, brate[n], part))
        return jnp.stack(vals)

    return trait_logl
