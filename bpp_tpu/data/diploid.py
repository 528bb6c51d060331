"""Analytical diploid phase resolution (Gronau et al. 2011).

Behavioral equivalent of the reference's ``src/diploid.c``
(``diploid_resolve_locus:307``): unphased diploid sequences carry
2-state ambiguity codes at heterozygous sites.  Each such sequence is
split into two haploid rows; a site with ``n`` unfixed heterozygotes
expands into ``2^n`` resolution columns, and the likelihood later
averages each original site over its resolutions
(``locus.c:2587-2614``).  One heterozygous site per sequence is pinned
to an arbitrary fixed resolution (preferring weight-1 singleton sites,
most-heterozygous first): the .1/.2 labeling within a sequence is a
likelihood-invariant symmetry, so pinning halves the expansion without
changing the averaged likelihood.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_POPCOUNT = np.array([bin(i).count("1") for i in range(16)], np.int64)
_LOWBIT = np.array([i & -i for i in range(16)], np.uint8)


@dataclass
class DiploidResolution:
    codes2: np.ndarray       # [n2_seq, S2] expanded+resolved codes
    seq_of_row: np.ndarray   # [n2_seq] original sequence index of each row
    res_index: np.ndarray    # [S2] original site index of each expanded column
    res_count: np.ndarray    # [S1] resolutions per original site (2^n)


def resolve_locus(codes: np.ndarray, weights: np.ndarray,
                  diploid: np.ndarray) -> DiploidResolution:
    """Expand unphased rows of a compressed alignment.

    Args:
      codes: ``[n_seq, S1]`` uint8 ambiguity masks (compressed patterns).
      weights: ``[S1]`` pattern weights.
      diploid: ``[n_seq]`` bool, True for unphased (to-split) rows.
    """
    n_seq, S1 = codes.shape
    card = _POPCOUNT[codes]
    het = (card == 2) & diploid[:, None]          # [n_seq, S1]
    if (card[diploid] == 3).any():
        raise ValueError("3-state ambiguity codes not allowed in unphased "
                         "diploid sequences")

    # --- pin one heterozygous site per sequence (diploid.c rounds loop) ------
    # The walk order must bit-match the reference: the candidate list is
    # built once (ascending site order), re-sorted STABLY by descending
    # sitehets every round (glibc qsort is a stable mergesort), entries
    # removed in place when their het count reaches zero.
    # hstate: 1 = free het, -1 = fixed resolution, 0 = not het
    hmat = het.astype(np.int64)
    sitehets = hmat.clip(0).sum(axis=0)
    singletons = ((weights == 1)[None, :] & het).sum(axis=1)
    resolved = ~(het.any(axis=1))                 # sequences with no hets
    resolved |= ~diploid
    cand = list(np.where((weights == 1) & (sitehets > 0))[0])
    for _ in range(n_seq):
        if resolved.all() or not cand:
            break
        cand.sort(key=lambda s: -sitehets[s])     # python sort is stable
        chosen_seq = -1
        for ci, site in enumerate(cand):
            rows = np.where((hmat[:, site] == 1) & ~resolved)[0]
            if rows.size == 0:
                continue
            chosen_seq = rows[np.argmin(singletons[rows])]
            hmat[chosen_seq, site] = -1
            sitehets[site] -= 1
            resolved[chosen_seq] = True
            if sitehets[site] == 0:
                del cand[ci]
            break
        if chosen_seq < 0:
            break

    free_hets = (hmat == 1)
    n_free = free_hets.sum(axis=0)                # [S1]
    res_count = (1 << n_free).astype(np.int64)

    # --- expanded alignment --------------------------------------------------
    row_of = np.zeros(n_seq, np.int64)
    k = 0
    for i in range(n_seq):
        row_of[i] = k
        k += 2 if diploid[i] else 1
    n2 = k
    S2 = int(res_count.sum())
    codes2 = np.zeros((n2, S2), np.uint8)
    seq_of_row = np.zeros(n2, np.int64)
    for i in range(n_seq):
        seq_of_row[row_of[i]] = i
        if diploid[i]:
            seq_of_row[row_of[i] + 1] = i
    res_index = np.zeros(S2, np.int64)

    col = 0
    for s in range(S1):
        n = int(n_free[s])
        reps = 1 << n
        free_rows = np.where(free_hets[:, s])[0]
        # base column (resolution-independent rows)
        base = np.zeros(n2, np.uint8)
        for i in range(n_seq):
            c = codes[i, s]
            r = row_of[i]
            if not diploid[i]:
                base[r] = c
            elif hmat[i, s] == -1:
                s1 = _LOWBIT[c]
                base[r] = s1
                base[r + 1] = c & ~s1
            elif hmat[i, s] == 0:
                base[r] = c
                base[r + 1] = c
        for j in range(reps):
            colv = base.copy()
            m = j
            # match the reference's bit order: bit 0 flips the LAST free row
            for t in range(n):
                i1 = free_rows[n - 1 - t]
                c = codes[i1, s]
                s1 = _LOWBIT[c]
                s2 = c & ~s1
                if m & 1:
                    s1, s2 = s2, s1
                colv[row_of[i1]] = s1
                colv[row_of[i1] + 1] = s2
                m >>= 1
            codes2[:, col] = colv
            res_index[col] = s
            col += 1
    assert col == S2

    return DiploidResolution(
        codes2=codes2, seq_of_row=seq_of_row, res_index=res_index,
        res_count=res_count)
