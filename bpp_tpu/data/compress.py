"""Site-pattern compression.

Replaces the reference's column string-sort compressor (``src/compress.c``
``compress_site_patterns``, JC69 symmetry folding ``encode_jc69``
``compress.c:161``) with vectorized numpy.  Runs on host at data-load
time; output feeds the fixed-shape locus tensors.

JC69 folding: for columns whose characters are all unambiguous single
states, relabel states canonically by first appearance so that columns
equal up to a state permutation collapse to one pattern.  Valid because
the JC69 likelihood is invariant under state relabeling.
"""

from __future__ import annotations

import numpy as np


def compress_patterns(
    codes: np.ndarray, jc69_fold: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Compress alignment columns into unique patterns + weights.

    Args:
      codes: ``[n_seq, n_sites]`` uint8 ambiguity bitmasks.
      jc69_fold: also merge columns equal up to state relabeling.

    Returns:
      (patterns ``[n_seq, n_patterns]`` uint8, weights ``[n_patterns]`` int32)
    """
    if codes.ndim != 2:
        raise ValueError("codes must be [n_seq, n_sites]")
    work = np.ascontiguousarray(codes)
    if jc69_fold:
        work = fold_jc69(work)
    # unique over columns
    cols = np.ascontiguousarray(work.T)
    view = cols.view([("", cols.dtype)] * cols.shape[1]).ravel()
    _, idx, counts = np.unique(view, return_index=True, return_counts=True)
    # keep first-appearance order (like a stable compressor)
    order = np.argsort(idx, kind="stable")
    idx = idx[order]
    counts = counts[order]
    patterns = work[:, idx]
    return patterns.astype(np.uint8), counts.astype(np.int32)


_SINGLE = np.zeros(256, dtype=bool)
for _m in (1, 2, 4, 8):
    _SINGLE[_m] = True
_STATE_OF = np.zeros(256, dtype=np.int64)
for _s, _m in enumerate((1, 2, 4, 8)):
    _STATE_OF[_m] = _s


def fold_jc69(codes: np.ndarray) -> np.ndarray:
    """Canonically relabel states within fully-unambiguous columns."""
    n_seq, n_sites = codes.shape
    unamb = _SINGLE[codes].all(axis=0)           # [S]
    if not unamb.any():
        return codes
    s = _STATE_OF[codes[:, unamb]]               # [n_seq, U] state indices 0..3
    rows = np.arange(n_seq)[:, None]
    # first row index where each state occurs, per column
    first = np.full((4, s.shape[1]), n_seq, dtype=np.int64)
    # go bottom-up so earlier rows overwrite
    for i in range(n_seq - 1, -1, -1):
        first[s[i], np.arange(s.shape[1])] = i
    del rows
    # rank states by first appearance: mapping[k, col] = canonical index
    order = np.argsort(first, axis=0, kind="stable")      # [4, U]
    mapping = np.empty_like(order)
    mapping[order, np.arange(s.shape[1])[None, :]] = np.arange(4)[:, None]
    new_s = mapping[s, np.arange(s.shape[1])[None, :]]    # [n_seq, U]
    out = codes.copy()
    out[:, unamb] = np.uint8(1) << new_s.astype(np.uint8)
    return out
