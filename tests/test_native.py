"""Native pattern-compression core (native/compress.cpp, the
reference's src/compress.c analog): bit-equality with the numpy path
across folding/order modes and dtypes."""

import numpy as np
import pytest

from bpp_tpu.data import compress as C
from bpp_tpu.data.cnative import compress_patterns_native

MASKS = np.array([1, 2, 4, 8, 15, 3, 5, 12, 7, 14], np.uint8)


def _numpy_path(codes, fold, sorted_order):
    work = np.ascontiguousarray(codes)
    if fold:
        work = C.fold_jc69(work)
    cols = np.ascontiguousarray(work.T)
    view = cols.view([("", cols.dtype)] * cols.shape[1]).ravel()
    _, idx, counts = np.unique(view, return_index=True, return_counts=True)
    if not sorted_order:
        order = np.argsort(idx, kind="stable")
        idx = idx[order]
        counts = counts[order]
    return work[:, idx], counts.astype(np.int32)


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("sorted_order", [False, True])
def test_native_matches_numpy(fold, sorted_order):
    rng = np.random.default_rng(42)
    for trial in range(20):
        n_seq = int(rng.integers(2, 40))
        n_sites = int(rng.integers(1, 400))
        pool = 5 if rng.random() < 0.5 else len(MASKS)
        codes = MASKS[rng.integers(0, pool, (n_seq, n_sites))]
        nat = compress_patterns_native(codes, fold, sorted_order)
        if nat is None:
            pytest.skip("native library unavailable")
        pats, w = _numpy_path(codes, fold, sorted_order)
        np.testing.assert_array_equal(nat[0], pats)
        np.testing.assert_array_equal(nat[1], w)


def test_native_u32():
    rng = np.random.default_rng(3)
    codes = rng.integers(1, 1 << 20, (10, 200)).astype(np.uint32)
    codes[:, 50] = codes[:, 10]          # force duplicates
    nat = compress_patterns_native(codes, False, False)
    if nat is None:
        pytest.skip("native library unavailable")
    pats, w = _numpy_path(codes, False, False)
    np.testing.assert_array_equal(nat[0], pats)
    np.testing.assert_array_equal(nat[1], w)


def test_compress_patterns_uses_some_path():
    codes = MASKS[np.random.default_rng(1).integers(0, 5, (8, 100))]
    pats, w = C.compress_patterns(codes, jc69_fold=True)
    assert w.sum() == 100 and pats.shape[0] == 8
