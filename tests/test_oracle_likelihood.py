"""Likelihood parity against the reference C binary.

Fixtures in tests/fixtures/yu2001 were produced by running the
reference bpp on examples/yu2001 with `print = 1 0 0 1` (sampled gene
trees + per-sample lnL).  For each sampled gene tree we rebuild the
batched GTrees arrays from the newick branch lengths and check that our
batched Felsenstein engine reproduces the reference's total lnL.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.core import felsenstein as fe
from bpp_tpu.core import pmatrix as pm
from bpp_tpu.io.newick import parse_newick
from bpp_tpu.loader import load_run_from_ctl
from bpp_tpu.trees.gtree import BIG_AGE, GTrees

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "yu2001")


def gtree_from_newick(nwk: str, label_to_tip: dict, T: int):
    """Build one locus's [N] arrays from a sampled gene-tree newick."""
    root = parse_newick(nwk)
    N = 2 * T - 1
    left = np.zeros(N, np.int32)
    right = np.zeros(N, np.int32)
    parent = np.full(N, -1, np.int32)
    age = np.full(N, BIG_AGE)
    age[:T] = 0.0
    counter = [T]

    def rec(node):
        if node.is_leaf:
            idx = label_to_tip[node.label]
            h = 0.0
        else:
            a = rec(node.children[0])
            b = rec(node.children[1])
            idx = counter[0]
            counter[0] += 1
            left[idx], right[idx] = a[0], b[0]
            parent[a[0]] = parent[b[0]] = idx
            # age from child height + child branch length
            h = a[1] + node.children[0].length
            age[idx] = h
        return idx, h

    rec(root)
    return left, right, parent, age


@pytest.fixture(scope="module")
def yu2001():
    run = load_run_from_ctl("/root/reference/examples/yu2001/yu2001.bpp.ctl")
    run.cfg = run.cfg.replace(dtype="float64")
    return run


def test_sampled_gtree_lnl_matches_reference(yu2001):
    run = yu2001
    batch = run.batch
    T = batch.max_tips
    labels = batch.labels[0]
    label_to_tip = {lab: i for i, lab in enumerate(labels)}

    mcmc = np.loadtxt(os.path.join(FIX, "out.mcmc.txt"), skiprows=1)
    with open(os.path.join(FIX, "out.gtree.L1")) as fh:
        newicks = [ln.strip() for ln in fh if ln.strip()]
    assert len(newicks) == mcmc.shape[0]

    tipp = fe.tip_partials_from_codes(
        jnp.asarray(batch.tip_codes), dtype=jnp.float64)
    weights = jnp.asarray(batch.weights, jnp.float64)
    n_seq = jnp.asarray(batch.n_seq)
    freqs = jnp.full((1, 4), 0.25)
    cw = jnp.ones((1,))

    checked = 0
    for row, nwk in zip(mcmc[::10], newicks[::10]):
        lnl_ref = row[2]
        l, r, p, a = gtree_from_newick(nwk, label_to_tip, T)
        gt = GTrees(jnp.asarray(l)[None], jnp.asarray(r)[None],
                    jnp.asarray(p)[None], jnp.asarray(a)[None])
        blen = fe.branch_lengths(gt, jnp.ones(1))
        pmats = pm.pmatrix_jc69(blen[:, :, None])
        logl = fe.loglikelihood(gt, tipp, weights, n_seq, pmats, freqs, cw)
        assert np.isclose(float(logl[0]), lnl_ref, atol=5e-2), (
            float(logl[0]), lnl_ref)
        checked += 1
    assert checked >= 5
