"""Diploid-path likelihood parity against the reference C binary.

Fixtures produced by the reference bpp on examples/frogs A00 (4
species, 5 loci, unphased diploid data, phase=1): per-sample gene
trees for every locus + total lnL.  Validates the analytical phasing
pipeline (expansion, resolution averaging) end to end.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.core import felsenstein as fe
from bpp_tpu.core import pmatrix as pm
from bpp_tpu.loader import load_run_from_ctl
from bpp_tpu.trees.gtree import GTrees
from tests.test_oracle_likelihood import gtree_from_newick

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "frogsA00")


def test_frogs_diploid_lnl_matches_reference():
    run = load_run_from_ctl("/root/reference/examples/frogs/A00.bpp.ctl")
    batch = run.batch
    T = batch.max_tips
    L = batch.n_loci
    assert L == 5

    mcmc = np.loadtxt(os.path.join(FIX, "out.mcmc.txt"), skiprows=1)
    per_locus_newicks = []
    for li in range(L):
        with open(os.path.join(FIX, f"out.gtree.L{li+1}")) as fh:
            per_locus_newicks.append([ln.strip() for ln in fh if ln.strip()])

    tipp = fe.tip_partials_from_codes(
        jnp.asarray(batch.tip_codes), dtype=jnp.float64)
    weights = jnp.asarray(batch.weights, jnp.float64)
    res_map = jnp.asarray(batch.res_map)
    res_count = jnp.asarray(batch.res_count)
    n_seq = jnp.asarray(batch.n_seq)
    freqs = jnp.full((L, 4), 0.25)
    cw = jnp.ones((1,))

    n_check = 6
    for s in range(0, len(per_locus_newicks[0]), len(per_locus_newicks[0]) // n_check):
        lnl_ref = mcmc[s][-1]
        lefts, rights, parents, ages = [], [], [], []
        for li in range(L):
            label_to_tip = {lab: i for i, lab in enumerate(batch.labels[li])}
            l, r, p, a = gtree_from_newick(
                per_locus_newicks[li][s], label_to_tip, T)
            lefts.append(l)
            rights.append(r)
            parents.append(p)
            ages.append(a)
        gt = GTrees(jnp.asarray(np.stack(lefts)), jnp.asarray(np.stack(rights)),
                    jnp.asarray(np.stack(parents)), jnp.asarray(np.stack(ages)))
        blen = fe.branch_lengths(gt, jnp.ones(L))
        pmats = pm.pmatrix_jc69(blen[:, :, None])
        logl = fe.loglikelihood(gt, tipp, weights, n_seq, pmats, freqs, cw,
                                res_map=res_map, res_count=res_count)
        total = float(jnp.sum(logl))
        assert np.isclose(total, lnl_ref, atol=5e-2), (s, total, lnl_ref)
