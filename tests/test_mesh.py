"""Multi-device correctness: sharded == unsharded sampling.

The reference's only parallelism is the pthread locus partition
(src/threads.c); its correctness argument is "workers own disjoint
locus ranges".  The TPU equivalent is GSPMD: every [L, ...] array is
sharded over a 1-D device mesh (bpp_tpu.parallel.mesh) and the jitted
step is identical program text — so sharded and unsharded runs must
produce the SAME chain (identical PRNG streams; cross-shard reductions
only reassociate sums, which in float64 stays far below the MH
accept-flip threshold over these chain lengths).

These tests run every model family's full chunk_step on the 8-virtual-
device CPU mesh (conftest sets xla_force_host_platform_device_count=8)
and compare against the single-placement run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.io.ctl import parse_ctl_lines
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.parallel.mesh import (
    LOCI_AXIS, locus_sharding, make_mesh, shard_pytree_by_locus,
)
from bpp_tpu.testing import synthetic_run

FROGS = """
seed = 5
seqfile = /root/reference/examples/frogs/frogs.txt
Imapfile = /root/reference/examples/frogs/frogs.Imap.txt
jobname = out
species&tree = 4 K C L H
                9 7 14 2
               (((K, C), L), H);
usedata = 1
nloci = 4
thetaprior = invgamma 3 0.008
tauprior = invgamma 3 0.012
finetune = 1
burnin = 20
sampfreq = 2
nsample = 20
"""


def _run_pair(eng, n_steps=20, n_devices=4, seed=3):
    """(unsharded_state, sharded_state) after identical chunk_steps."""
    state0 = eng.init_state()
    key = jax.random.PRNGKey(seed)

    ref, _ = eng.chunk_step(state0, key, n_steps)
    jax.block_until_ready(ref.logl)

    L = eng.ctx.locus_mask.shape[0]
    mesh = make_mesh(n_devices)
    ctx0 = eng.ctx
    eng.ctx = shard_pytree_by_locus(ctx0, mesh, L)
    try:
        st = shard_pytree_by_locus(state0, mesh, L)
        got, _ = eng.chunk_step(st, key, n_steps)
        jax.block_until_ready(got.logl)
    finally:
        eng.ctx = ctx0
    return ref, got


def _assert_states_match(ref, got, rtol=1e-9):
    # integer topology arrays must be bit-equal (any accept-decision
    # divergence shows up here first)
    for name in ("left", "right", "parent"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref.gt, name)),
            np.asarray(getattr(got.gt, name)), err_msg=name)
    np.testing.assert_allclose(np.asarray(ref.gt.age),
                               np.asarray(got.gt.age), rtol=rtol, atol=0)
    np.testing.assert_allclose(np.asarray(ref.sp.tau),
                               np.asarray(got.sp.tau), rtol=rtol, atol=0)
    np.testing.assert_allclose(np.asarray(ref.logl),
                               np.asarray(got.logl), rtol=rtol, atol=1e-7)


@pytest.mark.smoke
def test_sharded_equals_unsharded_a00_synthetic():
    run = synthetic_run(n_loci=16, n_seq=6, n_patterns=24, n_species=4,
                        dtype="float64")
    eng = Engine(run, seed=11)
    ref, got = _run_pair(eng, n_steps=25, n_devices=8)
    _assert_states_match(ref, got)
    np.testing.assert_allclose(np.asarray(ref.sp.theta),
                               np.asarray(got.sp.theta), rtol=1e-9)


@pytest.mark.slow
def test_sharded_equals_unsharded_a00_frogs():
    cfg = parse_ctl_lines(FROGS.strip().splitlines())
    eng = Engine(load_run(cfg), seed=5)
    ref, got = _run_pair(eng, n_steps=15, n_devices=4)
    _assert_states_match(ref, got)


@pytest.mark.slow
def test_sharded_equals_unsharded_a01():
    ctl = FROGS + "speciestree = 1\n"
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=5)
    ref, got = _run_pair(eng, n_steps=15, n_devices=4)
    _assert_states_match(ref, got)
    np.testing.assert_array_equal(np.asarray(ref.sp.left),
                                  np.asarray(got.sp.left))


@pytest.mark.slow
def test_sharded_equals_unsharded_a10():
    ctl = FROGS + "speciesdelimitation = 1 1 2 1\n"
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=5)
    ref, got = _run_pair(eng, n_steps=15, n_devices=4)
    _assert_states_match(ref, got)


@pytest.mark.slow
def test_sharded_equals_unsharded_msci():
    from bpp_tpu.io.ctl import parse_ctl
    cfg = parse_ctl("tests/fixtures/msci/m.ctl").replace(usedata=True)
    eng = Engine(load_run(cfg), seed=7)
    # 1 locus on a 2-device mesh: replication degenerate case must
    # still match (masked padding riding the sharded axis)
    ref, got = _run_pair(eng, n_steps=10, n_devices=1)
    _assert_states_match(ref, got)


@pytest.mark.slow
def test_sharded_equals_unsharded_mscm():
    ctl = FROGS.replace("usedata = 1", "usedata = 0") + (
        "migration = 2\n  K C 2 0.01\n  C K 2 0.01\n")
    cfg = parse_ctl_lines(ctl.strip().splitlines())
    eng = Engine(load_run(cfg), seed=5)
    ref, got = _run_pair(eng, n_steps=15, n_devices=4)
    for name in ("left", "right", "parent"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref.gt, name)),
            np.asarray(getattr(got.gt, name)), err_msg=name)
    np.testing.assert_allclose(np.asarray(ref.gt.age),
                               np.asarray(got.gt.age), rtol=1e-9, atol=0)
    np.testing.assert_allclose(np.asarray(ref.mig.M),
                               np.asarray(got.mig.M), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ref.mig.time),
                               np.asarray(got.mig.time), rtol=1e-9)


@pytest.mark.smoke
def test_sharding_actually_distributes():
    """The sharded state really lives on 8 devices (not silently
    replicated): each device holds L/8 loci of the tip partials."""
    run = synthetic_run(n_loci=16, n_seq=6, n_patterns=24, n_species=4,
                        dtype="float64")
    eng = Engine(run, seed=11)
    mesh = make_mesh(8)
    ctx = shard_pytree_by_locus(eng.ctx, mesh, 16)
    shard_shapes = [s.data.shape for s in ctx.tip_partials.addressable_shards]
    assert len(shard_shapes) == 8
    assert all(s[0] == 2 for s in shard_shapes)
    assert ctx.tip_partials.sharding == locus_sharding(mesh)
    assert LOCI_AXIS in mesh.axis_names
