"""A10 species delimitation under the MSC-M (IM) model.

Reference: migration-aware rjMCMC split/join — prop_rj.c:599-656 (and
the join mirror :1140-1222) call gtree_update_logprob_contrib_mig for
the affected populations; the only cfile guard blocks est_stree
(cfile.c:2884), so delimitation with gene flow IS a supported model
class.  Our rj move recomputes the full structured-coalescent density
with migration events riding the rubber band per-edge
(rj_moves._remap_event_times); proposals stranding an event in a
collapsed population's empty window reject through the density's
validity indicator.

Validation here:
  1. guards: est_stree blocked (cfile.c:2884 analog), est_delimit OK;
  2. prior-chain flow balance (detailed balance of the rj kernel with
     a migration route among the collapsible populations);
  3. event-window invariant + cache honesty along a full chain;
  4. signal: strongly diverged simulated data keeps P(3 species) high
     even with a (weak) migration route configured.
"""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.io.ctl import parse_ctl
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine


def _write_ctl(tmp_path, seqfile, imap, usedata, nloci, nsample,
               seed=7, wprior="5 1", burnin=200):
    ctl = tmp_path / "a10m.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = {seed}
        seqfile = {seqfile}
        Imapfile = {imap}
        jobname = {tmp_path}/out
        speciesdelimitation = 1 0 2
        species&tree = 3 A B C
                       4 4 4
                       ((A,B),C);
        usedata = {1 if usedata else 0}
        nloci = {nloci}
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        migration = 2
        A B
        B A
        wprior = {wprior}
        finetune = 1
        burnin = {burnin}
        sampfreq = 2
        nsample = {nsample}
    """))
    return str(ctl)


def _fake_data(tmp_path):
    (tmp_path / "d.txt").write_text(
        "\n".join(["12 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                               for s in "ABC" for i in range(4)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC" for i in range(4)))
    return str(tmp_path / "d.txt"), str(tmp_path / "d.imap")


def test_guards(tmp_path):
    seq, imap = _fake_data(tmp_path)
    ctl = _write_ctl(tmp_path, seq, imap, usedata=False, nloci=1, nsample=10)
    cfg = parse_ctl(ctl)
    # A10 x MSC-M constructs
    Engine(load_run(cfg), seed=1)
    # A01 (est_stree) x MSC-M is the reference's fatal (cfile.c:2884)
    txt = (tmp_path / "a10m.ctl").read_text().replace(
        "speciesdelimitation = 1 0 2", "speciestree = 1")
    (tmp_path / "a01m.ctl").write_text(txt)
    cfg2 = parse_ctl(str(tmp_path / "a01m.ctl"))
    with pytest.raises(NotImplementedError, match="cfile.c:2884"):
        Engine(load_run(cfg2), seed=1)


@pytest.mark.slow
def test_a10_mig_prior_flow_balance(tmp_path):
    """Detailed-balance probe of the migration-aware rj kernel under
    the prior (the test_a10 flow method, with an A<->B route whose
    windows open and close with the delimitation)."""
    from bpp_tpu.mcmc import rj_moves
    from bpp_tpu.mcmc.mig_moves import make_logpr_fn_mig

    seq, imap = _fake_data(tmp_path)
    # weak route prior (mean 0.2): with a strong one the 3sp state
    # almost always carries events, joins (correctly) reject, and the
    # probe ensembles never revisit the joined states
    ctl = _write_ctl(tmp_path, seq, imap, usedata=False, nloci=1,
                     nsample=100, seed=17, burnin=300, wprior="2 10")
    cfg = parse_ctl(ctl)
    run = load_run(cfg)
    eng = Engine(run, seed=17)
    rjdbg = jax.jit(lambda st, k: rj_moves.rj_move(
        eng.ctx, cfg, st, k, eng.root_age0, debug=True, routes=eng.routes))
    logpr_fn = make_logpr_fn_mig(eng.ctx, eng.routes)

    def init_in(collapsed, offset=0):
        """Init state forced into a target delimitation: search init
        seeds for a FULLY-SPLIT draw (collapsing is always valid, the
        reverse is not), then zero the target taus."""
        base = eng.seed
        st = None
        try:
            for s in range(base + 7919 * offset,
                           base + 7919 * offset + 50):
                eng.seed = s
                st = eng.init_state()
                if (np.asarray(st.sp.tau)[3:] > 0).all():
                    break
        finally:
            eng.seed = base
        tau = np.array(st.sp.tau)
        tau[collapsed] = 0.0
        sp = st.sp._replace(tau=jnp.asarray(tau, eng.dtype))
        logpr, *_ = logpr_fn(st.gt, sp, st.mig, st.subst.heredity)
        return st._replace(sp=sp, logpr=logpr)

    # Three FREE chains (one started per delimitation); probes pool by
    # whatever state the chain is in, so every per-state ensemble is
    # the chain's own (conditionally stationary) visit distribution —
    # forced re-pinned ensembles measurably bias theta/tau conditionals
    # and broke the balance by orders of magnitude (2026-08-21).
    alpha = {}      # (nsp, is_split) -> summed acceptance
    count = {}      # nsp -> probes
    for start, seed in (([3], 41), ([3, 4], 43), ([], 47)):
        st = init_in(start, offset=1 + len(start))
        key = jax.random.PRNGKey(seed)
        probe = jax.random.PRNGKey(seed + 10**6)
        for it in range(1500):
            key, s1 = jax.random.split(key)
            st, _ = eng.step(st, s1)
            if it < 150:
                continue
            tau_now = np.asarray(st.sp.tau)
            nsp = 1 + int(tau_now[3] > 0) + int(tau_now[4] > 0)
            probe, p1 = jax.random.split(probe)
            _, _, d = rjdbg(st, p1)
            count[nsp] = count.get(nsp, 0) + 1
            if not bool(d["bad"]):
                k = (nsp, bool(d["do_split"]))
                alpha[k] = alpha.get(k, 0.0) + min(
                    1.0, float(np.exp(min(float(d["lnacc"]), 0.0))))

    assert all(count.get(k, 0) > 100 for k in (1, 2, 3)), count
    j2 = alpha.get((2, False), 0.0) / count[2]
    s2 = alpha.get((2, True), 0.0) / count[2]
    j1 = alpha.get((1, False), 0.0) / count[1]
    s1 = alpha.get((1, True), 0.0) / count[1]
    j3 = alpha.get((3, False), 0.0) / count[3]
    s3 = alpha.get((3, True), 0.0) / count[3]
    assert j1 == 0.0    # no joinable node in the 1sp state
    assert s3 == 0.0    # no splittable node in the 3sp state
    # same noise bands as the non-migration flow test (test_a10)
    ratio_12 = j2 / max(s1, 1e-12)
    ratio_23 = s2 / max(j3, 1e-12)
    assert 0.15 < ratio_12 < 6.0, (j2, s1, ratio_12)
    assert 0.15 < ratio_23 < 6.0, (s2, j3, ratio_23)


@pytest.mark.smoke
def test_a10_mig_chain_invariants(tmp_path):
    """Full prior chain: delimitation actually mixes, events exist only
    when their route windows are alive, event validity holds, and the
    logpr/logl caches never drift."""
    from bpp_tpu.mcmc.mig_moves import make_logpr_fn_mig
    from bpp_tpu.trees import migration as mg

    seq, imap = _fake_data(tmp_path)
    ctl = _write_ctl(tmp_path, seq, imap, usedata=False, nloci=2,
                     nsample=50, seed=5)
    cfg = parse_ctl(ctl)
    run = load_run(cfg)
    eng = Engine(run, seed=5)
    st = eng.init_state()
    key = jax.random.PRNGKey(2)
    nsp_seen = set()
    ev_when_2sp = ev_when_3sp = 0
    logpr_fn = make_logpr_fn_mig(eng.ctx, eng.routes)
    for i in range(60):
        key, s = jax.random.split(key)
        st, _ = eng.chunk_step(st, s, 10)
        tau = np.asarray(st.sp.tau)
        nsp = 1 + int(tau[3] > 0) + int(tau[4] > 0)
        nsp_seen.add(nsp)
        nev = int(np.asarray(st.mig.count()).sum())
        if nsp < 3:
            ev_when_2sp += nev     # A<->B windows dead: must stay 0
        else:
            ev_when_3sp += nev
        pops = mg.assign_populations_mig(st.gt, st.sp, eng.ctx.tip_pop,
                                         st.mig, eng.ctx.n_seq)
        ok = mg.route_consistent_mig(st.gt, st.sp, st.mig, pops,
                                     eng.ctx.n_seq)
        assert bool(np.asarray(ok).all())
    assert len(nsp_seen) >= 2, nsp_seen      # rj really jumps
    assert ev_when_2sp == 0
    lp, *_ = logpr_fn(st.gt, st.sp, st.mig, st.subst.heredity)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(st.logpr),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.slow
def test_a10_mig_detects_distinct_species(tmp_path):
    """Clearly diverged data (tau >> theta, simulated WITHOUT gene
    flow) must keep P(3 species) dominant when analyzed under A10 x IM
    with a weak migration prior."""
    import os

    from bpp_tpu.sim.simulate import run_simulation
    from bpp_tpu.summary.delimit_summary import summarize_delimitations

    sim = tmp_path / "sim.ctl"
    sim.write_text(textwrap.dedent("""\
        seed = 11
        seqfile = sim.txt
        Imapfile = sim.imap
        species&tree = 3 A B C
                        4 4 4
                        ((A #0.002, B #0.002) :0.02 #0.002,
                          C #0.002) :0.04 #0.002;
        loci&length = 8 300
        model = 0
    """))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_simulation(str(sim))
    finally:
        os.chdir(cwd)
    ctl = _write_ctl(tmp_path, str(tmp_path / "sim.txt"),
                     str(tmp_path / "sim.imap"), usedata=True, nloci=8,
                     nsample=600, seed=3, wprior="2 10", burnin=500)
    cfg = parse_ctl(ctl)
    run = load_run(cfg)
    eng = Engine(run, seed=9)
    log = eng.run_mcmc(progress_every=0)
    tau = np.stack(log.tau)
    p3 = float(np.mean((tau[:, 3] > 0) & (tau[:, 4] > 0)))
    assert p3 > 0.8, p3
