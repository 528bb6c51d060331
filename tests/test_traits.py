"""Morphological traits (reference src/morph.c): parsing, likelihoods
against brute force, and MCMC integration (tau/mixing/rj re-scoring +
the trait branch-rate move)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpp_tpu.io.ctl import parse_ctl_lines
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.trees.traits import (
    build_trait_data, make_trait_logl, parse_traitfile,
)

TRAITS = """
/* continuous partition: 3 species, 2 chars, v_pop=0.5, ldetRs=0 */
3 2 C 0.5 0.0
A 1.0 2.0
B 1.2 1.7
C -0.3 0.4

3 4 D
A 0 1 0 2
B 1 1 ? 0
C 0 0 1 {01}
"""


class _St:
    n_tips = 3
    n_nodes = 5
    root = 3
    left = np.array([-1, -1, -1, 4, 0])
    right = np.array([-1, -1, -1, 2, 1])
    parent = np.array([4, 4, 3, -1, 3])
    names = ["A", "B", "C"]


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tf = tmp_path_factory.mktemp("tr") / "traits.txt"
    tf.write_text(TRAITS)
    parts = parse_traitfile(str(tf))
    st = _St()
    data = build_trait_data(parts, st)
    fn = make_trait_logl(st, data)
    return str(tf), parts, st, data, fn


def test_parse(tiny):
    _, parts, *_ = tiny
    assert parts[0].dtype == "cont" and parts[0].values.shape == (3, 2)
    assert parts[0].v_pop == 0.5
    assert parts[1].dtype == "disc"
    # '?' -> all-states mask, '{01}' -> bits 0|1
    assert parts[1].values[1, 2] == 1023
    assert parts[1].values[2, 3] == 3


def _pic_ref(st, tau, brate, m_tip, v_pop, ldetRs):
    m = {i: m_tip[i].copy() for i in range(3)}
    vk = {i: (tau[st.parent[i]] - tau[i]) * brate[i] if st.parent[i] >= 0
          else 0.0 for i in range(5)}
    brlen = {i: vk[i] + v_pop for i in range(3)}
    logl = 0.0
    p = m_tip.shape[1]
    for node in [4, 3]:
        l, r = st.left[node], st.right[node]
        v1, v2 = brlen[l], brlen[r]
        v12 = v1 + v2
        c = m[l] - m[r]
        logl += -0.5 * (p * math.log(2 * math.pi * v12) + ldetRs
                        + (c * c).sum() / v12)
        m[node] = (v2 * m[l] + v1 * m[r]) / v12
        brlen[node] = vk[node] + v1 * v2 / v12
    return logl


def _mkv_ref(st, tau, brate, states, nstate):
    def ptrans(k, v):
        e = math.exp(-v * k / (k - 1))
        return (1 / k + (k - 1) / k * e, 1 / k - 1 / k * e)

    tot = 0.0
    nchar = len(nstate)
    for h in range(nchar):
        k = nstate[h]
        v = {i: max((tau[st.parent[i]] - tau[i]) * brate[i], 1e-8)
             for i in range(5) if st.parent[i] >= 0}
        v[3] = 1e-8

        def lk(node, x, char_of=None):
            if node < 3:
                if char_of is None:
                    return 1.0 if (states[node][h] & (1 << x)) else 0.0
                return 1.0 if x == char_of else 0.0
            l, r = st.left[node], st.right[node]
            pl = pr = 0.0
            for y in range(k):
                ps, pd = ptrans(k, v[l])
                pl += (ps if y == x else pd) * lk(l, y, char_of)
            for y in range(k):
                ps, pd = ptrans(k, v[r])
                pr += (ps if y == x else pd) * lk(r, y, char_of)
            return pl * pr

        prob = sum(lk(3, x) for x in range(k)) / k
        pconst = sum(sum(lk(3, x, a) for x in range(k)) / k
                     for a in range(k))
        tot += math.log(prob) - math.log(1 - pconst)
    return tot


def test_logl_vs_bruteforce(tiny):
    _, parts, st, data, fn = tiny
    tau = np.array([0, 0, 0, 0.08, 0.03])
    for brate in (np.ones((2, 5)),
                  np.array([[1.0, 1, 1, 1, 1],
                            [0.5, 2.0, 1.3, 1.0, 0.7]])):
        ll = np.asarray(fn(jnp.asarray(tau), jnp.asarray(brate)))
        want_c = _pic_ref(st, tau, brate[0], parts[0].values, 0.5, 0.0)
        states = parts[1].values
        want_d = _mkv_ref(st, tau, brate[1], states,
                          np.asarray(data[1].nstate))
        np.testing.assert_allclose(ll[0], want_c, rtol=1e-10)
        np.testing.assert_allclose(ll[1], want_d, rtol=1e-10)


CTL = """
seed = 5
seqfile = /root/reference/examples/frogs/frogs.txt
Imapfile = /root/reference/examples/frogs/frogs.Imap.txt
jobname = out
species&tree = 4 K C L H
                9 7 14 2
               (((K, C), L), H);
usedata = 1
nloci = 2
cleandata = 0
thetaprior = gamma 2 200
tauprior = gamma 4 100
traitfile = {traitfile}
finetune = 1
burnin = 100
sampfreq = 2
nsample = 200
"""

FROG_TRAITS = """
4 3 C 1.0 0.0
K 0.1 -0.5 1.0
C 0.3 -0.2 0.8
L -1.0 0.6 0.2
H 0.9 0.1 -0.7

4 2 D
K 0 1
C 1 1
L 0 {01}
H 2 0
"""


@pytest.mark.smoke
def test_mcmc_integration(tmp_path):
    tf = tmp_path / "frog_traits.txt"
    tf.write_text(FROG_TRAITS)
    cfg = parse_ctl_lines(CTL.format(traitfile=tf).strip().splitlines())
    run = load_run(cfg)
    eng = Engine(run, seed=7)
    state = eng.init_state()
    assert state.trait is not None and state.trait.brate.shape == (2, 7)
    key = jax.random.PRNGKey(1)
    state, stats = eng.chunk_step(state, key, 150)
    # cached trait logl consistent with a recompute at current taus/rates
    want = eng.ctx.trait_fn(state.sp.tau, state.trait.brate)
    np.testing.assert_allclose(np.asarray(state.trait.logl),
                               np.asarray(want), rtol=1e-6, atol=1e-6)
    # the trait brate move mixes (strict clock: 1 shared rate/partition)
    from bpp_tpu.mcmc.state import MV_TRAIT
    prop, acc = np.asarray(stats)[MV_TRAIT]
    assert prop == 2 * 150 and acc > 0
    assert np.all(np.asarray(state.trait.brate)[:, 0]
                  == np.asarray(state.trait.brate)[:, 1])


@pytest.mark.slow
def test_mcmc_rj_with_traits(tmp_path):
    """A10 delimitation with traits: rj split/join re-scores traits and
    still crosses delimitation models on tiny data (2 seqs/species)."""
    (tmp_path / "d.txt").write_text(
        "\n".join(["6 24"] + [f"{s}^{s.lower()}{i} " + "A" * 24
                              for s in "ABC" for i in range(2)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC" for i in range(2)))
    tf = tmp_path / "t3.txt"
    tf.write_text("3 2 C 1.0 0.0\nA 0.2 -0.1\nB 0.4 0.1\nC -0.5 0.3\n")
    import textwrap
    ctl = textwrap.dedent(f"""\
        seed = 5
        seqfile = {tmp_path / 'd.txt'}
        Imapfile = {tmp_path / 'd.imap'}
        jobname = out
        speciesdelimitation = 1 0 2
        species&tree = 3 A B C
                       2 2 2
                       ((A,B),C);
        usedata = 0
        nloci = 1
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        traitfile = {tf}
        finetune = 1
        burnin = 100
        sampfreq = 2
        nsample = 200
    """)
    cfg = parse_ctl_lines(ctl.splitlines())
    run = load_run(cfg)
    eng = Engine(run, seed=3)
    state = eng.init_state()
    state, stats = eng.chunk_step(state, jax.random.PRNGKey(2), 400)
    want = eng.ctx.trait_fn(state.sp.tau, state.trait.brate)
    np.testing.assert_allclose(np.asarray(state.trait.logl),
                               np.asarray(want), rtol=1e-6, atol=1e-6)
    from bpp_tpu.mcmc.state import MV_RJ
    prop, acc = np.asarray(stats)[MV_RJ]
    assert prop > 0 and acc > 0       # delimitation moves across models


@pytest.mark.slow
def test_mcmc_a11_with_traits(tmp_path):
    """A11 (joint delimitation + tree search) with traits (VERDICT r4
    missing #3; prop_rj.c:727-774 re-scores traits inside split/join):
    the rj move rides trait_fn_topo on the CURRENT sampled topology,
    the trait cache stays consistent across rj + SPR/SNL + tau moves,
    and both the delimitation and the topology actually move."""
    import textwrap

    (tmp_path / "d.txt").write_text(
        "\n".join(["6 24"] + [f"{s}^{s.lower()}{i} " + "A" * 24
                              for s in "ABC" for i in range(2)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC" for i in range(2)))
    tf = tmp_path / "t3.txt"
    tf.write_text("3 2 C 1.0 0.0\nA 0.2 -0.1\nB 0.4 0.1\nC -0.5 0.3\n")
    ctl = textwrap.dedent(f"""\
        seed = 5
        seqfile = {tmp_path / 'd.txt'}
        Imapfile = {tmp_path / 'd.imap'}
        jobname = out
        speciesdelimitation = 1 0 2
        speciestree = 1 0
        species&tree = 3 A B C
                       2 2 2
                       ((A,B),C);
        usedata = 0
        nloci = 1
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        traitfile = {tf}
        finetune = 1
        burnin = 100
        sampfreq = 2
        nsample = 200
    """)
    cfg = parse_ctl_lines(ctl.splitlines())
    assert cfg.est_stree and cfg.est_delimit
    run = load_run(cfg)
    eng = Engine(run, seed=3)
    assert eng.ctx.trait_fn is None and eng.ctx.trait_fn_topo is not None
    state = eng.init_state()
    topo0 = np.asarray(state.sp.left).copy()
    nsp_seen = set()
    topo_changed = False
    key = jax.random.PRNGKey(2)
    rj_tot = np.zeros(2)
    for _ in range(6):
        key, s = jax.random.split(key)
        state, stats = eng.chunk_step(state, s, 100)
        from bpp_tpu.mcmc.state import MV_RJ
        rj_tot += np.asarray(stats)[MV_RJ]
        tau = np.asarray(state.sp.tau)
        nsp_seen.add(1 + int(tau[3] > 0) + int(tau[4] > 0))
        if (np.asarray(state.sp.left) != topo0).any():
            topo_changed = True
        # trait cache consistent with the topo-parametric recompute
        want = eng.ctx.trait_fn_topo(state.sp.left, state.sp.right,
                                     state.sp.parent, state.sp.tau,
                                     state.trait.brate)
        np.testing.assert_allclose(np.asarray(state.trait.logl),
                                   np.asarray(want), rtol=1e-6, atol=1e-6)
    assert rj_tot[0] > 0 and rj_tot[1] > 0, rj_tot   # rj accepts happen
    assert len(nsp_seen) >= 2, nsp_seen              # delimitation moves
    assert topo_changed                              # tree search moves


@pytest.mark.smoke
def test_traits_with_migration(tmp_path):
    """Traits x MSC-M (round 5: the reference has NO guard here — the
    trait likelihood depends on the species taus only, morph.c:888 —
    so the combination is supported; our old block was a coverage
    gap).  A00 x IM + traitfile: the tau/mixing moves carry the trait
    delta and the cache stays consistent; then A10 x IM + traits runs
    the migration-aware rj with the trait term."""
    import textwrap

    (tmp_path / "d.txt").write_text(
        "\n".join(["6 24"] + [f"{s}^{s.lower()}{i} " + "A" * 24
                              for s in "ABC" for i in range(2)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC" for i in range(2)))
    tf = tmp_path / "t3.txt"
    tf.write_text("3 2 C 1.0 0.0\nA 0.2 -0.1\nB 0.4 0.1\nC -0.5 0.3\n")
    base = textwrap.dedent(f"""\
        seed = 5
        seqfile = {tmp_path / 'd.txt'}
        Imapfile = {tmp_path / 'd.imap'}
        jobname = out
        species&tree = 3 A B C
                       2 2 2
                       ((A,B),C);
        usedata = 0
        nloci = 1
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        migration = 2
        A B
        B A
        wprior = 2 10
        traitfile = {tf}
        finetune = 1
        burnin = 100
        sampfreq = 2
        nsample = 100
    """)
    for extra in ("", "speciesdelimitation = 1 0 2\n"):
        cfg = parse_ctl_lines((base + extra).splitlines())
        run = load_run(cfg)
        eng = Engine(run, seed=3)
        state = eng.init_state()
        assert state.trait is not None
        state, stats = eng.chunk_step(state, jax.random.PRNGKey(2), 250)
        want = eng.ctx.trait_fn(state.sp.tau, state.trait.brate)
        np.testing.assert_allclose(np.asarray(state.trait.logl),
                                   np.asarray(want), rtol=1e-6, atol=1e-6)
        from bpp_tpu.mcmc.state import MV_TAU, MV_TRAIT
        st = np.asarray(stats)
        assert st[MV_TRAIT][0] > 0 and st[MV_TRAIT][1] > 0
        assert st[MV_TAU][1] > 0          # tau still mixes with traits
        if extra:
            from bpp_tpu.mcmc.state import MV_RJ
            assert st[MV_RJ][0] == 250    # rj proposing under IM+traits


def test_trait_fn_topo_matches_fixed():
    """The topology-parametric trait likelihood equals the fixed-tree
    closure on the same (topology, tau, brate)."""
    from bpp_tpu.testing import synthetic_species_tree
    from bpp_tpu.trees.traits import (
        build_trait_data, make_trait_logl, make_trait_logl_topo,
        parse_traitfile,
    )

    rng = np.random.default_rng(3)
    st = synthetic_species_tree(4, rng)
    txt = ("4 3 C 1.0 0.0\n"
           + "\n".join(f"{n} " + " ".join(f"{v:.3f}" for v in
                       rng.normal(size=3)) for n in st.names)
           + "\n\n4 2 D\n"
           + "\n".join(f"{n} {rng.integers(0, 2)} {rng.integers(0, 3)}"
                       for n in st.names) + "\n")
    data = build_trait_data(parse_traitfile_text(txt), st, jnp.float64)
    fixed = make_trait_logl(st, data)
    topo = make_trait_logl_topo(st.n_tips, st.n_nodes, data)
    tau = jnp.asarray(st.tau, jnp.float64)
    brate = jnp.asarray(rng.uniform(0.5, 2.0, (2, st.n_nodes)))
    a = fixed(tau, brate)
    b = topo(jnp.asarray(st.left), jnp.asarray(st.right),
             jnp.asarray(st.parent), tau, brate)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def parse_traitfile_text(txt):
    from bpp_tpu.trees.traits import parse_traitfile
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write(txt)
        path = f.name
    return parse_traitfile(path)


@pytest.mark.smoke
def test_traits_a01_species_tree_search(tmp_path):
    """A01 + traitfile (VERDICT r3 missing #4): the species SPR/SNL
    re-score the trait likelihood on the proposed topology
    (stree.c:727-736 analog), the trait cache stays consistent, and a
    strong continuous-trait signal pulls the topology posterior toward
    the trait-favored tree."""
    import textwrap

    # 4 taxa; traits put A,B very close and C,D very close -> the
    # trait likelihood strongly favors ((A,B),(C,D)) groupings
    tf = tmp_path / "t.txt"
    # small population variance (0.02): the between-species BM
    # component dominates, so the trait signal discriminates topologies
    tf.write_text(
        "4 4 C 0.02 0.0\n"
        "A 1.0 1.1 0.9 1.0\nB 1.05 1.0 0.95 1.02\n"
        "C -1.0 -1.1 -0.9 -1.0\nD -1.02 -1.0 -0.94 -1.05\n")
    (tmp_path / "d.txt").write_text(
        "\n".join(["4 24"] + [f"{s}^{s.lower()}1 " + "A" * 24
                              for s in "ABCD"]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}1\t{s}\n" for s in "ABCD"))
    ctl = textwrap.dedent(f"""\
        seed = 5
        seqfile = {tmp_path / 'd.txt'}
        Imapfile = {tmp_path / 'd.imap'}
        jobname = out
        speciestree = 1 0
        species&tree = 4 A B C D
                       1 1 1 1
                       ((A,C),(B,D));
        usedata = 0
        nloci = 1
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        traitfile = {tf}
        finetune = 1
        burnin = 200
        sampfreq = 2
        nsample = 300
    """)
    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import load_run
    cfg = parse_ctl_lines(ctl.splitlines())
    run = load_run(cfg)
    eng = Engine(run, seed=3)
    assert eng.ctx.trait_fn_topo is not None and eng.ctx.trait_fn is None
    state = eng.init_state()
    state, stats = eng.chunk_step(state, jax.random.PRNGKey(2), 500)
    # trait cache consistent through accepted SPR/SNL topology changes
    sp = state.sp
    want = eng.ctx.trait_fn_topo(sp.left, sp.right, sp.parent, sp.tau,
                                 state.trait.brate)
    np.testing.assert_allclose(np.asarray(state.trait.logl),
                               np.asarray(want), rtol=1e-6, atol=1e-6)
    # species SPR accepted at least once (start topology disagrees with
    # the trait signal, so moves must fire to escape it)
    from bpp_tpu.mcmc.state import MV_SSPR
    assert np.asarray(stats)[MV_SSPR][1] > 0
    # the AB clade (trait-favored) must appear in the final tree with
    # data-free sequences: the trait likelihood dominates
    names = run.stree.names
    left = np.asarray(sp.left)
    right = np.asarray(sp.right)
    clades = []
    for h in range(run.stree.n_tips, run.stree.n_nodes):
        def tips_under(i):
            if left[i] < 0:
                return {names[i]}
            return tips_under(left[i]) | tips_under(right[i])
        clades.append(frozenset(tips_under(h)))
    assert frozenset({"A", "B"}) in clades or \
        frozenset({"C", "D"}) in clades, clades
