"""A01 topology constraints / outgroup (reference src/constraint.c).

The strongest check: prior sampling (usedata=0) over 4 species with
``constraint = (A, B);`` must visit exactly the 3 rooted topologies
that keep AB as a clade, and never any other.
"""

import textwrap

import jax
import numpy as np
import pytest

from bpp_tpu.io.constraints import build_constraint_ids, parse_constraintfile
from bpp_tpu.io.ctl import parse_ctl
from bpp_tpu.loader import load_run
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.trees.stree import SpeciesTree


def _stree(newick, names):
    return SpeciesTree.from_newick(newick, names)


def test_build_ids_nested(tmp_path):
    cf = tmp_path / "c.txt"
    cf.write_text("constraint = ((A, B), C);\n")
    st = _stree("(((A,B),C),(D,E));", ["A", "B", "C", "D", "E"])
    ids = build_constraint_ids(st, str(cf))
    # nested clade (A,B) processed first (children-first recursion):
    # A, B and their LCA's strict descendants share an id; C and the
    # AB-ancestor get the outer id; D, E and the rest stay 0
    a, b, c, d, e = (list(st.names).index(x) for x in "ABCDE")
    assert ids[a] == ids[b] != 0
    assert ids[c] != 0 and ids[c] != ids[a]
    ab_anc = int(st.parent[a])
    assert ids[ab_anc] == ids[c]          # preorder marks lca(A,B) outer
    assert ids[d] == ids[e] == 0


def test_outgroup_becomes_ingroup_constraint(tmp_path):
    cf = tmp_path / "c.txt"
    cf.write_text("outgroup = D;\n")
    st = _stree("(((A,B),C),D);", ["A", "B", "C", "D"])
    ids = build_constraint_ids(st, str(cf))
    a, b, c, d = (list(st.names).index(x) for x in "ABCD")
    assert ids[a] == ids[b] == ids[c] != 0
    assert ids[d] == 0


def test_define_expansion_and_conflicts(tmp_path):
    cf = tmp_path / "c.txt"
    cf.write_text("define AB as (A, B);\nconstraint = (AB, C);\n")
    st = _stree("(((A,B),C),D);", ["A", "B", "C", "D"])
    ids = build_constraint_ids(st, str(cf))
    a, b, c, d = (list(st.names).index(x) for x in "ABCD")
    # the expanded define forms a NESTED (A,B) constraint inside (AB,C)
    # (constraint_process_recursive recurses into every internal node)
    assert ids[a] == ids[b] != 0
    assert ids[c] != 0 and ids[c] != ids[a]
    assert ids[d] == 0

    cf2 = tmp_path / "bad.txt"
    cf2.write_text("constraint = (A, C);\n")     # not a clade of start
    with pytest.raises(ValueError, match="clade"):
        build_constraint_ids(st, str(cf2))


def test_parse_errors(tmp_path):
    cf = tmp_path / "c.txt"
    cf.write_text("frobnicate = (A, B);\n")
    with pytest.raises(ValueError, match="define/constraint/outgroup"):
        parse_constraintfile(str(cf))


def _run_prior_a01(tmp_path, constraint_text, n_iter=1200):
    (tmp_path / "d.txt").write_text(
        "\n".join(["8 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                              for s in "ABCD" for i in range(2)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABCD" for i in range(2)))
    cf = tmp_path / "cons.txt"
    cf.write_text(constraint_text)
    ctl = tmp_path / "a01.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = 11
        seqfile = {tmp_path / 'd.txt'}
        Imapfile = {tmp_path / 'd.imap'}
        jobname = out
        speciestree = 1 0
        species&tree = 4 A B C D
                       2 2 2 2
                       (((A,B),C),D);
        usedata = 0
        nloci = 1
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        constraintfile = {cf}
        finetune = 1
        burnin = 200
        sampfreq = 2
        nsample = 500
    """))
    cfg = parse_ctl(str(ctl))
    run = load_run(cfg)
    eng = Engine(run, seed=23)
    state = eng.init_state()
    key = jax.random.PRNGKey(5)
    names = run.stree.names
    tipn = {i: names[i] for i in range(4)}
    counts = {}
    sspr = np.zeros(2)
    from bpp_tpu.mcmc.state import MV_SSPR
    for _ in range(n_iter // 20):
        key, sub = jax.random.split(key)
        state, stats = eng.chunk_step(state, sub, 20)
        sspr += np.asarray(stats)[MV_SSPR]
        left = np.asarray(state.sp.left)
        right = np.asarray(state.sp.right)
        pp = _pptable(left, right, np.asarray(state.sp.parent))
        topo = _canon(left, right, np.asarray(state.sp.parent), tipn)
        counts[topo] = counts.get(topo, 0) + 1
        # AB clade always present
        assert _has_clade(pp, [0, 1], 4), topo
    return counts, sspr


def _pptable(left, right, parent):
    H = len(left)
    pp = np.eye(H, dtype=bool)
    for i in range(H):
        j = i
        while parent[j] >= 0:
            j = parent[j]
            pp[i, j] = True
    return pp


def _has_clade(pp, tips, ntips):
    for v in range(len(pp)):
        under = [t for t in range(ntips) if pp[t, v]]
        if sorted(under) == sorted(tips):
            return True
    return False


def _canon(left, right, parent, tipn):
    root = int(np.nonzero(parent < 0)[0][0])

    def rec(i):
        if left[i] == -1:
            return tipn[i]
        a, b = rec(int(left[i])), rec(int(right[i]))
        return "(" + ",".join(sorted([a, b])) + ")"

    return rec(root)


@pytest.mark.smoke
def test_a01_prior_respects_constraint(tmp_path):
    counts, sspr = _run_prior_a01(tmp_path, "constraint = (A, B);\n")
    # the SPR kernel must still move between the 3 AB-preserving trees
    assert sspr[1] > 0, sspr
    assert len(counts) == 3, counts
    want = {"(((A,B),C),D)", "(((A,B),D),C)", "((A,B),(C,D))"}
    assert set(counts) == want, counts
    # default speciesmodelprior = 1 is uniform over ROOTED TREES
    # (lnprior_species_model delimit.c:722): ~1/3 each
    total = sum(counts.values())
    for topo, n in counts.items():
        assert 0.2 < n / total < 0.47, counts


def test_snl_with_constraints_rejected(tmp_path):
    (tmp_path / "d.txt").write_text(
        "\n".join(["8 20"] + [f"{s}^{s.lower()}{i} " + "A" * 20
                              for s in "ABCD" for i in range(2)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABCD" for i in range(2)))
    cf = tmp_path / "cons.txt"
    cf.write_text("constraint = (A, B);\n")
    ctl = tmp_path / "a01.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = 11
        seqfile = {tmp_path / 'd.txt'}
        Imapfile = {tmp_path / 'd.imap'}
        jobname = out
        speciestree = 1
        species&tree = 4 A B C D
                       2 2 2 2
                       (((A,B),C),D);
        usedata = 0
        nloci = 1
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        constraintfile = {cf}
        finetune = 1
        burnin = 20
        sampfreq = 2
        nsample = 20
    """))
    cfg = parse_ctl(str(ctl))
    with pytest.raises(NotImplementedError, match="SNL"):
        Engine(load_run(cfg), seed=1)
