"""Per-locus substitution models (model = custom partition file).

Covers the reference's partition-file grammar and validation
(parse_partition_line cfile.c:1090, validate_partitions cfile.c:1217)
and the per-locus likelihood semantics (method.c:3344-3352
msa->model assignment): each locus's likelihood under the CUSTOM batch
must equal the same locus scored by a homogeneous engine of its model.
"""

import numpy as np
import pytest
import jax

from bpp_tpu.config import SubstModel
from bpp_tpu.io.partition import (
    Partition, locus_models, parse_partition_file,
)
from bpp_tpu.mcmc import subst_moves
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.mcmc.state import make_logl_fn, refresh_eigen
from bpp_tpu.testing import synthetic_run

M = SubstModel


# --- parser ---------------------------------------------------------------


def _write(tmp_path, text):
    p = tmp_path / "parts.txt"
    p.write_text(text)
    return str(p)


def test_parse_basic(tmp_path):
    path = _write(tmp_path, "1 - 3, DNA, HKY\n4, DNA, JC69\n5 - 6, AA, WAG\n")
    parts = parse_partition_file(path)
    assert parts == [Partition(1, 3, M.HKY), Partition(4, 4, M.JC69),
                     Partition(5, 6, M.WAG)]
    assert locus_models(parts, 6) == [M.HKY, M.HKY, M.HKY, M.JC69,
                                      M.WAG, M.WAG]


def test_parse_case_and_comments(tmp_path):
    path = _write(tmp_path, "* header comment\n1-2, dna, gtr  * trailing\n")
    assert parse_partition_file(path) == [Partition(1, 2, M.GTR)]


def test_validate_must_start_at_one(tmp_path):
    path = _write(tmp_path, "2 - 4, DNA, HKY\n")
    with pytest.raises(ValueError, match="must start from locus 1"):
        parse_partition_file(path)


def test_validate_overlap(tmp_path):
    path = _write(tmp_path, "1 - 3, DNA, HKY\n3 - 4, DNA, JC69\n")
    with pytest.raises(ValueError, match="already in partition"):
        parse_partition_file(path)


def test_validate_gap(tmp_path):
    path = _write(tmp_path, "1 - 2, DNA, HKY\n4, DNA, JC69\n")
    with pytest.raises(ValueError, match="not contained in any partition"):
        parse_partition_file(path)


def test_validate_locus_count_mismatch(tmp_path):
    path = _write(tmp_path, "1 - 5, DNA, HKY\n")
    parts = parse_partition_file(path)
    with pytest.raises(ValueError, match="number of partitions"):
        locus_models(parts, 8)


def test_unknown_model(tmp_path):
    path = _write(tmp_path, "1 - 2, DNA, WAG\n")
    with pytest.raises(ValueError, match="Unknown DNA model"):
        parse_partition_file(path)


# --- likelihood parity ----------------------------------------------------


MODELS = [M.JC69, M.HKY, M.GTR, M.K80, M.TN93, M.F81]


@pytest.mark.smoke
def test_custom_likelihood_matches_homogeneous():
    """Each locus under CUSTOM == the same locus under its own model."""
    run = synthetic_run(n_loci=6, n_seq=5, n_patterns=12, seed=3,
                        model=M.CUSTOM, locus_models=MODELS,
                        dtype="float64")
    eng = Engine(run, seed=7)
    st = eng.init_state()
    assert np.all(np.isfinite(np.asarray(st.logl)))

    for m in set(MODELS):
        run_m = synthetic_run(n_loci=6, n_seq=5, n_patterns=12, seed=3,
                              model=m, dtype="float64")
        em = Engine(run_m, seed=7)
        sm = em.init_state()
        subst = sm.subst._replace(freqs=st.subst.freqs[:, :4],
                                  qrates=st.subst.qrates)
        subst = subst_moves._derive_kappas(subst, m)
        subst = refresh_eigen(subst, m)
        ll = make_logl_fn(em.ctx, run_m.cfg)(st.gt, subst, st.sp, st.clock)
        for i, mi in enumerate(MODELS):
            if mi == m:
                assert abs(float(ll[i]) - float(st.logl[i])) < 1e-8, (i, m)


@pytest.mark.smoke
def test_mixed_dna_aa_likelihood():
    """DNA loci embedded in the 20-state space score identically to an
    AA engine for the AA loci and stay finite overall."""
    from bpp_tpu.data.msa import ProcessedLocus
    from bpp_tpu.data.packing import pack_loci

    models = [M.HKY, M.WAG, M.JC69, M.LG]
    run = synthetic_run(n_loci=4, n_seq=5, n_patterns=12, seed=3,
                        model=M.CUSTOM, locus_models=models,
                        dtype="float64")
    rng = np.random.default_rng(11)
    loci = list(run.loci)
    for li in (1, 3):
        p = loci[li]
        codes = (1 << rng.integers(0, 20, size=p.codes.shape)).astype(
            np.uint32)
        loci[li] = ProcessedLocus(
            index=p.index, labels=p.labels, codes=codes, weights=p.weights,
            tip_species=p.tip_species, n_sites=p.n_sites)
    run.loci = loci
    run.batch = pack_loci(loci, site_block=8)
    eng = Engine(run, seed=7)
    st = eng.init_state()
    assert np.all(np.isfinite(np.asarray(st.logl)))

    for li, m in ((1, M.WAG), (3, M.LG)):
        loci_aa = [loci[1] if i in (0, 2) else p
                   for i, p in enumerate(loci)]
        run_m = synthetic_run(n_loci=4, n_seq=5, n_patterns=12, seed=3,
                              model=m, dtype="float64")
        run_m.loci = loci_aa
        run_m.batch = pack_loci(loci_aa, site_block=8)
        em = Engine(run_m, seed=7)
        sm = em.init_state()
        ll = make_logl_fn(em.ctx, run_m.cfg)(st.gt, sm.subst, st.sp,
                                             st.clock)
        assert abs(float(ll[li]) - float(st.logl[li])) < 1e-8


@pytest.mark.smoke
def test_custom_chain_respects_parameter_freedom():
    """Short chain: fixed-parameter loci never move, free ones do."""
    models = [M.JC69, M.HKY, M.GTR, M.K80]
    run = synthetic_run(n_loci=4, n_seq=5, n_patterns=12, seed=3,
                        model=M.CUSTOM, locus_models=models,
                        dtype="float64")
    eng = Engine(run, seed=7)
    st = eng.init_state()
    f0 = np.asarray(st.subst.freqs).copy()
    q0 = np.asarray(st.subst.qrates).copy()
    st2, _ = eng.chunk_step(st, jax.random.PRNGKey(0), 100)
    f1 = np.asarray(st2.subst.freqs)
    q1 = np.asarray(st2.subst.qrates)
    assert np.array_equal(f1[0], f0[0])        # JC69: freqs pinned
    assert np.array_equal(f1[3], f0[3])        # K80: freqs pinned
    assert np.abs(f1[1] - f0[1]).max() > 0     # HKY: freqs sampled
    assert np.abs(f1[2] - f0[2]).max() > 0     # GTR: freqs sampled
    assert np.array_equal(q1[0], q0[0])        # JC69: rates pinned
    assert np.abs(q1[1] - q0[1]).max() > 0     # HKY kappa sampled
    assert np.abs(q1[2] - q0[2]).max() > 0     # GTR rates sampled
    assert np.abs(q1[3] - q0[3]).max() > 0     # K80 kappa sampled
    assert np.all(np.isfinite(np.asarray(st2.logl)))


@pytest.mark.smoke
def test_ctl_end_to_end(tmp_path):
    """model = custom on the bundled frogs data (5 loci)."""
    from bpp_tpu.io.ctl import parse_ctl
    from bpp_tpu.loader import load_run

    (tmp_path / "parts.txt").write_text(
        "1 - 2, DNA, HKY\n3, DNA, JC69\n4 - 5, DNA, GTR\n")
    ctl = tmp_path / "run.ctl"
    ctl.write_text(f"""
seed = 11
seqfile = /root/reference/examples/frogs/frogs.txt
Imapfile = /root/reference/examples/frogs/frogs.Imap.txt
jobname = {tmp_path}/out
species&tree = 4  K  C  L  H
                  9  7 14  2
                 (((K, C), L), H);
usedata = 1
nloci = 5
model = custom {tmp_path}/parts.txt
cleandata = 0
thetaprior = 3 0.004
tauprior = 3 0.002
finetune = 1
print = 1 0 0 0
burnin = 50
sampfreq = 1
nsample = 50
""")
    cfg = parse_ctl(str(ctl))
    assert cfg.model == M.CUSTOM
    run = load_run(cfg)
    assert run.locus_models == [M.HKY, M.HKY, M.JC69, M.GTR, M.GTR]
    run.cfg = run.cfg.replace(dtype="float64")
    eng = Engine(run, seed=11)
    st = eng.init_state()
    st2, _ = eng.chunk_step(st, jax.random.PRNGKey(1), 50)
    assert np.all(np.isfinite(np.asarray(st2.logl)))
