import numpy as np
import pytest

from bpp_tpu.config import Method, PriorDist, SubstModel
from bpp_tpu.data.compress import compress_patterns, fold_jc69
from bpp_tpu.io import maps
from bpp_tpu.io.ctl import parse_ctl
from bpp_tpu.io.imap import parse_imap
from bpp_tpu.io.newick import parse_newick
from bpp_tpu.io.phylip import parse_phylip

EX = "/root/reference/examples"


def test_nt_map():
    assert maps.NT_MAP[ord("A")] == 1
    assert maps.NT_MAP[ord("t")] == 8
    assert maps.NT_MAP[ord("R")] == 5
    assert maps.NT_MAP[ord("-")] == 15
    assert maps.NT_MAP[ord("N")] == 15
    with pytest.raises(ValueError):
        maps.encode_nt("AC!G")


def test_phylip_yu2001():
    loci = parse_phylip(f"{EX}/yu2001/yu2001.txt")
    assert len(loci) == 1
    assert loci[0].count == 61
    assert loci[0].length == 9142
    assert loci[0].labels[0] == "AF310299"


def test_phylip_frogs():
    loci = parse_phylip(f"{EX}/frogs/frogs.txt")
    assert len(loci) == 5
    assert loci[0].count == 21
    assert loci[0].length == 489
    assert loci[0].individual_tags()[0] == "6"


def test_imap_frogs():
    m = parse_imap(f"{EX}/frogs/frogs.Imap.txt")
    assert m["6"] == "H"
    assert m["rd1"] == "C"


def test_ctl_yu2001():
    cfg = parse_ctl(f"{EX}/yu2001/yu2001.bpp.ctl")
    assert cfg.species.count == 1
    assert cfg.species.names == ("H",)
    assert cfg.species.max_seqs == (61,)
    assert cfg.nloci == 1
    assert cfg.thetaprior.dist == PriorDist.GAMMA
    assert cfg.thetaprior.alpha == 2 and cfg.thetaprior.beta == 2000
    assert cfg.burnin == 20 and cfg.nsample == 10
    assert cfg.method == Method.A00
    assert cfg.model == SubstModel.JC69
    assert cfg.finetune.auto


def test_ctl_frogs_a00():
    cfg = parse_ctl(f"{EX}/frogs/A00.bpp.ctl")
    assert cfg.species.count == 4
    assert cfg.species.newick.replace(" ", "") == "(((K,C),L),H);"
    assert cfg.phase == (1, 1, 1, 1)
    assert cfg.method == Method.A00
    assert cfg.finetune.auto
    assert cfg.finetune.gtage == 5
    assert cfg.finetune.mix == 0.3
    assert cfg.tauprior.alpha == 2 and cfg.tauprior.beta == 1000


def test_ctl_frogs_a11():
    cfg = parse_ctl(f"{EX}/frogs/A11.bpp.ctl")
    assert cfg.method == Method.A11


def test_newick_basic():
    n = parse_newick("((A:1.0, B:2.0)x:0.5, C:3.0)r;")
    leaves = [x.label for x in n.leaves()]
    assert leaves == ["A", "B", "C"]
    assert n.label == "r"
    assert n.children[0].label == "x"
    assert n.children[0].children[1].length == 2.0


def test_newick_extended():
    n = parse_newick("((A:1, (B:0.5)h[&phi=0.3,tau-parent=no]:0.5):1, (h2#H1:0.2, C:1):1);")
    labels = {x.label for x in n.walk() if x.label}
    assert "h" in labels
    h = [x for x in n.walk() if x.label == "h"][0]
    assert h.attributes["phi"] == "0.3"
    tagged = [x for x in n.walk() if x.hybrid_tag]
    assert tagged and tagged[0].hybrid_tag == "H1"


def test_compress():
    codes = np.array([
        [1, 1, 2, 1, 2],
        [2, 2, 4, 2, 4],
    ], dtype=np.uint8)
    pats, w = compress_patterns(codes)
    assert pats.shape == (2, 2)
    assert sorted(w.tolist()) == [2, 3]


def test_jc69_fold():
    # two columns identical up to state relabeling must merge
    codes = np.array([
        [1, 2],
        [1, 2],
        [4, 8],
    ], dtype=np.uint8)
    pats, w = compress_patterns(codes, jc69_fold=True)
    assert pats.shape == (3, 1)
    assert w.tolist() == [2]
    # ambiguity codes must not be folded
    codes2 = np.array([[1, 15], [2, 15]], dtype=np.uint8)
    out = fold_jc69(codes2)
    assert out[0, 1] == 15


def test_compress_counts_total():
    rng = np.random.default_rng(0)
    codes = rng.choice([1, 2, 4, 8, 15], size=(7, 103)).astype(np.uint8)
    pats, w = compress_patterns(codes)
    assert w.sum() == 103
    # reconstruct column multiset
    orig = {tuple(codes[:, j]) for j in range(103)}
    got = {tuple(pats[:, j]) for j in range(pats.shape[1])}
    assert orig == got


def test_parse_every_reference_ctl():
    """Every inference ctl bundled with the reference (testbed + the
    examples) must parse without error."""
    import glob
    from bpp_tpu.io.ctl import parse_ctl
    files = sorted(glob.glob(
        "/root/reference/test/testbed/**/*.ctl", recursive=True)) + sorted(
        glob.glob("/root/reference/examples/**/*.ctl", recursive=True))
    n = 0
    for f in files:
        text = open(f, errors="ignore").read()
        if "loci&length" in text:     # simulator ctl, separate parser
            continue
        parse_ctl(f)
        n += 1
    assert n > 150, n


def test_mcmc_writer_relaxed_clock_columns(tmp_path):
    """method.c:1938-1988 column parity: mu_bar (hierarchical locus
    rates), nu_bar / nu for clock 2/3, per-branch r: columns for the
    SIMPLE clock."""
    from bpp_tpu.config import Clock
    from bpp_tpu.io.ctl import parse_ctl_lines
    from bpp_tpu.loader import build_species_tree
    from bpp_tpu.output import McmcWriter

    base = [
        "seed = 1", "seqfile = x", "jobname = out",
        "species&tree = 3 A B C", " 2 2 2", "((A,B),C);",
        "usedata = 1", "nloci = 2", "thetaprior = 3 0.04",
        "tauprior = 3 0.2",
    ]
    cfg = parse_ctl_lines(base + ["locusrate = 1 2 10 5 iid",
                                  "clock = 2 10 100 5 iid G"])
    st = build_species_tree(cfg)
    w = McmcWriter(str(tmp_path / "a.txt"), cfg, st)
    w.close()
    assert "mu_bar" in w.columns and "nu_bar" in w.columns

    cfg = parse_ctl_lines(base + ["clock = 4 2.0"])
    w = McmcWriter(str(tmp_path / "b.txt"), cfg, st)
    w.close()
    rcols = [c for c in w.columns if c.startswith("r:")]
    assert len(rcols) == 5   # 3 tips + 2 inner with tau
    assert "nu_bar" not in w.columns
