"""bfdriver: Gauss-Legendre power-posterior control-file generator
(reference: src/bfdriver.c cmd_bfdriver:1161)."""

import numpy as np

from bpp_tpu.tools.bfdriver import beta_weights, cmd_bfdriver, estimate_logml

# reference output of `bpp --bfdriver t.ctl --points 8` (bfdriver.c
# baked-in x8/w8 tables), captured 2026-08-17
REF8 = [
    (0.019855, 0.101229), (0.101667, 0.222381), (0.237234, 0.313707),
    (0.408283, 0.362684), (0.591717, 0.362684), (0.762766, 0.313707),
    (0.898333, 0.222381), (0.980145, 0.101229),
]


def test_beta_weights_match_reference_tables():
    got = beta_weights(8)
    for (b, w), (rb, rw) in zip(got, REF8):
        assert abs(b - rb) < 1e-6 and abs(w - rw) < 1e-6
    # weights integrate a constant exactly: 0.5*sum(w)*c == c
    assert abs(sum(w for _, w in got) - 2.0) < 1e-12


def test_cmd_bfdriver_files(tmp_path):
    ctl = tmp_path / "t.ctl"
    ctl.write_text("seed = 1\nseqfile = d.txt\n")
    import io
    cmd_bfdriver(str(ctl), 4, out=io.StringIO())
    csv = (tmp_path / "t.ctl.betaweights.csv").read_text().splitlines()
    assert csv[0] == "beta,weight,ElnfX"
    assert len(csv) == 5
    sub = (tmp_path / "t.ctl.3").read_text()
    assert sub.startswith("seed = 1\n") and "BayesFactorBeta = " in sub
    # quadrature identity: if E_b[lnfX] = c for all b, logML = c
    filled = "\n".join([csv[0]] + [row + "  -42.5" for row in csv[1:]])
    (tmp_path / "filled.csv").write_text(filled + "\n")
    est = estimate_logml(str(tmp_path / "filled.csv"))
    assert abs(est - (-42.5)) < 1e-4
