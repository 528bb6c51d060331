"""Three-path likelihood consistency: packed-Pallas vs per-locus-Pallas
vs XLA (VERDICT r4 weak #5 / next #7 — promote scripts/tpu_numcheck.py
into the suite).

The engine exposes three DNA likelihood paths (driver._build_tips_am +
the pack gate): the lane-packed Pallas kernel (default TPU f32), the
per-locus Pallas kernel (diploid path), and the XLA einsum path.  They
must agree per locus to float32 roundoff on every model family the
packed kernel special-cases (jc69/tn93-class/gtr banding) with and
without discrete-Gamma rates.  On CPU the Pallas kernels run in
interpreter mode (BPP_TPU_PALLAS=interpret); on a real TPU backend the
same test exercises the compiled kernels.
"""

import os

import jax
import numpy as np
import pytest

MODELS = [
    ("0", 1),        # JC69, no Gamma
    ("HKY", 4),      # tn93-class kernel coefs + Gamma-4
    ("TN93", 1),
    ("7", 4),        # GTR (banded eigen form) + Gamma-4
]

SIM_CTL = """\
seed = 137
seqfile = sim.phy
treefile = sim.tre
Imapfile = sim.Imap.txt
modelparafile = sim.para.txt
species&tree = 4 A B C D
                 2 2 2 2
                ((A #0.01, B #0.01) :0.01 #0.01, (C #0.01, D #0.01) :0.012 #0.01) :0.02 #0.01;
loci&length = 12 200
model = 7
qrates = 0 6 4 2 3 5 8
basefreqs = 0 0.3 0.2 0.2 0.3
"""

RUN_CTL = """\
seed = 11
seqfile = {tmp}/sim.phy
Imapfile = {tmp}/sim.Imap.txt
jobname = {tmp}/out
species&tree = 4 A B C D
                 2 2 2 2
                ((A, B), (C, D));
usedata = 1
nloci = 12
cleandata = 0
model = {model}
{alpha}
thetaprior = 3 0.03
tauprior = 3 0.06
finetune = 1
burnin = 10
sampfreq = 1
nsample = 10
"""


@pytest.fixture(scope="module")
def simdata(tmp_path_factory):
    import subprocess  # noqa: F401  (keep flake quiet about os use)

    from bpp_tpu.sim.simulate import run_simulation

    tmp = tmp_path_factory.mktemp("kernelsim")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        with open("sim.ctl", "w") as f:
            f.write(SIM_CTL)
        run_simulation("sim.ctl")
    finally:
        os.chdir(cwd)
    return tmp


def _engine(tmp, model, cats, pack, pallas_at_build):
    """Build an Engine with the requested kernel-path knobs.

    BPP_TPU_PACK / BPP_TPU_PALLAS are read at Engine CONSTRUCTION to
    pick the path; BPP_TPU_PALLAS is ALSO read at trace time by the
    pallas_call interpret flag, so the caller owns the steady-state
    value — this helper only pins the construction-time values."""
    from bpp_tpu.loader import load_run_from_ctl
    from bpp_tpu.mcmc.driver import Engine

    alpha = f"alphaprior = 1 1 {cats}" if cats > 1 else ""
    ctl = tmp / f"run_{model}_{cats}.ctl"
    ctl.write_text(RUN_CTL.format(model=model, alpha=alpha, tmp=tmp))
    steady = os.environ.get("BPP_TPU_PALLAS")
    try:
        os.environ["BPP_TPU_PACK"] = pack
        if pallas_at_build is None:
            os.environ.pop("BPP_TPU_PALLAS", None)
        else:
            os.environ["BPP_TPU_PALLAS"] = pallas_at_build
        run = load_run_from_ctl(str(ctl))
        run.cfg = run.cfg.replace(dtype="float32")
        return Engine(run, seed=1)
    finally:
        os.environ.pop("BPP_TPU_PACK", None)
        if steady is None:
            os.environ.pop("BPP_TPU_PALLAS", None)
        else:
            os.environ["BPP_TPU_PALLAS"] = steady


@pytest.mark.parametrize("model,cats", MODELS)
def test_three_path_logl_agreement(simdata, model, cats, monkeypatch):
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # CPU: pallas kernels run in interpreter mode (trace-time knob)
        monkeypatch.setenv("BPP_TPU_PALLAS", "interpret")
    kern = None if on_tpu else "interpret"

    e_pack = _engine(simdata, model, cats, pack="auto",
                     pallas_at_build=kern)
    st = e_pack.init_state()
    # evolve so gene-tree topologies/ages are nontrivial
    st, _ = e_pack.chunk_step(st, jax.random.PRNGKey(3), 10)
    ll_packed = np.asarray(e_pack._logl_fn(st.gt, st.subst, st.sp, st.clock))
    assert e_pack.ctx.pack is not None, "packed path not engaged"

    e_pl = _engine(simdata, model, cats, pack="0", pallas_at_build=kern)
    assert e_pl.ctx.pack is None and e_pl.ctx.tips_am is not None
    ll_pallas = np.asarray(e_pl._logl_fn(st.gt, st.subst, st.sp, st.clock))

    e_xla = _engine(simdata, model, cats, pack="0", pallas_at_build="0")
    assert e_xla.ctx.pack is None and e_xla.ctx.tips_am is None
    ll_xla = np.asarray(e_xla._logl_fn(st.gt, st.subst, st.sp, st.clock))

    mask = np.asarray(e_pack.ctx.locus_mask)
    d_pl = np.abs(ll_packed - ll_pallas)[mask].max()
    d_xla = np.abs(ll_packed - ll_xla)[mask].max()
    assert np.isfinite(ll_packed[mask]).all()
    assert (ll_packed[mask] < 0).all()
    # f32 margin measured by scripts/tpu_numcheck.py on the real TPU
    # kernels (<= 0.004 / 0.014 lnL over 64 evolved JC69 loci)
    assert d_pl < 0.02, (model, cats, d_pl)
    assert d_xla < 0.02, (model, cats, d_xla)
