"""End-to-end CLI coverage: run/summary/extend/checkpoint flags on a
tiny prior-only config (the CLI surface the verify recipe drives)."""

import os
import subprocess
import sys
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=_REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))


def _write_inputs(tmp_path, extra=""):
    (tmp_path / "d.txt").write_text(
        "\n".join(["6 30"] + [f"{s}^{s.lower()}{i} " + "ACGTAC" * 5
                              for s in "ABC" for i in range(2)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC" for i in range(2)))
    ctl = tmp_path / "run.ctl"
    ctl.write_text(textwrap.dedent(f"""\
        seed = 5
        seqfile = d.txt
        Imapfile = d.imap
        jobname = out
        species&tree = 3 A B C
                       2 2 2
                       ((A,B),C);
        usedata = 1
        nloci = 2
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        finetune = 1
        burnin = 10
        sampfreq = 2
        nsample = 20
    """) + extra)
    return ctl


def _run(args, cwd):
    r = subprocess.run([sys.executable, "-m", "bpp_tpu", *args, "--cpu",
                        "--quiet"],
                       cwd=cwd, env=ENV, capture_output=True, text=True,
                       timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


@pytest.fixture(scope="module")
def base_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    ctl = _write_inputs(tmp, extra="checkpoint = 20\n")
    _run(["--cfile", str(ctl)], tmp)
    return tmp, ctl


@pytest.mark.smoke
def test_run_outputs(base_run):
    tmp, ctl = base_run
    assert (tmp / "out.mcmc.txt").exists()
    assert (tmp / "out.txt").exists()
    assert (tmp / "out.FigTree.tre").exists()
    assert (tmp / "out.pdf").exists()
    assert (tmp / "out.chk.npz").exists()
    n = len((tmp / "out.mcmc.txt").read_text().splitlines())
    assert n == 21                       # header + 20 samples


def test_summary_only(base_run):
    tmp, ctl = base_run
    (tmp / "out.txt").unlink()
    _run(["--summary", str(ctl)], tmp)
    text = (tmp / "out.txt").read_text()
    assert "summary-only" in text and "theta" in text


@pytest.mark.smoke
def test_resume_extend(base_run):
    tmp, ctl = base_run
    _run(["--resume", str(tmp / "out.chk.npz"), "--extend", "10"], tmp)
    n = len((tmp / "out.mcmc.txt").read_text().splitlines())
    assert n == 31                       # 20 + 10 extended samples


def test_extend_requires_resume(tmp_path):
    r = subprocess.run([sys.executable, "-m", "bpp_tpu", "--extend", "5"],
                       env=ENV, capture_output=True, text=True, timeout=120)
    assert r.returncode == 1
    assert "resume" in r.stderr
