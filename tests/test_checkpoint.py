"""Checkpoint/resume: exactly-once, byte-identical continuation.

The interrupted-and-resumed chain must reproduce the uninterrupted
chain's mcmc.txt byte-for-byte (PRNG key, finetunes, pjump stats and
file offsets are all checkpointed; load.c:2319 truncation semantics).
"""

import pytest
import subprocess
import sys
import textwrap


@pytest.mark.slow
def test_resume_byte_identical(tmp_path):
    (tmp_path / "d.txt").write_text(
        "\n".join(["12 20"] + [f"{s}^{s.lower()}{i} " + "ACGTACGTACGTACGTACGT"
                               for s in "ABC" for i in range(4)]) + "\n\n")
    (tmp_path / "d.imap").write_text(
        "".join(f"{s.lower()}{i}\t{s}\n" for s in "ABC" for i in range(4)))
    (tmp_path / "a00.ctl").write_text(textwrap.dedent("""\
        seed = 42
        seqfile = d.txt
        Imapfile = d.imap
        jobname = out
        species&tree = 3 A B C
                       4 4 4
                       ((A,B),C);
        usedata = 1
        nloci = 1
        thetaprior = gamma 2 200
        tauprior = gamma 2 100
        finetune = 1
        checkpoint = 30 100000
        burnin = 20
        sampfreq = 2
        nsample = 40
    """))
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo",
           "PATH": "/usr/bin:/bin"}
    r = subprocess.run(
        [sys.executable, "-m", "bpp_tpu", "--cfile", "a00.ctl", "--quiet"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    full = (tmp_path / "out.mcmc.txt").read_bytes()
    assert (tmp_path / "out.chk.npz").exists()

    r = subprocess.run(
        [sys.executable, "-m", "bpp_tpu", "--resume", "out.chk.npz",
         "--quiet"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    resumed = (tmp_path / "out.mcmc.txt").read_bytes()
    assert resumed == full
    # the resumed summary covers ALL samples (read back from the file)
    assert "40 samples" in (tmp_path / "out.txt").read_text()
