"""Two-process multihost smoke test (CPU cluster).

Drives the documented ``--multihost`` CLI path end-to-end: two real
OS processes form a JAX cluster over localhost, each owning 2 virtual
CPU devices; loci are sharded over the 4-device GLOBAL mesh; process 0
writes the output files.  This is the scale-out story the reference
lacks entirely (its parallelism tops out at one host's pthreads,
src/threads.c).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CTL = """
seed = 5
seqfile = {seq}
Imapfile = {imap}
jobname = {job}
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
nsample = 15
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cli(tmp_path):
    ctl = tmp_path / "run.ctl"
    ctl.write_text(CTL.format(
        seq="/root/reference/examples/frogs/frogs.txt",
        imap="/root/reference/examples/frogs/frogs.Imap.txt",
        job=str(tmp_path / "mh")))
    port = _free_port()

    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith("JAX_")}
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env_base.get("PYTHONPATH", "").split(os.pathsep))

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "bpp_tpu", "--cfile", str(ctl),
             "--cpu", "--x64", "--quiet",
             "--multihost", f"127.0.0.1:{port},2,{pid}"],
            env=env_base, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"process failed rc={rc}\n{err[-3000:]}"

    mcmc = tmp_path / "mh.mcmc.txt"
    assert mcmc.exists(), outs[0][2][-2000:]
    rows = mcmc.read_text().strip().splitlines()
    assert len(rows) >= 10   # header + samples
    data = np.array([[float(x) for x in r.split("\t")[1:]]
                     for r in rows[1:]])
    assert np.isfinite(data).all()
    # chains must move (frozen columns = a move stopped accepting)
    assert (data.std(0)[:-1] > 0).all(), data.std(0)
    # only process 0 writes; the summary file must exist exactly once
    assert (tmp_path / "mh.txt").exists()
