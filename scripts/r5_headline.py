"""Round-5 headline probe: compile_s + iters/s at N loci on the TPU."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 400

os.makedirs("/tmp/r5head", exist_ok=True)
os.chdir("/tmp/r5head")

SIM = open("/root/repo/scratch/sim_tpl.ctl").read()
RUN = open("/root/repo/scratch/run_tpl.ctl").read()
with open("sim.ctl", "w") as f:
    f.write(SIM.format(nloci=N))
with open("run.ctl", "w") as f:
    f.write(RUN.format(nloci=N))

from bpp_tpu.sim.simulate import run_simulation

t0 = time.perf_counter()
if not os.path.exists(f"sim_{N}.phy"):
    run_simulation("sim.ctl")
    os.rename("sim.phy", f"sim_{N}.phy")
print(f"sim: {time.perf_counter()-t0:.1f}s", flush=True)
import shutil

shutil.copy(f"sim_{N}.phy", "sim.phy")

import jax
import jax.numpy as jnp

from bpp_tpu.loader import load_run_from_ctl
from bpp_tpu.mcmc.driver import Engine

t0 = time.perf_counter()
run = load_run_from_ctl("run.ctl")
run.cfg = run.cfg.replace(dtype="float32")
eng = Engine(run, seed=1)
state = eng.init_state()
print(f"load+init: {time.perf_counter()-t0:.1f}s", flush=True)

key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
state, _ = eng.chunk_step(state, key, CHUNK)
float(jnp.sum(state.logl))
compile_s = time.perf_counter() - t0
print(f"compile+first chunk({CHUNK}): {compile_s:.1f}s", flush=True)

for trial in range(3):
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    state, _ = eng.chunk_step(state, sub, CHUNK)
    float(jnp.sum(state.logl))
    dt = time.perf_counter() - t0
    print(f"chunk {CHUNK}: {dt:.2f}s = {CHUNK/dt:.1f} it/s", flush=True)
