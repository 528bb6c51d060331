"""Round-5 chains-K aggregate throughput probe on the TPU."""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
L = int(sys.argv[2]) if len(sys.argv) > 2 else 100
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 200

os.makedirs("/tmp/r5head", exist_ok=True)
os.chdir("/tmp/r5head")
SIM = open("/root/repo/scratch/sim_tpl.ctl").read()
RUN = open("/root/repo/scratch/run_tpl.ctl").read()
with open("sim.ctl", "w") as f:
    f.write(SIM.format(nloci=L))
with open("run.ctl", "w") as f:
    f.write(RUN.format(nloci=L))
from bpp_tpu.sim.simulate import run_simulation

if not os.path.exists(f"sim_{L}.phy"):
    run_simulation("sim.ctl")
    os.rename("sim.phy", f"sim_{L}.phy")
shutil.copy(f"sim_{L}.phy", "sim.phy")

import jax
import jax.numpy as jnp

from bpp_tpu.loader import load_run_from_ctl
from bpp_tpu.mcmc.driver import Engine

run = load_run_from_ctl("run.ctl")
run.cfg = run.cfg.replace(dtype="float32")
eng = Engine(run, seed=1)
t0 = time.perf_counter()
states = eng.init_states(K)
print(f"init_states({K}): {time.perf_counter()-t0:.1f}s", flush=True)
mj = jax.jit(eng._chunk_multi, static_argnums=2)
key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
states, _, _ = mj(states, key, CHUNK, eng.ctx)
float(jnp.sum(states.logl))
print(f"compile+chunk: {time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(3):
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    states, _, _ = mj(states, sub, CHUNK, eng.ctx)
    float(jnp.sum(states.logl))
    dt = time.perf_counter() - t0
    print(f"K={K} L={L}: {K*CHUNK/dt:.0f} aggregate it/s "
          f"({dt/CHUNK*1e3:.2f} ms/it)", flush=True)
