"""TPU numeric check: packed vs per-locus-pallas vs f64-XLA logl."""
import os, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bpp_tpu.loader import load_run_from_ctl
from bpp_tpu.mcmc.driver import Engine
from bpp_tpu.sim.simulate import run_simulation

os.makedirs("/tmp/numchk", exist_ok=True); os.chdir("/tmp/numchk")
SIM = open("/root/repo/scratch/sim_tpl.ctl").read()
RUN = open("/root/repo/scratch/run_tpl.ctl").read()
open("sim.ctl", "w").write(SIM.format(nloci=64))
open("run.ctl", "w").write(RUN.format(nloci=64))
if not os.path.exists("sim.phy"):
    run_simulation("sim.ctl")

run = load_run_from_ctl("run.ctl")
run.cfg = run.cfg.replace(dtype="float32")
os.environ["BPP_TPU_PACK"] = "auto"
e1 = Engine(run, seed=1)
st = e1.init_state()
# evolve a bit so topologies are nontrivial
st, _ = e1.chunk_step(st, jax.random.PRNGKey(3), 20)
ll_packed = np.asarray(e1._logl_fn(st.gt, st.subst))

os.environ["BPP_TPU_PACK"] = "0"
run2 = load_run_from_ctl("run.ctl")
run2.cfg = run2.cfg.replace(dtype="float32")
e2 = Engine(run2, seed=1)
ll_pallas = np.asarray(e2._logl_fn(st.gt, st.subst))

os.environ["BPP_TPU_PALLAS"] = "0"
run3 = load_run_from_ctl("run.ctl")
run3.cfg = run3.cfg.replace(dtype="float32")
e3 = Engine(run3, seed=1)
ll_xla = np.asarray(e3._logl_fn(st.gt, st.subst))

mask = np.asarray(e1.ctx.locus_mask)
d1 = np.abs(ll_packed - ll_pallas)[mask].max()
d2 = np.abs(ll_packed - ll_xla)[mask].max()
print(f"max |packed - pallas| = {d1:.6f}  max |packed - xla| = {d2:.6f}")
print(f"sum logl packed {ll_packed[mask].sum():.3f} xla {ll_xla[mask].sum():.3f}")
assert d1 < 0.02 and d2 < 0.02, "TPU kernel mismatch"
print("OK")
