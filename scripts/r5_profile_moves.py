"""Marginal per-move timing of the A00 megastep at L loci (round 5).

For each move: jit a lax.scan of n calls, time at two scan lengths,
report the slope (the true marginal cost — axon's fixed ~27 ms
dispatch and ~0.5 ms/step scan phantom cancel in the difference).
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
L = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

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
from bpp_tpu.mcmc import moves
from bpp_tpu.mcmc.driver import Engine

run = load_run_from_ctl("run.ctl")
run.cfg = run.cfg.replace(dtype="float32")
eng = Engine(run, seed=1)
state = eng.init_state()
cfg, ctx = eng.cfg, eng.ctx


def marginal(move_fn, state, n1=10, n2=60):
    def mk(n):
        @jax.jit
        def f(st, key):
            def body(st, k):
                st, _ = move_fn(ctx, cfg, st, k)
                return st, None
            st, _ = jax.lax.scan(body, st, jax.random.split(key, n))
            return jnp.sum(st.logl)

        return f

    f1, f2 = mk(n1), mk(n2)
    key = jax.random.PRNGKey(0)
    float(f1(state, key))
    float(f2(state, key))
    b1 = b2 = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(f1(state, key))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f2(state, key))
        b2 = min(b2, time.perf_counter() - t0)
    return (b2 - b1) / (n2 - n1)


todo = [
    ("age_block", moves.age_block_move),
    ("spr_round", moves.spr_round_move),
    ("theta", moves.theta_move),
    ("tau", moves.tau_move),
    ("mixing", moves.mixing_move),
]
total = 0.0
for name, fn in todo:
    dt = marginal(fn, state)
    w = 1 if name != "spr_round" else 3
    total += w * dt
    print(f"{name:>10s}: {dt*1e3:7.3f} ms/call x{w}", flush=True)
print(f"{'sum':>10s}: {total*1e3:7.3f} ms/iter "
      f"(megastep measured ~{3.9 if L==1000 else '?'} ms)", flush=True)
