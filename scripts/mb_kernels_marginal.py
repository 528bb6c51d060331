"""Marginal timing of kernel variants: production baseline vs packed."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bpp_tpu.core.pallas_fels import site_logl_pallas
from bpp_tpu.config import SubstModel

L = 1000
T, S = 16, 128
N = 2 * T - 1
tiny = 1e-30
rng = np.random.default_rng(0)

def marginal(mkrun, args, n1=20, n2=120):
    f1, f2 = mkrun(n1), mkrun(n2)
    float(f1(*args)); float(f2(*args))
    b1 = b2 = float("inf")
    for _ in range(4):
        t0 = time.perf_counter(); float(f1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2(*args)); b2 = min(b2, time.perf_counter() - t0)
    return (b2 - b1) / (n2 - n1)

# ---------- production per-locus kernel ----------
left = np.zeros(N, np.int32); right = np.zeros(N, np.int32)
avail = list(range(T))
for k in range(T - 1):
    a = avail.pop(rng.integers(len(avail)))
    b = avail.pop(rng.integers(len(avail)))
    left[T + k], right[T + k] = a, b
    avail.append(T + k)
order_full = np.zeros((L, N), np.int32)
order_full[:, :T-1] = np.arange(T, N)
tips = (rng.random((L, T, 4, S)) < 0.3).astype(np.float32)
tips[:, :, 0, :] = np.maximum(tips[:, :, 0, :], 0.5)
prod_args = [jnp.asarray(x) for x in (
    order_full, np.tile(left, (L, 1)), np.tile(right, (L, 1)),
    np.zeros((L, N), np.int32), np.full(L, T, np.int32),
    np.zeros((L, N), np.float32), np.ones(L, np.float32),
    np.ones((L, 3), np.float32), np.full((L, 4), 0.25, np.float32),
    np.zeros((L, 4), np.float32), np.zeros((L, 16), np.float32),
    np.zeros((L, 16), np.float32), tips)]
blen = jnp.asarray((rng.random((L, N)) * 0.01).astype(np.float32))
npat_j = jnp.asarray(np.full(L, 24, np.int32))

def mk_prod(nscan):
    @jax.jit
    def run(blen):
        def body(c, _):
            out = site_logl_pallas(*prod_args, model=SubstModel.JC69,
                                   n_cats=1, blen=blen + c * 1e-20,
                                   n_pat=npat_j)
            return jnp.sum(out) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=nscan)
        return c
    return run

m = marginal(mk_prod, (blen,))
print(f"production per-locus kernel: {m*1e3:.3f} ms/pass "
      f"{m/L*1e6:.3f} us/locus")
