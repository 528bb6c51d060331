"""Proposal kernels and random-variate helpers on the JAX PRNG.

Counter-based JAX keys replace the reference's per-thread legacy LCG
streams (``src/random.c``).  The proposal kernels mirror the reference
math: the Bactrian-Laplace symmetric kernel (``random.c:191-208``,
m=0.90) and boundary reflection (``src/gtree.c:3982`` ``reflect``).
All functions are shape-polymorphic and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

M_BACTRIAN = 0.90
S_BACTRIAN = (1.0 - M_BACTRIAN * M_BACTRIAN) ** 0.5


def bactrian(key, shape=(), dtype=None):
    """Bactrian-Laplace variate: mean 0, variance 1, bimodal at ±m.

    ``dtype`` should be the state dtype: under x64 the JAX PRNG defaults
    to float64, which would silently promote float32 sampler state.
    """
    if dtype is None:
        dtype = jnp.result_type(float)
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, shape, dtype=dtype) - 0.5
    r = jnp.log1p(-2.0 * jnp.abs(u)) * 0.70710678118654752440
    lap = jnp.where(u >= 0, -r, r)
    z = M_BACTRIAN + lap * S_BACTRIAN
    sign = jnp.where(jax.random.uniform(k2, shape, dtype=dtype) < 0.5,
                     jnp.asarray(-1.0, dtype), jnp.asarray(1.0, dtype))
    return (sign * z).astype(dtype)


def reflect(x, a, b):
    """Reflect x into the open interval (a, b).

    Vectorized version of the reference ``reflect`` without its
    pathological resample-on-boundary loop; instead the result is nudged
    off the boundary by an epsilon of the interval width.
    """
    diff = b - a
    excess = jnp.where(x < a, a - x, jnp.where(x > b, x - b, 0.0))
    side = jnp.where(x > b, 1, 0)
    n = jnp.floor(excess / diff)
    side = jnp.where(jnp.mod(n, 2.0) > 0.1, 1 - side, side)
    excess = excess - n * diff
    y = jnp.where(side == 1, b - excess, a + excess)
    y = jnp.where(excess > 0, y, x)
    # keep strictly inside IN THE WORKING DTYPE: a fixed 1e-12 nudge
    # underflows in float32 (a + 1e-12 == a for a ~ 1e-3), producing
    # exact parent==child age ties that break age-sorted traversals
    lo = jnp.nextafter(jnp.asarray(a, y.dtype), jnp.asarray(b, y.dtype))
    hi = jnp.nextafter(jnp.asarray(b, y.dtype), jnp.asarray(a, y.dtype))
    # XLA flushes subnormals to zero, so nextafter(0, b) == 0 after FTZ;
    # fall back to the smallest normal to stay strictly above a zero bound
    tiny = jnp.asarray(jnp.finfo(y.dtype).tiny, y.dtype)
    lo = jnp.where(lo <= a, jnp.asarray(a, y.dtype) + tiny, lo)
    return jnp.clip(y, lo, jnp.maximum(lo, hi))


def mh_accept(key, lnacceptance):
    """Metropolis-Hastings accept decision (method.c style: accept when
    lnacceptance >= ~0 or log(u) < lnacceptance)."""
    u = jax.random.uniform(key, jnp.shape(lnacceptance))
    return (lnacceptance >= -1e-10) | (jnp.log(u) < lnacceptance)


def gamma_sample(key, alpha, shape=()):
    """Gamma(alpha, 1) variate (jax native rejection sampler)."""
    return jax.random.gamma(key, alpha, shape) if shape else jax.random.gamma(key, alpha)


def log_pdf_gamma(x, a, b):
    return a * jnp.log(b) - jax.lax.lgamma(a) + (a - 1.0) * jnp.log(x) - b * x


def log_pdf_invgamma(x, a, b):
    return a * jnp.log(b) - jax.lax.lgamma(a) - (a + 1.0) * jnp.log(x) - b / x
