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


def bactrian(key, shape=()):
    """Bactrian-Laplace variate: mean 0, variance 1, bimodal at ±m."""
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, shape) - 0.5
    r = jnp.log1p(-2.0 * jnp.abs(u)) * 0.70710678118654752440
    lap = jnp.where(u >= 0, -r, r)
    z = M_BACTRIAN + lap * S_BACTRIAN
    sign = jnp.where(jax.random.uniform(k2, shape) < 0.5, -1.0, 1.0)
    return sign * z


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
    # keep strictly inside
    eps = 1e-12 * jnp.maximum(diff, 1.0) + 1e-300
    return jnp.clip(y, a + eps, b - eps)


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
