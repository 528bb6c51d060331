"""Discrete-gamma among-site rate variation.

Jittable equivalent of the reference's mean-discretization
(``src/gamma.c:221`` ``pll_compute_gamma_cats``): K categories of a
mean-1 Gamma(alpha, alpha), cut at the k/K quantiles, each category
represented by its conditional mean.  The quantile function is computed
with a Wilson-Hilferty start refined by Newton iterations on the
regularized incomplete gamma — the same approach as PAML's PointChi2,
but vectorized/jit-safe so the alpha move can recompute categories on
device every proposal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gamma_quantile(p, a):
    """Quantile of Gamma(a, 1) via Wilson-Hilferty + Newton on gammainc."""
    # Wilson-Hilferty approximation of the chi2 quantile
    z = jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * p - 1.0)
    g = 2.0 / (9.0 * (2.0 * a))
    x = (2.0 * a) * (1.0 - g + z * jnp.sqrt(g)) ** 3 / 2.0
    x = jnp.maximum(x, 1e-10)

    lgam = jax.lax.lgamma(a)

    def newton(_, x):
        f = jax.scipy.special.gammainc(a, x) - p
        dfdx = jnp.exp((a - 1.0) * jnp.log(x) - x - lgam)
        step = f / jnp.maximum(dfdx, 1e-300)
        # damped step, keep positive
        return jnp.maximum(x - jnp.clip(step, -0.9 * x, 10.0 * x), 1e-12)

    return jax.lax.fori_loop(0, 40, newton, x)


def discrete_gamma_rates(alpha, n_cats: int):
    """Category rates (mean 1) for Gamma(alpha, alpha) with K mean-cats.

    Returns rates ``[n_cats]``; all categories have weight 1/K.
    """
    if n_cats == 1:
        return jnp.ones((1,), dtype=jnp.result_type(alpha, jnp.float32))
    alpha = jnp.asarray(alpha)
    k = jnp.arange(1, n_cats, dtype=alpha.dtype)
    cuts = _gamma_quantile(k / n_cats, alpha) / alpha      # Gamma(a, a) quantiles
    # conditional means via the identity
    #   E[X; X<=c] = (a/b) * I(c*b, a+1)  for X ~ Gamma(a, b=a) => mean 1
    inc = jax.scipy.special.gammainc(alpha + 1.0, cuts * alpha)
    inc = jnp.concatenate([jnp.zeros((1,), alpha.dtype), inc,
                           jnp.ones((1,), alpha.dtype)])
    rates = (inc[1:] - inc[:-1]) * n_cats
    return rates
