"""Conjugate / approximate-conjugate conditionals for theta-style Gibbs.

Vectorized re-derivation of the reference's
``get_gamma_conditional_approx`` (``src/stree.c``): the full conditional
of theta under a Gamma(a, b) prior with k coalescent events and waiting
sum T is ``p(th) ∝ th^(a-1-k) exp(-b·th - T/th)``; it is approximated
by moment-matching at the mode either with a gamma or an inverse-gamma
(the default proposal, ``BPP_THETA_PROP_MG_INVG``), then Metropolized.
Under an InvGamma(a, b) prior the conditional is exactly
InvGamma(a + k, b + T).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gamma_conditional_approx(a, b, k, T, invgamma_proposal: bool = True):
    """Approximate conditional parameters (a1, b1), vectorized over k/T.

    With ``invgamma_proposal`` the (a1, b1) parameterize an InvGamma
    proposal, otherwise a Gamma proposal.
    """
    out_dtype = jnp.result_type(jnp.asarray(k).dtype, jnp.float32)
    # solve in the widest available precision, return in the state dtype
    k = jnp.asarray(k, jnp.result_type(float))
    T = jnp.asarray(T, jnp.result_type(float))
    a1k = a - 1.0 - k
    Ts = jnp.maximum(T, 1e-300)
    m = (a1k + jnp.sqrt(a1k * a1k + 4.0 * b * Ts)) / (2.0 * b)
    m = jnp.maximum(m, 1e-300)
    ddl = -(a1k + 2.0 * Ts / m) / (m * m)
    v = -1.0 / ddl
    mmv = m * m / v

    if not invgamma_proposal:
        a1 = 1.0 + mmv / 2.0 + jnp.sqrt(mmv + mmv * mmv / 4.0)
        b1 = (a1 - 1.0) / m
        a1 = jnp.where(T <= 0.0, a, a1)
        b1 = jnp.where(T <= 0.0, b, b1)
        return a1.astype(out_dtype), b1.astype(out_dtype)

    # inverse-gamma proposal: a1 is the root of
    #   x^3 - (4+mmv) x^2 + (5-2mmv) x - (2+mmv) = 0  in [x0, x1]
    c1 = -(4.0 + mmv)
    c2 = 5.0 - 2.0 * mmv
    c3 = -(2.0 + mmv)

    def f(x):
        return ((x + c1) * x + c2) * x + c3

    x0 = (mmv + 2.0) / 2.0
    x1 = (mmv + 2.0) * 2.0
    f0 = f(x0)

    def body(_, carry):
        x0, x1, f0 = carry
        xm = 0.5 * (x0 + x1)
        fm = f(xm)
        same = f0 * fm > 0
        return (jnp.where(same, xm, x0), jnp.where(same, x1, xm),
                jnp.where(same, fm, f0))

    x0, x1, _ = jax.lax.fori_loop(0, 80, body, (x0, x1, f0))
    a1 = 0.5 * (x0 + x1)
    b1 = m * (a1 + 1.0)
    a1 = jnp.where(T <= 0.0, a + 2.0, a1)
    b1 = jnp.where(T <= 0.0, a * (a + 1.0) / b, b1)
    return a1.astype(out_dtype), b1.astype(out_dtype)


def sample_invgamma(key, a1, b1):
    return b1 / jax.random.gamma(key, a1, dtype=jnp.asarray(a1).dtype)


def sample_gamma_ab(key, a1, b1):
    return jax.random.gamma(key, a1, dtype=jnp.asarray(a1).dtype) / b1
