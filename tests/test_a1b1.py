"""Conditional (a1,b1) -> marginal reconstruction (src/a1b1.c).

Oracle (run once against the reference binary's own summary of its
ref.conditional_a1b1.txt, frogs 4 loci, invgamma 3 0.002 prior):
  ours: mean 0.002411 sd 0.001412 et (0.000550, 0.005886)
        hpd (0.000278, 0.004977) effu 0.058087 effy 0.056936 c 1.534113
  ref : mean 0.002411 sd 0.001412 et (0.000552, 0.005880)
        hpd (0.000286, 0.004977) effu 0.058087 effy 0.056936 c 1.534113
"""

import numpy as np

from bpp_tpu.summary.a1b1 import (
    DIST_GAMMA, DIST_INVGAMMA, conditional_to_marginal,
)


def test_degenerate_mixture_is_the_conditional():
    """All samples share (a1, b1): the marginal IS InvGamma(a1, b1)."""
    a1 = np.full(500, 12.0)
    b1 = np.full(500, 0.02)
    s = conditional_to_marginal(a1, b1, DIST_INVGAMMA)
    np.testing.assert_allclose(s["mean"], 0.02 / 11.0, rtol=1e-9)
    np.testing.assert_allclose(
        s["sd"], np.sqrt(0.02 ** 2 / (11 ** 2 * 10)), rtol=1e-9)
    from scipy.stats import invgamma
    lo = invgamma.ppf(0.025, 12, scale=0.02)
    hi = invgamma.ppf(0.975, 12, scale=0.02)
    np.testing.assert_allclose(s["et025"], lo, rtol=0.02)
    np.testing.assert_allclose(s["et975"], hi, rtol=0.02)
    assert s["c"] == np.inf or s["c"] > 1e6   # zero between-sample variance


def test_gamma_mixture_moments():
    """Mixture mean/var across varying conditionals: law of total
    mean/variance."""
    rng = np.random.default_rng(3)
    a1 = rng.uniform(5, 9, 2000)
    b1 = rng.uniform(40, 60, 2000)
    s = conditional_to_marginal(a1, b1, DIST_GAMMA)
    m = a1 / b1
    v = a1 / b1 ** 2
    np.testing.assert_allclose(s["mean"], m.mean(), rtol=1e-9)
    np.testing.assert_allclose(s["sd"],
                               np.sqrt(v.mean() + m.var()), rtol=1e-9)
    # intervals bracket the mean and have ~95% coverage width
    assert s["et025"] < s["mean"] < s["et975"]
    assert s["hpd975"] - s["hpd025"] <= s["et975"] - s["et025"] + 1e-9
