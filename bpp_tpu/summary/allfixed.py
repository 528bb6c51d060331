"""A00 posterior summaries: mean/median/HPD/ESS per sampled column.

Equivalent of the reference's ``src/allfixed.c`` (``allfixed_summary:
1601``): per-parameter posterior mean, median, S.D., min/max, 2.5%/
97.5% quantiles, HPD interval (``hpd_interval`` ``allfixed.c:318``),
effective sample size via Geyer's initial positive sequence method
(``eff_ict`` ``allfixed.c:227``), and lag-1 autocorrelation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def eff_ict(y: np.ndarray, maxlag: int = 2000, min_nr: int = 10) -> tuple[float, float]:
    """Integrated autocorrelation time (Geyer 1992 initial positive seq).

    Returns (tint, rho1).  ESS = n / tint.
    """
    n = len(y)
    mean = y.mean()
    stdev = y.std(ddof=0)
    if stdev / (abs(mean) + 1) < 1e-9 or n < min_nr + 2:
        return float(n), 0.0
    x = (y - mean) / stdev
    tint = -1.0
    rho0 = 1.0
    rho1 = 0.0
    for i in range(1, min(maxlag, n - min_nr)):
        rho = float(np.dot(x[: n - i], x[i:]) / (n - i))
        if i == 1:
            rho1 = rho
        if i % 2 == 1:
            if i > min_nr and rho + rho0 < 0:
                break
            tint += (rho0 + rho) * 2.0
        rho0 = rho
    # short anticorrelated chains can drive the Geyer sum negative (the
    # reference then reports a negative Tint, allfixed.c:233-266); clamp
    # to the iid floor instead of printing garbage
    return max(tint, 1.0), rho1


def hpd_interval(x: np.ndarray, alpha: float = 0.05) -> tuple[float, float]:
    """Shortest interval containing (1-alpha) posterior mass."""
    xs = np.sort(x)
    n = len(xs)
    k = max(int(np.floor(n * (1 - alpha))), 1)
    if k >= n:
        return float(xs[0]), float(xs[-1])
    widths = xs[k:] - xs[: n - k]
    i = int(np.argmin(widths))
    return float(xs[i]), float(xs[i + k])


@dataclass
class ColumnSummary:
    name: str
    mean: float
    median: float
    sd: float
    vmin: float
    vmax: float
    q025: float
    q975: float
    hpd_low: float
    hpd_high: float
    ess: float
    eff: float
    rho1: float


def summarize_column(name: str, x: np.ndarray) -> ColumnSummary:
    tint, rho1 = eff_ict(x)
    n = len(x)
    lo, hi = hpd_interval(x)
    return ColumnSummary(
        name=name,
        mean=float(x.mean()),
        median=float(np.median(x)),
        sd=float(x.std(ddof=0)),
        vmin=float(x.min()),
        vmax=float(x.max()),
        q025=float(np.quantile(x, 0.025)),
        q975=float(np.quantile(x, 0.975)),
        hpd_low=lo,
        hpd_high=hi,
        ess=n / tint,
        eff=1.0 / tint,
        rho1=rho1,
    )


def summary_table(columns: dict[str, np.ndarray]) -> list[ColumnSummary]:
    return [summarize_column(name, np.asarray(x))
            for name, x in columns.items()]


def format_summary(rows: list[ColumnSummary]) -> str:
    hdr = (f"{'param':<12} {'mean':>10} {'median':>10} {'S.D':>10} "
           f"{'min':>10} {'max':>10} {'2.5%':>10} {'97.5%':>10} "
           f"{'2.5%HPD':>10} {'97.5%HPD':>10} {'ESS*':>10} {'Eff*':>8} "
           f"{'rho1':>8}")
    lines = [hdr, "-" * len(hdr)]
    for r in rows:
        lines.append(
            f"{r.name:<12} {r.mean:>10.6g} {r.median:>10.6g} {r.sd:>10.6g} "
            f"{r.vmin:>10.6g} {r.vmax:>10.6g} {r.q025:>10.6g} "
            f"{r.q975:>10.6g} {r.hpd_low:>10.6g} {r.hpd_high:>10.6g} "
            f"{r.ess:>10.2f} {r.eff:>8.4f} {r.rho1:>8.4f}")
    return "\n".join(lines)


def split_rhat(chains: np.ndarray) -> float:
    """Gelman-Rubin split-R-hat over ``chains [K, S]``.

    Each chain is split in half (2K half-chains), then
    R-hat = sqrt(((n-1)/n W + B/n) / W) with B/W the between/within
    half-chain variances (Gelman et al. 2013, BDA3 eq. 11.4).  Values
    near 1 indicate between-chain agreement; > 1.01 is the usual
    convergence alarm.  No reference analog (the reference runs a
    single chain, method.c:5343); reported by the multi-chain mode
    (``chains = K``).
    """
    x = np.asarray(chains, np.float64)
    K, S = x.shape
    n = S // 2
    if n < 2:
        return float("nan")
    halves = x[:, : 2 * n].reshape(K * 2, n)
    if np.ptp(halves) == 0.0:
        return 1.0
    means = halves.mean(axis=1)
    B = n * means.var(ddof=1)
    W = halves.var(axis=1, ddof=1).mean()
    if W == 0.0:
        return float("inf")
    var_plus = (n - 1) / n * W + B / n
    return float(np.sqrt(var_plus / W))
