"""Minimal statistics kernels (scipy is not available in this environment).

Provides the one scipy function the reference depends on:
``scipy.stats.chisquare`` (used by adjust_bad_positions,
/root/reference/pdftabextract/clustering.py:356). The chi-square survival
function is computed via the regularized incomplete gamma function using the
classic series / continued-fraction split (Numerical Recipes §6.2 — public
algorithm), accurate to ~1e-12, far tighter than the 0.05 significance
threshold the pipeline compares against.
"""

import math

import numpy as np

_MAX_ITER = 500
_EPS = 3.0e-14


def _gamma_series(a, x):
    """Lower regularized incomplete gamma P(a, x) by series expansion."""
    gln = math.lgamma(a)
    ap = a
    s = 1.0 / a
    delta = s
    for _ in range(_MAX_ITER):
        ap += 1.0
        delta *= x / ap
        s += delta
        if abs(delta) < abs(s) * _EPS:
            break
    return s * math.exp(-x + a * math.log(x) - gln)


def _gamma_contfrac(a, x):
    """Upper regularized incomplete gamma Q(a, x) by continued fraction."""
    gln = math.lgamma(a)
    tiny = 1.0e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - gln) * h


def gammainc_upper(a, x):
    """Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("require x >= 0 and a > 0")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_series(a, x)
    return _gamma_contfrac(a, x)


def chi2_sf(stat, df):
    """Survival function of the chi-square distribution."""
    if df <= 0:
        raise ValueError("df must be > 0")
    if not np.isfinite(stat):
        return 0.0 if stat > 0 else 1.0
    if stat <= 0:
        return 1.0
    return gammainc_upper(df / 2.0, stat / 2.0)


def chisquare(f_obs, f_exp=None):
    """One-way chi-square test; returns (statistic, p-value).

    Matches scipy.stats.chisquare(f_obs, f_exp) with ddof=0: statistic =
    sum((obs-exp)^2 / exp), dof = k-1, p = chi2_sf(statistic, dof).
    """
    f_obs = np.asarray(f_obs, dtype=float)
    if f_exp is None:
        f_exp = np.full_like(f_obs, f_obs.mean())
    else:
        f_exp = np.asarray(f_exp, dtype=float)
    if f_obs.shape != f_exp.shape:
        raise ValueError("f_obs and f_exp must have the same shape")
    stat = float(np.sum((f_obs - f_exp) ** 2 / f_exp))
    df = f_obs.size - 1
    if df <= 0:
        return stat, float("nan")
    return stat, chi2_sf(stat, df)


def mode(arr):
    """Most common value; ties resolve to the smallest value because
    np.unique sorts. Parity: /root/reference/pdftabextract/common.py:394-397."""
    uniques, counts = np.unique(np.asarray(arr), return_counts=True)
    return uniques[np.argmax(counts)]
