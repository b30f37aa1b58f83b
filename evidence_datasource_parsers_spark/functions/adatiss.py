"""AdaTiSS-style adaptive robust z-scores (SURVEY §2.12, last stats gap).

Port of the reference's R implementation
(``/root/reference/modules/baseline_expression/metrics.py:98-108`` driving
``AdaTiSS_fn.R``): for each group (gene), fit the *population* component of
the value distribution robustly, then z-score every observation against the
fitted (mu0, sd0).  Outliers (tissue-specific expression) get large |z|
without corrupting the fit.

Faithful pieces (AdaTiSS_fn.R line refs):

* ``est_fn`` (R ``est.fn``, :292-331): gamma-weighted EM — weights
  dnorm(x; mu, sd)^gamma, weighted mean, (1+gamma)-corrected weighted
  variance, tol 1e-4, <=``step`` iterations, returning the *previous*
  iterate on convergence exactly as the R loop does.
* ``efdr_crt`` (R ``efdr.0.fn``, :266-287): fitted-population fraction
  pi0 = mean(den^gam) * sqrt(2 pi var)^gam * sqrt(1+gam) and the binned
  null-eFDR criterion min(1, pi0) * sum(p0_bin^2 / p_bin).
* ``adapt_gamma_fit`` (R ``adapt.gam.rob.fit.fn``, :150-205): gamma grid
  0..1 (n<=100) or 0..3 step 0.1, select gamma minimizing |min(crt,10)-1|.
* small-n path (R ``AdaTiSS``, :128-131): groups with <20 observations use
  median / 1.4826*MAD with pi0 = share within 2 MAD.
* sd floor 0.01 and z clipping at +-10 (R :132-137).

Deviation (documented): R's ``hist(x, breaks=k)`` snaps bin edges with
``pretty()``; here bins are ``numpy.histogram`` equal-width with the same
zero-count-bin merging.  The criterion's purpose (penalize a fit whose
binned null probabilities disagree with the data) is preserved; no R
runtime exists in this image to reproduce pretty() fixtures.
"""

from __future__ import annotations

import math

import numpy as np

SD_FLOOR = 0.01
Z_CLIP = 10.0
MAD_SCALE = 1.4826


def _dnorm(x: np.ndarray, mu: float, sd: float) -> np.ndarray:
    return np.exp(-0.5 * ((x - mu) / sd) ** 2) / (sd * math.sqrt(2 * math.pi))


def est_fn(
    x: np.ndarray,
    mu0: float,
    var0: float,
    gam: float,
    tol: float = 1e-4,
    step: int = 50,
):
    """Gamma-weighted EM for the population component (R ``est.fn``).

    Returns (mu, var, weights); (nan, nan, None) when the weighted variance
    collapses below 1e-4 (degenerate fit at this gamma).
    """
    x = x[~np.isnan(x)]
    w = _dnorm(x, mu0, math.sqrt(var0)) ** gam
    w = w / w.sum()
    for _ in range(step + 1):
        mu1 = float((w * x).sum())
        var1 = float((1 + gam) * (w * (x - mu1) ** 2).sum())
        if var1 < 1e-4:
            return float("nan"), float("nan"), None
        diff = abs(mu1 - mu0) + abs(math.sqrt(var1) - math.sqrt(var0))
        if diff < tol:
            break
        mu0, var0 = mu1, var1
        w = _dnorm(x, mu0, math.sqrt(var0)) ** gam
        w = w / w.sum()
    # like the R loop, the converged estimate is the last *accepted* iterate
    return mu0, var0, w


def _merged_bins(x: np.ndarray, bin_num: int | None):
    """Equal-width histogram with zero-count bins merged away (the role of
    R's ``bk.cnt.fn``)."""
    n = len(x)
    if bin_num is None:
        bin_num = 20 if n > 1000 else 10 if n > 500 else 5
    bin_num = max(1, bin_num)
    cnt, edges = np.histogram(x, bins=bin_num)
    while (cnt == 0).any() and len(cnt) > 1:
        i = int(np.argmin(cnt))  # first zero-count bin
        # merge into the smaller neighbor by dropping the shared edge
        drop = i + 1 if i == 0 or (i < len(cnt) - 1 and cnt[i + 1] <= cnt[i - 1]) else i
        edges = np.delete(edges, drop)
        cnt, edges = np.histogram(x, bins=edges)
    return edges, cnt


def efdr_crt(
    x: np.ndarray, mu: float, var: float, gam: float, bin_num: int | None = None
):
    """Population fraction + binned null-eFDR criterion (R ``efdr.0.fn``)."""
    from math import erf

    sd = math.sqrt(var)
    den = _dnorm(x, mu, sd)
    pi0 = float(
        (den**gam).mean() * math.sqrt(2 * math.pi * var) ** gam * math.sqrt(1 + gam)
    )

    def pnorm(q):
        return 0.5 * (1 + erf((q - mu) / (sd * math.sqrt(2))))

    edges, cnt = _merged_bins(x, bin_num)
    k = len(cnt)
    p0 = np.empty(k)
    p0[0] = pnorm(edges[1])
    p0[-1] = 1 - pnorm(edges[-2])
    for j in range(1, k - 1):
        p0[j] = pnorm(edges[j + 1]) - pnorm(edges[j])
    p = cnt / cnt.sum()
    crt = min(1.0, pi0) * float((p0**2 / p).sum())
    return pi0, crt


def adapt_gamma_fit(
    x: np.ndarray, gammas: np.ndarray | None = None, bin_num: int | None = None
) -> dict:
    """Gamma-grid robust fit (R ``adapt.gam.rob.fit.fn``): run the EM at each
    gamma, score with the eFDR criterion, keep the gamma whose criterion is
    closest to 1."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = len(x)
    if gammas is None:
        limit = 1.0 if n <= 100 else 3.0
        gammas = np.round(np.arange(0.0, limit + 0.05, 0.1), 10)
    if bin_num is None:
        bin_num = int(round(n / 10)) if n >= 20 else None
    rows = []
    for gam in gammas:
        mu, var, _ = est_fn(x, float(x.mean()), float(x.var(ddof=1)), float(gam))
        if math.isnan(var):
            continue
        pi0, crt = efdr_crt(x, mu, var, float(gam), bin_num)
        rows.append((float(gam), mu, math.sqrt(var), pi0, crt))
    if not rows:
        return {
            "n": n, "gamma": float("nan"), "mu": float("nan"),
            "sd": float("nan"), "pi0": float("nan"), "crt": float("nan"),
        }
    crts = [abs(min(r[4], 10.0) - 1.0) for r in rows]
    g, mu, sd, pi0, crt = rows[int(np.argmin(crts))]
    return {
        "n": n, "gamma": g, "mu": mu, "sd": sd,
        "pi0": min(1.0, pi0), "crt": min(10.0, crt),
    }


def robust_pop_fit(x: np.ndarray) -> dict:
    """Dispatcher mirroring R ``AdaTiSS`` (:109-131): adaptive-gamma EM for
    n >= 20, median / scaled-MAD for small groups; sd floored at 0.01."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = len(x)
    if n >= 20:
        fit = adapt_gamma_fit(x)
    else:
        med = float(np.median(x))
        mad = MAD_SCALE * float(np.median(np.abs(x - med)))
        pi0 = float((np.abs(x - med) <= 2 * mad).sum() / n) if n else float("nan")
        fit = {
            "n": n, "gamma": float("nan"), "mu": med,
            "sd": mad, "pi0": pi0, "crt": float("nan"),
        }
    fit["sd"] = max(fit["sd"], SD_FLOOR) if not math.isnan(fit["sd"]) else fit["sd"]
    return fit


def adatiss_zscores(
    df,
    group_cols: list[str],
    value_col: str,
    clip: float = Z_CLIP,
):
    """Per-group robust z-scores as an applyInPandas kernel: one shuffle on
    the group key, the iterative fit runs vectorized per group inside an
    Arrow batch (the reference round-trips a CSV through an R subprocess —
    a driver-side bottleneck this formulation removes).

    Output: the input columns plus ada_mu / ada_sd (the fitted population
    parameters) and ada_z (clipped at +-``clip``, matching R's ada.z).
    """
    from pyspark.sql import functions as F  # noqa: F401

    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes
    ) + ", ada_mu double, ada_sd double, ada_z double"

    def kernel(pdf):
        import pandas as pd

        vals = pdf[value_col].to_numpy(dtype=np.float64)
        fit = robust_pop_fit(vals)
        z = (vals - fit["mu"]) / fit["sd"]
        z = np.clip(z, -clip, clip)
        out = pdf.copy()
        out["ada_mu"] = fit["mu"]
        out["ada_sd"] = fit["sd"]
        out["ada_z"] = z
        return out

    return df.groupBy(*group_cols).applyInPandas(kernel, out_schema)
