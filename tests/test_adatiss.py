"""AdaTiSS robust z-score port: EM semantics, gamma adaptation, small-n
median/MAD path, and the applyInPandas integration."""

from __future__ import annotations

import math

import numpy as np
import pytest

from evidence_datasource_parsers_spark.functions.adatiss import (
    MAD_SCALE,
    adapt_gamma_fit,
    adatiss_zscores,
    est_fn,
    robust_pop_fit,
)


def test_est_fn_gamma_zero_is_mle():
    """gamma=0 → uniform weights → the EM fixed point is (mean, pop-var),
    the plain Gaussian MLE (sanity anchor for the weighting math)."""
    rng = np.random.default_rng(7)
    x = rng.normal(3.0, 2.0, 400)
    mu, var, w = est_fn(x, float(x.mean()), float(x.var(ddof=1)), gam=0.0)
    assert mu == pytest.approx(x.mean(), abs=1e-9)
    assert var == pytest.approx(x.var(ddof=0), rel=1e-3)
    assert w == pytest.approx(np.full(len(x), 1 / len(x)))


def test_est_fn_downweights_outliers():
    x = np.concatenate([np.random.default_rng(1).normal(0, 1, 100), [60.0]])
    mu, var, w = est_fn(x, float(x.mean()), float(x.var(ddof=1)), gam=0.5)
    assert abs(mu) < 0.3                      # not dragged by the outlier
    assert math.sqrt(var) < 2.0
    assert w[-1] < 1e-10                      # outlier weight ~ 0


def test_est_fn_degenerate_variance_returns_nan():
    x = np.full(50, 5.0)                      # zero spread → var collapses
    mu, var, _ = est_fn(x, 5.0, 1.0, gam=1.0)
    assert math.isnan(mu) and math.isnan(var)


def test_adaptive_fit_resists_contamination():
    rng = np.random.default_rng(42)
    x = np.concatenate([rng.normal(0, 1, 200), np.full(8, 50.0)])
    fit = robust_pop_fit(x)
    assert abs(fit["mu"]) < 0.2               # naive mean is ~1.9
    assert 0.7 < fit["sd"] < 1.3              # naive sd is ~9.7
    assert fit["gamma"] > 0                   # contamination forces gamma up
    assert 0.9 < fit["pi0"] <= 1.0            # ~96% population fraction


def test_adaptive_fit_recovers_clean_parameters():
    rng = np.random.default_rng(3)
    fit = robust_pop_fit(rng.normal(5.0, 2.0, 500))
    assert fit["mu"] == pytest.approx(5.0, abs=0.2)
    assert fit["sd"] == pytest.approx(2.0, abs=0.4)


def test_small_n_median_mad_path_exact():
    x = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    fit = robust_pop_fit(x)
    assert math.isnan(fit["gamma"])           # adaptive path not used (n<20)
    assert fit["mu"] == 3.0
    assert fit["sd"] == MAD_SCALE * 1.0       # median(|x-3|) = 1
    assert fit["pi0"] == pytest.approx(4 / 5)


def test_sd_floor():
    fit = robust_pop_fit(np.array([2.0] * 10))
    assert fit["sd"] == 0.01                  # MAD 0 → floored


def test_gamma_grid_depends_on_n():
    rng = np.random.default_rng(5)
    small = adapt_gamma_fit(rng.normal(0, 1, 60))
    assert small["gamma"] <= 1.0 + 1e-9       # n<=100 → grid capped at 1


def test_adatiss_zscores_applyinpandas(spark):
    rng = np.random.default_rng(11)
    big = [("g1", f"s{i}", float(v)) for i, v in enumerate(
        np.concatenate([rng.normal(10, 2, 40), [80.0, 90.0]])
    )]
    small = [("g2", f"s{i}", float(v)) for i, v in enumerate(
        [1.0, 2.0, 3.0, 4.0, 100.0]
    )]
    df = spark.createDataFrame(
        big + small, "gene string, sample_id string, value double"
    )
    out = adatiss_zscores(df, ["gene"], "value")
    assert out.columns == [
        "gene", "sample_id", "value", "ada_mu", "ada_sd", "ada_z"
    ]
    rows = out.collect()
    by_gene: dict[str, list] = {}
    for r in rows:
        by_gene.setdefault(r["gene"], []).append(r)

    # the Spark kernel must agree exactly with the driver-side fit
    for gene, data in (("g1", big), ("g2", small)):
        vals = np.array([v for _, _, v in data])
        fit = robust_pop_fit(vals)
        got = by_gene[gene][0]
        assert got["ada_mu"] == pytest.approx(fit["mu"], abs=1e-12)
        assert got["ada_sd"] == pytest.approx(fit["sd"], abs=1e-12)
        zs = {r["sample_id"]: r["ada_z"] for r in by_gene[gene]}
        for _, sid, v in data:
            want = float(np.clip((v - fit["mu"]) / fit["sd"], -10, 10))
            assert zs[sid] == pytest.approx(want, abs=1e-12)

    # outliers in g1 hit the +10 clip, population stays small
    g1z = [r["ada_z"] for r in by_gene["g1"]]
    assert sum(z == 10.0 for z in g1z) == 2
    assert sum(abs(z) < 3 for z in g1z) >= 38
