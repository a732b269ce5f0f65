"""Properties for queries_insight: each statistic re-derived with a
straight numpy/pandas recomputation (independent of BOTH engines —
the oracle checks Spark≡DuckDB; these check Spark≡the math)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from data_mastery_pipeline_spark.queries_insight import (
    cusum_revenue_shift,
    event_transition_matrix,
    ks_test_drift,
    seasonal_decompose_daily,
    woe_iv_value_deciles,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(f"{SF_SMOKE}/events.parquet")


@pytest.fixture(scope="module")
def orders_pd():
    return pd.read_parquet(f"{SF_SMOKE}/orders.parquet")


def _ks_brute(a: np.ndarray, b: np.ndarray) -> float:
    """D = max over pooled points of |F1 - F2| (right-continuous ECDFs
    evaluated AT each distinct pooled value)."""
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    return float(np.max(np.abs(f1 - f2)))


def test_ks_matches_brute_force(spark, events_pd):
    row = ks_test_drift(spark, SF_SMOKE).collect()[0]
    clicks = events_pd.loc[
        events_pd.event_type == "click", "value"
    ].to_numpy()
    purch = events_pd.loc[
        events_pd.event_type == "purchase", "value"
    ].to_numpy()
    assert row.n_click == len(clicks)
    assert row.n_purchase == len(purch)
    d = _ks_brute(clicks, purch)
    assert abs(row.d_stat - d) < 1e-6 + 1e-12
    lam = d * math.sqrt(
        len(clicks) * len(purch) / (len(clicks) + len(purch))
    )
    assert abs(row.ks_lambda - lam) < 1e-4 + 1e-12
    assert row.drift_detected == (lam > 1.358)


def test_ks_identical_samples_give_zero(spark):
    """Click-vs-click through the same plan must yield D=0 — pin by
    rewiring the group indicator via a monkeypatched filter? Simpler:
    the statistic is exercised above; here pin the internal identity
    D(a,a)=0 for the brute checker itself (guards the test oracle)."""
    a = np.array([1.0, 2.0, 2.0, 5.0])
    assert _ks_brute(a, a) == 0.0
    assert _ks_brute(a, np.array([10.0, 11.0])) == 1.0


def test_cusum_matches_recursion(spark, orders_pd):
    out = (
        cusum_revenue_shift(spark, SF_SMOKE)
        .orderBy("day")
        .toPandas()
    )
    daily = (
        orders_pd.groupby("o_orderdate")["o_totalprice"]
        .sum()
        .sort_index()
    )
    x = daily.to_numpy(dtype=float)
    mu, sd = x.mean(), x.std(ddof=1)
    k = sd / 2.0
    s_pos = np.zeros_like(x)
    s_neg = np.zeros_like(x)
    up, dn = 0.0, 0.0
    for i, xi in enumerate(x):
        up = max(0.0, up + xi - mu - k)
        dn = max(0.0, dn + mu - k - xi)
        s_pos[i], s_neg[i] = up, dn
    assert len(out) == len(x)
    assert list(out["day"]) == list(daily.index)
    # closed form Y - min(0, running-min Y) == the max(0, ...) recursion
    np.testing.assert_allclose(out["cusum_up"], s_pos, atol=0.011)
    np.testing.assert_allclose(out["cusum_down"], s_neg, atol=0.011)
    expected_alarm = np.maximum(s_pos, s_neg) > 4.0 * sd
    assert (out["alarm"].to_numpy() == expected_alarm).all()


def test_woe_iv_properties(spark, events_pd):
    out = woe_iv_value_deciles(spark, SF_SMOKE).orderBy("tile").toPandas()
    n = len(events_pd)
    assert list(out["tile"]) == list(range(1, 11))
    assert out["n"].sum() == n
    # SQL-standard NTILE: first (n mod 10) tiles get one extra row
    big, rem = n // 10, n % 10
    assert list(out["n"]) == [big + 1] * rem + [big] * (10 - rem)
    assert out["purchases"].sum() == int(
        (events_pd.event_type == "purchase").sum()
    )
    # recompute WoE on the smallest tile from the raw rows
    ev = events_pd.sort_values(["value", "event_id"]).reset_index(drop=True)
    sizes = [big + 1] * rem + [big] * (10 - rem)
    stops = np.cumsum(sizes)
    tile1 = ev.iloc[: stops[0]]
    goods1 = float((tile1.event_type == "purchase").sum())
    bads1 = len(tile1) - goods1
    gt = float((ev.event_type == "purchase").sum())
    bt = n - gt
    woe1 = math.log(((goods1 + 0.5) / gt) / ((bads1 + 0.5) / bt))
    assert abs(out["woe"].iloc[0] - woe1) < 1e-4 + 1e-12
    # IV contributions match the definition row-by-row
    for _, r in out.iterrows():
        g = r["purchases"] + 0.5
        b = r["n"] - r["purchases"] + 0.5
        woe = math.log((g / gt) / (b / bt))
        assert abs(r["woe"] - woe) < 1e-4 + 1e-12
        assert abs(r["iv_contrib"] - (g / gt - b / bt) * woe) < 1e-6 + 1e-12


def test_seasonal_decompose_reconstructs_series(spark, orders_pd):
    out = seasonal_decompose_daily(spark, SF_SMOKE).toPandas()
    daily = (
        orders_pd.groupby("o_orderdate")["o_totalprice"].sum().sort_index()
    )
    assert len(out) == len(daily)
    # trend+seasonal+residual == revenue (to quantization)
    recon = out["trend"] + out["seasonal"] + out["residual"]
    np.testing.assert_allclose(recon, out["revenue"], atol=0.021)
    # trend matches a pandas centered 7-row rolling mean
    trend = daily.rolling(7, center=True, min_periods=1).mean()
    np.testing.assert_allclose(
        out.sort_values("day")["trend"], trend.to_numpy(), atol=0.011
    )
    # seasonal: one value per weekday
    assert out.groupby(out["day"].map(lambda d: d.weekday()))[
        "seasonal"
    ].nunique().max() == 1


def test_transition_matrix_rows_normalize(spark, events_pd):
    out = event_transition_matrix(spark, SF_SMOKE).toPandas()
    sums = out.groupby("cur")["p"].sum()
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)
    # pair counts match a pandas recomputation
    ev = events_pd.sort_values(["user_id", "ts", "event_id"])
    ev["nxt"] = ev.groupby("user_id")["event_type"].shift(-1)
    truth = (
        ev.dropna(subset=["nxt"])
        .groupby(["event_type", "nxt"])
        .size()
        .rename("n")
        .reset_index()
    )
    m = out.merge(
        truth, left_on=["cur", "nxt"], right_on=["event_type", "nxt"]
    )
    assert len(m) == len(out) == len(truth)
    assert (m["n_x"] == m["n_y"]).all()
