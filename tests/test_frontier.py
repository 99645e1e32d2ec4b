"""Decision-frontier math vs a numpy oracle implementing the reference spec
(/root/reference/app/helpers/utils.py:308-443) — including the quirks:
distinct-value percentile, MAD→stdev(sensitivity=1) fallback, madpos clamp,
population σ, coeff_of_variation whole-group flagging."""

import math

import numpy as np
import pytest

from ee_outliers_spark.operators.frontier import flag_outliers, frontier_df


def oracle_frontier(method, values, sensitivity, trigger_on):
    a = np.asarray(values, dtype=np.float64)
    if method == "percentile":
        return float(np.percentile(sorted(set(values)), sensitivity))
    if method == "pct_of_max_value":
        return float(a.max() * sensitivity / 100)
    if method == "pct_of_median_value":
        return float(np.median(a) * sensitivity / 100)
    if method == "pct_of_avg_value":
        return float(a.mean() * sensitivity / 100)
    if method == "stdev":
        sgn = 1 if trigger_on == "high" else -1
        return float(a.mean() + sgn * sensitivity * a.std())
    if method == "float":
        return float(sensitivity)
    if method == "coeff_of_variation":
        return float(a.std() / a.mean())
    if method in ("mad", "madpos"):
        med = np.median(a)
        mad = np.median(np.abs(a - med))
        sgn = 1 if trigger_on == "high" else -1
        f = med + sgn * sensitivity * mad
        if f == med:  # MAD==0 (or s==0) → stdev with sensitivity 1
            f = a.mean() + sgn * 1 * a.std()
        if method == "madpos":
            f = max(f, 0.0)
        return float(f)
    raise ValueError(method)


GROUPS = {
    "g1": [1.0, 2.0, 2.0, 3.0, 10.0, 11.0, 4.0],
    "g2": [5.0, 5.0, 5.0, 5.0, 5.0, 9.0],       # MAD = 0 → stdev fallback
    "g3": [0.5, 0.5, 0.5],                        # MAD = 0, zero variance
    "g4": [100.0, 1.0, 2.0, 3.0, 2.0, 1.0, 50.0],
    "g5": [7.0],
}

CASES = [
    ("percentile", 25.0, "high"),
    ("percentile", 95.0, "low"),
    ("pct_of_max_value", 80.0, "high"),
    ("pct_of_median_value", 120.0, "low"),
    ("pct_of_avg_value", 99.0, "high"),
    ("mad", 3.0, "high"),
    ("mad", 2.0, "low"),
    ("madpos", 1000.0, "low"),   # strongly negative → clamped to 0
    ("stdev", 1.5, "high"),
    ("stdev", 1.0, "low"),
    ("float", 4.5, "high"),
    ("coeff_of_variation", 0.5, "high"),
    ("coeff_of_variation", 0.5, "low"),
]


@pytest.fixture(scope="module")
def values_df(spark):
    rows = [(g, v) for g, vs in GROUPS.items() for v in vs]
    return spark.createDataFrame(rows, "grp string, val double").cache()


@pytest.mark.parametrize("method,sens,on", CASES)
def test_frontier_matches_oracle(method, sens, on, spark, values_df):
    got = {
        r["grp"]: r["decision_frontier"]
        for r in frontier_df(values_df, ["grp"], "val", method, sens, on).collect()
    }
    for g, vs in GROUPS.items():
        want = oracle_frontier(method, vs, sens, on)
        assert math.isclose(got[g], want, rel_tol=1e-9, abs_tol=1e-12), (
            method, g, got[g], want,
        )


@pytest.mark.parametrize("method,sens,on", CASES)
def test_flags_match_oracle(method, sens, on, spark, values_df):
    got = flag_outliers(values_df, ["grp"], "val", method, sens, on)
    rows = got.collect()
    for r in rows:
        vs = GROUPS[r["grp"]]
        f = oracle_frontier(method, vs, sens, on)
        if method == "coeff_of_variation":
            want = f > sens if on == "high" else f < sens
        else:
            want = r["val"] > f if on == "high" else r["val"] < f
        assert r["is_outlier"] == want, (method, r, f)
