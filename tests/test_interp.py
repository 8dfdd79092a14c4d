"""Spline-family interpolation (functions/interp.py + frame.interpolate
methods cubicspline/pchip/akima — reference core/missing.py:227 scipy
wrappers, re-implemented from the published algorithms since scipy is
not in the container).

Validation strategy: closed-form mathematical properties each method
must satisfy (no scipy available to differential-test against):

* not-a-knot cubic spline through samples of ANY cubic polynomial is
  that polynomial — everywhere, including the extrapolation region
  (de Boor ch. IV); checked to 1e-9 absolute on random knots.
* pchip reproduces linear data exactly and never overshoots the data
  range on monotone input (the Fritsch-Carlson design property).
* akima reproduces linear data and is exact at the knots.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import conftest  # noqa: E402,F401

import pandas_spark as ps  # noqa: E402
from pandas_spark import col  # noqa: E402
from pandas_spark.functions.interp import interp_series  # noqa: E402


def _mask(y, idx):
    y = y.copy()
    y[idx] = np.nan
    return y


# ---------------------------------------------------------------------------
# kernel properties (pure numpy — no Spark)
# ---------------------------------------------------------------------------

def test_cubicspline_reproduces_cubic_polynomial():
    rng = np.random.RandomState(7)
    for _ in range(20):
        x = np.sort(rng.uniform(0, 10, size=rng.randint(8, 30)))
        x = np.unique(x)
        a, b, c, d = rng.uniform(-3, 3, 4)
        poly = lambda t: a * t**3 + b * t**2 + c * t + d
        y = poly(x)
        # mask interior AND trailing points (trailing = extrapolation)
        holes = rng.choice(np.arange(2, len(x)), size=len(x) // 3, replace=False)
        got = interp_series(x, _mask(y, holes), "cubicspline")
        assert np.allclose(got, y, atol=1e-8), np.abs(got - y).max()


def test_cubicspline_small_counts():
    # 2 valid points → line; 3 → the parabola through them
    x = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([1.0, np.nan, np.nan, 7.0])
    got = interp_series(x, y, "cubicspline")
    assert np.allclose(got, [1.0, 3.0, 5.0, 7.0])
    x = np.arange(5.0)
    q = 2 * x**2 - 3 * x + 1
    got = interp_series(x, _mask(q, [1, 3]), "cubicspline")
    assert np.allclose(got, q)


@pytest.mark.parametrize("method", ["pchip", "akima"])
def test_hermite_methods_reproduce_linear(method):
    rng = np.random.RandomState(3)
    x = np.sort(rng.uniform(0, 20, 25))
    y = 2.5 * x - 4.0
    holes = rng.choice(np.arange(1, 25), size=8, replace=False)
    got = interp_series(x, _mask(y, holes), method)
    assert np.allclose(got, y, atol=1e-9)


def test_pchip_no_overshoot_on_monotone_data():
    # step-like monotone data: a C2 spline overshoots here, pchip must not
    x = np.arange(10.0)
    y = np.array([0, 0, 0, 0.1, 0.9, 1, 1, 1, 1, 1.0])
    holey = np.full(40, np.nan)
    holey[::4] = y  # knots at integer positions
    got = interp_series(np.arange(0, 10, 0.25), holey, "pchip")
    assert np.nanmax(got) <= 1.0 + 1e-12 and np.nanmin(got) >= -1e-12
    assert (np.diff(got[~np.isnan(got)]) >= -1e-12).all()  # monotone


def test_akima_exact_at_knots_and_local():
    rng = np.random.RandomState(11)
    x = np.sort(rng.uniform(0, 10, 15))
    y = rng.uniform(-5, 5, 15)
    xs = np.concatenate([x, (x[:-1] + x[1:]) / 2])
    order = np.argsort(xs)
    ys = np.full(len(xs), np.nan)
    ys[: len(x)] = y
    got = interp_series(xs[order], ys[order], "akima")
    # knot values pass through untouched; every midpoint fills
    knot_mask = ~np.isnan(ys[order])
    assert np.array_equal(got[knot_mask], ys[order][knot_mask])
    assert not np.isnan(got).any()


def test_leading_nans_stay_and_limit_caps():
    x = np.arange(10.0)
    y = np.array([np.nan, np.nan, 1.0, np.nan, np.nan, np.nan, 5.0, 6.0, np.nan, 8.0])
    got = interp_series(x, y, "pchip", limit=2)
    assert np.isnan(got[0]) and np.isnan(got[1])  # leading stay
    assert not np.isnan(got[3]) and not np.isnan(got[4])  # first 2 of gap fill
    assert np.isnan(got[5])  # 3rd consecutive NaN stays (limit=2)
    assert not np.isnan(got[8])


def test_strictly_increasing_required():
    x = np.array([0.0, 1.0, 1.0, 2.0])
    y = np.array([0.0, 1.0, 1.5, np.nan])
    with pytest.raises(ValueError, match="strictly increasing"):
        interp_series(x, y, "cubicspline")


# ---------------------------------------------------------------------------
# engine path (applyInPandas per by= group)
# ---------------------------------------------------------------------------

def test_interpolate_cubicspline_by_groups(spark):
    rng = np.random.RandomState(5)
    rows = []
    for g in ["a", "b", "c"]:
        x = np.sort(rng.uniform(0, 10, 20))
        aa, bb, cc, dd = rng.uniform(-2, 2, 4)
        y = aa * x**3 + bb * x**2 + cc * x + dd
        holes = set(rng.choice(np.arange(1, 20), 6, replace=False))
        for i in range(20):
            rows.append((g, float(x[i]), None if i in holes else float(y[i]), float(y[i])))
    pdf = pd.DataFrame(rows, columns=["g", "x", "v", "want"])
    edf = ps.DataFrame(spark.createDataFrame(pdf))
    out = (
        edf.interpolate(subset=["v"], method="cubicspline", by=["g"], on="x")
        .to_pandas()
        .sort_values(["g", "x"])
    )
    assert np.allclose(out["v"].to_numpy(), out["want"].to_numpy(), atol=1e-7)


def test_interpolate_spline_upcasts_int_and_whole_frame(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0], "v": [2, None, None, 8]})
    edf = ps.DataFrame(spark.createDataFrame(pdf, schema="x double, v bigint"))
    out = edf.interpolate(subset=["v"], method="pchip", on="x")
    assert dict(out.dtypes)["v"] == "double"
    got = out.to_pandas().sort_values("x")["v"].tolist()
    assert np.allclose(got, [2.0, 4.0, 6.0, 8.0])  # linear data reproduced


def test_interpolate_spline_requires_on(spark):
    pdf = pd.DataFrame({"v": [1.0, None, 3.0]})
    edf = ps.DataFrame(spark.createDataFrame(pdf))
    with pytest.raises(ValueError, match="requires on="):
        edf.interpolate(subset=["v"], method="akima")


def test_bspline_family_polynomial_reproduction(spark):
    """order-k spline interpolation reproduces degree-k polynomials
    exactly, including extrapolation (the same closed-form property the
    cubicspline oracle uses); quadratic/cubic are the interp1d-kind
    aliases, polynomial(order=5) exercises the general odd-order path."""
    from pandas_spark.frame import DataFrame

    xs = [0.0, 1.0, 2.5, 4.0, 5.5, 7.0, 9.0, 11.0, 12.0, 14.0]
    p2 = lambda t: 3 - 2 * t + 0.5 * t * t
    p5 = lambda t: ((t - 4) ** 5) / 300 + t
    rows = []
    for i, x in enumerate(xs):
        gap = i in (2, 5, 9)  # interior + trailing gaps
        rows.append((x, None if gap else p2(x), None if gap else p5(x)))
    sdf = spark.createDataFrame(rows, "x double, q double, f double")
    f = DataFrame(sdf)
    got_q = {
        r["x"]: r["q"]
        for r in f.interpolate(subset=["q"], method="quadratic", on="x").spark.collect()
    }
    for x in xs:
        assert abs(got_q[x] - p2(x)) < 1e-9
    got_p = {
        r["x"]: r["f"]
        for r in f.interpolate(
            subset=["f"], method="polynomial", on="x", order=5
        ).spark.collect()
    }
    for x in xs:
        assert abs(got_p[x] - p5(x)) < 1e-7


def test_bspline_zero_and_slinear(spark):
    from pandas_spark.frame import DataFrame

    rows = [(0.0, 1.0), (1.0, None), (2.0, 5.0), (3.5, None), (4.0, 9.0), (6.0, None)]
    sdf = spark.createDataFrame(rows, "x double, v double")
    f = DataFrame(sdf)
    z = {r["x"]: r["v"] for r in f.interpolate(subset=["v"], method="zero", on="x").spark.collect()}
    # step-from-left: x=1 -> y(0)=1, x=3.5 -> y(2)=5, x=6 (beyond last knot) -> y(4)=9
    assert (z[1.0], z[3.5], z[6.0]) == (1.0, 5.0, 9.0)
    s = {r["x"]: r["v"] for r in f.interpolate(subset=["v"], method="slinear", on="x").spark.collect()}
    # linear in x between knots, linear extrapolation beyond
    assert abs(s[1.0] - 3.0) < 1e-12
    assert abs(s[3.5] - 8.0) < 1e-12
    assert abs(s[6.0] - 13.0) < 1e-12


def test_polynomial_requires_order(spark):
    import pytest as _pytest

    from pandas_spark.frame import DataFrame

    sdf = spark.createDataFrame(
        [(0.0, 1.0), (1.0, None), (2.0, 3.0)], "x double, v double"
    )
    with _pytest.raises(Exception, match="order"):
        DataFrame(sdf).interpolate(subset=["v"], method="polynomial", on="x").spark.collect()


def test_limit_direction_and_area_match_pandas(spark):
    """All 9 (limit_direction × limit_area) combos plus the limit=2
    interaction, differentially against real pandas on the probe series
    [N, N, 1, N, N, N, 5, N, N]."""
    import numpy as np
    import pandas as pd

    from pandas_spark.frame import DataFrame

    vals = [None, None, 1.0, None, None, None, 5.0, None, None]
    ps = pd.Series([np.nan if v is None else v for v in vals])
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v double"
    )
    f = DataFrame(sdf).sort_values("t")
    for ld in ("forward", "backward", "both"):
        for la in (None, "inside", "outside"):
            want = ps.interpolate(limit_direction=ld, limit_area=la).tolist()
            got_rows = f.interpolate(
                subset=["v"], limit_direction=ld, limit_area=la
            ).spark.collect()
            got = [r["v"] for r in sorted(got_rows, key=lambda r: r["t"])]
            for w, g in zip(want, got):
                assert (np.isnan(w) and g is None) or abs(w - g) < 1e-12, (ld, la, want, got)
        want = ps.interpolate(limit_direction=ld, limit=2).tolist()
        got_rows = f.interpolate(
            subset=["v"], limit_direction=ld, limit=2
        ).spark.collect()
        got = [r["v"] for r in sorted(got_rows, key=lambda r: r["t"])]
        for w, g in zip(want, got):
            assert (np.isnan(w) and g is None) or abs(w - g) < 1e-12, (ld, want, got)
