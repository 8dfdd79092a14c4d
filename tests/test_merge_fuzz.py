"""Differential fuzz for merge() against eager pandas, focused on the
round-10 tiny-dim literal-map compose (operators/joins.py
``_tiny_dim_compose``): a driver-local right side flips between the
compose fast path (unique non-null int/string keys) and the real join
(dup keys, NULL keys, float keys, multi-key) — every generated case
must match pandas row-for-row either way, so the fuzz exercises BOTH
regimes and the boundary between them.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import conftest  # noqa: E402,F401

import pandas_spark as ps  # noqa: E402


def _vals(x):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return None
    if isinstance(x, float):
        return round(x, 9)
    return x


def _canon(pdf: pd.DataFrame) -> list:
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(_vals(x) for x in r) for r in pdf.itertuples(index=False)]
    return sorted(
        rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r)
    )


key_pools = {
    "int": lambda rng, n: rng.integers(0, 8, n).tolist(),
    "str": lambda rng, n: [f"k{v}" for v in rng.integers(0, 8, n)],
    "float": lambda rng, n: (rng.integers(0, 8, n) * 1.5).tolist(),
}


@settings(
    max_examples=int(os.environ.get("FUZZ_EXAMPLES", "30")),
    deadline=None,
    derandomize="FUZZ_EXAMPLES" not in os.environ,
    suppress_health_check=list(HealthCheck),
)
@given(data=st.data())
def test_merge_tiny_dim_matches_pandas(spark, data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    how = data.draw(st.sampled_from(["inner", "left", "left_semi", "left_anti"]))
    ktype = data.draw(st.sampled_from(["int", "str", "float"]))
    dup_keys = data.draw(st.booleans())
    null_key = data.draw(st.booleans())

    n_left, n_right = 40, data.draw(st.integers(1, 12))
    left = pd.DataFrame(
        {
            "k": key_pools[ktype](rng, n_left),
            "lv": rng.normal(size=n_left).round(3),
            "lid": range(n_left),
        }
    )
    if null_key:
        left.loc[rng.integers(0, n_left, 3), "k"] = None

    rkeys = key_pools[ktype](rng, n_right)
    if not dup_keys:
        rkeys = list(dict.fromkeys(rkeys))  # unique → compose-eligible
    right = pd.DataFrame(
        {
            "rk": rkeys,
            "rv": rng.normal(size=len(rkeys)).round(3),
            "rs": [f"s{i}" for i in range(len(rkeys))],
        }
    )
    if null_key and data.draw(st.booleans()):
        right.loc[0, "rk"] = None  # NULL right key → fallback path

    el = ps.from_pandas(spark, left)
    er = ps.from_pandas(spark, right)

    if how in ("left_semi", "left_anti"):
        matched = left["k"].isin(right["rk"].dropna())
        # pandas NULL keys: eqNullSafe — a NULL left key matches a NULL
        # right key (pandas merge matches NaN==NaN)
        if right["rk"].isna().any():
            matched = matched | left["k"].isna()
        exp = left[matched] if how == "left_semi" else left[~matched]
        got = el.merge(er, left_on="k", right_on="rk", how=how)
        assert _canon(got.to_pandas()) == _canon(exp.reset_index(drop=True))
        return

    exp = left.merge(right, left_on="k", right_on="rk", how=how)
    got = el.merge(er, left_on="k", right_on="rk", how=how)
    assert _canon(got.to_pandas()) == _canon(exp.reset_index(drop=True))
