"""Dtype-bridge round-trip conformance (r7 verdict stretch #8): one
parametrized matrix pushing every FIXTURES.md §1 dtype through

    engine → Arrow → pandas → engine        (to_pandas / from_pandas)
    engine → parquet → engine               (to_parquet / read_parquet)

and asserting a schema+value FIXPOINT. The dtype bridge is
load-bearing for every pandas differential in the suite; before this
file it was tested piecewise (per-op), never as one closed loop.

Missing-value convention under test (SURVEY §1.3 / §7.0): pandas
NaN/NaT/None all normalize to Spark NULL at from_pandas; float NaN
that the ENGINE holds as a value stays NaN through to_pandas. So the
fixpoint is asserted from the ENGINE side: whatever the engine holds
must survive a full loop bit-for-bit (schema included).
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import conftest  # noqa: E402,F401

import pandas_spark as ps  # noqa: E402
from pandas_spark.sources.io import from_pandas  # noqa: E402


# The FIXTURES.md §1 dtype matrix. Each row:
#   (name, engine DDL, engine values, rt_ddl, rt_vals)
# rt_ddl/rt_vals = the DOCUMENTED result of a plain (no schema=)
# engine -> pandas -> engine loop. None means "unchanged" (a strict
# fixpoint). Where they differ, the degradation is a pandas/numpy
# representational limit, not an engine bug — and from_pandas(schema=)
# removes it (exact-fixpoint test below covers every row):
#   * int widths with NULLs -> double (numpy has no nullable ints)
#   * NULL-free narrow ints keep their width (Arrow preserves)
#   * decimal precision re-infers from the values (scale survives)
#   * naive datetimes infer as session-tz TIMESTAMP, not NTZ
#   * NULL array elements -> NaN through numpy float arrays
#   * dict cells infer as struct, not map
#   * struct int fields re-infer at bigint
NAN = float("nan")
MATRIX = [
    ("i8", "tinyint", [-128, 0, 127, None],
     "double", [-128.0, 0.0, 127.0, None]),
    ("i8_nonnull", "tinyint", [-128, 0, 127], None, None),
    ("i16", "smallint", [-32768, 0, 32767, None],
     "double", [-32768.0, 0.0, 32767.0, None]),
    ("i32", "int", [-2147483648, 0, 2147483647, None],
     "double", [-2147483648.0, 0.0, 2147483647.0, None]),
    ("i32_nonnull", "int", [-2147483648, 0, 2147483647], None, None),
    ("i64", "bigint", [-(2**53), 0, 2**53 - 1, None],
     "double", [-float(2**53), 0.0, float(2**53 - 1), None]),
    ("i64_nonnull", "bigint", [-(2**63), 0, 2**63 - 1], None, None),
    ("u32_as_i64", "bigint", [2**31 + 1, 2**40, 0], None, None),
    ("f32", "float", [1.5, -0.0, 3.0e38, None], None, None),
    (
        "f64",
        "double",
        [1.5, -0.0, float("inf"), float("-inf"), 5e-324, None],
        None, None,
    ),
    ("dec", "decimal(12,2)", ["12345.67", "-0.01", None],
     "decimal(7,2)", None),
    ("b", "boolean", [True, False, None], None, None),
    (
        "s",
        "string",
        ["", "héllo", "漢字🎉", "á", " padded ", 'q"u,o\nte', None],
        None, None,
    ),
    ("ts_ntz", "timestamp_ntz",
     [datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
      datetime.datetime(1970, 1, 1),
      datetime.datetime(2024, 3, 10, 2, 30, 0, 123456), None],
     "timestamp", None),
    ("d", "date",
     [datetime.date(1969, 7, 20), datetime.date(2024, 2, 29), None],
     None, None),
    ("dur", "interval day to second",
     [datetime.timedelta(days=2, hours=3, microseconds=7),
      datetime.timedelta(0), None],
     None, None),
    ("arr", "array<int>", [[1, 2, 3], [], None, [None, 4]],
     "array<double>", [[1.0, 2.0, 3.0], [], None, [None, 4.0]]),
    ("arr_nonnull_elems", "array<bigint>", [[1, 2, 3], [], None], None, None),
    ("mp", "map<string,int>", [{"a": 1, "b": 2}, {"a": 3, "b": 4}, None],
     "struct<a:bigint,b:bigint>", [(1, 2), (3, 4), None]),
    ("st", "struct<x:int, y:string>", [(1, "one"), (None, None), None],
     "struct<x:bigint,y:string>", None),
    ("bin", "binary", [b"\x00\x01\xff", b"", None], None, None),
]


def _canon(v):
    """Order-independent, NaN-aware canonical form of one cell."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return (v, math.copysign(1, v))  # -0.0 vs 0.0 distinct
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    if hasattr(v, "asDict"):  # Row (struct)
        return tuple(_canon(x) for x in v)
    return v


def _engine_frame(spark, name, ddl, values):
    import decimal

    if ddl.startswith("decimal"):
        values = [None if v is None else decimal.Decimal(v) for v in values]
    rows = [(i, v) for i, v in enumerate(values)]
    sdf = spark.createDataFrame(rows, f"id bigint, `{name}` {ddl}")
    return ps.DataFrame(sdf)


IDS = [m[0] for m in MATRIX]


@pytest.mark.parametrize("name,ddl,values,rt_ddl,rt_vals", MATRIX, ids=IDS)
def test_pandas_roundtrip_contract(spark, name, ddl, values, rt_ddl, rt_vals):
    """Plain engine -> to_pandas -> from_pandas: a strict fixpoint
    where pandas can represent the type; the documented degradation
    (rt_ddl/rt_vals) where it can't."""
    f = _engine_frame(spark, name, ddl, values)
    back = from_pandas(spark, f.to_pandas())
    want_ddl = rt_ddl or ddl
    got_ddl = back.spark.schema[name].dataType.simpleString()
    assert got_ddl == want_ddl.replace(" ", "").replace("interval day to second".replace(" ", ""), "interval day to second"), (
        f"{name}: schema contract broken: expected {want_ddl}, got {got_ddl}"
    )
    exp = _engine_frame(spark, name, want_ddl if rt_vals else ddl,
                        rt_vals or values) if rt_vals else f
    want = {r["id"]: _canon(r[name]) for r in exp.spark.collect()}
    got = {r["id"]: _canon(r[name]) for r in back.spark.collect()}
    assert got == want


@pytest.mark.parametrize("name,ddl,values,rt_ddl,rt_vals", MATRIX, ids=IDS)
def test_pandas_roundtrip_schema_pin_is_fixpoint(
    spark, name, ddl, values, rt_ddl, rt_vals
):
    """from_pandas(schema=) removes every inference boundary: the loop
    is an exact schema+value fixpoint for ALL matrix rows."""
    f = _engine_frame(spark, name, ddl, values)
    back = from_pandas(
        spark, f.to_pandas(), schema=f"id bigint, `{name}` {ddl}"
    )
    assert back.spark.schema == f.spark.schema
    want = {r["id"]: _canon(r[name]) for r in f.spark.collect()}
    got = {r["id"]: _canon(r[name]) for r in back.spark.collect()}
    assert got == want


@pytest.mark.parametrize("name,ddl,values,rt_ddl,rt_vals", MATRIX, ids=IDS)
def test_parquet_roundtrip_fixpoint(spark, name, ddl, values, rt_ddl, rt_vals, tmp_path):
    if ddl == "interval day to second":
        pytest.skip("parquet has no day-time-interval logical type (Spark maps "
                    "it on write only via a long; documented engine boundary)")
    f = _engine_frame(spark, name, ddl, values)
    p = str(tmp_path / f"rt_{name}.parquet")
    f.to_parquet(p)
    back = ps.read_parquet(spark, p, cache=False)
    assert back.spark.schema == f.spark.schema, (
        f"schema drift through parquet: "
        f"{f.spark.schema.simpleString()} -> {back.spark.schema.simpleString()}"
    )
    want = {r["id"]: _canon(r[name]) for r in f.spark.collect()}
    got = {r["id"]: _canon(r[name]) for r in back.spark.collect()}
    assert got == want


def test_float_nan_normalizes_to_null_at_from_pandas(spark):
    """The ONE asymmetric edge, asserted explicitly: pandas NaN means
    missing (dtypes/missing.py:99), so from_pandas maps float NaN to
    NULL — a pandas->engine->pandas loop turns NaN into NaN (via NULL),
    while an engine-held NaN VALUE maps to NULL on return because
    pandas cannot distinguish the two."""
    pdf = pd.DataFrame({"v": [1.0, float("nan"), 3.0]})
    f = from_pandas(spark, pdf)
    vals = [r["v"] for r in f.spark.collect()]
    assert vals[0] == 1.0 and vals[2] == 3.0 and vals[1] is None
