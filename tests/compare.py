"""Differential comparison helper mirroring the driver's correctness gate:
row-count + schema (column names) + order-insensitive value match.

Stricter than the driver on values: exact for ints/strings/bools, and exact
for floats too unless a per-test tolerance is passed (our queries emit
decimal-stabilized or rounded floats precisely so exactness holds).
"""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # ints may arrive as int32/int64/uint depending on engine; floats as f32/f64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_df_equal(spark_df, duck_con, oracle_sql: str, float_tol: float = 0.0) -> None:
    a = _normalize(spark_df.toPandas())
    b = _normalize(duck_con.execute(oracle_sql).df())
    assert list(a.columns) == list(b.columns), f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    # The driver's value-hash is dtype-sensitive: a Spark int64 column vs a
    # DuckDB float64 column (e.g. SUM(BIGINT) -> HUGEINT -> float64) hashes
    # differently even when every value is equal. Python's int == float would
    # hide that here, so fail fast on any int-vs-float dtype split.
    for c in a.columns:
        ai = pd.api.types.is_integer_dtype(a[c])
        bi = pd.api.types.is_integer_dtype(b[c])
        assert ai == bi, (
            f"column {c}: dtype class differs (spark {a[c].dtype} vs oracle "
            f"{b[c].dtype}) — the driver's value-hash would reject this; "
            f"CAST the oracle aggregate (HUGEINT leak?) or fix the Spark type"
        )
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        if pd.api.types.is_float_dtype(a[c]):
            for i, (x, y) in enumerate(zip(av, bv)):
                x_nan = x is None or (isinstance(x, float) and math.isnan(x))
                y_nan = y is None or (isinstance(y, float) and math.isnan(y))
                if x_nan and y_nan:
                    continue
                assert not (x_nan or y_nan), f"{c}[{i}]: {x} vs {y}"
                if float_tol == 0.0:
                    assert x == y, f"{c}[{i}]: {x!r} != {y!r}"
                else:
                    assert math.isclose(x, y, rel_tol=float_tol, abs_tol=float_tol), (
                        f"{c}[{i}]: {x!r} !~ {y!r}"
                    )
        else:
            assert av == bv, f"column {c} differs (first rows: {av[:5]} vs {bv[:5]})"
