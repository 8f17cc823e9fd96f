"""Differential harness: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate (row count + columns + order-
insensitive values, columns sorted by name) at sf0.001 so mismatches
surface locally before the driver's sf0.01 run. Exact comparison — the
float discipline in queries/__init__ is supposed to make results
deterministic, and this test is what enforces it.
"""

from __future__ import annotations

import pandas as pd
import pytest

from vspace_spark.queries import ORACLES, QUERIES, load_all

load_all()

ORACLE_CASES = sorted(ORACLES)
ROWS_ONLY_CASES = sorted(set(QUERIES) - set(ORACLES))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = (
                pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[ns]")
            )
        elif s.dtype == object:
            import datetime as dt

            first = s.dropna().iloc[0] if s.notna().any() else None
            if isinstance(first, (dt.date, dt.datetime)):
                df[c] = pd.to_datetime(s).astype("datetime64[ns]")
            else:
                df[c] = s.map(lambda x: str(x) if x is not None else None)
        else:
            # unify integer widths / nullability across engines
            try:
                df[c] = pd.to_numeric(s)
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _types_compatible(spark_dt, duck_t: str):
    """Is the DuckDB oracle column type hash-safe against the Spark one?

    The driver's value-hash canonicalizes both results column-by-column;
    types that canonicalize identically (integer widths, date/timestamp
    family) are fine, but a DuckDB HUGEINT (INT128 — what list_sum over
    BIGINT returns) or a one-sided DECIMAL does NOT round-trip the same
    way as Spark's long/double and produces a values-identical-but-
    hash-red driver row (round-6 `multimodal_phash_dedup` lesson).
    Returns True / False / None (unknown pairing — treated as failure
    so new type shapes get an explicit allowance here).
    """
    import pyspark.sql.types as T

    duck_t = duck_t.upper()
    integral = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")
    temporal = duck_t == "DATE" or duck_t.startswith("TIMESTAMP")
    if "HUGEINT" in duck_t:
        return False
    if isinstance(spark_dt, (T.LongType, T.IntegerType, T.ShortType,
                             T.ByteType)):
        return duck_t in integral
    if isinstance(spark_dt, T.DoubleType):
        # exact width: float32 values don't round-trip to the same
        # float64 bit patterns, so FLOAT-vs-double is the same
        # values-equal-but-hash-red class this gate exists to catch
        return duck_t == "DOUBLE"
    if isinstance(spark_dt, T.FloatType):
        return duck_t == "FLOAT"
    if isinstance(spark_dt, T.DecimalType):
        return duck_t.startswith("DECIMAL")
    if isinstance(spark_dt, T.StringType):
        return duck_t == "VARCHAR"
    if isinstance(spark_dt, T.BooleanType):
        return duck_t == "BOOLEAN"
    if isinstance(spark_dt, (T.DateType, T.TimestampType,
                             T.TimestampNTZType)):
        return temporal
    if isinstance(spark_dt, T.ArrayType):
        return duck_t.endswith("[]")
    if isinstance(spark_dt, T.BinaryType):
        return duck_t == "BLOB"
    return None


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_types = {f.name: f.dataType for f in sdf.schema.fields}
    rel = duck.sql(ORACLES[name])
    for col, duck_t in zip(rel.columns, (str(t) for t in rel.types)):
        assert col in spark_types, (
            f"{name}: oracle column {col!r} missing from Spark schema"
        )
        ok = _types_compatible(spark_types[col], duck_t)
        assert ok is True, (
            f"{name}.{col}: oracle type {duck_t} is not hash-safe against"
            f" Spark {spark_types[col].simpleString()} (compat={ok});"
            " cast the oracle (e.g. ::BIGINT over list_sum) or align the"
            " Spark side"
        )
    got = _canon(sdf.toPandas())
    want = _canon(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    try:
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=True
        )
    except AssertionError as e:  # pragma: no cover - debug aid
        diff = got.compare(want) if got.shape == want.shape else None
        raise AssertionError(f"{name} mismatch:\n{diff}\n{e}") from None


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
