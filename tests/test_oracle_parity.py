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


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    got = _canon(QUERIES[name](spark, sf_dir).toPandas())
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
