from __future__ import annotations

import duckdb
import pytest

from vspace_spark.session import get_spark

# default sf0.001 keeps CI fast; override to sweep a larger scale:
#   SPARK_GRAFT_TEST_SF=/root/testdata/sf0.1 pytest tests/test_oracle_parity.py
import os as _os  # noqa: E402

SF_DIR = _os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vspace-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
