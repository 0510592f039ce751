"""Shared test fixtures: one SparkSession per test run + DuckDB oracle helper."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from ufc_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="ufc-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for cross-engine comparison: columns sorted by name,
    rows sorted by all columns, dates→ISO strings, floats rounded."""
    out = df.copy()
    out = out[sorted(out.columns)]
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            # date-typed cols come back as midnight timestamps from DuckDB
            nonnull = s.dropna()
            fmt = (
                "%Y-%m-%d"
                if (nonnull.dt.normalize() == nonnull).all()
                else "%Y-%m-%d %H:%M:%S"
            )
            out[col] = s.dt.strftime(fmt)
            out[col] = out[col].where(s.notna(), None)
        elif s.dtype == object:
            import decimal

            def _norm_obj(v):
                if hasattr(v, "isoformat"):
                    return v.isoformat()
                if isinstance(v, decimal.Decimal):
                    return float(v)
                return v

            out[col] = s.map(_norm_obj)
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.map(
                lambda v: None
                if v is None or (isinstance(v, float) and math.isnan(v))
                else round(float(v), 6)
            )
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("Int64")
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(
        drop=True
    )
    return out


def assert_frames_match(spark_df, duck_df: pd.DataFrame, label: str = "") -> None:
    left = normalize_frame(spark_df.toPandas())
    right = normalize_frame(duck_df)
    assert list(left.columns) == list(right.columns), (
        f"{label}: column mismatch {list(left.columns)} vs {list(right.columns)}"
    )
    assert len(left) == len(right), f"{label}: row count {len(left)} vs {len(right)}"
    pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=False,
                                  rtol=1e-5, atol=1e-8, obj=label or "frame")


# ---------------------------------------------------------------------------
# two-tier suite: the exhaustive per-query oracle sweep and the hypothesis
# property suites dominate runtime (~11 of ~13 minutes). They are marked
# `slow` at collection so `pytest -m "not slow"` is the <2-minute iteration
# tier; plain `pytest tests/` still runs everything.
# ---------------------------------------------------------------------------

_SLOW_FILES = {"test_extra_queries.py", "test_properties.py", "test_models_oracle.py"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
