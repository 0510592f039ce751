"""NULL-partition-key regression tests for the de-weakened groupwise
window rewrites (r5 ADVICE items 2–3).

The r5 rewrites replaced ``Window.partitionBy(event_type)`` with a
groupBy + broadcast-stitch-join; a plain equi-join there silently DROPS
NULL-key rows that the window would have grouped. The live testdata has
no NULL event_type, so the sf sweeps can't catch a regression — this
test builds a tiny events parquet WITH NULL keys and requires the Spark
queries to match their own committed DuckDB oracles on it (the oracles
still use real SQL windows, i.e. the pre-rewrite semantics).
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from tests.conftest import normalize_frame

NULLED_QUERIES = ["window_distribution", "target_encoding_loo"]


@pytest.fixture(scope="module")
def null_events_dir(spark, tmp_path_factory):
    rows = []
    for i in range(60):
        # every 5th row has a NULL event_type -> a 12-row NULL group
        et = None if i % 5 == 0 else ["click", "view", "purchase"][i % 3]
        rows.append(
            (
                i,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
                i % 7,
                et,
                round((i * 37 % 101) / 3.0, 2),
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = tmp_path_factory.mktemp("nullkey")
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "events.parquet"))
    return str(out)


@pytest.mark.parametrize("name", NULLED_QUERIES)
def test_null_event_type_rows_survive_and_match_oracle(
    spark, null_events_dir, name
):
    import __spark_entry__ as entry

    got = entry.queries()[name](spark, null_events_dir)
    # no row lost: both queries emit one row per input event
    assert got.count() == 60
    assert got.filter("event_type IS NULL").count() == 12

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet/*.parquet')"
    )
    want = con.execute(entry.oracle_sql()[name]).df()
    con.close()
    left = normalize_frame(got.toPandas())
    right = normalize_frame(want)
    assert list(left.columns) == list(right.columns)
    assert left.equals(right), f"{name}: value mismatch with NULL keys"
