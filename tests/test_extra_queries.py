"""Beyond-parity queries vs their DuckDB oracles."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_frames_match

from ufc_data_warehouse_spark.extra_queries import EXTRA_ORACLES, EXTRA_QUERIES


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, duck, name):
    assert name in EXTRA_ORACLES, f"{name} missing oracle"
    spark_df = EXTRA_QUERIES[name](spark, SF_DIR)
    duck_df = duck.execute(EXTRA_ORACLES[name]).df()
    assert_frames_match(spark_df, duck_df, label=name)


def test_transform_with_state_totals(spark, duck):
    """Spark 4 transformWithStateInPandas path — gated on google.protobuf,
    which the TWS python driver worker imports (absent in some containers)."""
    import pytest as _pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        _pytest.skip("google.protobuf unavailable — TWS driver worker needs it")
    from ufc_data_warehouse_spark.extra_queries import (
        q_streaming_transform_with_state,
    )

    sdf = q_streaming_transform_with_state(spark, SF_DIR)
    duck_df = duck.execute(
        """SELECT user_id, count(*) AS n_events,
  sum(floor(value * 100)::BIGINT)::BIGINT AS value_cents
FROM events GROUP BY user_id ORDER BY user_id"""
    ).df()
    assert_frames_match(sdf, duck_df, label="transform_with_state")


def test_chunk_udtf_matches_column_chunker(spark):
    """The SQL UDTF surface must be row-identical to the production
    Column-based chunker."""
    from pyspark.sql import functions as F

    from ufc_data_warehouse_spark.extra_queries import _read
    from ufc_data_warehouse_spark.operators import text as t

    docs = _read(spark, SF_DIR, "documents").limit(100)
    col_rows = {
        (r["id"], r["chunk_idx"], r["chunk_text"], r["chunk_chars"])
        for r in t.chunk_documents(docs, chunk_chars=200, overlap=50).collect()
    }
    t.register_sql_udtfs(spark)
    docs.select(
        F.col("doc_id").alias("id"),
        t.normalized_text(F.col("text")).alias("norm"),
    ).createOrReplaceTempView("docs_norm")
    udtf_rows = {
        tuple(r)
        for r in spark.sql(
            """SELECT d.id, c.chunk_idx, c.chunk_text, c.chunk_chars
               FROM docs_norm d, LATERAL chunk_udtf(d.norm, 200, 50) c"""
        ).collect()
    }
    assert udtf_rows == col_rows and len(col_rows) > 0
