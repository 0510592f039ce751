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


def test_restart_resume_ingests_only_new_files(spark, tmp_path):
    """Checkpointed streaming ingest must resume across restarts: run 1
    consumes the files present, run 2 (same checkpoint) consumes ONLY the
    newly-landed file, run 3 with nothing new is a no-op — the sink ends
    exactly-once with no duplicates."""
    import glob
    import shutil

    from tests.conftest import SF_DIR
    from ufc_data_warehouse_spark.streaming import events as ev

    full = spark.read.parquet(f"{SF_DIR}/events.parquet")
    half_a = full.filter("event_id % 2 = 0")
    half_b = full.filter("event_id % 2 = 1")

    src = tmp_path / "landing"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def land(df, name):
        staged = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staged)
        part = glob.glob(f"{staged}/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    land(half_a, "a")
    ev.resumable_ingest_run(spark, str(src), sink, ckpt, full.schema)
    n_a = spark.read.parquet(sink).count()
    assert n_a == half_a.count()

    land(half_b, "b")
    ev.resumable_ingest_run(spark, str(src), sink, ckpt, full.schema)
    after_b = spark.read.parquet(sink)
    assert after_b.count() == full.count()
    assert after_b.select("event_id").distinct().count() == full.count()

    # idempotent restart: nothing new landed → nothing reprocessed
    ev.resumable_ingest_run(spark, str(src), sink, ckpt, full.schema)
    assert spark.read.parquet(sink).count() == full.count()


def test_stateful_query_on_rocksdb_state_store(spark):
    """The watermarked dedup must run unchanged on the RocksDB state
    store provider — the disk-backed store that holds 100 TB-scale
    streaming state (the default in-memory HDFS-backed store is bounded
    by executor heap). Results must equal the default-provider run and
    the progress metrics must prove RocksDB actually engaged."""
    import tempfile

    from tests.conftest import SF_DIR
    from ufc_data_warehouse_spark.streaming import events as ev

    conf = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(conf, None)
    try:
        baseline = ev.run_available_now(
            ev.dedup_redelivered(
                ev.read_events_stream_redelivered(spark, SF_DIR)
            ),
            output_mode="append",
        )
        expected = {r["event_id"] for r in baseline.collect()}

        spark.conf.set(
            conf,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        result = ev.dedup_redelivered(
            ev.read_events_stream_redelivered(spark, SF_DIR)
        )
        q = (
            result.writeStream.format("memory")
            .queryName("rocksdb_dedup_out")
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_rdb_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.lastProgress
        got = {
            r["event_id"] for r in spark.table("rocksdb_dedup_out").collect()
        }
        assert got == expected and len(got) > 0
        metrics = progress["stateOperators"][0]["customMetrics"]
        assert any("rocksdb" in k.lower() for k in metrics), metrics
    finally:
        if saved is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, saved)


def test_prefix_filter_is_lossless_vs_exhaustive(spark):
    """The prefix filter must reproduce the exhaustive token-Jaccard join
    EXACTLY — it is a candidate-pruning rewrite, not an approximation.
    Run both paths in Spark over the same corpus and compare pair sets."""
    from pyspark.sql import functions as F

    from ufc_data_warehouse_spark.extra_queries import _read
    from ufc_data_warehouse_spark.operators import dedup

    docs = _read(spark, SF_DIR, "documents")
    fast = {
        (r["id_a"], r["id_b"], r["shared"], r["union_size"])
        for r in dedup.prefix_filter_pairs(docs, min_jaccard_pct=85).collect()
    }
    tok = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.array_distinct(dedup.tokens(F.col("text")))
        ).alias("shingle"),
    ).where(F.col("shingle") != "")
    slow = {
        (r["id_a"], r["id_b"], r["shared"], r["union_size"])
        for r in dedup.jaccard_pairs(tok, min_jaccard=0.0)
        .where(F.lit(100) * F.col("shared") >= F.lit(85) * F.col("union_size"))
        .collect()
    }
    assert fast == slow and len(fast) > 0
