"""CSV ingestion path: routing, header normalization, full-replace, and an
end-to-end CSV → raw → model run (the reference's startup.sh flow)."""

from __future__ import annotations

import csv
import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from ufc_data_warehouse_spark.models import REGISTRY
from ufc_data_warehouse_spark.sources import ingest
from ufc_data_warehouse_spark.sources.ingest import (
    ingest_dir,
    load_raw,
    normalize_identifier,
    table_name,
)


def test_table_routing():
    assert table_name("/x/ufc_fight_results.csv") == "fact_ufc_fight_results"
    assert table_name("/x/ufc_event_details.csv") == "dim_ufc_event_details"
    assert table_name("/x/ufc_fighter_tott.csv") == "dim_ufc_fighter_tott"


def test_normalize_identifier():
    assert normalize_identifier("Fight Time (Min)") == "fight_time_min"
    assert normalize_identifier("  URL ") == "url"
    assert normalize_identifier("2nd Round") == "_2nd_round"
    assert normalize_identifier("a__b") == "a_b"


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(header)
        w.writerows(rows)


def test_csv_to_model_end_to_end(spark, tmp_path):
    csv_dir = tmp_path / "csvs"
    wh = tmp_path / "wh"
    os.makedirs(csv_dir)
    _write_csv(
        csv_dir / "ufc_event_details.csv",
        ["EVENT", "URL", "DATE", "LOCATION"],
        [
            ["UFC 1", "http://e/1", "Nov 12, 1993", "Denver, Colorado, USA"],
            ["UFC 2", "http://e/2", "March 11, 1994", "Denver, Colorado, USA"],
        ],
    )
    _write_csv(
        csv_dir / "ufc_fight_results.csv",
        ["EVENT", "BOUT", "OUTCOME", "WEIGHTCLASS", "METHOD", "ROUND",
         "TIME", "TIME FORMAT", "REFEREE", "DETAILS", "URL"],
        [
            ["UFC 1", "A One vs. B Two", "W/L", "UFC Heavyweight Title Bout",
             "KO/TKO", "1", "1:26", "No Time Limit", "R", "", "http://f/1"],
            ["UFC 2", "A One vs. C Three", "W/L", "UFC Heavyweight Title Bout",
             "Submission", "2", "4:20", "No Time Limit", "R", "", "http://f/2"],
        ],
    )
    written = ingest_dir(spark, str(csv_dir), str(wh))
    assert set(written) == {"dim_ufc_event_details", "fact_ufc_fight_results"}

    raw = load_raw(spark, str(wh))
    # all-string raw layer with normalized headers
    fr = raw["fact_ufc_fight_results"]
    assert dict(fr.dtypes)["round"] == "string"
    assert "time_format" in fr.columns

    wins = REGISTRY.build(raw, targets=["fighters_by_wins"])["fighters_by_wins"]
    rows = {r["fighter"]: r["wins"] for r in wins.collect()}
    assert rows == {"A One": 2}

    # S3 replace semantics: re-ingest overwrites, row count stable
    ingest_dir(spark, str(csv_dir), str(wh))
    assert load_raw(spark, str(wh))["fact_ufc_fight_results"].count() == 2


def test_permissive_ingest_quarantines_malformed_rows(spark, tmp_path):
    from ufc_data_warehouse_spark.sources.ingest import (
        corrupt_record_count,
        read_csv_all_string,
    )

    p = tmp_path / "messy.csv"
    p.write_text(
        "EVENT,URL,DATE\n"
        "UFC 1,http://e/1,Nov 12 1993\n"
        'UFC 2,http://e/2,Mar 11 1994,extra,fields,overflowing\n'
        "UFC 3,http://e/3,Apr 1 1994\n"
    )
    df = read_csv_all_string(spark, str(p), keep_corrupt=True)
    assert "_corrupt_record" in df.columns
    assert corrupt_record_count(df) == 1
    # the good rows survive with normalized headers
    good = df.filter(df["_corrupt_record"].isNull())
    assert {r["event"] for r in good.collect()} == {"UFC 1", "UFC 3"}
    # default path: strict shape, no quarantine column
    plain = read_csv_all_string(spark, str(p))
    assert "_corrupt_record" not in plain.columns


def test_htmltable_python_datasource(spark, tmp_path):
    """Custom Python Data Source (Spark 4): the reference's out-of-engine
    HTML-table scrape becomes an in-engine partition-parallel scan."""
    from ufc_data_warehouse_spark.sources import htmltable

    (tmp_path / "a.html").write_text(
        """<html><body><h1>Championship history</h1>
        <table>
          <tr><th>Date</th><th>Fighter</th><th>Weight Category</th><th>Reason</th></tr>
          <tr><td>Jan 5, 2020</td><td>A&amp;lpha One</td><td>UFC Lightweight
              Championship</td><td>vacated   (injury)</td></tr>
          <tr><td>Mar 9, 2021</td><td>Beta Two</td><td>Heavyweight</td><td>stripped</td></tr>
        </table>
        <table><tr><th>Ignored</th></tr><tr><td>second table skipped</td></tr></table>
        </body></html>"""
    )
    (tmp_path / "b.html").write_text(
        """<table>
          <tr><th>Date</th><th>Fighter</th><th>Weight Category</th><th>Reason</th></tr>
          <tr><td>Jul 1, 2022</td><td>Gamma Three</td><td>Flyweight</td><td>retired</td></tr>
        </table>"""
    )
    htmltable.register(spark)
    df = (
        spark.read.format("htmltable")
        .option("path", str(tmp_path / "*.html"))
        .load()
    )
    assert df.columns == ["date", "fighter", "weight_category", "reason"]
    rows = {tuple(r) for r in df.collect()}
    assert ("Mar 9, 2021", "Beta Two", "Heavyweight", "stripped") in rows
    assert ("Jul 1, 2022", "Gamma Three", "Flyweight", "retired") in rows
    # whitespace collapsed inside cells; second table ignored
    assert any("vacated (injury)" == r[3] for r in rows)
    assert len(rows) == 3
    # partition-parallel: one scan task per file
    assert df.rdd.getNumPartitions() == 2


def test_seqstream_python_streaming_source(spark):
    """Custom Python streaming data source: offset-tracked, deterministic,
    partition-parallel — the exactly-once replay contract in miniature."""
    from ufc_data_warehouse_spark.sources import htmltable
    from ufc_data_warehouse_spark.streaming.events import run_available_now

    htmltable.register_seqstream(spark)
    stream = (
        spark.readStream.format("seqstream")
        .option("maxrows", 500)
        .option("tasks", 4)
        .load()
    )
    agg = stream.groupBy().agg(
        F.count("*").alias("n"), F.sum("id").alias("id_sum")
    )
    out = run_available_now(agg, output_mode="complete").collect()
    assert out[0]["n"] == 500
    assert out[0]["id_sum"] == 500 * 499 // 2  # exactly 0..499, no dup/loss


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"Doc Id": 1, "Body Text": "hello world"}\n'
        '{"Doc Id": 2, "Body Text": "second line"}\n'
        "this is not json at all\n"
    )
    schema = StructType(
        [
            StructField("Doc Id", LongType()),
            StructField("Body Text", StringType()),
        ]
    )
    # cache: Spark forbids pruning a raw-JSON scan down to only the
    # corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = ingest.read_jsonl(spark, str(src), schema=schema, keep_corrupt=True).cache()
    # headers normalized like the CSV path
    assert {"doc_id", "body_text", "_corrupt_record"} <= set(df.columns)
    assert ingest.corrupt_record_count(df) == 1
    # collect (not count) so the scan references the data columns too —
    # a corrupt-column-only query on raw JSON is disallowed
    good = df.filter(F.col("_corrupt_record").isNull())
    assert len(good.collect()) == 2

    out = tmp_path / "out_jsonl"
    ingest.write_jsonl(good.select("doc_id", "body_text"), str(out))
    back = ingest.read_jsonl(spark, str(out))
    assert sorted((r["doc_id"], r["body_text"]) for r in back.collect()) == [
        (1, "hello world"),
        (2, "second line"),
    ]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "docs_orc")
    ingest.write_orc(docs, out)
    back = ingest.read_orc(spark, out)
    assert back.count() == docs.count()
    assert back.schema == docs.schema
    # predicate reaches the ORC scan (stripe-level pushdown)
    plan = (
        back.filter(F.col("doc_id") < 10)
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "doc_id" in plan


def test_jsonlsink_python_datasource_writer(spark, tmp_path):
    """Custom Python Data Source WRITER (Arrow form): staged write +
    atomic commit; round-trip equals the source; _SUCCESS manifest
    carries the committed row count; staging is cleaned up."""
    import json
    import os

    from pyspark.sql import functions as F

    from ufc_data_warehouse_spark.sources import pysink

    pysink.register(spark)
    src = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"),
        F.concat(F.lit("row-"), F.col("id")).alias("label"),
    )
    out = str(tmp_path / "sink")
    os.makedirs(out)
    src.write.format("jsonlsink").option("path", out).mode("append").save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 1000
    assert not os.path.exists(os.path.join(out, "_staging"))

    back = spark.read.schema("id long, bucket long, label string").json(
        f"{out}/*.jsonl"
    )
    assert back.count() == 1000
    assert back.agg(F.sum("id")).collect()[0][0] == 999 * 1000 // 2

    # overwrite drops prior parts, second manifest still exact
    src.limit(10).write.format("jsonlsink").option("path", out).mode(
        "overwrite"
    ).save()
    back2 = spark.read.schema("id long, bucket long, label string").json(
        f"{out}/*.jsonl"
    )
    assert back2.count() == 10


def test_xml_native_source_roundtrip(spark, tmp_path):
    """Native Spark 4 XML source: rowTag extraction, header
    normalization, explicit-schema read, and sink round-trip."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    src = tmp_path / "feed"
    src.mkdir()
    (src / "a.xml").write_text(
        "<feed><entry><DocId>1</DocId><Body Text='x'>hello</Body></entry>"
        "<entry><DocId>2</DocId><Body>world</Body></entry></feed>"
    )
    df = ingest.read_xml(spark, str(src), row_tag="entry")
    assert "docid" in df.columns or "doc_id" in df.columns
    assert df.count() == 2

    schema = StructType(
        [StructField("DocId", LongType()), StructField("Body", StringType())]
    )
    typed = ingest.read_xml(spark, str(src), row_tag="entry", schema=schema)
    rows = {r["docid"]: r["body"] for r in typed.collect()}
    assert rows == {1: "hello", 2: "world"}

    out = tmp_path / "out_xml"
    ingest.write_xml(typed, str(out), row_tag="entry")
    back = ingest.read_xml(spark, str(out), row_tag="entry", schema=schema)
    assert sorted((r["docid"], r["body"]) for r in back.collect()) == [
        (1, "hello"),
        (2, "world"),
    ]


def test_binary_assets_source(spark, tmp_path):
    """binaryFile ingest for multimodal assets: one row per file with
    (path, modification_time, length, content); glob pruning happens at
    listing time."""
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "a.png").write_bytes(b"\x89PNG\r\n" + b"\x00" * 10)
    (assets / "b.png").write_bytes(b"\x89PNG\r\n" + b"\x01" * 20)
    (assets / "notes.txt").write_text("not an image")

    df = ingest.read_binary_assets(spark, str(assets), glob_filter="*.png")
    rows = sorted(df.collect(), key=lambda r: r["path"])
    assert len(rows) == 2
    assert [r["length"] for r in rows] == [16, 26]
    assert rows[0]["content"][:4] == b"\x89PNG"
    assert set(df.columns) == {"path", "modification_time", "length", "content"}

    # feeds straight into the multimodal decode plumbing: magic-byte
    # format sniffing (pure Column), deterministic media ids
    from ufc_data_warehouse_spark.operators import multimodal

    all_assets = ingest.read_binary_assets(spark, str(assets))
    meta = multimodal.attach_asset_metadata(all_assets)
    kinds = {r["source"].rsplit("/", 1)[-1]: r["kind"] for r in meta.collect()}
    assert kinds == {"a.png": "image", "b.png": "image", "notes.txt": "binary"}
    ids1 = {r["media_id"] for r in meta.collect()}
    ids2 = {
        r["media_id"]
        for r in multimodal.attach_asset_metadata(all_assets).collect()
    }
    assert ids1 == ids2 and all(i >= 0 for i in ids1)
    # digest path works on sniffed assets too
    digested = multimodal.media_metadata(meta)
    assert digested.count() == 3


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A column added mid-stream must surface via mergeSchema: old files
    read NULL for it; explicit-schema reads stay pinned."""
    target = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")\
        .write.mode("append").parquet(target)
    spark.createDataFrame(
        [(3, "c", "en")], "doc_id long, text string, lang string"
    ).write.mode("append").parquet(target)

    merged = ingest.read_parquet_evolving(spark, target)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "en"}

    pinned = spark.read.schema("doc_id long, text string").parquet(target)
    assert set(pinned.columns) == {"doc_id", "text"}
    assert pinned.count() == 3
