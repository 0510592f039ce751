"""Staging models — typed/trimmed projections over the stringly raw layer.

Spark-native re-expression of the reference's two staging views; every
expression is a built-in Column function (JVM codegen path, no UDFs):
- stg_fight_results ← /root/reference/ufc/models/stg/stg_fight_results.sql:1-56
- stg_event_details ← /root/reference/ufc/models/stg/stg_event_details.sql:1-40
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exprs import (
    empty_to_null,
    fight_time_seconds,
    method_group,
    split_part,
    to_date_cascade,
)
from ..registry import model


@model(
    "stg_fight_results",
    deps=["fact_ufc_fight_results"],
    layer="stg",
    alias="mv_stg_fight_results",
)
def stg_fight_results(d: dict[str, DataFrame]) -> DataFrame:
    """Trim + type + derive winner/method_group/fight-time.

    Mirrors stg_fight_results.sql: split_part on ' vs. ' and '/' (X3),
    outcome→winner CASE (:33-37), ilike method buckets (:38-43), and the
    malformed-time-guarded fight-time arithmetic (:44-55).
    """
    src = d["fact_ufc_fight_results"].select(
        F.trim("event").alias("event"),
        F.trim("bout").alias("bout"),
        F.trim("weightclass").alias("weightclass"),
        F.trim("method").alias("method"),
        empty_to_null(F.trim("round")).cast("int").alias("round_number"),
        F.trim("time").alias("time"),
        F.trim("time_format").alias("time_format"),
        F.trim("url").alias("url"),
        split_part(F.trim("bout"), " vs. ", 1).alias("fighter_1"),
        split_part(F.trim("bout"), " vs. ", 2).alias("fighter_2"),
        split_part(F.trim("outcome"), "/", 1).alias("outcome_1"),
        split_part(F.trim("outcome"), "/", 2).alias("outcome_2"),
    )
    secs = fight_time_seconds(F.col("time"), F.col("round_number"))
    return src.select(
        "*",
        F.when(F.upper("outcome_1") == "W", F.col("fighter_1"))
        .when(F.upper("outcome_2") == "W", F.col("fighter_2"))
        .otherwise(F.lit(None).cast("string"))
        .alias("winner"),
        method_group("method").alias("method_group"),
        secs.alias("fight_time_seconds"),
        (secs / 60.0).alias("fight_time_minutes"),
    )


@model(
    "stg_event_details",
    deps=["dim_ufc_event_details"],
    layer="stg",
    alias="mv_stg_event_details",
)
def stg_event_details(d: dict[str, DataFrame]) -> DataFrame:
    """Trim + regex-guarded 4-format date cascade + event_year.

    Mirrors stg_event_details.sql:12-39 (the cascade is SURVEY's riskiest
    dialect translation — X7); null date for unparseable strings.
    """
    src = d["dim_ufc_event_details"].select(
        F.trim("event").alias("event"),
        F.trim("url").alias("url"),
        F.trim("date").alias("event_date_raw"),
        F.trim("location").alias("location"),
    )
    event_date = to_date_cascade(F.col("event_date_raw"))
    return src.select(
        "event",
        "url",
        "location",
        event_date.alias("event_date"),
        F.year(event_date).cast("int").alias("event_year"),
    )
