"""Core layer — star-schema dims and facts (SURVEY §1.1).

- fct_fights       ← /root/reference/ufc/models/core/fct_fights.sql:1-67
- dim_fighter      ← /root/reference/ufc/models/core/dim_fighter.sql:1-22
- dim_event        ← /root/reference/ufc/models/core/dim_event.sql:1-11
- dim_division     ← /root/reference/ufc/models/core/dim_division.sql:1-6
- fct_title_reigns ← /root/reference/ufc/models/core/fct_title_reigns.sql:1-11

Scale notes: stg_event_details is a tiny dim (one row per event) — the
fights⋈events join is explicitly broadcast so the 100 TB fact side never
shuffles (SURVEY §2.3 J1/J2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exprs import last_word, not_null_or_empty, split_part, weight_category
from ..registry import model


@model(
    "fct_fights",
    deps=["stg_fight_results", "stg_event_details"],
    layer="core",
    schema="semantic",
    alias="fct_fights",
)
def fct_fights(d: dict[str, DataFrame]) -> DataFrame:
    """Fight fact: event enrichment (left join — J2), weight-category
    normalization, and title/interim/tournament flags (fct_fights.sql:10-41).
    """
    results = d["stg_fight_results"]
    events = d["stg_event_details"].select("event", "event_date")
    base = results.join(F.broadcast(events), "event", "left")
    return base.select(
        F.col("url").alias("fight_id"),
        F.col("event").alias("event_name"),
        "event_date",
        "bout",
        F.col("weightclass").alias("weightclass_raw"),
        weight_category("weightclass", strip_interim=True).alias("weight_category"),
        "fighter_1",
        "fighter_2",
        "winner",
        "method",
        "round_number",
        "time",
        "time_format",
        "method_group",
        "fight_time_seconds",
        "fight_time_minutes",
        F.when(F.col("weightclass").ilike("%Title Bout%"), 1).otherwise(0).alias("is_title_bout"),
        F.when(F.col("weightclass").ilike("%interim%"), 1).otherwise(0).alias("is_interim"),
        F.when(F.col("weightclass").ilike("%tournament%"), 1).otherwise(0).alias("is_tournament"),
    ).filter(not_null_or_empty("fight_id"))


@model(
    "dim_fighter",
    deps=["fct_fights"],
    layer="core",
    schema="semantic",
    alias="dim_fighter",
)
def dim_fighter(d: dict[str, DataFrame]) -> DataFrame:
    """Distinct fighters with first/last name (dim_fighter.sql:4-22) —
    the UNION-ALL unpivot idiom (U1) + split_part/last-word (X3/X4)."""
    ff = d["fct_fights"]
    fighters = (
        ff.select(F.col("fighter_1").alias("fighter_name"))
        .unionByName(ff.select(F.col("fighter_2").alias("fighter_name")))
        .unionByName(ff.select(F.col("winner").alias("fighter_name")))
    )
    return (
        fighters.filter(not_null_or_empty("fighter_name"))
        .select(
            "fighter_name",
            split_part(F.col("fighter_name"), " ", 1).alias("first_name"),
            last_word("fighter_name").alias("last_name"),
        )
        .distinct()
    )


@model(
    "dim_event",
    deps=["stg_event_details"],
    layer="core",
    schema="semantic",
    alias="dim_event",
)
def dim_event(d: dict[str, DataFrame]) -> DataFrame:
    """Event dim (dim_event.sql:3-11)."""
    return (
        d["stg_event_details"]
        .filter(not_null_or_empty("event"))
        .select(
            F.col("event").alias("event_name"),
            F.col("event").alias("event_key"),
            "event_date",
            "event_year",
            "location",
            "url",
        )
    )


@model(
    "dim_division",
    deps=["fct_fights"],
    layer="core",
    schema="semantic",
    alias="dim_division",
)
def dim_division(d: dict[str, DataFrame]) -> DataFrame:
    """Distinct divisions (dim_division.sql:3-6)."""
    return (
        d["fct_fights"]
        .filter(not_null_or_empty("weight_category"))
        .select(F.col("weight_category").alias("division_name"))
        .distinct()
    )


@model(
    "fct_title_reigns",
    deps=["title_reigns"],
    layer="core",
    schema="semantic",
    alias="fct_title_reigns",
)
def fct_title_reigns(d: dict[str, DataFrame]) -> DataFrame:
    """Projection of title_reigns into the semantic layer
    (fct_title_reigns.sql:3-11)."""
    return d["title_reigns"].select(
        "weight_category",
        "fighter",
        "start_date",
        "end_date",
        "end_reason",
        "reign_days",
        "is_active",
    )
