"""Slowly-changing-dimension (SCD Type 2) building and CDC apply — the
dimension-maintenance operators of a warehouse load layer.

The reference rebuilds dimensions from scratch on every load
(``write_disposition="replace"``, /root/reference/dlt/load.py:35) and keeps
no history; these add the standard history-preserving path:

- **scd2_build**: change events → versioned dimension rows with
  ``valid_from``/``valid_to``/``is_current`` (consecutive duplicate states
  collapsed first, so versions are real changes, not raw events);
- **cdc_apply**: apply an insert/update/delete change feed onto a base
  snapshot, last-writer-wins per key.

Both are single-keyed-shuffle shapes: every window/join keys on the
dimension's natural key, so at 100 TB the work partitions by key and no
global ordering is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Versioned SCD2 rows from a change-event stream: (key, version,
    attr, valid_from, valid_to, is_current).

    Change detection (drop rows equal to the previous state) and interval
    assembly (``valid_to`` = next change's ``valid_from``; null = open)
    are two windows over the SAME (partition, order) spec — Catalyst
    plans ONE exchange + one sort for both. ``is_current`` marks the open
    interval. Deterministic: ordering includes the tiebreak column, and
    the null-safe comparison keeps the first row per key.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    prev = F.lag(attr_col).over(w)
    changes = (
        df.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("_chg", ~prev.eqNullSafe(F.col(attr_col)))
        .filter(F.col("_chg"))
    )
    return (
        changes.select(
            F.col(key_col).alias("key"),
            F.row_number().over(w).alias("version"),
            F.col(attr_col).alias("attr"),
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w).alias("valid_to"),
        )
        .withColumn(
            "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0)
        )
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str,
    order_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Apply an I/U/D change feed to a base snapshot, last-writer-wins:
    the latest change per key (by ``order_cols``) decides — ``D`` removes
    the key, ``I``/``U`` set the key's ``value_cols``; untouched base keys
    pass through.

    Shapes: latest-per-key is one keyed window shuffle of the (usually
    small) change feed; the base side does one LEFT ANTI hash join on the
    key (broadcast the latest-change keys when the feed is increment-
    sized) plus a union — the base never sorts and never moves except on
    its key. This is the dataframe equivalent of MERGE with WHEN MATCHED
    DELETE/UPDATE and WHEN NOT MATCHED INSERT.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.desc(c) for c in order_cols])
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    upserts = latest.filter(F.col(op_col) != "D").select(key_col, *value_cols)
    untouched = base.select(key_col, *value_cols).join(
        F.broadcast(latest.select(key_col)), key_col, "left_anti"
    )
    return untouched.unionByName(upserts)
