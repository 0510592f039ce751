"""Statistical / time-series analytics queries and the grouped-map
pandas API surface: per-key OLS trend, z-score outliers, time-weighted
average, equi-width histogram, grouped-map min-max normalization,
cogrouped as-of join, and blocked fuzzy entity matching.

No reference analog (reshefsharvit/ufc-data-warehouse exposes no
statistical or UDF surface — SURVEY.md §2.10); these extend the engine
the way operators/training.py does. Each query pairs a Spark callable
with a DuckDB oracle over the same parquet views. Exact-arithmetic
contract: aggregates are integer/DECIMAL sums with explicitly bounded
precisions (identical casts on both engines — see
operators/timeseries.py docstring), and floats appear only in final
single-expression projections, so cross-engine hashes match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, grouped, timeseries

Query = Callable[[SparkSession, str], DataFrame]


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .extra_queries import _read as read

    return read(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# time-series / statistical family (events table)
# ---------------------------------------------------------------------------


def q_ts_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time (day granularity)."""
    ev = _read(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts::timestamp) div 86400000000").alias("x"),
        "value",
    )
    return timeseries.ols_trend(ev, "event_type", "x", "value").orderBy(
        "event_type"
    )


def q_ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 3-sigma outlier counts, decimal-exact."""
    return timeseries.zscore_outlier_counts(
        _read(spark, sf_dir, "events"), "event_type", "value", sigmas=3.0
    ).orderBy("event_type")


def q_ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value (step interpolation)."""
    return timeseries.time_weighted_avg(
        _read(spark, sf_dir, "events"), "user_id", "ts", "value"
    ).orderBy("user_id")


def q_ts_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values (width 25)."""
    return timeseries.equiwidth_histogram(
        _read(spark, sf_dir, "events"), "value", width=25.0
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# grouped-map / cogrouped-map pandas API surface (events table)
# ---------------------------------------------------------------------------


def q_grouped_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type min-max normalization via grouped-map applyInPandas."""
    return grouped.minmax_normalize(
        _read(spark, sf_dir, "events"), "event_type", "value"
    ).orderBy("event_id")


def q_cogroup_asof_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the user's latest strictly-earlier view event
    (cogrouped-map applyInPandas + vectorized merge_asof)."""
    ev = _read(spark, sf_dir, "events")
    return grouped.cogroup_asof(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
        key="user_id",
    ).orderBy("user_id", "left_event_id")


# ---------------------------------------------------------------------------
# blocked fuzzy matching (part table)
# ---------------------------------------------------------------------------


def q_fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-brand part pairs within Levenshtein distance 4 — entity
    resolution with equi-join blocking + thresholded JVM residual."""
    part = _read(spark, sf_dir, "part")
    pairs = dedup.blocked_edit_distance_pairs(
        part, key="p_partkey", name="p_name", block="p_brand", max_dist=4
    )
    return pairs.select(
        "id_1", "id_2", F.col("dist").cast("long").alias("dist")
    ).orderBy("id_1", "id_2")


ANALYTICS_QUERIES: dict[str, Query] = {
    "ts_ols_trend": q_ts_ols_trend,
    "ts_zscore_outliers": q_ts_zscore_outliers,
    "ts_time_weighted_avg": q_ts_time_weighted_avg,
    "ts_value_histogram": q_ts_value_histogram,
    "grouped_minmax_norm": q_grouped_minmax_norm,
    "cogroup_asof_view_purchase": q_cogroup_asof_view_purchase,
    "fuzzy_part_name_pairs": q_fuzzy_part_name_pairs,
}

ANALYTICS_ORACLES: dict[str, str] = {
    "ts_ols_trend": """
WITH base AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000) AS x,
         value::DECIMAL(18,4) AS y
  FROM events
),
m AS (
  SELECT event_type, count(*) AS n,
         sum(x)::BIGINT AS sx,
         sum(y)::DECIMAL(20,4) AS sy,
         sum((y * x::DECIMAL(9,0))::DECIMAL(28,4))::DECIMAL(28,4) AS sxy,
         sum(x * x)::BIGINT AS sxx
  FROM base GROUP BY event_type
)
SELECT event_type, n,
  (n::DECIMAL(6,0) * sxy - sx::DECIMAL(10,0) * sy)::DOUBLE
    / (n * sxx - sx * sx)::DOUBLE AS slope,
  (sy::DOUBLE
     - ((n::DECIMAL(6,0) * sxy - sx::DECIMAL(10,0) * sy)::DOUBLE
        / (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE) / n::DOUBLE AS intercept
FROM m ORDER BY event_type""",
    "ts_zscore_outliers": """
-- operand casts are WIDER here than Spark's (20 vs 16/17 digits): DuckDB
-- executes a decimal multiply in the operands' physical type, so width
-- <= 18 operands multiply in int64 and overflow; the VALUES are exact
-- and identical on both engines either way.
WITH t AS (
  SELECT event_type, value::DECIMAL(12,4) AS x FROM events
),
w AS (
  SELECT event_type, x,
    (count(*) OVER (PARTITION BY event_type))::DECIMAL(20,0) AS n,
    (sum(x) OVER (PARTITION BY event_type))::DECIMAL(20,4) AS s1,
    (sum(x * x) OVER (PARTITION BY event_type))::DECIMAL(24,8) AS s2
  FROM t
)
SELECT event_type,
  count(*) FILTER (
    WHERE ((n * x - s1)::DECIMAL(20,4) * (n * x - s1)::DECIMAL(20,4))::DOUBLE
      > 9.0 * ((n * s2)::DECIMAL(33,8) - (s1 * s1)::DECIMAL(33,8))::DOUBLE
  ) AS n_outliers,
  count(*) AS n
FROM w GROUP BY event_type ORDER BY event_type""",
    "ts_time_weighted_avg": """
WITH s AS (
  SELECT user_id, value::DECIMAL(18,4) AS v,
    lead(epoch_us(ts) // 1000000)
      OVER (PARTITION BY user_id ORDER BY ts, event_id)
      - (epoch_us(ts) // 1000000) AS dt
  FROM events
),
f AS (SELECT * FROM s WHERE dt IS NOT NULL)
SELECT user_id,
  sum((v * dt::DECIMAL(20,0))::DECIMAL(31,4))::DOUBLE
    / sum(dt)::DOUBLE AS twa,
  sum(dt)::BIGINT AS total_secs,
  count(*) AS n_intervals
FROM f GROUP BY user_id ORDER BY user_id""",
    "ts_value_histogram": """
SELECT floor(value / 25.0)::BIGINT AS bucket, count(*) AS n,
  sum(value::DECIMAL(18,4))::DOUBLE AS sum_value
FROM events GROUP BY 1 ORDER BY 1""",
    "grouped_minmax_norm": """
SELECT event_id, event_type, value,
  CASE WHEN max(value) OVER w = min(value) OVER w THEN value * 0.0
       ELSE (value - min(value) OVER w)
            / (max(value) OVER w - min(value) OVER w)
  END AS norm_value
FROM events
WINDOW w AS (PARTITION BY event_type)
ORDER BY event_id""",
    "cogroup_asof_view_purchase": """
SELECT p.user_id, p.event_id AS left_event_id, p.ts AS left_ts,
       v.event_id AS right_event_id, v.value AS right_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts > v.ts
ORDER BY p.user_id, left_event_id""",
    "fuzzy_part_name_pairs": """
SELECT a.p_partkey AS id_1, b.p_partkey AS id_2,
       levenshtein(a.p_name, b.p_name)::BIGINT AS dist
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
ORDER BY id_1, id_2""",
}


def q_arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native grouped map (applyInArrow): per-type integer stats,
    zero pandas materialization."""
    return grouped.group_id_stats_arrow(
        _read(spark, sf_dir, "events"), "event_type"
    ).orderBy("event_type")


def q_nullsafe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): keys are
    deliberately NULLed for a deterministic slice of rows, and the
    null-safe join matches NULL with NULL — the semantic SQL's plain `=`
    silently drops. Spark plans `<=>` as a HASH join key (null-safe
    equality is still an equi-join), not a nested loop."""
    ev = _read(spark, sf_dir, "events")
    left = ev.select(
        F.when(F.col("event_id") % 7 != 0, F.col("user_id")).alias("k"),
        "event_id",
    )
    right = ev.select(
        F.when(F.col("event_id") % 11 != 0, F.col("user_id")).alias("k"),
        F.col("event_id").alias("r_id"),
    ).groupBy("k").agg(F.count("*").alias("r_n"))
    joined = left.join(right, left["k"].eqNullSafe(right["k"]), "inner")
    return (
        joined.groupBy(left["k"].alias("k"))
        .agg(F.count("*").alias("n_joined"), F.max("r_n").alias("r_n"))
        .orderBy(F.col("k").asc_nulls_last())
    )


def q_map_props_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType semi-structured path: props parsed as map<string,long>
    (schema-flexible like VARIANT but with native map operators), then
    exploded to per-key stats — the third way to hold semi-structured
    data (typed struct / VARIANT / MAP), each oracle-checked."""
    ev = _read(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select(F.explode(m).alias("key", "val"))
        .groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.sum("val").alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("key")
    )


ANALYTICS_QUERIES.update(
    {
        "arrow_group_stats": q_arrow_group_stats,
        "nullsafe_join_counts": q_nullsafe_join_counts,
        "map_props_key_stats": q_map_props_key_stats,
    }
)
ANALYTICS_ORACLES.update(
    {
        "arrow_group_stats": """
SELECT event_type, count(*) AS n, min(event_id) AS min_id,
  max(event_id) AS max_id
FROM events GROUP BY event_type ORDER BY event_type""",
        "nullsafe_join_counts": """
WITH l AS (
  SELECT CASE WHEN event_id % 7 != 0 THEN user_id END AS k, event_id
  FROM events
),
r AS (
  SELECT k, count(*) AS r_n FROM (
    SELECT CASE WHEN event_id % 11 != 0 THEN user_id END AS k FROM events
  ) GROUP BY k
)
SELECT l.k, count(*) AS n_joined, max(r.r_n) AS r_n
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
GROUP BY l.k ORDER BY l.k ASC NULLS LAST""",
        # json_each (table function) is unavailable in this DuckDB build;
        # the testdata props carry exactly one key ('k', verified across
        # all SFs), so per-key explode stats reduce to json_extract stats
        # keyed by that literal.
        "map_props_key_stats": """
SELECT 'k' AS key, count(*) AS n,
  sum(json_extract(props, '$.k')::BIGINT) AS sum_val,
  min(json_extract(props, '$.k')::BIGINT) AS min_val,
  max(json_extract(props, '$.k')::BIGINT) AS max_val
FROM events WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY 1 ORDER BY key""",
    }
)
