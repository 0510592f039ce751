"""Arrow-batched grouped-map operators: ``groupBy().applyInPandas`` and
``cogroup().applyInPandas``.

These complete the Python-UDF API surface (SURVEY §2.10 — the reference
has no in-database UDFs at all; `operators/udafs.py` covers grouped-AGG
pandas UDFs, `operators/multimodal.py` covers scalar/iterator pandas
UDFs, this module covers the grouped-MAP and COGROUPED-MAP forms).

Both operators here exist as built-in-expressible queries too (window
min/max; union-merge as-of) — they are implemented through the pandas
API deliberately, as the pattern template for logic that genuinely needs
per-group imperative code (model scoring, merge_asof with tolerance,
per-group curve fitting). The semantics are pinned to engine-neutral
definitions so a plain-SQL oracle can verify them bit-for-bit.

Scale posture: ``applyInPandas`` is ONE hash exchange on the group key;
each group must fit in one executor's memory as a pandas/Arrow frame —
fine for HIGH-CARDINALITY keys (per-user, per-document: bounded rows
per key), wrong for whole-table groups AND for low-cardinality keys
(a ~5-value key like event_type makes each group ~1/5 of the table —
one executor materializes ~20 TB at the 100 TB scale, the grouped-map
twin of the LOWCARD-WINDOW shape tools/plan_audit.py flags). The demo
queries key by user_id for exactly this reason; per-low-card-key
statistics belong in JVM partial aggs (groupBy) or the two-phase rank
operators. Arrow transfers batches columnar; no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["minmax_normalize", "cogroup_asof", "group_id_stats_arrow"]


def minmax_normalize(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-group min-max normalization via grouped-map ``applyInPandas``.

    norm = (x − min) / (max − min), 0.0 for degenerate single-valued
    groups. Division of two IEEE doubles in the same expression shape an
    SQL engine would use — bit-identical to a window-function oracle.

    Returns (event_id, key, value, norm_value).
    """
    import pandas as pd

    key_type = dict(df.dtypes)[key]
    out_schema = (
        f"event_id long, {key} {key_type}, {value} double, norm_value double"
    )

    def normalize(pdf: "pd.DataFrame") -> "pd.DataFrame":
        lo = pdf[value].min()
        hi = pdf[value].max()
        span = hi - lo
        norm = (pdf[value] - lo) / span if span > 0 else pdf[value] * 0.0
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                key: pdf[key],
                value: pdf[value],
                "norm_value": norm,
            }
        )

    return (
        df.select("event_id", key, value)
        .groupBy(key)
        .applyInPandas(normalize, schema=out_schema)
    )


def cogroup_asof(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` + ``pd.merge_asof``.

    For every left row, attach the latest right row of the same ``key``
    with ``right.ts < left.ts`` (strictly before — no exact matches),
    or nulls when no such row exists. This is the cogrouped-map
    formulation of the as-of join (`extra_queries.q_asof_orders_before_
    events` is the pure-Column union-merge formulation of the same
    operator; at 100 TB prefer that one — it is whole-stage codegen and
    never materializes a group in Python).

    One hash exchange per side on ``key``; each (left-group,
    right-group) pair arrives as two pandas frames, merged with the
    vectorized ``merge_asof`` (binary search per row, not a pair join).

    Returns (key, left_event_id, left_ts, right_event_id, right_value).
    """
    import pandas as pd

    out_schema = (
        f"{key} long, left_event_id long, left_ts timestamp, "
        "right_event_id long, right_value double"
    )

    def merge(lg: "pd.DataFrame", rg: "pd.DataFrame") -> "pd.DataFrame":
        if lg.empty:
            return pd.DataFrame(
                columns=[
                    key,
                    "left_event_id",
                    "left_ts",
                    "right_event_id",
                    "right_value",
                ]
            )
        lg = lg.sort_values(ts, kind="mergesort")
        if rg.empty:
            # a key with left rows but no right rows: the cogroup hands an
            # empty right frame — every left row null-completes
            merged = lg.copy()
            merged["right_event_id"] = pd.Series(dtype="float64")
            merged["right_value"] = pd.Series(dtype="float64")
        else:
            rg = rg.rename(columns={"r_ts": ts}).sort_values(
                ts, kind="mergesort"
            )
            merged = pd.merge_asof(
                lg,
                rg[[ts, "right_event_id", "right_value"]],
                on=ts,
                direction="backward",
                allow_exact_matches=False,
            )
        return pd.DataFrame(
            {
                key: merged[key],
                "left_event_id": merged["event_id"],
                "left_ts": merged[ts],
                "right_event_id": merged["right_event_id"].astype("Int64"),
                "right_value": merged["right_value"],
            }
        )

    # Pin an explicit keyed repartition on both sides: the shuffled data
    # is small, so AQE would coalesce the exchange to ONE partition and
    # serialize every group through a single Python worker (observed 8s
    # for 1500 groups; per-group UDF invocation cost is milliseconds and
    # parallelism is the only lever). An explicit numPartitions is
    # exempt from AQE coalescing, restoring full-width fan-out.
    spread = left.sparkSession.sparkContext.defaultParallelism
    lsel = left.select(key, "event_id", ts).repartition(spread, key)
    # Alias-rename EVERY right column: when left and right derive from the
    # same base plan (self-cogroup), their attributes share expression IDs
    # and Catalyst's column pruning — triggered by a downstream projection
    # like count() — deduplicates the references and silently drops the
    # right side's shared columns from the Arrow batch (observed: the
    # right pdf arrived as [key, value] only). Fresh aliases get fresh
    # expression IDs, making the right side's columns un-prunable.
    rsel = right.select(
        F.col(key).alias(key),
        F.col("event_id").alias("right_event_id"),
        F.col(ts).alias("r_ts"),
        F.col("value").alias("right_value"),
    ).repartition(spread, key)
    return lsel.groupBy(key).cogroup(rsel.groupBy(key)).applyInPandas(
        merge, schema=out_schema
    )


def group_id_stats_arrow(df: DataFrame, key: str) -> DataFrame:
    """Per-group stats via ``groupBy().applyInArrow`` — the Arrow-NATIVE
    grouped-map form (Spark 4): the UDF receives/returns a
    ``pyarrow.Table`` with no pandas materialization in between, the
    zero-copy path for columnar group logic (the pandas variants pay an
    Arrow→pandas conversion per group).

    Outputs are integers only (count, min/max of event_id) so the result
    is reduction-order-free and exactly reproducible in any engine.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    key_type = dict(df.dtypes)[key]
    out_schema = f"{key} {key_type}, n long, min_id long, max_id long"

    def stats(t: "pa.Table") -> "pa.Table":
        ids = t.column("event_id")
        return pa.table(
            {
                key: [t.column(key)[0].as_py()],
                "n": [t.num_rows],
                "min_id": [pc.min(ids).as_py()],
                "max_id": [pc.max(ids).as_py()],
            }
        )

    return df.select(key, "event_id").groupBy(key).applyInArrow(
        stats, schema=out_schema
    )
