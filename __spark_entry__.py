"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (title_reigns — the reference's hardest
  model) on /root/testdata/sf0.001.
- ``queries()``: one entry per implemented operator/model from SURVEY.md §2.
  UFC models run over the synthetic UFC raw layer derived deterministically
  from the testdata (see ufc_data_warehouse_spark/synth.py).
- ``oracle_sql()``: the DuckDB-equivalent SQL for every query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ufc_data_warehouse_spark.api import build_model  # noqa: E402
from ufc_data_warehouse_spark.oracle import model_names, oracle_for  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: champion-lineage reconstruction (title_reigns)."""
    return build_model(spark, "/root/testdata/sf0.001", "title_reigns")


def _model_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return build_model(spark, sf_dir, name)

    run.__name__ = f"query_{name}"
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in model_names():
        out[name] = _model_query(name)
    try:
        from ufc_data_warehouse_spark.extra_queries import EXTRA_QUERIES

        out.update(EXTRA_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: oracle_for(name) for name in model_names()}
    try:
        from ufc_data_warehouse_spark.extra_queries import EXTRA_ORACLES

        out.update(EXTRA_ORACLES)
    except ImportError:
        pass
    return out
