"""High-level engine API: build any model over a testdata scale-factor dir.

This is the reference's ``dbt run`` + Metabase-card surface in one place
(SURVEY §3): resolve the model DAG lazily, hand back DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import models  # noqa: F401 — populates the registry
from .registry import REGISTRY
from .session import apply_runtime_confs
from .synth import ufc_raw_tables


def build_model(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Resolve model ``name`` over the UFC raw layer derived from ``sf_dir``."""
    apply_runtime_confs(spark)
    raw = ufc_raw_tables(spark, sf_dir)
    return REGISTRY.build(raw, targets=[name])[name]


def build_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    apply_runtime_confs(spark)
    raw = ufc_raw_tables(spark, sf_dir)
    return REGISTRY.build(raw)
