"""Classic-Spark executor for Declarative Pipelines (`pyspark.pipelines`).

Spark 4.1 ships the SDP decorator API (`@dp.materialized_view`,
`@dp.temporary_view`, `@dp.table`) but executes pipelines only through
the Spark Connect CLI (`spark-pipelines run`); this container — like
many deployments — runs classic mode. The decorators themselves are
pure registration against a pluggable
:class:`~pyspark.pipelines.graph_element_registry.GraphElementRegistry`,
so this module provides the missing half: a registry that captures the
dataflow graph and a resolver that executes it on a classic
SparkSession — users write STANDARD `pyspark.pipelines` code and run it
here unchanged.

Dependency order is discovered, not declared: each flow's query
function references upstreams via ``spark.table(name)``, which fails
analysis until that name exists — so the resolver retries unresolved
flows until fixpoint (the lazy-discovery analog of the registry.py
topo-sort, which needs explicit dep lists). Materialized views write
parquet and re-register as reads — true materialization: downstream
plans start from the scan, not an expanded view tree (same plan-
truncation rationale as `etl.run_pipeline`).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from pathlib import Path

from pyspark.pipelines.flow import Flow
from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)
from pyspark.pipelines.output import Output
from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException


class LocalGraphRegistry(GraphElementRegistry):
    """Captures SDP graph elements for classic-mode execution."""

    def __init__(self) -> None:
        self.outputs: dict[str, Output] = {}
        self.flows: list[Flow] = []

    def register_output(self, output: Output) -> None:
        self.outputs[output.name] = output

    def register_flow(self, flow: Flow) -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path: Path) -> None:
        raise NotImplementedError(
            "SQL-file graph elements are not supported by the local executor"
        )


def run_pipeline(
    spark: SparkSession,
    define: Callable[[], None],
    materialize_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Execute an SDP pipeline definition on a classic SparkSession.

    ``define`` is a zero-arg callable whose body declares datasets with
    the standard ``pyspark.pipelines`` decorators. Returns
    {dataset name → DataFrame} for every flow target.
    """
    from pyspark.pipelines.output import MaterializedView

    reg = LocalGraphRegistry()
    with graph_element_registration_context(reg):
        define()

    mv_dir = materialize_dir or tempfile.mkdtemp(prefix="sdp_mv_")
    results: dict[str, DataFrame] = {}
    pending = list(reg.flows)
    while pending:
        progress = False
        deferred: list[Flow] = []
        for flow in pending:
            try:
                df = flow.func()
            except AnalysisException as exc:
                # upstream not yet registered -> try again next round
                if "TABLE_OR_VIEW_NOT_FOUND" in str(exc):
                    deferred.append(flow)
                    continue
                raise
            out = reg.outputs.get(flow.target)
            if isinstance(out, MaterializedView):
                path = os.path.join(mv_dir, flow.target)
                df.write.mode("overwrite").parquet(path)
                df = spark.read.parquet(path)
            df.createOrReplaceTempView(flow.target)
            results[flow.target] = df
            progress = True
        if deferred and not progress:
            missing = [f.target for f in deferred]
            raise RuntimeError(
                f"pipeline cannot make progress; unresolved flows: {missing} "
                "(cycle or reference to a table no flow produces)"
            )
        pending = deferred
    return results
