"""Model registry — the dbt-DAG analog (SURVEY §1.1, §3 entry point 1).

The reference's transformation layer is 28 dbt view models wired by
``ref()``/``source()`` (e.g. /root/reference/ufc/models/core/fct_fights.sql:42-44);
``dbt run`` topologically orders them and creates one Postgres view each, so
the "execution plan" is Postgres inlining the whole view stack at read time
(/root/reference/startup.sh:30-34).

Spark-native equivalent: each model is a pure function
``dict[name → DataFrame] → DataFrame``; resolving a model composes *lazy*
DataFrames, which is exactly Catalyst logical-plan composition — the view
stack inlining the reference delegates to Postgres, we delegate to Catalyst
(predicate pushdown, column pruning, join reordering through every layer
for free — SURVEY §4).

``materialize`` is the ``dbt run --full-refresh`` analog: write chosen marts
to partitioned parquet. At the 100 TB design point only the marts are
materialized; intermediate models stay as logical-plan views so no shuffle
or scan is paid twice.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ModelFn = Callable[[dict[str, DataFrame]], DataFrame]


@dataclass
class Model:
    name: str
    deps: list[str]
    fn: ModelFn
    layer: str = "analytics"  # stg | core | analytics
    # dbt `schema=` config analog, e.g. goat_status (title_reigns.sql:1)
    schema: str | None = None
    alias: str | None = None


@dataclass
class Registry:
    models: dict[str, Model] = field(default_factory=dict)

    def model(
        self,
        name: str,
        deps: list[str],
        layer: str = "analytics",
        schema: str | None = None,
        alias: str | None = None,
    ) -> Callable[[ModelFn], ModelFn]:
        """Decorator: register ``fn`` as model ``name`` depending on ``deps``
        (source tables or other models)."""

        def wrap(fn: ModelFn) -> ModelFn:
            self.models[name] = Model(name, list(deps), fn, layer, schema, alias)
            return fn

        return wrap

    def topo_order(self, targets: list[str] | None = None) -> list[str]:
        """Dependency-ordered model names (dbt's graph ordering)."""
        order: list[str] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(name: str) -> None:
            if name in seen or name not in self.models:
                return  # not-a-model deps are source tables
            if name in visiting:
                raise ValueError(f"dependency cycle at {name}")
            visiting.add(name)
            for dep in self.models[name].deps:
                visit(dep)
            visiting.discard(name)
            seen.add(name)
            order.append(name)

        for t in targets or list(self.models):
            visit(t)
        return order

    def build(
        self, sources: dict[str, DataFrame], targets: list[str] | None = None
    ) -> dict[str, DataFrame]:
        """Resolve models into lazy DataFrames. Nothing executes here —
        this composes one Catalyst logical plan per model, the direct
        analog of the reference's all-views design."""
        resolved: dict[str, DataFrame] = dict(sources)
        for name in self.topo_order(targets):
            if name in resolved:
                continue  # caller supplied a precomputed (e.g. cached) frame
            model = self.models[name]
            missing = [d for d in model.deps if d not in resolved]
            if missing:
                raise KeyError(f"model {name} missing inputs: {missing}")
            resolved[name] = model.fn(resolved)
        return resolved

    def materialize(
        self,
        sources: dict[str, DataFrame],
        warehouse_dir: str,
        targets: list[str] | None = None,
        partition_by: dict[str, list[str]] | None = None,
        metrics: dict[str, dict] | None = None,
        jdbc_url: str | None = None,
        jdbc_options: dict[str, str] | None = None,
        jdbc_num_partitions: int | dict[str, int] | None = None,
    ) -> dict[str, str]:
        """Write models to ``{warehouse}/{layer}/{name}`` parquet, or —
        when ``jdbc_url`` is given — to ``{layer}_{name}`` tables over
        JDBC (the reference's Postgres load target, dlt/load.py:55-59).

        ``partition_by`` maps model name → partition columns (natural keys,
        e.g. weight_category) — the 100 TB layout knob.

        When ``metrics`` (a dict) is passed, each mart write is wrapped in
        ``df.observe`` and per-mart row counts land in ``metrics[name]`` —
        pipeline observability measured DURING the write itself (the
        accumulator rides the job), not by re-scanning the written output.

        ``jdbc_num_partitions`` caps the sink's connection fan-out (a
        global int, or per-model dict) — without it every upstream output
        partition opens its own connection, the max_connections hazard
        ``write_jdbc``'s docstring warns about.
        """
        if jdbc_url is not None and partition_by:
            raise ValueError(
                "partition_by is a parquet-layout knob; JDBC tables have no "
                "directory partitioning — drop it or use the parquet sink"
            )
        resolved = self.build(sources, targets)
        written: dict[str, str] = {}
        for name in self.topo_order(targets):
            model = self.models[name]
            path = f"{warehouse_dir}/{model.layer}/{name}"
            df = resolved[name]
            obs = None
            if metrics is not None:
                from pyspark.sql import Observation

                obs = Observation(f"mart_{name}")
                df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
            if jdbc_url is not None:
                path = f"{model.layer}_{name}"
                n_parts = (
                    jdbc_num_partitions.get(name)
                    if isinstance(jdbc_num_partitions, dict)
                    else jdbc_num_partitions
                )
                write_jdbc(
                    df, jdbc_url, path, options=jdbc_options,
                    num_partitions=n_parts,
                )
            else:
                writer = df.write.mode("overwrite")
                cols = (partition_by or {}).get(name)
                if cols:
                    writer = writer.partitionBy(*cols)
                writer.parquet(path)
            if obs is not None:
                metrics[name] = obs.get
            written[name] = path
        return written


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> None:
    """JDBC sink — the reference's actual load target is a Postgres
    database written over a DB-API/JDBC connection (reference
    dlt/load.py:55-59 + .dlt/secrets.toml); this is the Spark-native
    equivalent for any JDBC-speaking warehouse.

    Scale notes: every output partition opens one connection and writes
    ``batchsize`` rows per round-trip, so ``num_partitions`` IS the sink
    parallelism knob — cap it well below the database's max_connections
    (a 1000-executor job must not open 32k connections). Default
    batchsize raised to 10k (Spark's 1k default round-trips too often
    for bulk loads). ``truncate`` defaults true so overwrite keeps the
    target table's DDL (indexes, grants) instead of drop+recreate —
    dbt's incremental-friendly behavior.
    """
    opts = {"batchsize": "10000", "truncate": "true"}
    opts.update(options or {})
    # repartition, NOT coalesce: coalesce propagates the reduced partition
    # count upstream (num_partitions=1 would serialize the whole producing
    # job) and can never raise the count; the extra exchange is the price
    # of decoupling compute parallelism from connection fan-out
    writer = df.repartition(num_partitions) if num_partitions else df
    writer.write.mode(mode).options(**opts).jdbc(url, table)


def jdbc_roundtrip(
    spark,
    df: DataFrame,
    url: str,
    table: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Write ``df`` to ``table`` over JDBC and read it back — the
    load-verification shape (dlt's post-load row-count check,
    reference dlt/load.py)."""
    write_jdbc(df, url, table, options=options, num_partitions=1)
    reader = spark.read.options(**(options or {}))
    return reader.jdbc(url, table)


REGISTRY = Registry()
model = REGISTRY.model
