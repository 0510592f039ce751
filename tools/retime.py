"""Isolated re-time of individual bench queries (VERDICT r4 task 4).

The shared box carries external background load (documented in the verify
notes: individual bench queries can spike 5-8x), so an apparent per-query
regression inside a full sweep must be confirmed by re-timing the query in
an ISOLATED session, best-of-N, with the load average and the fixed canary
job recorded alongside. Usage:

    python tools/retime.py [out.json] name [name ...]

Model queries (bench.MODEL_HEADLINE) get the same amortized pipeline the
bench gives them (raw layer materialized, staging persisted — steady-state
cost, not ingest); beyond-parity names run directly against
$SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 3


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if args and args[0].endswith(".json"):
        out_path, args = args[0], args[1:]
    if not args:
        print("usage: retime.py [out.json] name [name ...]", file=sys.stderr)
        sys.exit(2)

    import shutil

    import __spark_entry__ as entry_mod
    from ufc_data_warehouse_spark import models  # noqa: F401
    from ufc_data_warehouse_spark.registry import REGISTRY
    from ufc_data_warehouse_spark.session import get_spark
    from ufc_data_warehouse_spark.synth import ufc_raw_tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ufc-retime")
    spark.range(1).count()

    def canary() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(id * id % 97) as s"
        ).collect()
        return time.perf_counter() - t0

    record: dict = {
        "sf_dir": sf_dir,
        "runs": RUNS,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "canary_sec": round(min(canary() for _ in range(3)), 4),
        "queries": {},
    }

    from bench import MODEL_HEADLINE, RAW_TABLES

    model_names = [n for n in args if n in MODEL_HEADLINE]
    warehouse = None
    stored: dict = {}
    try:
        if model_names:
            warehouse = tempfile.mkdtemp(prefix="ufc_retime_")
            raw = ufc_raw_tables(spark, sf_dir)
            for n in RAW_TABLES:
                raw[n].write.mode("overwrite").parquet(f"{warehouse}/{n}")
            stored = {
                n: spark.read.parquet(f"{warehouse}/{n}") for n in RAW_TABLES
            }
            stg = (
                "stg_fight_results",
                "stg_event_details",
                "stg_title_fights_norm",
            )
            built = REGISTRY.build(stored, targets=list(stg))
            for n in stg:
                stored[n] = built[n].persist()
                stored[n].count()

        all_queries = entry_mod.queries()
        for name in args:
            if name in MODEL_HEADLINE:
                run = lambda n=name: REGISTRY.build(stored, targets=[n])[
                    n
                ].count()
            else:
                run = lambda n=name: all_queries[n](spark, sf_dir).count()
            spark.sparkContext._jvm.System.gc()
            best = None
            for _ in range(RUNS):
                t0 = time.perf_counter()
                rows = run()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            record["queries"][name] = {"best_sec": round(best, 4), "rows": rows}
            print(f"# {name}: {rows} rows, best {best:.4f}s", file=sys.stderr)
        record["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    finally:
        try:
            spark.stop()
        except Exception:  # noqa: BLE001
            pass
        if warehouse:
            shutil.rmtree(warehouse, ignore_errors=True)

    line = json.dumps(record, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
