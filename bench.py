"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Timing method: each query is resolved lazily then forced with a count-style
action (collect on aggregates, count on wide outputs) so the measured cost
is the full plan execution, not result transfer of huge row sets.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    # model family coverage: simple agg, gaps-and-islands, heavy self-join,
    # theta join, the 13-CTE boss, and its dependents
    "fighters_by_wins",
    "fighters_best_record",
    "fighters_by_longest_winning_streak",
    "quality_of_opposition_faced",
    "wins_over_champions_agg",
    "consecutive_title_defenses",
    "title_reigns",
    "total_champ_days",
    "multi_division_champs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ufc_data_warehouse_spark.api import build_all
    from ufc_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="ufc-bench")
    try:
        import __spark_entry__ as entry_mod

        all_queries = entry_mod.queries()
        names = [n for n in HEADLINE if n in all_queries]
        try:
            from ufc_data_warehouse_spark.extra_queries import BENCH_EXTRA

            names += [n for n in BENCH_EXTRA if n in all_queries]
        except ImportError:
            pass

        # warm the JVM + parquet footers once so timings measure query work
        build_all(spark, sf_dir)["stg_fight_results"].count()

        timings: dict[str, float] = {}
        t_total = time.perf_counter()
        for name in names:
            t0 = time.perf_counter()
            df = all_queries[name](spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 4)
            print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        total = round(time.perf_counter() - t_total, 4)

        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        print(
            json.dumps(
                {
                    "metric": "headline-query wall time",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
