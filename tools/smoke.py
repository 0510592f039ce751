"""One-command driver-gate replay: entry() smoke + a query/oracle sample.

Usage: python tools/smoke.py [n_sample] [sf_dir]

Runs the three checks the grading driver runs, in miniature:
1. entry(spark) returns a DataFrame with >= 0 rows (t1 smoke);
2. a deterministic sample of n (default 8) queries from queries() is
   executed AND hash-compared against its DuckDB oracle at sf0.01
   (t2 correctness, sampled);
3. the registry inventory is consistent (every query has an oracle).

Exit code 0 = all green. For the full gate run
``pytest tests/test_extra_queries.py tests/test_models_oracle.py`` with
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as entry_mod
    from tests.conftest import TABLES, assert_frames_match
    from ufc_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="smoke")
    try:
        df = entry_mod.entry(spark)
        n = df.count()
        print(f"entry(): {n} rows — OK")

        qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
        missing = [k for k in qs if k not in oracles]
        assert not missing, f"queries without oracle: {missing}"
        print(f"inventory: {len(qs)} queries, all with oracles — OK")

        con = duckdb.connect()
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        names = sorted(qs)
        step = max(1, len(names) // n_sample)
        sample = names[::step][:n_sample]
        for name in sample:
            sdf = qs[name](spark, sf_dir)
            ddf = con.execute(oracles[name]).df()
            assert_frames_match(sdf, ddf, label=name)
            print(f"  {name}: oracle match — OK")
        print(f"sampled correctness ({len(sample)} queries) — OK")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
