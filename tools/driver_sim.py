"""Simulate the driver's correctness gate locally: run each query and its
oracle at a given SF dir, normalize (columns sorted by name, rows sorted,
floats rounded to 6dp), and require EXACT equality of the normalized
frames — stricter than the test suite's rtol compare, so anything green
here should be green in CORRECTNESS_r{N}.json.

Usage: python tools/driver_sim.py [sf_dir] [first_n | name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tests.conftest import TABLES, normalize_frame  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from ufc_data_warehouse_spark.session import get_spark

    qs = entry.queries()
    oracles = entry.oracle_sql()
    rest = sys.argv[2:]
    if len(rest) == 1 and rest[0].isdigit():
        names = list(qs)[: int(rest[0])]
    elif rest:
        names = rest
    else:
        names = list(qs)[:50]

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    spark = get_spark(app_name="driver-sim")
    n_pass = n_fail = 0
    try:
        for name in names:
            if name not in oracles:
                print(f"SKIP  {name} (no oracle — rows-only check)")
                continue
            try:
                left = normalize_frame(qs[name](spark, sf_dir).toPandas())
                right = normalize_frame(con.execute(oracles[name]).df())
                ok_cols = list(left.columns) == list(right.columns)
                ok_rows = len(left) == len(right)
                ok_vals = ok_cols and ok_rows and left.equals(right)
                if ok_vals:
                    n_pass += 1
                    print(f"PASS  {name} ({len(left)} rows)")
                else:
                    n_fail += 1
                    print(
                        f"FAIL  {name} cols={ok_cols} rows={ok_rows}"
                        f" ({len(left)} vs {len(right)})"
                    )
            except Exception as ex:  # noqa: BLE001
                n_fail += 1
                print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:120]}")
    finally:
        spark.stop()
    print(f"TOTAL pass={n_pass} fail={n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
