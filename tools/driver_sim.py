"""Simulate the driver's correctness gate locally: run each query and its
oracle at a given SF dir, normalize (columns sorted by name, rows sorted,
floats rounded to 6dp), and require EXACT equality of the normalized
frames — stricter than the test suite's rtol compare, so anything green
here should be green in CORRECTNESS_r{N}.json.

Usage: python tools/driver_sim.py [--json out.json] [sf_dir] [first_n | name ...]

``--json`` additionally writes the machine-readable sweep record
(n_pass/n_fail/names_md5/head_commit) — the exact shape committed as
SWEEP_r{N}.json each round, so the record never needs hand-assembly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tests.conftest import TABLES, normalize_frame  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out, args = args[1], args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from ufc_data_warehouse_spark.session import get_spark

    qs = entry.queries()
    oracles = entry.oracle_sql()
    rest = args[1:]
    if len(rest) == 1 and rest[0].isdigit():
        names = list(qs)[: int(rest[0])]
    elif rest:
        names = list(rest)
    else:
        names = list(qs)[:50]
    n_skip = 0

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
                n_skip += 1
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
    if json_out:
        import hashlib
        import json as _json
        import subprocess

        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
        record = {
            "what": (
                "full-contract strict sweep (tools/driver_sim.py: EXACT "
                "equality of normalized spark-vs-DuckDB frames)"
            ),
            "sf_dir": sf_dir,
            "head_commit": head,
            "n_queries": len(names),
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_skipped_no_oracle": n_skip,
            "names_md5": hashlib.md5(
                "\n".join(sorted(names)).encode()
            ).hexdigest(),
        }
        with open(json_out, "w") as fh:
            _json.dump(record, fh, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
