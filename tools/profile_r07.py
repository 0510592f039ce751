"""Round-7 measurement harness (guide §1: measure first).

For each named bench query, in ONE session:
  - capture .explain("formatted") to plans/r07/<name>_<tag>.txt
  - run the same action the bench times (.count()) best-of-N isolated,
    recording wall seconds AND the number of Spark jobs/stages/tasks the
    run launched (job-count ~= fixed scheduler overhead, the dominant
    term for iterative queries at sf0.1)
  - optionally run a noop-sink pass (computes every column — catches
    count()-only pruning artifacts) when --noop is given

Usage: python tools/profile_r07.py out.json [--tag before|after] [--noop] name...
       (no names = the full BENCH_EXTRA list)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 3


def main() -> None:
    args = sys.argv[1:]
    out_path = args.pop(0)
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    do_noop = "--noop" in args
    if do_noop:
        args.remove("--noop")
    plans_only = "--plans-only" in args
    if plans_only:
        args.remove("--plans-only")

    import __spark_entry__ as entry_mod
    from ufc_data_warehouse_spark.extra_queries import BENCH_EXTRA
    from ufc_data_warehouse_spark.session import get_spark

    names = args or list(BENCH_EXTRA)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07"
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="ufc-profile-r07")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    qs = entry_mod.queries()

    def canary() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr("sum(id * id % 97) as s").collect()
        return time.perf_counter() - t0

    rec: dict = {
        "sf_dir": sf_dir,
        "tag": tag,
        "runs": RUNS,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "canary_sec": round(min(canary() for _ in range(3)), 4),
        "queries": {},
    }
    st = spark.sparkContext.statusTracker()

    for name in names:
        if name not in qs:
            rec["queries"][name] = {"error": "unknown query"}
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            n_exchanges = plan.count("Exchange")
            if plans_only:
                rec["queries"][name] = {"exchanges_in_plan": n_exchanges}
                print(f"# {name}: plan captured exch={n_exchanges}", file=sys.stderr)
                continue
            spark.sparkContext._jvm.System.gc()
            best = None
            rows = 0
            jobs = stages = tasks = 0
            for r in range(RUNS):
                group = f"{name}:{tag}:{r}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                rows = qs[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                spark.sparkContext.setJobGroup(None, None)
                if best is None or dt < best:
                    best = dt
                if r == 0:
                    job_ids = st.getJobIdsForGroup(group)
                    jobs = len(job_ids)
                    for jid in job_ids:
                        ji = st.getJobInfo(jid)
                        if ji is not None:
                            for sid in ji.stageIds:
                                stages += 1
                                si = st.getStageInfo(sid)
                                if si is not None:
                                    tasks += si.numTasks
            noop_sec = None
            if do_noop:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                noop_sec = round(time.perf_counter() - t0, 4)
            rec["queries"][name] = {
                "best_sec": round(best, 4),
                "rows": rows,
                "jobs_run0": jobs,
                "stages_run0": stages,
                "tasks_run0": tasks,
                "exchanges_in_plan": n_exchanges,
            }
            if noop_sec is not None:
                rec["queries"][name]["noop_sec"] = noop_sec
            print(
                f"# {name}: {best:.3f}s rows={rows} jobs={jobs} "
                f"stages={stages} tasks={tasks} exch={n_exchanges}",
                file=sys.stderr,
            )
        except Exception as ex:  # noqa: BLE001
            rec["queries"][name] = {"error": f"{type(ex).__name__}: {str(ex)[:200]}"}
            print(f"# {name}: ERROR {ex}", file=sys.stderr)
    rec["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    rec["canary_end_sec"] = round(min(canary() for _ in range(3)), 4)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
