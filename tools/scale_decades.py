"""Two-decade growth probe: time the scale-suspect headliners at base,
10x, and 100x the bench corpus and report per-decade growth ratios.

The per-round bench (`bench.py`) measures one decade (10x). One decade
can hide a superlinear term that only emerges at the next (an O(n·√n)
or lightly-quadratic path can look "about 8x" at 10x). This probe adds
the second decade: a sub-quadratic operator must grow ≤ ~factor per
decade AND the 10x→100x ratio must not blow past the base→10x ratio.

Probe corpora are derived with the same decorrelation contract as the
bench's 10x tier (see scalegen.py), with one substitution applied at
EVERY probe factor (10x AND 100x): documents use the factor-agnostic
token-suffix transform (`scale_documents_suffix`, valid to 676x)
instead of the character rotation (valid to 10x). Using one generator
across both tiers keeps the decade-over-decade ratios internally
consistent — the probe's whole point — at the cost that this probe's
10x document timings are NOT directly comparable to bench.py's
rotation-based 10x tier (different generator, different token stream);
compare decade ratios within this file, absolute times within bench.

Usage: python tools/scale_decades.py [sf_dir] [out_json]
Writes SCALE_DECADES.json at the repo root by default; one JSON line to
stdout. Not wired into bench.py — the 100x tier costs tens of minutes
and is a documented one-off measurement (results table in SCALE.md),
re-run on demand when a probed operator's plan changes.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ufc_data_warehouse_spark import scalegen  # noqa: E402
from ufc_data_warehouse_spark.session import get_spark  # noqa: E402

# (query, tables it reads) — generation only materializes what a probe
# query touches, so the 100x dir skips the tables nothing reads
PROBES: dict[str, tuple[str, ...]] = {
    # banded SimHash pair join at production width (documents)
    "dedup_simhash48_pairs": ("documents",),
    # cross-document verbatim-span coverage (documents)
    "dedup_repeated_spans": ("documents",),
    # hyperplane-LSH candidate-first near-dup (embeddings)
    "dedup_embedding_lsh90": ("embeddings",),
    # lexical retrieval scoring (documents)
    "bm25_doc_ranking": ("documents",),
    # iterative graph loop over the customer->supplier purchase graph
    "graph_pagerank_top100": ("customer", "orders", "lineitem"),
    # the de-weakened two-phase global-rank machinery (VERDICT r3 task 2)
    # at two decades: equi-depth vocab rank, equi-depth event decile, and
    # the bucketed customer prefix sum
    "text_token_rarity": ("documents",),
    "calibration_reliability_bins": ("events",),
    "pareto_abc_customers": ("customer", "orders"),
    # r5: the de-weakened groupwise low-cardinality-key window queries
    # (VERDICT r4 task 3) — partitioned two-phase rank must stay ~linear
    # across both decades; the whole point of the rewrite is that no
    # single key's partition ever becomes one task
    "rank_family_orders": ("orders",),
    "window_distribution": ("events",),
    "grouped_quartiles": ("events",),
    "target_encoding_loo": ("events",),
    "curriculum_phases": ("documents",),
    # r6 (VERDICT r5 task 4): the two audit-caught rewrites from r5 —
    # per-lang token-bin packing cumsum on the partitioned two-phase
    # rank, and the prefix-max disorder audit on global_prefix_max
    "pack_token_bins": ("documents",),
    "event_disorder_audit": ("events",),
}

RUNS = 2  # best-of per (query, tier)


def ensure_decade_dir(
    spark, sf_dir: str, out_dir: str, factor: int, tables: tuple[str, ...]
) -> str:
    """Like scalegen.ensure_scale_dir but factor-agnostic for documents
    (token-suffix mode) and restricted to the probed tables.

    Markers are PER TABLE (keyed by factor, source dir, and generator
    version), so extending PROBES with a query that touches a new table
    only generates that table — it does not regenerate the existing
    multi-GB 100x corpus."""
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.basename(sf_dir.rstrip("/"))
    n_cust = None
    for table in tables:
        marker = os.path.join(
            out_dir,
            f"_DECADE_{factor}x_of_{base}_{table}"
            f"_v{scalegen.GENERATOR_VERSION}",
        )
        if os.path.exists(marker):
            continue
        # drop any stale marker for THIS table (older version / other
        # source dir) before regenerating it
        for stale in glob.glob(
            os.path.join(out_dir, f"_DECADE_*_{table}_v*")
        ):
            os.remove(stale)
        if table in ("customer", "orders") and n_cust is None:
            n_cust = (
                spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
                .select((F.max("c_custkey") + 1).alias("n"))
                .first()["n"]
            )
        df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        if table == "documents":
            scaled = scalegen.scale_documents_suffix(df, factor)
        elif table in ("customer", "orders"):
            scaled = scalegen._SCALERS[table](df, factor, n_cust=n_cust)
        else:
            scaled = scalegen._SCALERS[table](df, factor)
        # multi-file write (unlike the 10x tier's single file): at 100x a
        # repartition(1) write is a single-threaded bottleneck and the
        # probe queries read directories just as happily
        dest = os.path.join(out_dir, f"{table}.parquet")
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        elif os.path.exists(dest):
            os.remove(dest)
        scaled.write.mode("overwrite").parquet(dest)
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return out_dir


def best_of(fn, runs: int = RUNS) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "SCALE_DECADES.json"
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark(app_name="scale-decades")
    tables = tuple(sorted({t for ts in PROBES.values() for t in ts}))
    tiers: dict[int, str] = {1: sf_dir}
    for factor in (10, 100):
        d = os.path.join(repo, f".bench_decade{factor}")
        print(f"# generating {factor}x tier ...", file=sys.stderr)
        tiers[factor] = ensure_decade_dir(spark, sf_dir, d, factor, tables)

    # incremental: keep rows already measured by a prior run of the same
    # (sf_dir, runs) config so extending PROBES only times the new names
    results: dict[str, dict[str, float]] = {}
    if os.path.exists(out_json):
        try:
            with open(out_json) as fh:
                prior = json.load(fh)
            if (
                prior.get("sf_dir") == sf_dir
                and prior.get("runs_best_of") == RUNS
                # a generator bump rebuilds every tier dir — timings
                # measured against old-generator data must not be
                # reported as current
                and prior.get("generator_version")
                == scalegen.GENERATOR_VERSION
            ):
                results = {
                    k: v for k, v in prior.get("results", {}).items()
                    if k in PROBES
                }
        except (OSError, ValueError):
            pass
    for name in PROBES:
        if name in results:
            print(f"# {name}: cached from prior run", file=sys.stderr)
            continue
        row: dict[str, float] = {}
        for factor, d in tiers.items():
            secs = best_of(lambda: qs[name](spark, d).count())
            row[f"t{factor}x"] = round(secs, 4)
            print(f"# {name} @ {factor}x: {secs:.2f}s", file=sys.stderr)
        row["decade1"] = round(row["t10x"] / row["t1x"], 2)
        row["decade2"] = round(row["t100x"] / row["t10x"], 2)
        results[name] = row
    out = {
        "sf_dir": sf_dir,
        "runs_best_of": RUNS,
        "generator_version": scalegen.GENERATOR_VERSION,
        "factors": [1, 10, 100],
        "results": results,
    }
    with open(out_json, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
