"""ML-ops / feature-engineering operators: point-in-time feature
assembly, exact grouped ROC-AUC, ordered sequence-pattern matching,
co-occurrence (market-basket) pair mining, and one-pass column
profiling.

No reference analog (reshefsharvit/ufc-data-warehouse is a BI
warehouse — SURVEY.md §2.10 notes zero UDF/ML surface); these are the
training-data-pipeline extensions the engine needs at 100 TB, in the
same spirit as operators/training.py.

Exact-arithmetic contract (same as operators/timeseries.py): every
aggregate is an integer count or a bounded-precision DECIMAL sum;
floats appear only as raw column values carried through, or in ONE
final division/cast per output column (IEEE-correctly-rounded in both
engines), so cross-engine hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pit_features(
    events: DataFrame,
    *,
    entity: str,
    ts: str,
    order_tiebreak: str,
    label_filter: Column,
    value: str,
    feature_specs: dict[str, Column],
) -> DataFrame:
    """Point-in-time training-set assembly (feature-store semantics).

    For every label row (``label_filter``), compute features over the
    entity's events STRICTLY BEFORE the label's event time — the
    point-in-time-correct join that prevents label leakage. This is the
    "training set generation" primitive of a feature store (Feast /
    Tecton style), re-expressed as a single keyed window:

    - one exchange on ``entity``; every feature shares the same
      window frame (UNBOUNDED PRECEDING .. 1 PRECEDING), so Catalyst
      fuses them into ONE Window operator — no per-feature joins;
    - the label filter is applied ABOVE the window (a predicate on a
      non-partition column cannot be pushed below it), so features see
      all prior events, labels keep only their own rows;
    - scale: cost is one shuffle + one sort of the events table,
      independent of the number of features. At 100 TB the same plan
      holds — skewed entities are bounded by per-entity history, and
      the alternative (N range joins against N feature tables) is
      strictly worse.

    ``feature_specs`` maps output column name -> aggregate Column to
    evaluate over the prior-events frame (e.g. ``F.count(F.lit(1))``,
    ``F.sum(...)``, ``F.last(..., ignorenulls=True)``).
    """
    w = (
        Window.partitionBy(entity)
        .orderBy(ts, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    feats = events.select(
        "*",
        *[expr.over(w).alias(name) for name, expr in feature_specs.items()],
    )
    return feats.filter(label_filter)


def auc_by_group(
    scored: DataFrame, *, group: str, score: str, is_pos: Column
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney rank-sum identity,
    with average-rank tie handling — bit-exact across engines.

    AUC = U / (n_pos * n_neg) where U = sum of positives' average
    ranks − n_pos(n_pos+1)/2. Everything stays integer until one final
    double division:

    - ``rank()`` over (group, score) gives the low tie rank r;
    - peers = count(*) over the RANGE CURRENT ROW..CURRENT ROW frame
      (value peers) — shares the group exchange + score sort with the
      rank window instead of forcing a second (group, score) hash
      partitioning;
    - 2·avg_rank = 2r + peers − 1 (integer), so
      2U = Σ_pos(2r + peers − 1) − n_pos(n_pos+1) and
      AUC = 2U / (2·n_pos·n_neg) — exact bigints into ONE
      IEEE-correctly-rounded division.

    Scale: one exchange on ``group`` + per-group sort; no global sort,
    no self-join of the score table (the naive pairwise definition is
    O(n²) per group). Groups fit the keyed-window model at any n.
    """
    w_rank = Window.partitionBy(group).orderBy(score)
    w_peers = (
        Window.partitionBy(group)
        .orderBy(score)
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    r2 = (
        2 * F.rank().over(w_rank)
        + F.count(F.lit(1)).over(w_peers)
        - 1
    ).cast("long")
    ranked = scored.select(
        F.col(group), is_pos.alias("is_pos"), r2.alias("r2")
    )
    agg = ranked.groupBy(group).agg(
        F.sum(F.when(F.col("is_pos"), F.col("r2"))).alias("s2"),
        F.count(F.when(F.col("is_pos"), F.lit(1))).alias("n_pos"),
        F.count(F.when(~F.col("is_pos"), F.lit(1))).alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
        / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
    )
    return agg.select(group, "n_pos", "n_neg", auc.alias("auc"))


def sequence_pattern_counts(
    events: DataFrame,
    *,
    entity: str,
    ts: str,
    order_tiebreak: str,
    symbol: Column,
    pattern: str,
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching: encode each
    entity's event stream as an ordered symbol string and count
    non-overlapping regex matches (both engines scan left-to-right,
    non-overlapping, greedy — identical semantics).

    Per entity: sort_array(collect_list(struct(ts, tiebreak, symbol)))
    gives a total order (struct comparison is field-lexicographic), so
    the string is deterministic even under equal timestamps. One keyed
    exchange; the regex runs once per entity JVM-side.

    Scale: per-entity history must fit in one task (same bound as any
    per-entity sequential op). For pathological entities, the
    automaton can be run incrementally via the partitioned-TABLE UDTF
    (operators/udtfs.py) instead of materializing the string.
    """
    base = events.select(
        F.col(entity),
        F.col(ts).alias("_ts"),
        F.col(order_tiebreak).alias("_tb"),
        symbol.alias("sym"),
    )
    arr = F.array_sort(F.collect_list(F.struct("_ts", "_tb", "sym")))
    seq = F.concat_ws("", F.transform(arr, lambda x: x["sym"]))
    return (
        base.groupBy(entity)
        .agg(seq.alias("seq"))
        .select(
            entity,
            F.length("seq").cast("long").alias("seq_len"),
            F.regexp_count("seq", F.lit(pattern)).cast("long").alias("n_matches"),
        )
    )


def cooccurrence_pairs(
    df: DataFrame, *, basket: str, item: str
) -> DataFrame:
    """Market-basket pairwise co-occurrence support: for every
    unordered item pair, the number of baskets containing both.

    Re-expressed without the classic self-join: distinct (basket,
    item) → per-basket sorted item array → in-array pair expansion
    (the same combinations trick as dedup.lsh_candidate_pairs) →
    hash agg on the pair. Pair fan-out is Σ|basket-itemset|², bounded
    by the per-basket distinct-item count — never |items|² global, and
    the basket×basket join space never exists.
    """
    d = df.select(basket, item).distinct()
    arrs = d.groupBy(basket).agg(
        F.array_sort(F.collect_set(item)).alias("items")
    )
    pairs = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    return (
        arrs.select(F.explode(pairs).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )


#: column kinds whose min/max cast to string identically across engines
_SAFE_MINMAX = {"bigint", "int", "smallint", "tinyint", "string"}


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass multi-column data profiling (the dbt-profiler /
    DESCRIBE EXTENDED shape): per column, non-null count, exact
    distinct count, and min/max rendered as strings.

    All profiled columns ride ONE aggregate over ONE scan; Spark plans
    the multiple exact count-distincts as a single Expand (one shuffle,
    scan multiplied by the column count — at 100 TB swap the exact
    distincts for approx_count_distinct/HLL sketches, same shape,
    no Expand). The 1-row aggregate is then unpivoted with stack()
    into the long profile format — zero extra shuffles.

    min/max are emitted only for integer/string columns: float and
    timestamp to-string rendering is engine-specific (Java
    Double.toString vs C printf; fractional-second trimming), so those
    kinds profile counts-only rather than risk false hash mismatches.
    """
    kinds = dict(df.dtypes)
    exprs: list[Column] = []
    stack_args: list[str] = []
    for i, c in enumerate(cols):
        exprs.append(F.count(F.col(c)).alias(f"nn_{i}"))
        exprs.append(F.count_distinct(F.col(c)).alias(f"nd_{i}"))
        if kinds[c] in _SAFE_MINMAX:
            exprs.append(F.min(F.col(c)).cast("string").alias(f"mn_{i}"))
            exprs.append(F.max(F.col(c)).cast("string").alias(f"mx_{i}"))
            stack_args.append(f"'{c}', nn_{i}, nd_{i}, mn_{i}, mx_{i}")
        else:
            stack_args.append(
                f"'{c}', nn_{i}, nd_{i}, CAST(NULL AS STRING), CAST(NULL AS STRING)"
            )
    row = df.agg(*exprs)
    return row.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column_name, n_nonnull, n_distinct, min_value, max_value)"
    )


def interval_overlap_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts_us: str,
    start_us: str,
    end_us: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Generic NON-equi interval containment join — point ∈ [start, end)
    with NO shared key between the sides — planned as a HASH join.

    Spark plans a bare range predicate as BroadcastNestedLoopJoin
    (O(|P|·|I|) compares — dead at 10⁹×10⁸). The classic fix is a
    bucket grid: each interval replicates to every ``bucket_s``-wide
    epoch bucket it overlaps (sequence+explode — fan-out is
    ⌈len/bucket_s⌉+1 per interval, so size ``bucket_s`` to the TYPICAL
    interval length); each point maps to exactly ONE bucket, so after
    the bucket equi-join + exact range residual every true pair appears
    exactly once — no dedup pass. All epoch math is integer µs.
    Returns the matched pairs (all interval columns + all point
    columns); callers aggregate. This is the no-shared-key complement
    of the equi-key-+-residual shape in q_scd2_point_in_time_join.
    """
    bus = int(bucket_s) * 1_000_000
    # SQL `div` = exact int64 floor division (inputs are non-negative
    # epochs) — float `/`+cast would misbucket near 2^53-scale epochs
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_us} div {bus}"),
                F.expr(f"({end_us} - 1) div {bus}"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.expr(f"{point_ts_us} div {bus}"))
    out = iv.join(pt, "__bucket").where(
        (F.col(point_ts_us) >= F.col(start_us))
        & (F.col(point_ts_us) < F.col(end_us))
    )
    return out.drop("__bucket")


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """2-D skyline / Pareto frontier (minimize both ``x`` and ``y``):
    rows no other row dominates (≤ on both dims, < on at least one) —
    the multi-objective shortlist (cheapest-for-its-size, fastest-for-
    its-cost) that a scalar score can't express.

    O(n²) dominance self-joins are the naive plan; instead the input
    collapses to one candidate per distinct ``x`` (only min-``y`` can
    survive — any same-``x`` worse row is dominated), so the sort-scan
    rides ≤|distinct x| rows: ascending-``x`` window keeps a row iff
    every strictly-smaller ``x`` has strictly larger ``y`` (running min
    over UNBOUNDED..1 PRECEDING). The global window is the documented
    single-task hazard; at 10⁹ distinct ``x`` use repartitionByRange +
    per-partition min + broadcast prefix-min (the parallel-prefix scan
    shape noted in SCALE.md). Exact for integer dims; float dims keep
    engine-identical compare semantics (no arithmetic performed).
    """
    cand = df.groupBy(F.col(x)).agg(F.min(F.col(y)).alias(y))
    w = (
        Window.orderBy(F.col(x).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        cand.withColumn("__prev_min", F.min(F.col(y)).over(w))
        .where(F.col("__prev_min").isNull() | (F.col(y) < F.col("__prev_min")))
        .drop("__prev_min")
    )
