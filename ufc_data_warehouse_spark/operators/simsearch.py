"""Similarity search over embedding columns (``array<float>``).

Beyond-parity surface: brute-force cosine top-k as the exact baseline, and
hyperplane-LSH bucketing as the sublinear scale path.

Design for 100 TB:
- dot products/norms are ``F.aggregate``/``F.zip_with`` Column expressions
  — JVM codegen, sequential (deterministic) accumulation in DOUBLE;
- brute-force is query-batch × corpus: broadcast the (small) query set,
  never shuffle the corpus; top-k per query is one partial-agg shuffle of
  k rows per partition (TakeOrdered shape, not a global sort);
- LSH buckets give O(1) candidate lookup: signature = sign-bits against
  deterministic md5-derived hyperplanes, so buckets are reproducible
  across engines and runs (no RNG state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-accumulation dot product via ``aggregate``/``zip_with``.

    Measured note: an unrolled ``element_at`` expression tree (64 terms)
    benches ~5× SLOWER than this form — the giant expression falls out of
    codegen and is evaluated node-per-node, while the higher-order function
    runs one tight specialized loop over the array. Keep the lambda form.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, neighbor_id,
    rank, cosine). Self-matches excluded.

    ``queries`` is broadcast; ranking ties broken by neighbor id for
    cross-engine determinism.
    """
    # Norms are per-row constants: compute them ONCE per side before the
    # join (N + N_q sqrt-aggregates) instead of inside the pair expression
    # (2 × N × N_q) — at 100 TB the pair space dwarfs both inputs.
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("vnorm"),
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("vec"), F.col("qvec"))
                / (F.col("vnorm") * F.col("qnorm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    candidates: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t) —
    the dedup modality for already-embedded corpora.

    With ``candidates`` — a DataFrame of (id_a, id_b) pairs, e.g. LSH
    bucket collisions — the plan is built FROM the candidate side: two
    shuffle/broadcast hash joins attach the vectors to each candidate
    pair, then the exact cosine verify runs over |candidates| rows only.
    This is the 100 TB path: cost is O(|candidates|), never O(n²), and
    the plan contains no BroadcastNestedLoopJoin. Without ``candidates``
    this is the exhaustive O(n²) verify — the oracle-ground-truth
    baseline, small-n only.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    if candidates is not None:
        # Candidate-first: two equi hash joins, each shuffling only the
        # candidate set + one vector column. Canonicalize to id_a < id_b
        # so callers may pass unordered collision pairs.
        pairs = (
            candidates.select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .join(a, "id_a")
            .join(b, "id_b")
        )
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
) -> DataFrame:
    """IVF-flavored ANN: the corpus is pre-partitioned into inverted lists
    (here the ``label`` column — in production a clustering assignment);
    each query probes only the ``n_probe`` nearest lists, then ranks
    exactly within them.

    The list representative is the member with the MINIMUM id (a
    deterministic medoid stand-in) — unlike a mean centroid it involves no
    float accumulation, so results are engine-exact and reproducible.

    Scale shape: reps are tiny (one per list) and broadcast twice; the
    candidate scan touches |corpus| × n_probe/n_lists rows — the sublinear
    path; final top-k is one window per query over candidates only.
    """
    w_rep = Window.partitionBy(list_col).orderBy(F.asc(id_col))
    reps = (
        embeddings.withColumn("_rn", F.row_number().over(w_rep))
        .filter(F.col("_rn") == 1)
        .select(F.col(list_col).alias("rep_list"), F.col(vec_col).alias("rep_vec"))
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    probe_rank = Window.partitionBy("query_id").orderBy(
        F.desc("rep_cos"), F.asc("rep_list")
    )
    probes = (
        qs.join(F.broadcast(reps))
        .select(
            "query_id",
            "qvec",
            "qnorm",
            "rep_list",
            (
                _dot(F.col("rep_vec"), F.col("qvec"))
                / (_norm(F.col("rep_vec")) * F.col("qnorm"))
            ).alias("rep_cos"),
        )
        .withColumn("_pr", F.row_number().over(probe_rank))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qvec", "qnorm", F.col("rep_list").alias("probe_list"))
    )
    cands = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("vnorm"),
        F.col(list_col).alias("probe_list"),
    ).join(F.broadcast(probes), "probe_list")
    w_k = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("vec"), F.col("qvec"))
                / (F.col("vnorm") * F.col("qnorm"))
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplane_weight(plane: F.Column, dim: F.Column) -> F.Column:
    """Deterministic pseudo-random INTEGER weight in [-1000, 1000):
    derived from md5(plane:dim) — identical in any engine with md5 +
    hex→int. Kept integral (the conceptual weight is this / 1000) so the
    plane dot can be an exact int64 sum: float accumulation order differs
    between engines, and a dot within 1 ulp of 0 would otherwise flip a
    sign bit and silently change the candidate set (r3 ADVICE)."""
    h = F.conv(
        F.substring(F.md5(F.concat(plane.cast("string"), F.lit(":"), dim.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % 2000) - 1000


# fixed-point scale for embedding components in the LSH sign test: the
# per-plane dot becomes Σ floor(x·1e6)·w over int64 — order-free exact on
# any engine. |x|≲10, |w|<1000, d=64 → |dot| < 1e12, far inside int64.
_LSH_XSCALE = 1_000_000


def lsh_bucket_signatures(
    embeddings: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): ``num_planes`` sign-bits against deterministic
    hyperplanes, packed into a bigint bucket key.

    Shape: explode (vec × plane × dim) is avoided — the plane weights are
    generated per (plane, dim) once and joined via a broadcast range table,
    then one groupBy(id, plane) + one groupBy(id). At corpus scale the
    bucket key becomes the shuffle/partition key for candidate lookup.

    The sign test is EXACT integer arithmetic (components fixed-point
    quantized to 1e-6 units, weights integral 1e-3 units): the dot is an
    int64 sum, so its sign cannot depend on accumulation order — Spark
    and the DuckDB oracle agree bit-for-bit even for dots near 0.
    """
    # dims from the first NON-NULL, NON-EMPTY vector — a corpus whose
    # first row happens to be null/empty must not zero out every bucket
    head = (
        embeddings.filter(
            F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
        )
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    dims = head["d"] if head is not None else 0
    spark = embeddings.sparkSession
    if not dims or dims <= 0:
        # no usable vector anywhere: no buckets, stable schema
        return embeddings.select(
            F.col(id_col).alias("id"), F.lit(0).cast("long").alias("bucket")
        ).limit(0)
    # one range, plane = id div dims / dim = id mod dims — no cross join,
    # so downstream plans stay NLJ-free
    weights = spark.range(num_planes * dims).select(
        (F.col("id") / dims).cast("long").alias("plane"),
        (F.col("id") % dims).alias("dim"),
    ).select(
        "plane", "dim", hyperplane_weight(F.col("plane"), F.col("dim")).alias("w")
    )
    comps = (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.posexplode(vec_col).alias("dim", "x"),
        )
        .join(F.broadcast(weights), "dim")
        .groupBy("id", "plane")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * _LSH_XSCALE).cast("long")
                * F.col("w")
            ).alias("dot")
        )
    )
    return comps.groupBy("id").agg(
        F.sum(
            F.when(
                F.col("dot") > 0, F.expr("shiftleft(1L, cast(plane as int))")
            ).otherwise(0)
        ).alias("bucket")
    )


def quantize_int8(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Scalar int8 quantization of an embedding column: per-corpus global
    [min, max] → each component maps to floor((x-min)/(max-min)*255),
    clamped to [0, 255].

    The memory-bandwidth lever for 100 TB similarity search: 4× smaller
    vectors (float32→uint8) means 4× more corpus per executor and 4× less
    shuffle when candidates move. The [min,max] stats are a 1-row aggregate
    broadcast to every task (no shuffle of the corpus); the mapping itself
    is a JVM ``transform`` lambda — no Python. ``floor`` (not round) keeps
    the codes bit-identical across engines, so an external SQL engine can
    reproduce the codes exactly. Adds ``codes array<int>`` plus the
    ``q_min``/``q_scale`` needed to dequantize (x ≈ code/255*scale+min).
    """
    flat = embeddings.select(F.explode(vec_col).alias("x"))
    stats = flat.agg(
        F.min("x").cast("double").alias("q_min"),
        F.max("x").cast("double").alias("q_max"),
    ).withColumn("q_scale", F.col("q_max") - F.col("q_min"))
    return (
        embeddings.join(F.broadcast(stats))
        .withColumn(
            "codes",
            F.transform(
                F.col(vec_col),
                lambda x: F.least(
                    F.lit(255),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (x.cast("double") - F.col("q_min"))
                            / F.col("q_scale")
                            * F.lit(255.0)
                        ).cast("int"),
                    ),
                ),
            ),
        )
        .drop("q_max")
    )


def dequantized(df: DataFrame, codes_col: str = "codes") -> F.Column:
    """Reconstruct approximate float vectors from int8 codes (midpoint of
    each quantization cell, the standard unbiased choice)."""
    return F.transform(
        F.col(codes_col),
        lambda c: (c.cast("double") + 0.5) / 255.0 * F.col("q_scale")
        + F.col("q_min"),
    )


# ---------------------------------------------------------------------------
# k-means + semantic dedup
# ---------------------------------------------------------------------------

_KM_SCALE = 1_000_000  # fixed-point quantization for engine-exact centroids


def _quantized(vec_col: F.Column) -> F.Column:
    """floor(x * 1e6) as bigint — fixed-point components whose cross-row
    SUMS are exact integers, so centroid means are order-independent and
    bit-identical across engines (a plain float mean would depend on
    accumulation order and could flip boundary assignments)."""
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * _KM_SCALE).cast("long")
    )


_IDENT = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _sq_dist_to(q_col: str, centroid: list[float]) -> F.Column:
    """Squared L2 distance from the quantized vector to a literal centroid.
    Row-local sequential fold in index order — deterministic IEEE doubles,
    reproducible by any engine that evaluates lists in order.

    Built as ONE ``F.expr`` string rather than ``F.zip_with``/
    ``F.aggregate`` with Python lambdas: the lambda path costs ~70 py4j
    round-trips per centroid (each ``F.lit`` + the lambda-to-Catalyst
    conversion), which measured ~0.9 s of pure driver-side expression
    construction per pq_encode assignment pass (16 centroids). The parsed
    tree is the identical aggregate(zip_with(...)) — same IEEE evaluation
    order, same results bit-for-bit (``repr`` of a Python float is
    shortest-round-trip, and Spark's double literal parser recovers the
    exact same IEEE value).

    r8 (r7 ADVICE): ``q_col`` is a PLAIN COLUMN NAME only — it is
    interpolated into a SQL string, so a Column object or non-identifier
    (which the old ``Column | str`` signature silently collapsed to a
    column literally named "q") is rejected loudly instead."""
    if not isinstance(q_col, str) or not _IDENT.match(q_col):
        raise ValueError(
            f"_sq_dist_to needs a bare column-name identifier, got {q_col!r}"
        )
    name = q_col
    arr = ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in centroid)
    return F.expr(
        f"aggregate(zip_with({name}, array({arr}), "
        f"(x, y) -> (CAST(x AS DOUBLE) / {_KM_SCALE} - y)"
        f" * (CAST(x AS DOUBLE) / {_KM_SCALE} - y)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 4,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means over an embedding column, fully deterministic:
    returns (assignments (id, cluster), final centroids).

    Init = the ``k`` lowest-id vectors (no RNG). Each iteration is the
    canonical distributed shape:

    - **assign**: centroids are collected to the driver (k×d doubles —
      KBs even at 100 TB corpus scale) and inlined as literal arrays, so
      assignment is a ZERO-shuffle map-only projection; argmin ties break
      to the lowest cluster index.
    - **update**: per-(cluster, dim) sums of the fixed-point components —
      posexplode is a narrow flatMap and the agg partial-aggregates
      map-side, so the exchange carries k×d partial rows per map task,
      not the corpus. Empty clusters keep their previous centroid.

    ``n_assign`` assignment passes ⇒ ``n_assign − 1`` centroid updates.
    Exact integer sums + single final division make every centroid, every
    distance, and every assignment bit-reproducible in DuckDB SQL — the
    oracle replays the whole algorithm unrolled.
    """
    q = embeddings.select(
        F.col(id_col).alias("id"), _quantized(F.col(vec_col)).alias("q")
    )
    init_rows = q.orderBy("id").limit(k).collect()
    centroids = [[qi / _KM_SCALE for qi in r["q"]] for r in init_rows]
    # degenerate corpora (n < k, incl. n = 0) clamp to the vectors that
    # exist — graceful behavior only, outside any oracle-checked regime
    k = min(k, len(centroids))
    if k == 0:
        return q.select("id", F.lit(0).cast("int").alias("cluster")), []

    def assign(frame: DataFrame) -> DataFrame:
        dists = [_sq_dist_to("q", c) for c in centroids]
        best_d, best_j = dists[0], F.lit(0)
        for j in range(1, k):
            cond = dists[j] < best_d
            best_j = F.when(cond, j).otherwise(best_j)
            best_d = F.when(cond, dists[j]).otherwise(best_d)
        return frame.withColumn("cluster", best_j.cast("int"))

    assigned = assign(q)
    for _ in range(n_assign - 1):
        sums = (
            assigned.select("cluster", F.posexplode("q").alias("dim", "qx"))
            .groupBy("cluster", "dim")
            .agg(F.sum("qx").alias("s"), F.count("*").alias("cnt"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = (r["s"], r["cnt"])
        centroids = [
            [
                float(by_cluster[j][i][0]) / (by_cluster[j][i][1] * float(_KM_SCALE))
                for i in range(len(centroids[j]))
            ]
            if j in by_cluster
            else centroids[j]
            for j in range(k)
        ]
        assigned = assign(q)
    return assigned.select("id", "cluster"), centroids


def pq_encode(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 4,
    n_assign: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product quantization: split each ``dims``-d vector into ``m``
    subvectors and learn an independent ``k``-centroid codebook per
    subspace with the deterministic fixed-point :func:`kmeans`; each
    vector compresses to ``m`` small codes (here 4 × 2 bits).

    Returns (codes (id, code_0..code_{m-1}), codebooks[m][k][dims/m]).

    Scale shape: ALL ``m`` subspace k-means train in ONE melted plan —
    the corpus explodes to (id, sub, subvector) rows once, assignment is
    a per-sub CASE ladder over driver-literal centroids (zero shuffle),
    and each update pass is a single groupBy(sub, cluster, dim) job whose
    map-side-combined exchange carries m×k×d partial rows per task. Job
    count is therefore 1 init + (n_assign−1) updates regardless of m —
    the sequential per-subspace form pays m× corpus scans per pass, which
    at 100 TB is the difference between 2 and 2m full reads. The final
    codes pivot is one hash agg on ``id`` (the m-way join chain it
    replaces was m−1 exchanges). Every number is identical to the
    per-subspace form: same lowest-k-id init, same fixed-point sums, same
    tie-breaks — the unrolled DuckDB oracle replays it bit-for-bit. PQ is
    the memory lever brute/IVF search sits on at 100 TB: 64 float32 dims
    (256 B) → m log2(k) bits (1 B here), so candidate scoring reads 256×
    less.
    """
    d_sub = dims // m
    sub_slices = F.array(
        *[F.slice(F.col(vec_col), mm * d_sub + 1, d_sub) for mm in range(m)]
    )
    melted = embeddings.select(
        F.col(id_col).alias("id"), F.posexplode(sub_slices).alias("sub", "v")
    ).select("id", "sub", _quantized(F.col("v")).alias("q"))

    # one init job: the k lowest-id vectors, sliced driver-side into every
    # subspace's initial centroids (floor-quantization commutes with the
    # slice, so these equal the per-subspace init exactly)
    init_rows = (
        embeddings.select(
            F.col(id_col).alias("id"), _quantized(F.col(vec_col)).alias("q")
        )
        .orderBy("id")
        .limit(k)
        .collect()
    )
    books: list[list[list[float]]] = [
        [
            [qv / _KM_SCALE for qv in r["q"][mm * d_sub : (mm + 1) * d_sub]]
            for r in init_rows
        ]
        for mm in range(m)
    ]
    # degenerate corpora (n < k, incl. n = 0) clamp to the vectors that
    # exist — graceful behavior only, outside any oracle-checked regime
    k = min(k, len(init_rows))
    if k == 0:
        empty_codes = embeddings.select(
            F.col(id_col).alias("id"),
            *[F.lit(0).cast("int").alias(f"code_{mm}") for mm in range(m)],
        ).limit(0)
        return empty_codes, [[] for _ in range(m)]

    def assign(frame: DataFrame) -> DataFrame:
        per_sub = []
        for mm in range(m):
            dists = [_sq_dist_to("q", c) for c in books[mm]]
            best_d, best_j = dists[0], F.lit(0)
            for j in range(1, k):
                cond = dists[j] < best_d
                best_j = F.when(cond, j).otherwise(best_j)
                best_d = F.when(cond, dists[j]).otherwise(best_d)
            per_sub.append(best_j)
        expr = F.when(F.col("sub") == 0, per_sub[0])
        for mm in range(1, m):
            expr = expr.when(F.col("sub") == mm, per_sub[mm])
        return frame.withColumn("cluster", expr.cast("int"))

    assigned = assign(melted)
    for _ in range(n_assign - 1):
        sums = (
            assigned.select("sub", "cluster", F.posexplode("q").alias("dim", "qx"))
            .groupBy("sub", "cluster", "dim")
            .agg(F.sum("qx").alias("s"), F.count("*").alias("cnt"))
            .collect()
        )
        by_key = {
            (r["sub"], r["cluster"], r["dim"]): (r["s"], r["cnt"]) for r in sums
        }
        books = [
            [
                [
                    float(by_key[(mm, j, i)][0])
                    / (by_key[(mm, j, i)][1] * float(_KM_SCALE))
                    for i in range(d_sub)
                ]
                if (mm, j, 0) in by_key
                else books[mm][j]  # empty cluster keeps its previous centroid
                for j in range(k)
            ]
            for mm in range(m)
        ]
        assigned = assign(melted)

    codes = assigned.groupBy("id").agg(
        *[
            F.max(F.when(F.col("sub") == mm, F.col("cluster")))
            .cast("int")
            .alias(f"code_{mm}")
            for mm in range(m)
        ]
    )
    return codes, books


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    probe_vec: list[float],
    k_top: int = 10,
    exclude_id: int | None = None,
) -> DataFrame:
    """Asymmetric distance computation (ADC): rank the whole corpus
    against one uncompressed probe using only its PQ codes —
    ``dist(q, x) ≈ Σ_m table_m[code_m(x)]`` where ``table_m[j]`` is the
    exact squared distance of the probe's m-th subvector to centroid j.

    The m×k distance table is computed ONCE on the driver and inlined as
    array literals, so scoring is a zero-shuffle map-only projection of
    m ``element_at`` lookups + an add chain — no per-row vector math at
    all. That is the entire point of PQ at 100 TB: the scan touches 1
    byte of codes per vector instead of 256 B of floats.
    """
    m = len(codebooks)
    if m == 0 or not codebooks[0]:
        # empty codebooks (trained on an empty corpus): nothing to rank
        return codes.select(
            "id",
            F.lit(0.0).alias("adc_dist"),
            F.lit(0).cast("int").alias("rank"),
        ).limit(0)
    d_sub = len(codebooks[0][0])
    tables = [
        [
            sum(
                (probe_vec[mm * d_sub + j] - c[j]) ** 2
                for j in range(d_sub)
            )
            for c in codebooks[mm]
        ]
        for mm in range(m)
    ]
    dist = None
    for mm in range(m):
        lookup = F.element_at(
            F.array(*[F.lit(float(t)) for t in tables[mm]]),
            F.col(f"code_{mm}") + 1,
        )
        dist = lookup if dist is None else dist + lookup
    out = codes.select("id", dist.alias("adc_dist"))
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    w = Window.orderBy(F.asc("adc_dist"), F.asc("id"))
    # global top-k: TakeOrderedAndProject shape (limit pushes the sort to
    # per-partition top-k + a k-row merge), not a full global sort
    return (
        out.orderBy(F.asc("adc_dist"), F.asc("id"))
        .limit(k_top)
        .withColumn("rank", F.row_number().over(w))
    )


def coarse_centroids(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    list_col: str = "label",
    dims: int = 64,
) -> DataFrame:
    """(list_id, centroid array<double>): the exact per-inverted-list mean
    via fixed-point component sums (order-free integers, so the centroid
    is bit-identical across engines and partitionings — same trick as
    :func:`kmeans`). One narrow posexplode + one (list, dim) agg."""
    q = embeddings.select(
        F.col(list_col).alias("list_id"), _quantized(F.col(vec_col)).alias("q")
    )
    sums = (
        q.select("list_id", F.posexplode("q").alias("dim", "qx"))
        .groupBy("list_id", "dim")
        .agg(F.sum("qx").alias("s"), F.count("*").alias("cnt"))
    )
    val = F.col("s").cast("double") / (
        F.col("cnt").cast("double") * F.lit(float(_KM_SCALE))
    )
    return sums.groupBy("list_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("dim"), val.alias("v")))),
            lambda st: st["v"],
        ).alias("centroid")
    )


def ivfadc_topk(
    embeddings: DataFrame,
    probe_vec: list[float],
    n_probe: int = 2,
    k_top: int = 10,
    m: int = 4,
    pq_k: int = 4,
    n_assign: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
    exclude_id: int | None = None,
) -> DataFrame:
    """Residual IVFADC — the FAISS IVFADC shape: PQ codebooks learn on
    RESIDUALS (vector − its inverted list's centroid), which concentrates
    the quantizer's budget on within-list variation; query time probes
    the ``n_probe`` nearest lists by exact L2-to-centroid, builds ONE
    distance table per (probed list, subspace) from the per-list probe
    residual, and ADC-scores only those lists' codes.

    Scale shape: centroids and codebooks are driver literals (n_lists×d
    and m×k×d_sub doubles — KBs); candidate scoring is a map-only CASE of
    ``element_at`` lookups over n_probe/n_lists of the corpus; no vector
    floats are read at query time. All arithmetic is deterministic IEEE
    replayed by the DuckDB oracle (fixed-point centroids + codebooks).
    """
    cents = coarse_centroids(embeddings, vec_col=vec_col, list_col=list_col, dims=dims)
    resid = embeddings.join(
        F.broadcast(cents), F.col(list_col) == F.col("list_id")
    ).select(
        F.col(id_col).alias("rid"),
        F.col(list_col).alias("rlist"),
        F.zip_with(
            F.col(vec_col), F.col("centroid"), lambda x, c: x.cast("double") - c
        ).alias("residual"),
    )
    codes, books = pq_encode(
        resid, m=m, k=pq_k, n_assign=n_assign, dims=dims,
        id_col="rid", vec_col="residual",
    )
    cent_map = {
        r["list_id"]: [float(v) for v in r["centroid"]]
        for r in cents.collect()  # bounded: one row per inverted list
    }
    probed = sorted(
        (sum((p - c) ** 2 for p, c in zip(probe_vec, cvec)), lid)
        for lid, cvec in cent_map.items()
    )[:n_probe]
    probe_lists = [lid for _, lid in probed]
    d_sub = dims // m
    # per-(list, subspace) distance tables from the per-list probe residual
    tables = {
        lid: [
            [
                sum(
                    (
                        (probe_vec[mm * d_sub + j] - cent_map[lid][mm * d_sub + j])
                        - c[j]
                    )
                    ** 2
                    for j in range(d_sub)
                )
                for c in books[mm]
            ]
            for mm in range(m)
        ]
        for lid in probe_lists
    }
    labeled = codes.join(  # pq_encode returns codes keyed "id"
        embeddings.select(
            F.col(id_col).alias("id"), F.col(list_col).alias("rlist")
        ),
        "id",
    ).filter(F.col("rlist").isin(probe_lists))
    def list_term(lid: int, mm: int) -> F.Column:
        arr = F.array(*[F.lit(float(t)) for t in tables[lid][mm]])
        return F.element_at(arr, F.col(f"code_{mm}") + 1)

    dist = None
    for mm in range(m):
        lookup = list_term(probe_lists[-1], mm)
        for lid in reversed(probe_lists[:-1]):
            lookup = F.when(F.col("rlist") == lid, list_term(lid, mm)).otherwise(
                lookup
            )
        dist = lookup if dist is None else dist + lookup
    out = labeled.select("id", dist.alias("adc_dist"))
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    w = Window.orderBy(F.asc("adc_dist"), F.asc("id"))
    return (
        out.orderBy(F.asc("adc_dist"), F.asc("id"))
        .limit(k_top)
        .withColumn("rank", F.row_number().over(w))
    )


def semantic_dedup_pairs(
    embeddings: DataFrame,
    assignments: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: candidate pairs come ONLY
    from the same k-means cluster (the cluster key is the join/shuffle
    key), then an exact cosine verify — at corpus scale the pair space is
    Σ|cluster|² instead of n², and each cluster's pairs compute
    independently in parallel. Returns (cluster, id_a, id_b).
    """
    side = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    ).join(assignments, "id")
    a = side.select(
        F.col("cluster"),
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = side.select(
        F.col("cluster"),
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("cluster", "id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .select("cluster", "id_a", "id_b")
    )


def cosine_scores_arrow(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bulk cosine scoring against one query via ``mapInArrow`` — the
    batch-inference shape: each Arrow RecordBatch's list<float> column is
    reinterpreted as a contiguous (rows × dim) matrix with ZERO copies
    (``.values`` on the flat buffer), scored with one numpy matmul, and
    returned as a new batch. No pandas materialization, no per-row Python.

    This is the third Arrow entry point next to grouped ``applyInArrow``
    (operators/grouped.py) and pandas ``applyInPandas`` — use it when the
    computation is per-row but vectorizes across the batch (embedding
    scoring, feature transforms over the whole corpus).

    Scale: map-only — no shuffle, no skew; the query vector rides the
    serialized closure (KBs). Rows with a null or wrong-length vector are
    dropped (malformed embeddings must not kill a 100 TB scoring pass).
    """
    import numpy as np

    dim = len(query_vec)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt(np.dot(q, q)))

    def score(batches):
        import pyarrow as pa

        for b in batches:
            ids = b.column(id_col)
            vecs = b.column(vec_col)
            lengths = vecs.value_lengths().to_numpy(zero_copy_only=False)
            ok = (~ids.is_null().to_numpy(zero_copy_only=False)) & (
                ~vecs.is_null().to_numpy(zero_copy_only=False)
            ) & (lengths == dim)
            if not ok.all():
                b = b.filter(pa.array(ok))
                ids, vecs = b.column(id_col), b.column(vec_col)
            if b.num_rows == 0:
                continue
            mat = vecs.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64
            ).reshape(b.num_rows, dim)
            norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            scores = (mat @ q) / (norms * qn)
            yield pa.record_batch(
                [ids, pa.array(scores, type=pa.float64())],
                names=[id_col, "cosine"],
            )

    return embeddings.select(id_col, vec_col).mapInArrow(
        score, schema=f"{id_col} long, cosine double"
    )


def incremental_topk_update(
    base_topk: DataFrame,
    new_embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental top-k maintenance (the EDBT'20 incremental-top-k
    shape): when a NEW batch of vectors lands, update each query's top-k
    WITHOUT rescoring the historical corpus — score queries × new batch
    only, union with the stored top-k, re-rank, cut at k.

    Work ∝ |queries| × |batch| + |queries| × k; the old corpus is never
    read. Correctness invariant (oracle-checked): incrementally
    maintained top-k == full recompute over corpus ∪ batch — cosine is a
    per-pair score, so the true top-k over the union can only come from
    (old top-k ∪ new-batch scores)."""
    fresh = cosine_topk(new_embeddings, queries, k=k, id_col=id_col, vec_col=vec_col)
    merged = base_topk.select(
        "query_id", "neighbor_id", "cosine"
    ).unionByName(fresh.select("query_id", "neighbor_id", "cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _int_dot(a: F.Column, b: F.Column) -> F.Column:
    """Exact BIGINT dot product of two int-code arrays (JVM fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def int_vector_near_pairs(
    feats: DataFrame,
    max_d2: int,
    dims: int,
    id_col: str = "media_id",
    vec_col: str = "fi",
    n_bands: int = 4,
) -> DataFrame:
    """Exact near-neighbor pairs over integer feature vectors:
    (id_a, id_b, d2) for every pair with squared L2 distance <= max_d2,
    id_a < id_b — same rows as the naive all-pairs join, bit-for-bit,
    WITHOUT the cartesian product.

    Banded grid blocking (lossless, pigeonhole): the ``dims`` coordinates
    split into ``n_bands`` contiguous bands; any pair within ``max_d2``
    total has at least one band whose partial squared distance is
    <= max_d2 / n_bands, so every coordinate in that band differs by at
    most r = floor(sqrt(max_d2 / n_bands)). Quantizing that band's
    coordinates to grid cells of width r + 1 puts the pair in cells that
    differ by <= 1 per coordinate — so probing the 3^dims_per_band
    neighbor-cell offsets of ONE side finds every true pair. Candidates
    flow through an equi-join on (band, cell...), then the exact integer
    d2 verify kills false candidates. Recall is exactly 1.

    Shape at 100 TB: probe side explodes x(n_bands * 3^dims_per_band)
    (x36 at the 8-dim/4-band default), build side x n_bands — both
    narrow maps; the single shuffle is the (band, cells) equi-join whose
    cost is Σ bucket_pairs, not n². Pruning power scales with threshold
    tightness (cells per dim ≈ range / sqrt(max_d2/n_bands)); production
    perceptual-hash thresholds are far tighter than this demo's, giving
    correspondingly finer grids.
    """
    dpb, rem = divmod(dims, n_bands)
    assert rem == 0, "dims must divide evenly into n_bands"
    w = int((max_d2 // n_bands) ** 0.5) + 1

    def cells(b: int, offs: tuple[int, ...] | None = None) -> list[F.Column]:
        out = []
        for j in range(dpb):
            c = F.floor(F.element_at(F.col(vec_col), b * dpb + j + 1) / F.lit(w))
            if offs is not None:
                c = c + F.lit(offs[j])
            out.append(c.cast("long").alias(f"c{j}"))
        return out

    import itertools

    probe_structs = [
        F.struct(F.lit(b).alias("band"), *cells(b, offs))
        for b in range(n_bands)
        for offs in itertools.product((-1, 0, 1), repeat=dpb)
    ]
    build_structs = [
        F.struct(F.lit(b).alias("band"), *cells(b)) for b in range(n_bands)
    ]
    key = ["band"] + [f"c{j}" for j in range(dpb)]
    # ids ONLY through the exploded join + distinct — carrying the vector
    # payloads through the x36 explode and the pair shuffle would multiply
    # shuffled bytes by redundant array copies; the verify re-fetches each
    # side's vector with one id-keyed join instead
    probe = feats.select(
        F.col(id_col).alias("id_a"),
        F.explode(F.array(*probe_structs)).alias("k"),
    ).select("id_a", *[F.col(f"k.{c}").alias(c) for c in key])
    build = feats.select(
        F.col(id_col).alias("id_b"),
        F.explode(F.array(*build_structs)).alias("k"),
    ).select("id_b", *[F.col(f"k.{c}").alias(c) for c in key])
    pairs = (
        probe.join(build, key)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    d2 = F.aggregate(
        F.zip_with(F.col("fa"), F.col("fb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(
            feats.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("fa")),
            "id_a",
        )
        .join(
            feats.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("fb")),
            "id_b",
        )
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(max_d2))
        .select("id_a", "id_b", "d2")
    )


def kcenter_coreset(embeddings: DataFrame, k: int = 4) -> DataFrame:
    """Greedy k-center (Gonzalez maximin) coreset selection over
    int8-quantized vectors → ``(rank, vec_id, d2)``: the k points that
    best cover the corpus under squared-L2, each row recording the
    maximin distance that got it picked (the coverage radius before it
    joined).

    Training-data selection at scale: every round is one broadcast of the
    single newly-chosen center (a 1-row frame — never the corpus), one
    map-side distance update using d² = |p|² + |c|² − 2⟨p,c⟩ (self-norms
    precomputed once), and one TakeOrdered(1) for the argmax — no global
    sort, no driver-side vector math. Distances are exact BIGINT (int8
    codes), so selection order is total (tie → min vec_id) and the whole
    greedy trace replays as unrolled SQL CTEs in any engine.
    """
    codes = quantize_int8(embeddings).select("vec_id", "codes")
    pts = codes.withColumn("sq", _int_dot(F.col("codes"), F.col("codes")))
    center = (
        pts.filter(F.col("vec_id") == 0)
        .select(
            F.col("vec_id").alias("c_id"),
            F.col("codes").alias("c_codes"),
            F.col("sq").alias("c_sq"),
        )
        .localCheckpoint(eager=True)
    )
    chosen = [(1, center, F.lit(0).cast("long"))]
    d2_to_center = (
        F.col("sq")
        + F.col("c_sq")
        - F.lit(2) * _int_dot(F.col("codes"), F.col("c_codes"))
    )
    state = (
        pts.crossJoin(F.broadcast(center))
        .select("vec_id", "codes", "sq", d2_to_center.alias("mind"))
        .localCheckpoint(eager=True)
    )
    for rank in range(2, k + 1):
        center = (
            state.orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .select(
                F.col("vec_id").alias("c_id"),
                F.col("codes").alias("c_codes"),
                F.col("sq").alias("c_sq"),
                F.col("mind").alias("c_mind"),
            )
            .localCheckpoint(eager=True)
        )
        chosen.append((rank, center, F.col("c_mind")))
        state = (
            state.crossJoin(F.broadcast(center.drop("c_mind")))
            .select(
                "vec_id",
                "codes",
                "sq",
                F.least(F.col("mind"), d2_to_center).alias("mind"),
            )
            .localCheckpoint(eager=True)
        )
    out = None
    for rank, center, d2 in chosen:
        row = center.select(
            F.lit(rank).cast("int").alias("rank"),
            F.col("c_id").alias("vec_id"),
            d2.alias("d2"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def maxsim_scores_arrow(
    codes_df: DataFrame,
    query_codes: list[tuple[int, list[int]]],
    subvecs: int = 8,
    subdim: int = 8,
) -> DataFrame:
    """Vectorized late-interaction MaxSim over int8 codes via
    ``mapInArrow`` → ``(query_id, neighbor_id, score)``: each corpus
    batch is reshaped to (rows × subvecs × subdim) int64 and scored
    against ALL queries with one einsum — Σᵢ maxⱼ ⟨qᵢ, dⱼ⟩ per
    (query, doc) pair, exact integer arithmetic, bit-identical to the
    JVM HOF scorer and the SQL oracle.

    This is the throughput path the HOF version trades away: higher-order
    lambdas run interpreted (outside whole-stage codegen), so per-pair
    scoring costs ~512 boxed ops; one numpy einsum amortizes that across
    the whole Arrow batch. Map-only — queries ride the closure (KBs), the
    corpus never shuffles; the only exchange left is the final top-k
    window upstream.
    """
    import numpy as np

    dim = subvecs * subdim
    qids = np.asarray([q[0] for q in query_codes], dtype=np.int64)
    qmat = np.asarray([q[1] for q in query_codes], dtype=np.int64).reshape(
        len(query_codes), subvecs, subdim
    )

    def score(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            mat = (
                b.column("codes")
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .reshape(b.num_rows, subvecs, subdim)
            )
            # (q, n, i, j) integer dots, max over doc subvecs, sum over
            # query subvecs — all int64, no float ever
            dots = np.einsum("qik,njk->qnij", qmat, mat)
            scores = dots.max(axis=3).sum(axis=2)
            qq, nn = np.meshgrid(np.arange(len(qids)), np.arange(b.num_rows),
                                 indexing="ij")
            yield pa.record_batch(
                [
                    pa.array(qids[qq.ravel()], type=pa.int64()),
                    pa.array(ids[nn.ravel()], type=pa.int64()),
                    pa.array(scores.ravel(), type=pa.int64()),
                ],
                names=["query_id", "neighbor_id", "score"],
            )

    assert all(len(q[1]) == dim for q in query_codes)
    return codes_df.select("vec_id", "codes").mapInArrow(
        score, schema="query_id long, neighbor_id long, score long"
    )


def write_ivf_partitioned(
    embeddings: DataFrame,
    path: str,
    list_col: str = "label",
) -> None:
    """Materialize the IVF index as list-partitioned parquet
    (``path/label=<list>/...``): the storage layout that turns a probe
    into PARTITION PRUNING — a 2-of-10-lists probe reads 20% of the
    files, enforced by the catalog, not by a post-scan filter. At 100 TB
    this (plus per-list file sizing) IS the index build."""
    embeddings.write.mode("overwrite").partitionBy(list_col).parquet(path)


def ivf_topk_from_partitioned(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
    schema=None,
):
    """IVF probe over the partitioned index written by
    :func:`write_ivf_partitioned`: probe lists are chosen exactly like
    :func:`ivf_topk` (broadcast medoid reps), but the candidate scan
    filters ``list_col IN (probed)`` against the PARTITIONED store — the
    plan shows PartitionFilters, so unprobed lists are never read.

    The probed list set is collected to the driver first (bounded:
    ≤ queries × n_probe small integers) because partition pruning needs a
    LITERAL IN-list at planning time — a join can't prune partitions
    (only runtime DPP could, and a deterministic literal beats relying on
    it). Returns the same rows as ivf_topk over the same data.

    ``schema``: pass the corpus schema to make the read robust to an
    index built from an EMPTY corpus (zero partition dirs → Spark cannot
    infer a schema; with the schema declared the probe just returns no
    candidates).
    """
    reader = spark.read.schema(schema) if schema is not None else spark.read
    full = reader.parquet(path)
    w_rep = Window.partitionBy(list_col).orderBy(F.asc(id_col))
    reps = (
        full.withColumn("_rn", F.row_number().over(w_rep))
        .filter(F.col("_rn") == 1)
        .select(F.col(list_col).alias("rep_list"), F.col(vec_col).alias("rep_vec"))
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    probe_rank = Window.partitionBy("query_id").orderBy(
        F.desc("rep_cos"), F.asc("rep_list")
    )
    probes = (
        qs.join(F.broadcast(reps))
        .select(
            "query_id",
            "qvec",
            "qnorm",
            "rep_list",
            (
                _dot(F.col("rep_vec"), F.col("qvec"))
                / (_norm(F.col("rep_vec")) * F.col("qnorm"))
            ).alias("rep_cos"),
        )
        .withColumn("_pr", F.row_number().over(probe_rank))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qvec", "qnorm", F.col("rep_list").alias("probe_list"))
    )
    probe_lists = sorted(
        {r["probe_list"] for r in probes.select("probe_list").distinct().collect()}
    )
    cands = (
        full.filter(F.col(list_col).isin(probe_lists))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("vnorm"),
            F.col(list_col).alias("probe_list"),
        )
        .join(F.broadcast(probes), "probe_list")
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cands.filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("vec"), F.col("qvec"))
                / (F.col("vnorm") * F.col("qnorm"))
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
