"""Beyond-parity queries: training-data operators, TPC-H-style analytics on
the native testdata tables, as-of joins, and sessionization.

Each entry pairs a Spark callable (spark, sf_dir) → DataFrame with a DuckDB
oracle statement over the same parquet views. Float-valued outputs avoid
accumulation-order sensitivity: sums are DECIMAL (exact, order-free) or
single-division ratios of integers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup, scale, simsearch, text
from .session import apply_runtime_confs

Query = Callable[[SparkSession, str], DataFrame]


# Shingles are the dominant subplan of the dedup family and are referenced
# up to 4× inside ONE query (signatures, sizes, both sides of the verify
# join) plus across three queries — Catalyst recomputes each reference, so
# persist once per (session, sf_dir). MEMORY_AND_DISK: spills, never OOMs.
# On a real 100 TB run this frame is the one you'd checkpoint to parquet.
_shingle_cache: dict[tuple[str, str], DataFrame] = {}


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _shingle_cache:
        docs = _spread(_read(spark, sf_dir, "documents"))
        # r8 (VERDICT r7 item 2): the r7 _spread left the CACHED frame at
        # 32 tiny partitions, taxing every downstream read of the cache
        # with 32-task stages (dedup_minhash_lsh 0.54 -> 0.69 s). The
        # shingling itself still computes 32-way (the spread above);
        # REBALANCE then lets AQE size the cached partitions to the
        # advisory bytes — ~5 partitions at sf0.1, thousands at real
        # scale — so read-side task count tracks data, not core count
        # (§2.2 fewer/larger partitions; interleaved A/B: 32-way cache
        # 2.7-5.9 s vs compacted 2.0-3.1 s on the lsh pipeline).
        _shingle_cache[key] = (
            dedup.word_shingles(docs, n=3).hint("rebalance").persist()
        )
    return _shingle_cache[key]


# LSH candidate pairs are consumed by two queries (the verify and the full
# cluster pipeline) and are tiny (bucket collisions only) — persist the
# frame, not just the plan, so the minhash re-derivation is paid once.
_cand_cache: dict[tuple[str, str], DataFrame] = {}


def _lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _cand_cache:
        sigs = dedup.minhash_signatures(_shingles(spark, sf_dir), num_hashes=16)
        _cand_cache[key] = dedup.lsh_candidate_pairs(
            sigs, bands=4, rows_per_band=4
        ).persist()
    return _cand_cache[key]


def _spread(df: DataFrame) -> DataFrame:
    """Single shared implementation since r8 (r7 ADVICE: this helper was
    duplicated in synth.py while two other modules delegated here —
    partitioning policy now lives in one place with a per-session probe
    memo). See :func:`operators.scale.spread_single_split`."""
    return scale.spread_single_split(df)


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which the Spark parquet
        # reader rejects; read nanos as long and truncate to micros with
        # INTEGER division — `ns / 1000` through double loses precision
        # (epoch-nanos exceed 2^53) and drifts ±1µs off the DuckDB oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# dedup family (documents table)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return dedup.exact_duplicate_groups(docs).orderBy("text_hash")


def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return dedup.fingerprint(docs).orderBy("id")


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir)
    cands = _lsh_candidates(spark, sf_dir)
    return dedup.jaccard_pairs(sh, min_jaccard=0.2, candidates=cands).orderBy(
        "id_a", "id_b"
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup pipeline: shingle → minhash → LSH → verify → connected
    components → canonical pick (what a 100 TB dedup job actually emits)."""
    docs = _read(spark, sf_dir, "documents")
    sh = _shingles(spark, sf_dir)
    cands = _lsh_candidates(spark, sf_dir)
    pairs = dedup.jaccard_pairs(sh, min_jaccard=0.2, candidates=cands)
    ids = docs.select(F.col("doc_id").alias("id"))
    return dedup.duplicate_clusters(pairs, ids).orderBy("id")


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir)
    return dedup.jaccard_pairs(sh, min_jaccard=0.2).orderBy("id_a", "id_b")


def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-Jaccard join via lossless prefix filtering — the
    deterministic complement to MinHash-LSH (operators/dedup.py::
    prefix_filter_pairs). The oracle verifies exhaustively; prefix
    filtering must reproduce it bit-for-bit."""
    docs = _read(spark, sf_dir, "documents")
    return dedup.prefix_filter_pairs(docs, min_jaccard_pct=85).orderBy(
        "id_a", "id_b"
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r8 (VERDICT r7 item 2): NO _spread here — the 24-bit signature pass
    # is cheap enough that the extra exchange costs more than the
    # parallelism buys on the benched count() action (interleaved A/B at
    # sf0.1: 0.66-0.79 s without vs 1.0-1.3 s with). The heavy 48/64-bit
    # pair queries below keep their spread (their per-token md5 work
    # dwarfs one exchange; 10x tier evidence in OPTIMIZATION_r07.md).
    docs = _read(spark, sf_dir, "documents")
    return dedup.simhash(docs).orderBy("id")


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_read(spark, sf_dir, "documents"))
    return dedup.simhash_near_pairs(dedup.simhash(docs), max_hamming=6).orderBy(
        "id_a", "id_b"
    )


def q_dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production append-only scenario: docs with
    doc_id % 10 == 0 arrive as today's batch; the rest are the indexed
    corpus whose LSH band keys are already stored. The batch's band keys
    (broadcast) probe the corpus index by equi-join, candidates verify
    with exact shingle Jaccard, and only verified (batch, corpus) dup
    links are emitted — corpus data is never shuffled and batch cost is
    independent of corpus size (operators/dedup.py::
    incremental_lsh_candidates). Complements incremental_dedup_pairs
    (curation_queries.py), which exact-joins the batch's shingles against
    the corpus' shingle inverted index instead of a stored LSH index —
    exact recall at any threshold but shingle-join cost; this variant is
    the constant-work-per-batch path once a corpus index exists."""
    sh = _shingles(spark, sf_dir)
    sigs = dedup.minhash_signatures(sh, num_hashes=16)
    batch_sigs = sigs.filter(F.col("id") % 10 == 0)
    corpus_sigs = sigs.filter(F.col("id") % 10 != 0)
    cands = dedup.incremental_lsh_candidates(corpus_sigs, batch_sigs)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    shared = (
        cands.join(
            sh.select(F.col("id").alias("batch_id"), "shingle"), "batch_id"
        )
        .join(
            sh.select(F.col("id").alias("corpus_id"), "shingle"),
            ["corpus_id", "shingle"],
        )
        .groupBy("batch_id", "corpus_id")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(
            sizes.select(F.col("id").alias("batch_id"), F.col("n").alias("n_b")),
            "batch_id",
        )
        .join(
            sizes.select(F.col("id").alias("corpus_id"), F.col("n").alias("n_c")),
            "corpus_id",
        )
        .select(
            "batch_id",
            "corpus_id",
            "shared",
            (F.col("n_b") + F.col("n_c") - F.col("shared")).alias("union_size"),
            (
                F.col("shared").cast("double")
                / (F.col("n_b") + F.col("n_c") - F.col("shared"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
        .orderBy("batch_id", "corpus_id")
    )


def q_dedup_simhash48_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-width SimHash config: 48-bit signature, Hamming <= 3 →
    4 pigeonhole bands of 12 bits each, i.e. 4096-way band buckets. This
    is the selectivity regime the banded join is built for (the 24-bit
    demo config has 3-4-bit bands); wider signature + tighter threshold
    is exactly how a pretraining-dedup deployment runs SimHash."""
    docs = _spread(_read(spark, sf_dir, "documents"))
    sigs = dedup.simhash(docs, bits=48)
    return dedup.simhash_near_pairs(sigs, max_hamming=3, bits=48).orderBy(
        "id_a", "id_b"
    )


def q_dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document verbatim-span coverage (substring-dedup /
    memorization-risk audit): per doc, the fraction of tokens inside
    5-gram spans that also appear verbatim in at least one other
    document (operators/dedup.py::repeated_span_coverage)."""
    docs = _read(spark, sf_dir, "documents")
    return dedup.repeated_span_coverage(docs, n=5).orderBy("id")


def q_dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-width config simhash_near_pairs' docstring prescribes for
    production: 64-bit signature, Hamming <= 3 → 4 pigeonhole bands of 16
    bits — 65536-way band buckets, the selectivity that keeps Σbucket²
    sub-quadratic at corpus scale (benched at 10× in bench.py's scale
    tier). Signature bits 60–63 come from a second md5 word so every band
    carries real hash entropy."""
    docs = _spread(_read(spark, sf_dir, "documents"))
    sigs = dedup.simhash(docs, bits=64)
    return dedup.simhash_near_pairs(sigs, max_hamming=3, bits=64).orderBy(
        "id_a", "id_b"
    )


from .sqlfrag import (  # noqa: E402
    _BANDS_SQL,
    _JACCARD_CORE_SQL,
    _MINHASH_SQL,
    _NORM_SQL,
    _SHINGLES_SQL,
    _TOKS_SQL,
)

def _embedding_lsh_oracle(n_bands: int, band_bits: int, threshold: float) -> str:
    """DuckDB replay of _embedding_lsh_near_dup: hyperplane sign buckets →
    band-key collision candidates → exact cosine verify. Bit 63 of the
    packed bucket needs its two's-complement value spelled out (DuckDB
    raises on 1::BIGINT << 63); the band extraction's arithmetic shift is
    corrected by the mask, same as the Spark side."""
    n_planes = n_bands * band_bits
    mask = (1 << band_bits) - 1
    return f"""
WITH weights AS (
  SELECT p.plane, d.dim,
    ((('0x' || substr(md5(p.plane || ':' || d.dim), 1, 15))::BIGINT % 2000) - 1000) AS w
  FROM (SELECT unnest(generate_series(0, {n_planes - 1})) AS plane) p,
       (SELECT unnest(generate_series(0, 63)) AS dim) d
),
comps AS (
  -- exact int64 dot (components fixed-point 1e-6, weights integral 1e-3):
  -- sign cannot depend on accumulation order, matching the Spark side
  SELECT e.vec_id AS id, w.plane,
    sum(floor(e.x::DOUBLE * 1000000)::BIGINT * w.w) AS dot
  FROM (SELECT vec_id, embedding[d.dim + 1]::DOUBLE AS x, d.dim
        FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS dim) d) e
  JOIN weights w ON e.dim = w.dim
  GROUP BY e.vec_id, w.plane
),
buckets AS (
  SELECT id, sum(CASE WHEN dot > 0 THEN
      (CASE WHEN plane = 63 THEN (-9223372036854775807::BIGINT - 1)
            ELSE (1::BIGINT << plane::INT) END)
    ELSE 0 END)::BIGINT AS bucket
  FROM comps GROUP BY id
),
bands AS (
  SELECT bu.id, bd.band, (bu.bucket >> (bd.band * {band_bits})) & {mask} AS key
  FROM buckets bu, (SELECT unnest(generate_series(0, {n_bands - 1})) AS band) bd
),
cands AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.id < r.id
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT c.id_a, c.id_b
FROM cands c
JOIN e a ON c.id_a = a.vec_id
JOIN e b ON c.id_b = b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= {threshold}
ORDER BY id_a, id_b"""


def _simhash_sql(bits: int) -> str:
    # bits > 60 draw from a second md5 over tok || '#2', mirroring
    # operators/dedup.py::simhash exactly
    return f"""
doc_toks AS (
  SELECT doc_id AS id, {_TOKS_SQL} AS toks FROM documents
),
tok_hash AS (
  SELECT id, ('0x' || substr(md5(t.tok), 1, 15))::BIGINT AS h,
         ('0x' || substr(md5(t.tok || '#2'), 1, 15))::BIGINT AS h2
  FROM doc_toks, unnest(toks) AS t(tok)
),
bit_deltas AS (
  SELECT id, b.bit,
    CASE WHEN (CASE WHEN b.bit < 60 THEN (h >> b.bit)
                    ELSE (h2 >> (b.bit - 60)) END) & 1 = 1
         THEN 1 ELSE -1 END AS delta
  FROM tok_hash, unnest(generate_series(0, {bits - 1})) AS b(bit)
),
bit_sums AS (SELECT id, bit, sum(delta) AS s FROM bit_deltas GROUP BY id, bit),
simhashes AS (
  -- bit 63 is the sign bit: DuckDB raises on 1::BIGINT << 63, so emit the
  -- two's-complement value directly (Spark's shiftleft(1L, 63) == MIN_LONG)
  SELECT id, sum(CASE WHEN s > 0 THEN
      (CASE WHEN bit = 63 THEN (-9223372036854775807::BIGINT - 1)
            ELSE (1::BIGINT << bit) END)
    ELSE 0 END)::BIGINT AS simhash
  FROM bit_sums GROUP BY id
)"""


_SIMHASH_SQL = _simhash_sql(dedup.SIMHASH_BITS)

# ---------------------------------------------------------------------------
# text analysis family
# ---------------------------------------------------------------------------


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(_read(spark, sf_dir, "documents")).orderBy("id")


def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(_read(spark, sf_dir, "documents")).orderBy("id")


def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(_read(spark, sf_dir, "documents")).orderBy("id")


def q_text_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal as a zero-shuffle map-only projection."""
    return text.ngram_repetition(_read(spark, sf_dir, "documents"), n=2).orderBy(
        "id"
    )


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.chunk_documents(
        _read(spark, sf_dir, "documents"), chunk_chars=200, overlap=50
    ).orderBy("id", "chunk_idx")


def q_text_bpe_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bpe_token_estimate(_read(spark, sf_dir, "documents")).orderBy("id")


def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.vocab_top_terms(_read(spark, sf_dir, "documents"), k=100)


_STOPLIST_SQL = "[" + ", ".join(f"'{s}'" for s in text.EN_STOPWORDS) + "]"

# ---------------------------------------------------------------------------
# similarity search family (embeddings table)
# ---------------------------------------------------------------------------


def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization (4× memory/shuffle reduction for ANN at
    scale); codes verified bit-exact via per-vector checksum — floor-based
    mapping is reproducible in any SQL engine."""
    emb = _read(spark, sf_dir, "embeddings")
    q = simsearch.quantize_int8(emb)
    return q.select(
        "vec_id",
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("code_sum"),
        F.element_at("codes", 1).alias("first_code"),
    ).orderBy("vec_id")


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(_read(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return (
        simsearch.cosine_topk(emb, queries, k=10)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def q_ann_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental top-k maintenance: base top-k over the historical
    corpus (vec_id %5 != 0), then the %5 == 0 batch lands and updates it
    WITHOUT rescoring history. The oracle is the full recompute over the
    whole corpus — incremental == recompute is the maintenance
    invariant."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    base = simsearch.cosine_topk(old, queries, k=10)
    out = simsearch.incremental_topk_update(base, new, queries, k=10)
    return out.select("query_id", "neighbor_id", "rank").orderBy(
        "query_id", "rank"
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return simsearch.ivf_topk(emb, queries, k=10, n_probe=2).orderBy(
        "query_id", "rank"
    )


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    return simsearch.lsh_bucket_signatures(emb, num_planes=8).orderBy("id")


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    return simsearch.embedding_near_dup(emb, threshold=0.4).orderBy("id_a", "id_b")


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB embedding-dedup path: banded random-hyperplane LSH →
    candidate pairs → exact cosine verify restricted to candidates.

    16 sign-bit planes split into 4 bands × 4 bits; a pair is a candidate
    if ANY band key collides (standard LSH banding — recall rises with
    band count, candidate volume stays Σ|band-bucket|², never n²). The
    verify is exact cosine over candidates only, so precision is 1.

    Plan shape (audit-enforced, not allowlisted): band self-join and both
    vector-attach joins are hash joins; no BroadcastNestedLoopJoin.
    """
    return _embedding_lsh_near_dup(
        spark, sf_dir, n_bands=4, band_bits=4, threshold=0.4
    )


def _embedding_lsh_near_dup(
    spark: SparkSession,
    sf_dir: str,
    n_bands: int,
    band_bits: int,
    threshold: float,
) -> DataFrame:
    emb = _spread(_read(spark, sf_dir, "embeddings"))
    # arithmetic shift + mask extracts the band bits correctly even when
    # plane 63 set the sign bit (the fill bits are masked away)
    bands = _embedding_band_keys(emb, n_bands, band_bits)
    left = bands.select(F.col("id").alias("id_a"), "band", "key")
    right = bands.select(F.col("id").alias("id_b"), "band", "key")
    candidates = left.join(right, ["band", "key"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    return simsearch.embedding_near_dup(
        emb, threshold=threshold, candidates=candidates
    ).orderBy("id_a", "id_b")


def _embedding_band_keys(emb: DataFrame, n_bands: int, band_bits: int) -> DataFrame:
    """(id, band, key) banded hyperplane sign keys — the stored index
    row format for the append-only embedding-dedup scenario."""
    buckets = simsearch.lsh_bucket_signatures(emb, num_planes=n_bands * band_bits)
    keys = F.array(
        *[
            F.shiftright(F.col("bucket"), b * band_bits).bitwiseAND(
                F.lit((1 << band_bits) - 1)
            )
            for b in range(n_bands)
        ]
    )
    return buckets.select("id", F.posexplode(keys).alias("band", "key"))


def q_dedup_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding dedup — the production append-only scenario,
    the embedding-space sibling of ``dedup_incremental_batch``: vectors
    with vec_id % 10 == 0 arrive as today's batch; the rest are the
    indexed corpus whose banded hyperplane keys are already stored. The
    batch's band keys are BROADCAST (a daily increment is MBs even when
    the corpus index is TBs), the corpus index streams map-side through
    the equi-join and is never shuffled, and only collision candidates
    pay the exact-cosine verify — batch cost independent of corpus size.
    Hyperplanes derive deterministically from (plane, dim), so index rows
    written yesterday and probe keys computed today agree by construction.
    """
    emb = _read(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    n_bands, band_bits = 4, 4
    cands = (
        _embedding_band_keys(corpus, n_bands, band_bits)
        .select(F.col("id").alias("corpus_id"), "band", "key")
        .join(
            F.broadcast(
                _embedding_band_keys(batch, n_bands, band_bits).select(
                    F.col("id").alias("batch_id"), "band", "key"
                )
            ),
            ["band", "key"],
        )
        .select("batch_id", "corpus_id")
        .distinct()
    )
    bv = batch.select(
        F.col("vec_id").alias("batch_id"),
        F.col("embedding").alias("vb"),
        simsearch._norm(F.col("embedding")).alias("nb"),
    )
    cv = corpus.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("vc"),
        simsearch._norm(F.col("embedding")).alias("nc"),
    )
    cos = simsearch._dot(F.col("vb"), F.col("vc")) / (F.col("nb") * F.col("nc"))
    return (
        cands.join(bv, "batch_id")
        .join(cv, "corpus_id")
        .select("batch_id", "corpus_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.4)
        .select("batch_id", "corpus_id")
        .orderBy("batch_id", "corpus_id")
    )


def q_ann_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the banded-LSH dedup against the exhaustive
    ground truth — the audit that justifies (n_bands, band_bits) before
    trusting the candidate restriction at scale: one row (n_true,
    n_found, recall_bps). Found pairs are a SUBSET of true pairs by
    construction (the verify is exact), so precision is always 1 and
    only recall needs measuring. Composes the exhaustive baseline, so
    this is a small-n audit — at production scale recall is estimated on
    a sampled slice instead.
    """
    emb = _read(spark, sf_dir, "embeddings")
    true_pairs = simsearch.embedding_near_dup(emb, threshold=0.4)
    found = _embedding_lsh_near_dup(
        spark, sf_dir, n_bands=4, band_bits=4, threshold=0.4
    )
    n_true = true_pairs.agg(F.count(F.lit(1)).alias("n_true"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    return n_true.crossJoin(n_found).select(
        "n_true",
        "n_found",
        F.expr(
            "CASE WHEN n_true = 0 THEN 10000 "
            "ELSE CAST(n_found * 10000 DIV n_true AS BIGINT) END"
        ).alias("recall_bps"),
    )


def q_dedup_embedding_lsh90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-selectivity embedding dedup: 64 hyperplanes in 4
    bands × 16 bits (65536-way band buckets), verify threshold 0.9 — the
    regime a real near-dup pass runs at (0.9+ cosine ≈ same document
    re-encoded; 0.4 is topical similarity, not duplication). Cost profile
    at scale: signature computation is linear in corpus size and
    dominates; candidates ≈ 4·n²/65536 stay sub-quadratic until n
    approaches the bucket count, at which point add planes per band —
    bucket count must grow with the corpus (benched at 10× in bench.py's
    scale tier)."""
    return _embedding_lsh_near_dup(
        spark, sf_dir, n_bands=4, band_bits=16, threshold=0.9
    )


# ---------------------------------------------------------------------------
# TPC-H-style analytics on the native tables (DECIMAL-exact aggregation)
# ---------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary. DECIMAL sums — exact and
    accumulation-order-independent, so hash-safe across engines."""
    li = _read(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
                .cast("decimal(38,8)")
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped-order revenue (join + agg + top-k)."""
    cust = _read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(38,8)")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation through a 5-way star join; small
    dims broadcast."""
    region = _read(spark, sf_dir, "region")
    nation = _read(spark, sf_dir, "nation")
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    sup = _read(spark, sf_dir, "supplier")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(38,8)")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(sup.withColumnRenamed("s_nationkey", "sn"), li["l_suppkey"] == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("sn"))
        .join(F.broadcast(nation), F.col("sn") == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_tpch_q4_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join. The semi join never
    materializes matched lineitems (first-match short-circuit), so the
    probe side streams at full scan speed — at 100 TB this is a shuffled
    hash semi-join on l_orderkey with AQE sizing the build side."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > orders["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q6_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective scan-aggregate. All three predicates and
    the 4-column projection reach the parquet scan (PushedFilters +
    ReadSchema — asserted in tests/test_plans.py), which is the whole
    game at 100 TB: the scan reads a fraction of the data and the agg is
    a two-phase partial/final with no other shuffle."""
    li = _read(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    # the year predicate is written as a shipdate RANGE, not year()=1997:
    # a range lands in PushedFilters (row-group stats skip); year() would
    # stay a post-scan DataFilter and read every row group
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(38,8)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q_tpch_q17_smallqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG subquery → per-group agg + re-join.
    The per-part average is a partial-aggregated shuffle on l_partkey and
    the re-join reuses that same key (co-partitioned: AQE sees both sides
    hashed on l_partkey, no extra exchange); `part` is broadcast.

    Float note: l_quantity is integer-valued, so sum/avg are exact in
    double on both engines — the 0.2*avg threshold is bit-identical."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    small = li.join(per_part, "l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return (
        small.join(F.broadcast(part), small["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("small_qty_revenue"),
        )
        .orderBy("p_brand")
    )


def q_tpch_q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE-sum) aggregation — counts
    of urgent vs non-urgent orders per lineitem return flag. One shuffled
    join on orderkey, one agg on a 3-value key."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — ratio of two exact decimal
    sums over a broadcast part join, computed as ONE division (order-free,
    hash-safe)."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(38,8)")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type").like("PROMO%"), revenue).otherwise(
                    F.lit(0).cast("decimal(38,8)")
                )
            ).cast("double")
            / F.sum(revenue).cast("double")
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_items"),
    )


def q_tpch_q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a join whose predicate is an OR of conjunct
    bundles (brand × size × quantity bands). The equi-key on partkey
    carries the (broadcast) hash join; the disjunction evaluates as a
    post-join residual — Catalyst's standard equi+residual split, so the
    OR never degrades the join into a nested loop."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 15))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(10, 40))
            & (F.col("l_quantity").between(20, 50))
        )
    )
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(38,8)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(cond)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution. The filter on
    orders belongs to the LEFT JOIN's ON clause (not a WHERE — that would
    drop order-less customers), then two stacked aggregations: per-customer
    count, then a histogram of those counts. The second agg's input is one
    row per customer, so its shuffle is tiny regardless of fact size."""
    cust = _read(spark, sf_dir, "customer").select("c_custkey")
    orders = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the SAME fact table.
    A supplier "kept an order waiting" if it shipped >90 days after the
    order date on a finished order, another supplier shipped in that order
    (left-semi), and no OTHER supplier was also late (left-anti). The late
    set is computed once and reused for both probe and anti build; all
    three joins hash on l_orderkey, so AQE coalesces them onto one
    exchange of each side — no O(n²) correlated re-execution.

    Reference analog: the reign-interval EXISTS logic in
    `ufc/models/analytics/title_reigns.sql:272-286` is the same
    correlated-predicate family; this is its decorrelated plan shape."""
    sup = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = (
        _read(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    others = li.alias("l2")
    other_late = late.alias("l3")
    waiting = (
        l1.join(
            others,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(sup), F.col("l1.l_suppkey") == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


def q_tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: substring bucketing + scalar-aggregate threshold +
    NOT EXISTS. "Country code" is the last 2 digits of c_name; customers
    above the positive-balance average in selected codes with no URGENT
    orders. The 1-row stats frame is broadcast; above-average is tested as
    ``bal * n > sum`` in exact decimal (order-free, hash-safe); the anti
    join builds on a filtered 1-column projection of orders."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    codes = ["01", "13", "17", "18", "23", "29", "30", "31"]
    bal = F.col("c_acctbal").cast("decimal(18,4)")
    coded = cust.withColumn("cntrycode", F.right(F.col("c_name"), F.lit(2))).filter(
        F.col("cntrycode").isin(codes)
    )
    stats = coded.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal).alias("tot_bal"), F.count("*").alias("n_pos")
    )
    return (
        coded.crossJoin(F.broadcast(stats))
        .filter(bal * F.col("n_pos") > F.col("tot_bal"))
        .join(orders, coded["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax against an aggregated view — supplier(s)
    whose 1997 revenue equals the maximum. The per-supplier agg is computed
    once; the global max is a 1-row frame broadcast back against it (scalar
    subquery shape), NOT a rank-window over the whole agg — a global
    window would funnel every supplier row through one partition."""
    li = _read(spark, sf_dir, "lineitem")
    sup = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(38,8)")
    per_sup = (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).alias("total_revenue"))
    )
    best = per_sup.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        per_sup.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered keys semi-joined back to the facts.
    The qualifying-order set (sum(qty) > threshold) is the build side of a
    left-semi against lineitem, then the detail agg re-groups on the same
    orderkey — AQE reuses the orderkey hashing across the semi and the
    final agg, and the customer dim is broadcast."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q_tpch_q20_nested_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a CHAIN of semi-joins — suppliers who shipped more
    than 50 units of some part in 1997, restricted to a nation set. Both
    semi levels build on pre-aggregated/filtered small sides; the nation
    restriction is a broadcast semi."""
    li = _read(spark, sf_dir, "lineitem")
    sup = _read(spark, sf_dir, "supplier")
    nation = _read(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == 0
    ).select("n_nationkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        sup.join(heavy, sup["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(
            F.broadcast(nation),
            sup["s_nationkey"] == nation["n_nationkey"],
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q_antijoin_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join, plus a scalar aggregate subquery.

    Above-average balance is tested as ``acctbal * n > sum`` (exact
    decimal arithmetic) instead of ``acctbal > avg`` — avg of doubles is
    accumulation-order sensitive and could flip boundary rows between
    engines. The 1-row stats frame is broadcast (scalar subquery shape);
    the anti join builds on the filtered recent-orders side."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(18,4)")
    stats = cust.agg(
        F.sum(bal).alias("tot_bal"), F.count("*").alias("n_cust")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(stats))
        .filter(bal * F.col("n_cust") > F.col("tot_bal"))
        .join(recent, F.col("c_custkey") == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(bal).cast("double").alias("total_balance"),
        )
        .orderBy("c_nationkey")
    )


def q_tpch_q7_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: role-playing dimension — nation joined TWICE under
    different roles (supplier's vs customer's) with an asymmetric pair
    filter, plus a year breakdown. Both nation legs broadcast; the only
    real shuffles are lineitem⋈orders on orderkey and the final 3-key
    agg."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(38,8)")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_cube_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all 4 subtotal combinations of priority × status)
    with grouping_id — like ROLLUP, one Expand + a single shuffled agg,
    never a per-level re-scan."""
    orders = _read(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,4)")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(price).cast("double").alias("total_price"),
        )
        .orderBy(
            F.asc("gid"),
            F.asc_nulls_last("o_orderpriority"),
            F.asc_nulls_last("o_orderstatus"),
        )
    )


def q_topn_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — the most common analytics shape there is: each
    customer's 3 largest orders via row_number over a keyed window. One
    shuffle on custkey; the sort is per-partition-key, never global.
    Tiebreak on orderkey keeps it deterministic across engines."""
    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    )


def q_rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (priority → status hierarchy) with grouping_id.
    Spark computes all rollup levels in one shuffle (Expand + single hash
    agg) — no per-level re-scan."""
    orders = _read(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,4)")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(price).cast("double").alias("total_price"),
        )
        .orderBy(
            F.asc("gid"),
            F.asc_nulls_last("o_orderpriority"),
            F.asc_nulls_last("o_orderstatus"),
        )
    )


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: the events `props` JSON string is
    parsed with a typed schema (`from_json` — vectorized Jackson parse,
    JVM-side; the schema-on-read path that scales, vs per-row
    get_json_object re-parsing per extracted field) and aggregated."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = _read(spark, sf_dir, "events")
    props_schema = StructType([StructField("k", LongType())])
    parsed = ev.withColumn("k", F.from_json("props", props_schema)["k"])
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def q_set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (absent from the reference — SURVEY §2.7): the
    early-customer cohort (ordered in the first year) intersected with and
    subtracted from the late cohort. Both compile to aggregate-based
    set-op plans (no sort), shuffling only distinct keys."""
    orders = _read(spark, sf_dir, "orders")
    early = orders.filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1996-01-01"))
    ).select("o_custkey")
    late = orders.filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    ).select("o_custkey")
    loyal = early.intersect(late).withColumn("cohort", F.lit("retained"))
    # exceptAll is MULTISET difference: applied to raw orders it keeps
    # count-1 copies of keys present in both cohorts — dedup first so the
    # semantics are EXCEPT DISTINCT, matching the SQL oracle
    churned = early.distinct().exceptAll(late.distinct()).withColumn(
        "cohort", F.lit("churned")
    )
    return (
        loyal.unionByName(churned)
        .select("cohort", "o_custkey")
        .orderBy("cohort", "o_custkey")
    )


def q_date_spine_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled time series: a generated month spine left-joined to
    monthly order totals, so empty months appear as explicit zeros.

    The spine is `sequence()` + `explode` — a generated table, not a scan;
    at any scale it is tiny (one row per month) and broadcast to the join.
    Densification is what makes downstream window/trend math correct when
    the fact table has silent gaps."""
    orders = _read(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 month"))
        ).alias("month_start")
    )
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month_start")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
    )
    return (
        spine.join(monthly, "month_start", "left")
        .select(
            "month_start",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
        .orderBy("month_start")
    )


def q_trailing_30d_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer trailing-30-day order total at each
    order date. The frame is over the epoch-day VALUE (rangeBetween), not
    row offsets — the batch twin of a 30-day sliding stream window. One
    shuffle on the customer key."""
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias(
            "epoch_day"
        ),
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_day")
        .rangeBetween(-29, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.sum("price").over(w).cast("double").alias("trailing_30d_total"),
            F.count(F.lit(1)).over(w).alias("trailing_30d_orders"),
        )
        .orderBy("o_orderkey")
    )


def q_dq_orders_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality suite on orders (dbt-test analog): not_null +
    accepted_values fused into one scan, unique via one groupBy, FK via a
    broadcast anti join — each emitting (check_name, n_violations)."""
    from .validation import run_checks

    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    return run_checks(
        orders,
        not_null=["o_orderkey", "o_custkey", "o_orderdate"],
        accepted={"o_orderstatus": ["F", "O", "P"]},
        unique=[["o_orderkey"]],
        fks=[("o_custkey", customer, "c_custkey", "customer")],
    )


def q_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts + decimal totals spread across the 3 status
    columns. The value list is EXPLICIT (["F","O","P"]) — with an implicit
    list Spark runs an extra distinct-collect job and the output schema
    depends on the data, which breaks plan caching and schema contracts at
    scale."""
    orders = _read(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,4)")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
        .join(
            orders.groupBy("o_orderpriority").agg(
                F.sum(price).cast("double").alias("total_price")
            ),
            "o_orderpriority",
        )
        .orderBy("o_orderpriority")
    )


def q_unpivot_lineitem_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the per-lineitem charge components (price, discount,
    tax) stacked into (component, amount) rows — `DataFrame.unpivot` is a
    zero-shuffle Expand, then one agg shuffle on the tiny key."""
    li = _read(spark, sf_dir, "lineitem")
    long = li.select(
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price"),
        F.col("l_discount").cast("decimal(18,4)").alias("discount"),
        F.col("l_tax").cast("decimal(18,4)").alias("tax"),
    ).unpivot(
        ids=["l_orderkey"],
        values=["price", "discount", "tax"],
        variableColumnName="component",
        valueColumnName="amount",
    )
    return (
        long.groupBy("component")
        .agg(
            F.count("*").alias("n"),
            F.sum("amount").cast("double").alias("total_amount"),
        )
        .orderBy("component")
    )


def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: L2 norm via
    F.aggregate (fold), positive-component count via F.filter, all
    JVM-side — no Python UDF, stays inside whole-stage codegen.

    Cross-engine float discipline: the per-row norm is rounded to 6dp and
    cast to decimal BEFORE aggregating, so the group sums are exact
    (order-free) and the averages are single integer-ratio divisions —
    a plain avg-of-doubles would be accumulation-order sensitive."""
    emb = _read(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm6 = F.round(F.sqrt(sq_sum), 6).cast("decimal(18,6)")
    n_pos = F.size(F.filter(F.col("embedding"), lambda x: x > 0))
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            (F.sum(norm6).cast("double") / F.count("*")).alias("avg_l2_norm"),
            (F.sum(n_pos.cast("long")).cast("double") / F.count("*")).alias(
                "avg_positive_dims"
            ),
        )
        .orderBy("label")
    )


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (Spark `percentile` ≡
    DuckDB `quantile_cont`, bit-identical: both sort the group and compute
    the same (1-f)·a + f·b interpolation).

    Scale note: exact percentile buffers each group's values — fine for
    bounded groups, NOT for 100 TB global quantiles. The scale path is
    `approx_percentile` (t-digest sketch, mergeable partial aggregation,
    bounded memory); tests/test_scale_ops.py asserts it lands within its
    accuracy bound of this exact result."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.25D, 0.5D, 0.9D, 0.99D))"
            ).alias("p"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            F.col("p")[0].alias("p25"),
            F.col("p")[1].alias("p50"),
            F.col("p")[2].alias("p90"),
            F.col("p")[3].alias("p99"),
            "n",
        )
        .orderBy("event_type")
    )


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window distribution functions (ntile / percent_rank / cume_dist /
    first_value / nth_value) per event_type. The (value, event_id) order
    key is a total order, so rank-family outputs are deterministic; the
    ratio functions are exact integer divisions — bit-identical across
    engines.

    De-weakened r5 (VERDICT r4 task 3): event_type has ~5 distinct
    values, so the keyed window was one ~20 TB sort task per type at the
    100 TB scale (per-row rank outputs — no WindowGroupLimit rescue).
    Now the partitioned two-phase rank (``global_order_rank(
    partition_cols=...)``) supplies (rn, n) per type with
    hashpartitioning(type, bucket) parallelism, and the whole family is
    closed-form: the (value, event_id) order key is UNIQUE, so
    percent_rank = (rn-1)/(n-1), cume_dist = rn/n, ntile is
    exact_ntile_expr. first_value/nth_value(2) over the default
    running frame are the partition's first two rows for every row with
    rn ≥ their position — a 2-rows-per-key frame (rn <= 2) pivoted and
    broadcast back, NULL while the frame hasn't reached row 2. The
    stitch join is eqNullSafe (r5 ADVICE): groupBy puts NULL event_type
    in one group exactly like Window.partitionBy, and a plain equi-join
    would silently drop those rows if NULL keys ever appear."""
    from ufc_data_warehouse_spark.operators.scale import (
        exact_ntile_expr,
        global_order_rank,
    )

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    g = global_order_rank(
        ev, "value", ["event_id"], partition_cols=["event_type"]
    )
    heads = (
        g.filter(F.col("rn") <= 2)
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("event_id"))).alias(
                "first_id"
            ),
            F.min(F.when(F.col("rn") == 2, F.col("event_id"))).alias(
                "_second_id"
            ),
        )
        .withColumnRenamed("event_type", "_et")
    )
    n1 = F.col("n_total") - F.lit(1)
    return (
        g.join(F.broadcast(heads), g["event_type"].eqNullSafe(heads["_et"]))
        .select(
            "event_id",
            "event_type",
            exact_ntile_expr(4).alias("quartile"),
            F.when(n1 > 0, (F.col("rn") - F.lit(1)) / n1)
            .otherwise(F.lit(0.0))
            .alias("pr"),
            (F.col("rn") / F.col("n_total")).alias("cd"),
            "first_id",
            # nth_value's default frame ends at the CURRENT row: row 1's
            # frame hasn't seen row 2 yet -> NULL, like the window
            F.when(F.col("rn") >= 2, F.col("_second_id")).alias("second_id"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# training-data preparation (documents table): split / pack / shuffle
# ---------------------------------------------------------------------------


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SEED = 42


def _split_case_sql(id_expr: str) -> str:
    """DuckDB CASE ladder mirroring training.split_column bit-for-bit."""
    from .operators.training import split_bounds_hex

    bounds = split_bounds_hex(_SPLIT_WEIGHTS)
    bucket = f"substr(md5('{_SPLIT_SEED}:' || {id_expr}::VARCHAR), 1, 4)"
    arms = "".join(
        f" WHEN {bucket} < '{ub}' THEN '{name}'" for name, ub in bounds[:-1]
    )
    return f"CASE{arms} ELSE '{bounds[-1][0]}' END"


def q_split_stratified_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (hash-bucket, shuffle-free
    projection), verified by per-(lang, split) counts."""
    from .operators import training

    docs = _read(spark, sf_dir, "documents")
    return (
        training.assign_split(docs, "doc_id", _SPLIT_WEIGHTS, seed=_SPLIT_SEED)
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang", "split")
    )


_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_MIX_SEED = 7
_MIX_DEFAULT = 0.05


def q_mixture_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: per-source keep rates applied as a
    stateless hash filter (no shuffle, reproducible across cluster sizes —
    unlike df.sample). Verified by per-source kept-count AND the exact sum
    of kept ids, so the oracle checks WHICH rows survived, not just how
    many."""
    from .operators import training

    docs = _read(spark, sf_dir, "documents")
    kept = training.mixture_sample(
        docs, "doc_id", "source", _MIX_RATES, seed=_MIX_SEED,
        default_rate=_MIX_DEFAULT,
    )
    return (
        kept.groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("source")
    )


def q_pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: per-language sequential bins of ~4096 tokens
    (cheap n_chars/4 token proxy). One shuffle, on lang."""
    from .operators import training

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        "lang",
        (F.floor(F.col("n_chars") / 4) + 1).cast("bigint").alias("tokens"),
    )
    return training.token_bins(docs, "id", "tokens", budget=4096, group_col="lang").orderBy(
        "id"
    )


def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus (seeded-hash order)."""
    from .operators import training

    docs = _read(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    return (
        training.shuffled(docs, "id", seed=_SPLIT_SEED)
        .select("id", F.col("pos").cast("bigint").alias("pos"))
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# as-of join + sessionization (events table)
# ---------------------------------------------------------------------------


def q_asof_orders_before_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent order at
    event time (``o_orderdate <= ts``, ties broken by highest order key).

    Union-merge plan, the shape that survives 100 TB: interleave both
    tables sorted by (user, time) and carry the latest order forward with
    ``last(ignorenulls)`` over one prefix window. ONE shuffle of
    events+orders on user_id and no intermediate pair blow-up — an
    equi-join + per-event rank would shuffle both sides AND materialize
    |event × qualifying orders| rows before discarding all but one, then
    reshuffle on event_id for the pick."""
    ev = _read(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    o_rows = orders.filter(F.col("o_orderdate").isNotNull()).select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        "o_orderdate",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    e_rows = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        "event_id",
        "ts",
    )
    # orders sort before events at equal t (inclusive <=); equal-date orders
    # ascending by key so the prefix-last is the highest-key pick
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("t"), F.desc("is_order"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = o_rows.unionByName(e_rows).select(
        "event_id",
        "user_id",
        "ts",
        "is_order",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("asof_orderdate"),
    )
    return (
        merged.filter((F.col("is_order") == 0) & F.col("asof_orderkey").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("asof_orderkey").alias("o_orderkey"),
            F.col("asof_orderdate").alias("o_orderdate"),
        )
        .orderBy("event_id")
    )


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-minute-gap sessions per user
    (gaps-and-islands over event times), session length + event count."""
    ev = _read(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_seq")
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-signup DAY,
    counted distinct-active per days-since-signup. Two keyed aggs and
    one join, all hashed on user_id — at scale the activity join
    co-partitions with the cohort frame (AQE), and day arithmetic is
    pure integer math so cross-engine results are exact."""
    ev = _read(spark, sf_dir, "events")
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
        .select("user_id", F.to_date("first_signup").alias("cohort_day"))
    )
    activity = ev.select(
        "user_id", F.to_date("ts").alias("active_day")
    ).distinct()
    return (
        activity.join(cohorts, "user_id")
        .withColumn("day_offset", F.datediff("active_day", "cohort_day"))
        .filter(F.col("day_offset") >= 0)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
        .orderBy("cohort_day", "day_offset")
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: each stage's first
    qualifying timestamp must follow the previous stage's within 1 day. Three aggs +
    two joins, ALL keyed on user_id — one partitioning reused end-to-end;
    the final count is a single-row rollup."""
    ev = _read(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.join(s, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("s_ts"))
            & (F.col("ts") <= F.col("s_ts") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("s_ts").alias("n_signup"),
            F.count("c_ts").alias("n_click_after_signup"),
            F.count("p_ts").alias("n_purchase_after_click"),
        )
    )


def q_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed event rollup with FILTER-agg + exact decimal sums."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
            F.count(F.when(F.col("value") > 50, 1)).alias("n_high"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Metabase-card surface (SURVEY S7/O3/X13): top-k + fighter image URL.
# The reference cards order by the metric alone (charts.sh:154-498); a
# fighter tiebreak is added on BOTH engines so the LIMIT cutoff is
# deterministic.
# ---------------------------------------------------------------------------

_IMG_SQL = """CASE WHEN fighter IS NULL OR fighter = '' THEN NULL
  ELSE concat('http://localhost:8888/',
    regexp_replace(regexp_replace(lower(fighter), '[^a-z0-9]+', '_', 'g'),
                   '^_+|_+$', '', 'g'), '.png') END"""


# One spec per reference card (charts.sh:176-498): model, extra output
# columns after (fighter, image), the card's ORDER BY refined to a TOTAL
# order over the model's grain (so the LIMIT cutoff is deterministic on
# both engines), hidden order-only columns, and the LIMIT.
_DIRS = {
    "asc": ("asc", "ASC"),
    "desc": ("desc", "DESC"),
    "asc_nl": ("asc_nulls_last", "ASC NULLS LAST"),
    "desc_nl": ("desc_nulls_last", "DESC NULLS LAST"),
}

CARD_SPECS: dict[str, dict] = {
    "card_qof_at_time_top25": dict(
        model="quality_of_opposition_faced",
        cols=["avg_opponent_win_pct_at_time"],
        order=[("avg_opponent_win_pct_at_time", "desc_nl"), ("fighter", "asc")],
        limit=25,
    ),
    "card_qof_career_wins_top25": dict(
        model="quality_of_opposition_faced",
        cols=["avg_opponent_career_wins"],
        order=[("avg_opponent_career_wins", "desc_nl"), ("fighter", "asc")],
        limit=25,
    ),
    "card_title_fight_wins_top50": dict(
        model="title_fight_results_by_fighter",
        cols=["category", "title_fight_wins"],
        order=[("title_fight_wins", "desc"), ("fighter", "asc"), ("category", "asc")],
        limit=50,
    ),
    "card_multi_division_champs": dict(
        model="multi_division_champs",
        cols=["distinct_title_categories"],
        order=[("distinct_title_categories", "desc"), ("fighter", "asc")],
        limit=None,
    ),
    "card_wins_over_champions_top25": dict(
        model="wins_over_champions_agg",
        cols=["wins_over_champions"],
        order=[("wins_over_champions", "desc"), ("fighter", "asc")],
        limit=25,
    ),
    "card_longest_streaks_top25": dict(
        model="fighters_by_longest_winning_streak",
        cols=["longest_win_streak"],
        order=[("longest_win_streak", "desc"), ("fighter", "asc")],
        limit=25,
    ),
    "card_best_record_top25": dict(
        model="fighters_best_record",
        cols=["win_pct"],
        order=[("win_pct", "desc_nl"), ("fighter", "asc")],
        limit=25,
    ),
    "card_non_decision_top25": dict(
        model="fighters_by_non_decision_wins",
        cols=["non_decision_wins"],
        order=[("non_decision_wins", "desc"), ("fighter", "asc")],
        limit=25,
    ),
    "card_title_defenses_top50": dict(
        model="title_defenses",
        cols=["weight_category", "title_defenses"],
        order=[("title_defenses", "desc"), ("fighter", "asc"), ("weight_category", "asc")],
        limit=50,
    ),
    "card_champ_rounds_top50": dict(
        model="championship_rounds_fought",
        cols=["title_fights", "championship_rounds_fought"],
        order=[
            ("championship_rounds_fought", "desc"),
            ("title_fights", "desc"),
            ("fighter", "asc"),
        ],
        limit=50,
    ),
    "card_consec_defenses_top50": dict(
        model="consecutive_title_defenses",
        cols=["weight_category", "max_consecutive_title_defenses"],
        order=[
            ("max_consecutive_title_defenses", "desc"),
            ("fighter", "asc"),
            ("weight_category", "asc"),
        ],
        limit=50,
    ),
    "card_clutch_wins_top25": dict(
        model="clutch_wins",
        cols=["clutch_wins"],
        order=[("clutch_wins", "desc"), ("fighter", "asc")],
        limit=25,
    ),
    "card_total_champ_days_top50": dict(
        model="total_champ_days",
        cols=["weight_category", "total_champ_days"],
        order=[
            ("total_champ_days", "desc_nl"),
            ("fighter", "asc"),
            ("weight_category", "asc"),
        ],
        limit=50,
    ),
}


def _make_card(spec: dict) -> Query:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .api import build_model
        from .exprs import image_slug_url

        df = build_model(spark, sf_dir, spec["model"]).select(
            "fighter",
            image_slug_url("fighter").alias("fighter_image_url"),
            *spec["cols"],
        )
        order = [getattr(F, _DIRS[d][0])(c) for c, d in spec["order"]]
        out = df.orderBy(*order)
        if spec["limit"]:
            out = out.limit(spec["limit"])
        return out

    run.__name__ = f"card_{spec['model']}"
    return run


def _make_card_oracle(spec: dict) -> str:
    from .oracle import oracle_for

    cols = ", ".join(spec["cols"])
    order = ", ".join(f"{c} {_DIRS[d][1]}" for c, d in spec["order"])
    limit = f" LIMIT {spec['limit']}" if spec["limit"] else ""
    return f"""
SELECT fighter, {_IMG_SQL} AS fighter_image_url, {cols}
FROM ({oracle_for(spec['model'])})
ORDER BY {order}{limit}"""


def _card(model: str, metric: str, k: int) -> Query:
    spec = dict(model=model, cols=[metric],
                order=[(metric, "desc_nl"), ("fighter", "asc")], limit=k)
    return _make_card(spec)


def _card_oracle(model: str, metric: str, k: int) -> str:
    spec = dict(model=model, cols=[metric],
                order=[(metric, "desc_nl"), ("fighter", "asc")], limit=k)
    return _make_card_oracle(spec)


# ---------------------------------------------------------------------------
# multimodal plumbing (documents → opaque binary corpus)
# ---------------------------------------------------------------------------


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = _read(spark, sf_dir, "documents")
    return multimodal.media_metadata(multimodal.synthesize_media(docs)).orderBy(
        "media_id"
    )


def q_multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the full binary → mapInPandas(fake decode) → frame-sample
    pipeline; the md5-derived stub keeps it oracle-checkable."""
    from .operators import multimodal

    docs = _read(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(docs)
    decoded = multimodal.decode_media(media, fake=True)
    return multimodal.sample_frames(decoded, every_n=30).orderBy(
        "media_id", "frame_idx"
    )


def q_real_codec_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL uncompressed codec (r6, ``numpy_uncompressed_decode``)
    under the driver's cross-engine gate — not the fake stand-in.

    Each sampled doc becomes a genuine 4×4 binary PPM whose 48 pixel
    bytes are md5(doc_id) tiled ×3; the codec header-parses and decodes
    it for real (the same code path a production PPM corpus takes), and
    the audit emits EXACT integers only: width/height/n_frames plus
    ``pixel_sum`` recovered from the float32 feature means
    ((f_r+f_g+f_b)·16·255, absolute float error ≤ ~7e-4 ≪ the 0.5
    rounding margin, so the round-trip is integer-exact). The oracle
    recomputes the same sum arithmetically from DuckDB's own md5 — two
    engines, two decoding paths, one exact answer. Compressed formats
    remain the documented seam (operators/multimodal.py)."""
    from .operators import multimodal as mm

    docs = _read(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    digest = F.unhex(F.md5(F.col("doc_id").cast("string")))
    payload = F.concat(
        F.lit(b"P6\n4 4\n255\n"), digest, digest, digest
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        "source",
    )
    decoded = mm.decode_media(
        media, decode_fn=mm.numpy_uncompressed_decode
    )
    f = F.col("features")
    return decoded.select(
        "media_id",
        "width",
        "height",
        "n_frames",
        F.round((f[0] + f[1] + f[2]) * 16 * 255)
        .cast("bigint")
        .alias("pixel_sum"),
    ).orderBy("media_id")


def q_png_codec_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL PNG decoder (r7, ``numpy_png_decode`` — stdlib zlib +
    numpy) under the driver's cross-engine gate, on fully VALID PNGs
    synthesized in pure Column expressions.

    Each sampled doc becomes a 4×4 RGB8 PNG: scanline 0 carries filter
    None with md5(doc_id) bytes 0-11 as pixels; scanlines 1-3 carry
    filter Up (type 2) with further tiled digest bytes as deltas, so the
    decoder's unfilter pass does real mod-256 reconstruction work. The
    container is genuine end-to-end: zlib stream with a stored-DEFLATE
    block whose adler32 is computed ARITHMETICALLY from the digest bytes
    (precomputed position coefficients, mod 65521), chunk CRCs via
    Spark's built-in ``crc32`` (JVM-side), constant IHDR/IEND CRCs as
    literals. The decoder verifies every CRC and the adler (via
    zlib.decompress) before unfiltering — a wrong byte anywhere rows out
    as NULL, failing the audit. The oracle replays the Up-filter
    accumulation arithmetically from DuckDB's own md5: two engines, one
    decode answer, no shared code."""
    import struct as _st
    import zlib as _zl

    from .operators import multimodal as mm

    # r7: _spread() A/B'd and REVERTED here — the 4×4 PNG decode is so
    # cheap that 32 Python decode workers cost more than they save
    # (interleaved A/B in OPTIMIZATION_r07.md); the 32×32 JPEG audit keeps
    # its spread (real Huffman+DCT work per row)
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 5)
    hexstr = F.md5(F.col("doc_id").cast("string"))
    digest = F.unhex(hexstr)
    tiled = F.concat(digest, digest, digest)  # 48 pixel/delta bytes

    # digest byte values as ints, for the arithmetic adler32
    dbytes = [
        F.conv(F.substring(hexstr, 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(16)
    ]
    # raw scanlines: [0x00 | t0..t11] [0x02 | t12..t23] ×3 → 52 bytes
    raw = F.concat(
        F.lit(b"\x00"), F.substring(tiled, 1, 12),
        F.lit(b"\x02"), F.substring(tiled, 13, 12),
        F.lit(b"\x02"), F.substring(tiled, 25, 12),
        F.lit(b"\x02"), F.substring(tiled, 37, 12),
    )
    # adler32 over the 52 raw bytes: s1 = 1 + Σb, s2 = n + Σ(n-k)·b_k
    # (0-indexed k, mod 65521). Filter bytes contribute 6 to s1 and 156
    # to s2; tiled byte j sits at position j + 1 + j//12, so its s2
    # coefficient is 51 - j - j//12 — folded per digest byte below.
    coeff = [0] * 16
    for j in range(48):
        coeff[j % 16] += 51 - j - j // 12
    s1 = (sum(dbytes[1:], dbytes[0]) * 3 + F.lit(7)) % 65521
    s2_terms = dbytes[0] * coeff[0]
    for i in range(1, 16):
        s2_terms = s2_terms + dbytes[i] * coeff[i]
    s2 = (s2_terms + F.lit(52 + 156)) % 65521
    adler = F.unhex(F.lpad(F.hex(s2 * 65536 + s1), 8, "0"))
    # zlib hdr 0x78 0x01 + stored-block hdr (final, LEN=52, NLEN=~52)
    idat_data = F.concat(F.lit(b"\x78\x01\x01\x34\x00\xcb\xff"), raw, adler)
    idat_crc = F.unhex(
        F.lpad(F.hex(F.crc32(F.concat(F.lit(b"IDAT"), idat_data))), 8, "0")
    )
    ihdr_data = _st.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    ihdr_chunk = (
        _st.pack(">I", 13) + b"IHDR" + ihdr_data
        + _st.pack(">I", _zl.crc32(b"IHDR" + ihdr_data) & 0xFFFFFFFF)
    )
    iend_chunk = b"\x00\x00\x00\x00IEND" + _st.pack(
        ">I", _zl.crc32(b"IEND") & 0xFFFFFFFF
    )
    payload = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n" + ihdr_chunk),
        F.lit(_st.pack(">I", 63) + b"IDAT"),  # 2+5+52+4 zlib bytes
        idat_data,
        idat_crc,
        F.lit(iend_chunk),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        "source",
    )
    decoded = mm.decode_media(media, decode_fn=mm.stdlib_decode)
    f = F.col("features")
    return decoded.select(
        "media_id",
        "width",
        "height",
        "n_frames",
        F.round((f[0] + f[1] + f[2]) * 16 * 255)
        .cast("bigint")
        .alias("pixel_sum"),
    ).orderBy("media_id")


def q_wav_codec_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real PCM WAV decode path (``numpy_uncompressed_decode``'s
    ``_wav``) under the driver's cross-engine gate — the audio analog of
    the PPM/PNG audits (r7; previously unit-tested only).

    Each sampled doc becomes a valid 16-bit mono 8 kHz WAV whose 8
    samples are md5(doc_id) interpreted as little-endian int16; the RIFF/
    fmt/data framing is constant so the whole header is a literal and
    only the sample bytes vary. The audit recovers EXACT integers from
    the float feature vector: sample_sum = round(mean·n·32768) (|sum| ≤
    2^18, float32 abs error ~0.02 ≪ 0.5), min/max samples directly from
    features 2/3. The oracle rebuilds the int16 values arithmetically
    from DuckDB's md5 (lo + 256·hi, two's complement)."""
    import struct as _st

    from .operators import multimodal as mm

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 2)
    digest = F.unhex(F.md5(F.col("doc_id").cast("string")))  # 16 B = 8 samples
    fmt = _st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    header = (
        b"RIFF" + _st.pack("<I", 4 + 8 + len(fmt) + 8 + 16) + b"WAVE"
        + b"fmt " + _st.pack("<I", len(fmt)) + fmt
        + b"data" + _st.pack("<I", 16)
    )
    payload = F.concat(F.lit(header), digest)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        "source",
    )
    decoded = mm.decode_media(media, decode_fn=mm.stdlib_decode)
    f = F.col("features")
    return decoded.select(
        "media_id",
        F.col("width").alias("n_channels"),
        F.col("height").alias("sample_rate"),
        F.col("n_frames").alias("n_samples"),
        F.round(f[0] * 8 * 32768).cast("bigint").alias("sample_sum"),
        F.round(f[2] * 32768).cast("bigint").alias("min_sample"),
        F.round(f[3] * 32768).cast("bigint").alias("max_sample"),
    ).orderBy("media_id")


def q_bmp_codec_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real 24-bit BMP decode path (``_bmp``) under the driver's
    cross-engine gate (r7). The 4×4 pixel array is md5(doc_id) ∥
    md5(doc_id·'x') ∥ md5(doc_id) — two DIFFERENT digests, so the three
    per-channel sums differ and the decoder's BGR→RGB reorder is
    actually verified (a uniform 3× tiling makes all channel sums
    collapse to Σdigest because gcd(3,16)=1, hiding a swapped-channel
    bug). BMP stores byte j as the {B,G,R}[j%3] of pixel j//3, bottom-up
    (row order cancels in sums; the flip is ground-truth unit-tested).
    The oracle walks the same 48 stored positions from DuckDB's md5."""
    import struct as _st

    from .operators import multimodal as mm

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 7)
    d1 = F.unhex(F.md5(F.col("doc_id").cast("string")))
    d2 = F.unhex(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("x"))))
    pixels = F.concat(d1, d2, d1)  # 48 B: 4 rows × 4 px × BGR
    header = _st.pack("<2sIHHI", b"BM", 54 + 48, 0, 0, 54) + _st.pack(
        "<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, 48, 2835, 2835, 0, 0
    )
    payload = F.concat(F.lit(header), pixels)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        "source",
    )
    decoded = mm.decode_media(media, decode_fn=mm.stdlib_decode)
    f = F.col("features")
    return decoded.select(
        "media_id",
        "width",
        "height",
        "n_frames",
        F.round(f[0] * 16 * 255).cast("bigint").alias("r_sum"),
        F.round(f[1] * 16 * 255).cast("bigint").alias("g_sum"),
        F.round(f[2] * 16 * 255).cast("bigint").alias("b_sum"),
    ).orderBy("media_id")


def q_jpeg_codec_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full baseline-JPEG codec (r7: ``jpeg_encode_baseline`` →
    ``numpy_jpeg_decode``, pure numpy Huffman + DCT) under the driver's
    cross-engine gate — encode AND decode both run distributed inside
    Arrow-batched UDFs; DuckDB never sees a JPEG byte.

    JPEG is lossy, so the audit is built on the one exactly-recoverable
    case: each sampled doc becomes a 32×32 grayscale image of sixteen
    CONSTANT 8×8 blocks (one md5 byte each, Kronecker-expanded). A
    constant block's DCT has only a DC coefficient; with quant=1 that
    integer survives quantize→Huffman→dequantize→IDCT bit-exactly, so
    gray_sum/min_byte/max_byte recovered from the decoded features are
    EXACT integers the oracle recomputes from its own md5. The entropy
    path does real work: 16 DC Huffman symbols + EOBs per image, byte
    stuffing, canonical table reconstruction from DHT."""
    from .operators import multimodal as mm

    mm.register_codecs_by_value()  # closures capture the encoder fn
    docs = _spread(
        _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 3)
    )
    seeds = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(F.md5(F.col("doc_id").cast("string"))).alias("seed"),
        "source",
    )
    encode_fn = mm.jpeg_encode_baseline

    def encode(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for seed in pdf["seed"]:
                d = _np.frombuffer(bytes(seed), dtype=_np.uint8)
                arr = _np.kron(
                    d.reshape(4, 4), _np.ones((8, 8), dtype=_np.uint8)
                ).astype(_np.uint8)
                payloads.append(encode_fn(arr, quant=1))
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                    "source": pdf["source"],
                }
            )

    media = seeds.mapInPandas(encode, schema=mm.MEDIA_SCHEMA)
    decoded = mm.decode_media(media, decode_fn=mm.stdlib_decode)
    f = F.col("features")
    return decoded.select(
        "media_id",
        "width",
        "height",
        "n_frames",
        F.round(f[0] * 1024 * 255).cast("bigint").alias("gray_sum"),
        F.round(f[4] * 255).cast("bigint").alias("min_byte"),
        F.round(f[5] * 255).cast("bigint").alias("max_byte"),
    ).orderBy("media_id")


def q_gif_codec_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real GIF codec (r7: LZW in pure Python, ``gif_encode_gray`` →
    ``numpy_gif_decode``) under the driver's cross-engine gate. Each
    sampled doc's md5 becomes a 4×4 index image over the identity
    grayscale palette, LZW-compressed into a genuine GIF87a in one Arrow
    UDF and decoded by the full container walk (sub-block reassembly,
    variable-width LSB-first codes, clear/KwKwK handling) in another.
    GIF is lossless, so the decoded gray sums equal plain digest
    arithmetic — which is exactly what the DuckDB oracle computes,
    having never seen a GIF byte."""
    from .operators import multimodal as mm

    mm.register_codecs_by_value()
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 8)
    seeds = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(F.md5(F.col("doc_id").cast("string"))).alias("seed"),
        "source",
    )
    encode_fn = mm.gif_encode_gray

    def encode(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [
                encode_fn(
                    _np.frombuffer(bytes(seed), dtype=_np.uint8).reshape(4, 4)
                )
                for seed in pdf["seed"]
            ]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                    "source": pdf["source"],
                }
            )

    media = seeds.mapInPandas(encode, schema=mm.MEDIA_SCHEMA)
    decoded = mm.decode_media(media, decode_fn=mm.stdlib_decode)
    f = F.col("features")
    return decoded.select(
        "media_id",
        "width",
        "height",
        "n_frames",
        F.round(f[0] * 16 * 255).cast("bigint").alias("gray_sum"),
        F.round(f[4] * 255).cast("bigint").alias("min_byte"),
        F.round(f[5] * 255).cast("bigint").alias("max_byte"),
    ).orderBy("media_id")


def q_ulaw_codec_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 µ-law companded audio (r7: WAV fmt 7 in ``_wav``) under the
    driver's cross-engine gate. The µ-law expansion is CLOSED-FORM
    integer arithmetic — complement, mantissa·8 + 132 bias, shift by the
    segment, re-bias, sign — so while Spark runs the real vectorized
    decoder over genuine WAV bytes, DuckDB evaluates the same formula
    symbolically per digest byte. Sixteen companded samples per doc;
    sample_sum/min/max recovered exactly from the feature floats
    (|linear| ≤ 8031 ≪ the float32 margin)."""
    import struct as _st

    from .operators import multimodal as mm

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 9)
    digest = F.unhex(F.md5(F.col("doc_id").cast("string")))  # 16 µ-law bytes
    fmt = _st.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    header = (
        b"RIFF" + _st.pack("<I", 4 + 8 + len(fmt) + 8 + 16) + b"WAVE"
        + b"fmt " + _st.pack("<I", len(fmt)) + fmt
        + b"data" + _st.pack("<I", 16)
    )
    payload = F.concat(F.lit(header), digest)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        "source",
    )
    decoded = mm.decode_media(media, decode_fn=mm.stdlib_decode)
    f = F.col("features")
    return decoded.select(
        "media_id",
        F.col("width").alias("n_channels"),
        F.col("height").alias("sample_rate"),
        F.col("n_frames").alias("n_samples"),
        F.round(f[0] * 16 * 32768).cast("bigint").alias("sample_sum"),
        F.round(f[2] * 32768).cast("bigint").alias("min_sample"),
        F.round(f[3] * 32768).cast("bigint").alias("max_sample"),
    ).orderBy("media_id")


_KIND_SQL = """CASE WHEN doc_id % 3 = 0 THEN 'image'
  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"""

# ---------------------------------------------------------------------------
# streaming (Trigger.AvailableNow → deterministic batch-equivalent results)
# ---------------------------------------------------------------------------


def q_streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import events as se

    apply_runtime_confs(spark)
    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(se.tumbling_counts(stream)).orderBy(
        "window_start", "event_type"
    )


def q_streaming_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact windowed count(distinct) via chained stateful ops (dedup →
    windowed count), both state stores bounded by one watermark."""
    from .streaming import events as se

    apply_runtime_confs(spark)
    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(se.windowed_distinct_users(stream)).orderBy(
        "window_start"
    )


def q_streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import events as se

    apply_runtime_confs(spark)
    stream = se.read_events_stream(spark, sf_dir)
    customer = _read(spark, sf_dir, "customer")
    return se.run_available_now(
        se.stream_static_nation_activity(stream, customer)
    ).orderBy("window_start", "c_nationkey")


def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import events as se

    apply_runtime_confs(spark)
    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(se.session_windows(stream)).orderBy(
        "user_id", "session_start"
    )


def q_streaming_stateful_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-user
    profiles; with one AvailableNow batch the update equals the batch
    group-by, which the oracle reproduces."""
    from .streaming import events as se

    apply_runtime_confs(spark)
    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        se.stateful_user_profiles(stream), output_mode="update"
    ).orderBy("user_id")


def q_streaming_dedup_redelivered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingestion: the source delivers every event TWICE
    (at-least-once redelivery); dropDuplicatesWithinWatermark emits each
    exactly once, so the oracle is simply the events table itself."""
    from .streaming import events as se

    apply_runtime_confs(spark)
    stream = se.read_events_stream_redelivered(spark, sf_dir)
    return se.run_available_now(
        se.dedup_redelivered(stream), output_mode="append"
    ).orderBy("event_id")


def q_streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent streams (separate sources over the same events
    file) joined on user_id + a 1-hour time-range bound; append mode."""
    from .streaming import events as se

    apply_runtime_confs(spark)
    signups = se.read_events_stream(spark, sf_dir)
    purchases = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        se.stream_stream_signup_purchase(signups, purchases), output_mode="append"
    ).orderBy("user_id", "signup_id", "purchase_id")


def q_streaming_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end exactly-once into a non-transactional sink: redelivered
    source → streaming dedup → update-mode totals → foreachBatch MERGE
    into parquet. Forcing one file per micro-batch makes the sink apply
    multiple overlapping batches — the final table must still equal the
    batch ground truth, which is exactly what the oracle states."""
    import tempfile as _tf

    from .streaming import events as se

    apply_runtime_confs(spark)
    stream = se.read_events_stream_redelivered(spark, sf_dir, max_files_per_trigger=1)
    target = _tf.mkdtemp(prefix="upsert_target_") + "/totals"
    se.run_foreach_batch_upsert(
        se.user_value_totals(stream), keys=["user_id"], target_dir=target
    )
    return spark.read.parquet(target).orderBy("user_id")


def q_streaming_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 transformWithStateInPandas (typed state handles) running the
    same per-user totals as the other stateful paths; needs the RocksDB
    state store provider, restored afterwards.

    NOT registered in EXTRA_QUERIES: the TWS python driver worker requires
    ``google.protobuf``, absent in this container (no pip allowed), so the
    path is exercised by a protobuf-gated test instead
    (tests/test_extra_queries.py::test_transform_with_state_totals)."""
    from .streaming import events as se

    apply_runtime_confs(spark)
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = se.read_events_stream(spark, sf_dir)
        return se.run_available_now(
            se.stateful_totals_tws(stream), output_mode="update"
        ).orderBy("user_id")
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)


def q_streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import events as se

    apply_runtime_confs(spark)
    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(se.sliding_user_activity(stream)).orderBy(
        "window_start", "user_id"
    )


# ---------------------------------------------------------------------------
# scale operators, result-checked (their no-Exchange / skew-spread plan
# shapes are asserted in tests/test_scale_ops.py; these queries prove the
# rewrites are EXACT against a plain-SQL oracle)
# ---------------------------------------------------------------------------


def q_range_join_order_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join at scale: purchases landing inside the 3-day
    window after each signup by the same user, counted per signup. Runs as
    a hash equi-join on (user, day-bucket) via interval_bucket_join — the
    oracle states the same thing as a plain theta join."""
    ev = _read(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("win_end"),
    )
    matched = scale.interval_bucket_join(
        purchases,
        signups,
        point_key="user_id",
        interval_key="s_user",
        point_ts="ts",
        start_col="win_start",
        end_col="win_end",
        bucket_seconds=86400,
    )
    return (
        matched.groupBy("signup_id")
        .agg(F.count("*").alias("n_purchases"))
        .orderBy("signup_id")
    )


def q_salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation; algebraically identical to a
    plain GROUP BY, which is exactly what the oracle runs."""
    ev = _read(spark, sf_dir, "events")
    return scale.salted_sum_count(
        ev, ["event_type"], value_col="user_id", salt_buckets=8
    ).orderBy("event_type")


def q_bucketed_customer_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-bucket co-located join: both sides written bucketed on the
    join key, so the join (and the downstream agg) runs without a shuffle
    of either fact — the 100 TB layout for repeat-joined tables. The
    oracle is the plain join+agg."""
    sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,4)").alias("price")
    )
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o_tbl, c_tbl = f"bkt_orders_{sf_tag}", f"bkt_customer_{sf_tag}"
    scale.write_bucketed(orders, o_tbl, ["o_custkey"], num_buckets=16)
    scale.write_bucketed(cust, c_tbl, ["c_custkey"], num_buckets=16)
    o = scale.bucketed(spark, o_tbl)
    c = scale.bucketed(spark, c_tbl)
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

EXTRA_QUERIES: dict[str, Query] = {
    "range_join_order_window_events": q_range_join_order_window_events,
    "salted_event_type_stats": q_salted_event_type_stats,
    "bucketed_customer_order_totals": q_bucketed_customer_order_totals,
    "dedup_exact": q_dedup_exact,
    "dedup_fingerprint": q_dedup_fingerprint,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_clusters": q_dedup_clusters,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_prefix_filter": q_dedup_prefix_filter,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_simhash48_pairs": q_dedup_simhash48_pairs,
    "dedup_simhash64_pairs": q_dedup_simhash64_pairs,
    "dedup_repeated_spans": q_dedup_repeated_spans,
    "dedup_incremental_batch": q_dedup_incremental_batch,
    "text_token_stats": q_text_token_stats,
    "text_language_id": q_text_language_id,
    "text_quality_score": q_text_quality_score,
    "text_ngram_repetition": q_text_ngram_repetition,
    "vocab_top_terms": q_vocab_top_terms,
    "text_chunks": q_text_chunks,
    "text_bpe_estimate": q_text_bpe_estimate,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_quantize_int8": q_embedding_quantize_int8,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_incremental_topk": q_ann_incremental_topk,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "dedup_embedding_lsh90": q_dedup_embedding_lsh90,
    "dedup_embedding_incremental": q_dedup_embedding_incremental,
    "ann_lsh_recall_audit": q_ann_lsh_recall_audit,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q4_semijoin": q_tpch_q4_semijoin,
    "tpch_q6_pushdown": q_tpch_q6_pushdown,
    "tpch_q17_smallqty": q_tpch_q17_smallqty,
    "tpch_q12_priority_by_flag": q_tpch_q12_priority_by_flag,
    "tpch_q14_promo_revenue": q_tpch_q14_promo_revenue,
    "tpch_q19_disjunctive_join": q_tpch_q19_disjunctive_join,
    "tpch_q7_nation_pairs": q_tpch_q7_nation_pairs,
    "tpch_q13_custdist": q_tpch_q13_custdist,
    "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "cube_order_totals": q_cube_order_totals,
    "topn_orders_per_customer": q_topn_orders_per_customer,
    "tpch_q18_large_orders": q_tpch_q18_large_orders,
    "tpch_q20_nested_semijoin": q_tpch_q20_nested_semijoin,
    "tpch_q21_waiting_supplier": q_tpch_q21_waiting_supplier,
    "tpch_q22_global_sales": q_tpch_q22_global_sales,
    "antijoin_dormant_customers": q_antijoin_dormant_customers,
    "rollup_order_totals": q_rollup_order_totals,
    "window_distribution": q_window_distribution,
    "value_percentiles": q_value_percentiles,
    "pivot_status_counts": q_pivot_status_counts,
    "dq_orders_checks": q_dq_orders_checks,
    "date_spine_monthly_revenue": q_date_spine_monthly_revenue,
    "set_ops_customer_cohorts": q_set_ops_customer_cohorts,
    "json_props_stats": q_json_props_stats,
    "trailing_30d_totals": q_trailing_30d_totals,
    "unpivot_lineitem_charges": q_unpivot_lineitem_charges,
    "embedding_norm_stats": q_embedding_norm_stats,
    "split_stratified_counts": q_split_stratified_counts,
    "mixture_sample_counts": q_mixture_sample_counts,
    "pack_token_bins": q_pack_token_bins,
    "shuffle_order": q_shuffle_order,
    "asof_orders_before_events": q_asof_orders_before_events,
    "sessionization": q_sessionization,
    "event_type_stats": q_event_type_stats,
    "cohort_retention": q_cohort_retention,
    "funnel_conversion": q_funnel_conversion,
    "card_fighters_by_wins_top50": _card("fighters_by_wins", "wins", 50),
    "card_title_reigns_days_top200": None,  # filled below (custom metric)
    "card_quality_of_opposition_top25": _card(
        "quality_of_opposition_faced", "avg_opponent_win_pct_at_time", 25
    ),
    "multimodal_metadata": q_multimodal_metadata,
    "multimodal_frame_plan": q_multimodal_frame_plan,
    "streaming_tumbling_counts": q_streaming_tumbling_counts,
    "streaming_windowed_distinct": q_streaming_windowed_distinct,
    "streaming_static_join": q_streaming_static_join,
    "streaming_session_windows": q_streaming_session_windows,
    "streaming_sliding_windows": q_streaming_sliding_windows,
    "streaming_dedup_redelivered": q_streaming_dedup_redelivered,
    "streaming_stream_stream_join": q_streaming_stream_stream_join,
    "streaming_foreach_batch_upsert": q_streaming_foreach_batch_upsert,
    "streaming_stateful_profiles": q_streaming_stateful_profiles,
}


def _card_title_reigns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """charts.sh:465-495 shape: reign leaderboard with image url, top 200."""
    from .api import build_model
    from .exprs import image_slug_url

    df = build_model(spark, sf_dir, "title_reigns")
    # (fighter, weight_category, start_date) is the reign PK → total order,
    # so the LIMIT cutoff is deterministic on both engines.
    return (
        df.select(
            "fighter",
            image_slug_url("fighter").alias("fighter_image_url"),
            "weight_category",
            "reign_days",
            "is_active",
            "start_date",
        )
        .orderBy(
            F.desc_nulls_last("reign_days"),
            F.asc("fighter"),
            F.asc("weight_category"),
            F.asc_nulls_last("start_date"),
        )
        .limit(200)
        .drop("start_date")
    )


EXTRA_QUERIES["card_title_reigns_days_top200"] = _card_title_reigns

EXTRA_ORACLES: dict[str, str] = {
    "dedup_exact": """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1 ORDER BY text_hash""",
    "dedup_fingerprint": f"""
SELECT doc_id AS id, md5({_NORM_SQL}) AS fingerprint
FROM documents ORDER BY id""",
    "dedup_minhash_lsh": f"""
WITH {_SHINGLES_SQL.strip().lstrip(',')},
sigs AS ({_MINHASH_SQL}),
buckets AS ({_BANDS_SQL}),
cands AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
),
{_JACCARD_CORE_SQL.strip().lstrip(',')}
SELECT j.id_a, j.id_b, j.shared, j.union_size, j.jaccard
FROM jac j JOIN cands c ON j.id_a = c.id_a AND j.id_b = c.id_b
WHERE j.jaccard >= 0.2 ORDER BY j.id_a, j.id_b""",
    "dedup_clusters": f"""
WITH RECURSIVE {_SHINGLES_SQL.strip().lstrip(',')},
sigs AS ({_MINHASH_SQL}),
buckets AS ({_BANDS_SQL}),
cands AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
),
{_JACCARD_CORE_SQL.strip().lstrip(',')},
dup_pairs AS (
  SELECT j.id_a, j.id_b FROM jac j
  JOIN cands c ON j.id_a = c.id_a AND j.id_b = c.id_b
  WHERE j.jaccard >= 0.2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM dup_pairs
  UNION SELECT id_b, id_a FROM dup_pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
  WHERE r.src <> e.dst
),
comp AS (
  SELECT src AS id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src
)
SELECT d.doc_id AS id, coalesce(c.cluster_id, d.doc_id) AS cluster_id,
  CASE WHEN coalesce(c.cluster_id, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
ORDER BY id""",
    "dedup_ngram_jaccard": f"""
WITH {_SHINGLES_SQL.strip().lstrip(',')},
{_JACCARD_CORE_SQL.strip().lstrip(',')}
SELECT id_a, id_b, shared, union_size, jaccard
FROM jac WHERE jaccard >= 0.2 ORDER BY id_a, id_b""",
    "dedup_prefix_filter": f"""
WITH tok AS (
  SELECT DISTINCT doc_id AS id, t.tok AS token
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) d,
       unnest(toks) AS t(tok)
  WHERE t.tok <> ''
),
sizes AS (SELECT id, count(*) AS n FROM tok GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM tok a JOIN tok b ON a.token = b.token AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT s.id_a, s.id_b, s.shared,
  (na.n + nb.n - s.shared) AS union_size,
  s.shared::DOUBLE / (na.n + nb.n - s.shared) AS jaccard
FROM shared s JOIN sizes na ON s.id_a = na.id JOIN sizes nb ON s.id_b = nb.id
WHERE 100 * s.shared >= 85 * (na.n + nb.n - s.shared)
ORDER BY id_a, id_b""",
    "dedup_simhash": f"""
WITH {_SIMHASH_SQL.strip().lstrip(',')}
SELECT id, simhash FROM simhashes ORDER BY id""",
    "dedup_simhash_pairs": f"""
WITH {_SIMHASH_SQL.strip().lstrip(',')}
SELECT a.id AS id_a, b.id AS id_b,
  bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM simhashes a JOIN simhashes b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
ORDER BY id_a, id_b""",
    "dedup_incremental_batch": f"""
WITH {_SHINGLES_SQL.strip().lstrip(',')},
sigs AS ({_MINHASH_SQL}),
buckets AS ({_BANDS_SQL}),
cands AS (
  SELECT DISTINCT b.id AS batch_id, c.id AS corpus_id
  FROM buckets b JOIN buckets c
    ON b.band = c.band AND b.bucket = c.bucket
  WHERE b.id % 10 = 0 AND c.id % 10 <> 0
),
sizes AS (SELECT id, count(*) AS n FROM shingles GROUP BY id),
shared AS (
  SELECT x.batch_id, x.corpus_id, count(*) AS shared
  FROM cands x
  JOIN shingles a ON a.id = x.batch_id
  JOIN shingles b ON b.id = x.corpus_id AND b.shingle = a.shingle
  GROUP BY x.batch_id, x.corpus_id
)
SELECT s.batch_id, s.corpus_id, s.shared,
  (nb.n + nc.n - s.shared) AS union_size,
  s.shared::DOUBLE / (nb.n + nc.n - s.shared) AS jaccard
FROM shared s
JOIN sizes nb ON s.batch_id = nb.id
JOIN sizes nc ON s.corpus_id = nc.id
WHERE s.shared::DOUBLE / (nb.n + nc.n - s.shared) >= 0.2
ORDER BY batch_id, corpus_id""",
    "dedup_simhash48_pairs": f"""
WITH {_simhash_sql(48).strip().lstrip(',')}
SELECT a.id AS id_a, b.id AS id_b,
  bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM simhashes a JOIN simhashes b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b""",
    "dedup_repeated_spans": f"""
WITH doc_toks AS (
  SELECT doc_id AS id, {_TOKS_SQL} AS toks FROM documents
),
pos AS (
  SELECT id, len(toks) AS n_tokens, t.p - 1 AS pos,
    array_to_string(toks[t.p:t.p+4], ' ') AS gram
  FROM doc_toks, unnest(generate_series(1, len(toks) - 4)) AS t(p)
  WHERE len(toks) >= 5
),
gram_docs AS (
  SELECT gram FROM (SELECT DISTINCT id, gram FROM pos)
  GROUP BY gram HAVING count(*) >= 2
),
dup AS (SELECT p.id, p.pos FROM pos p JOIN gram_docs g USING (gram)),
cov AS (
  SELECT id,
    CASE WHEN lag(pos) OVER (PARTITION BY id ORDER BY pos) IS NULL THEN 5
         ELSE least(5, pos - lag(pos) OVER (PARTITION BY id ORDER BY pos))
    END AS c
  FROM dup
),
per_doc AS (
  SELECT id, max(n_tokens) AS n_tokens, count(*) AS n_positions
  FROM pos GROUP BY id
),
agg AS (
  SELECT id, count(*) AS dup_positions, sum(c) AS covered FROM cov GROUP BY id
)
SELECT b.id, b.n_tokens::BIGINT AS n_tokens,
  b.n_positions::BIGINT AS n_positions,
  coalesce(a.dup_positions, 0)::BIGINT AS dup_positions,
  coalesce(a.covered, 0)::BIGINT AS covered_tokens,
  (coalesce(a.covered, 0) * 10000 // b.n_tokens)::BIGINT AS coverage_bps
FROM per_doc b LEFT JOIN agg a USING (id) ORDER BY id""",
    "dedup_simhash64_pairs": f"""
WITH {_simhash_sql(64).strip().lstrip(',')}
SELECT a.id AS id_a, b.id AS id_b,
  bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM simhashes a JOIN simhashes b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b""",
    "text_token_stats": f"""
SELECT doc_id AS id, len({_TOKS_SQL})::INT AS n_tokens,
  len(list_distinct({_TOKS_SQL}))::INT AS n_unique_tokens,
  length({_NORM_SQL})::INT AS n_chars_norm
FROM documents ORDER BY id""",
    "text_language_id": f"""
SELECT doc_id AS id, len({_TOKS_SQL})::INT AS n_tokens,
  len(list_filter({_TOKS_SQL}, t -> list_contains({_STOPLIST_SQL}, t)))::INT AS stop_tokens,
  CASE WHEN len(list_filter({_TOKS_SQL}, t -> list_contains({_STOPLIST_SQL}, t))) * 20
            >= len({_TOKS_SQL}) THEN 'en' ELSE 'und' END AS lang_guess
FROM documents ORDER BY id""",
    "text_chunks": f"""
WITH base AS (
  SELECT doc_id AS id, {_NORM_SQL} AS norm FROM documents
  WHERE length({_NORM_SQL}) > 0
),
counted AS (
  SELECT id, norm,
    CASE WHEN length(norm) <= 200 THEN 0
         ELSE ceil((length(norm) - 200)::DOUBLE / 150)::INT END AS n_chunks
  FROM base
)
SELECT id, (s.start // 150)::INT AS chunk_idx,
  substr(norm, s.start + 1, 200) AS chunk_text,
  length(substr(norm, s.start + 1, 200))::INT AS chunk_chars
FROM counted, unnest(generate_series(0, n_chunks * 150, 150)) AS s(start)
ORDER BY id, chunk_idx""",
    "text_bpe_estimate": f"""
WITH base AS (SELECT doc_id AS id, {_NORM_SQL} AS norm FROM documents)
SELECT id,
  len(regexp_extract_all(norm, '[a-z0-9]+'))::INT AS word_runs,
  len(regexp_extract_all(norm, '[^a-z0-9 ]'))::INT AS punct_chars,
  (coalesce(list_sum(list_transform(regexp_extract_all(norm, '[a-z0-9]+'),
      w -> (length(w) + 3) // 4)), 0)
   + len(regexp_extract_all(norm, '[^a-z0-9 ]')))::BIGINT AS est_tokens
FROM base ORDER BY id""",
    "vocab_top_terms": f"""
WITH toks AS (
  SELECT doc_id AS id, unnest({_TOKS_SQL}) AS term FROM documents
)
SELECT term, count(*) AS n_occurrences, count(DISTINCT id) AS n_docs
FROM toks WHERE term <> ''
GROUP BY term
ORDER BY n_occurrences DESC, term ASC
LIMIT 100""",
    "text_quality_score": f"""
WITH q AS (
  SELECT doc_id AS id,
    CASE WHEN length({_NORM_SQL}) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END AS len_ok,
    CASE WHEN len(list_distinct({_TOKS_SQL})) * 5 >= len({_TOKS_SQL}) THEN 1 ELSE 0 END AS diversity_ok,
    CASE WHEN length(regexp_replace({_NORM_SQL}, '[^a-z]', '', 'g')) * 5
              >= length({_NORM_SQL}) * 3 THEN 1 ELSE 0 END AS alpha_ok
  FROM documents
)
SELECT id, len_ok, diversity_ok, alpha_ok,
  (len_ok + diversity_ok + alpha_ok) AS quality
FROM q ORDER BY id""",
    "dedup_embedding_cosine": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= 0.4
ORDER BY id_a, id_b""",
    "dedup_embedding_lsh": _embedding_lsh_oracle(
        n_bands=4, band_bits=4, threshold=0.4
    ),
    "ann_lsh_recall_audit": f"""
WITH truth AS (
  SELECT count(*) AS n_true FROM (
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
          >= 0.4
  )
),
found AS (
  SELECT count(*) AS n_found FROM (
    {_embedding_lsh_oracle(n_bands=4, band_bits=4, threshold=0.4)}
  )
)
SELECT n_true::BIGINT AS n_true, n_found::BIGINT AS n_found,
  CASE WHEN n_true = 0 THEN 10000
       ELSE (n_found * 10000 // n_true) END::BIGINT AS recall_bps
FROM truth, found""",
    "dedup_embedding_lsh90": _embedding_lsh_oracle(
        n_bands=4, band_bits=16, threshold=0.9
    ),
    "dedup_embedding_incremental": """
WITH weights AS (
  SELECT p.plane, d.dim,
    ((('0x' || substr(md5(p.plane || ':' || d.dim), 1, 15))::BIGINT % 2000) - 1000) AS w
  FROM (SELECT unnest(generate_series(0, 15)) AS plane) p,
       (SELECT unnest(generate_series(0, 63)) AS dim) d
),
comps AS (
  SELECT e.vec_id AS id, w.plane,
    sum(floor(e.x::DOUBLE * 1000000)::BIGINT * w.w) AS dot
  FROM (SELECT vec_id, embedding[d.dim + 1]::DOUBLE AS x, d.dim
        FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS dim) d) e
  JOIN weights w ON e.dim = w.dim
  GROUP BY e.vec_id, w.plane
),
buckets AS (
  SELECT id, sum(CASE WHEN dot > 0 THEN (1::BIGINT << plane::INT) ELSE 0 END)::BIGINT AS bucket
  FROM comps GROUP BY id
),
bands AS (
  SELECT bu.id, bd.band, (bu.bucket >> (bd.band * 4)) & 15 AS key
  FROM buckets bu, (SELECT unnest(generate_series(0, 3)) AS band) bd
),
cands AS (
  SELECT DISTINCT b.id AS batch_id, c.id AS corpus_id
  FROM bands b JOIN bands c ON b.band = c.band AND b.key = c.key
  WHERE b.id % 10 = 0 AND c.id % 10 <> 0
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT cd.batch_id, cd.corpus_id
FROM cands cd
JOIN e a ON cd.batch_id = a.vec_id
JOIN e b ON cd.corpus_id = b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= 0.4
ORDER BY batch_id, corpus_id""",
    "ann_ivf_topk": """
WITH reps AS (
  SELECT label AS rep_list, embedding::DOUBLE[] AS rep_vec
  FROM (
    SELECT label, embedding,
      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
    FROM embeddings
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
      FROM embeddings WHERE vec_id % 50 = 0),
probes AS (
  SELECT query_id, qvec, rep_list AS probe_list FROM (
    SELECT q.query_id, q.qvec, r.rep_list,
      row_number() OVER (PARTITION BY q.query_id ORDER BY
        list_dot_product(r.rep_vec, q.qvec)
          / (sqrt(list_dot_product(r.rep_vec, r.rep_vec))
             * sqrt(list_dot_product(q.qvec, q.qvec))) DESC, r.rep_list) AS pr
    FROM q, reps r
  ) WHERE pr <= 2
),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
    list_dot_product(e.embedding::DOUBLE[], p.qvec)
      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
         * sqrt(list_dot_product(p.qvec, p.qvec))) AS cosine
  FROM embeddings e JOIN probes p ON e.label = p.probe_list
  WHERE e.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, rank::INT AS rank FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 10 ORDER BY query_id, rank""",
    "ann_cosine_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_dot_product(e.embedding::DOUBLE[], q.qvec)
      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
         * sqrt(list_dot_product(q.qvec, q.qvec))) AS cosine
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank::INT AS rank FROM ranked
WHERE rank <= 10 ORDER BY query_id, rank""",
    "ann_incremental_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_dot_product(e.embedding::DOUBLE[], q.qvec)
      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
         * sqrt(list_dot_product(q.qvec, q.qvec))) AS cosine
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank::INT AS rank FROM ranked
WHERE rank <= 10 ORDER BY query_id, rank""",
    "ann_lsh_buckets": """
WITH weights AS (
  SELECT p.plane, d.dim,
    ((('0x' || substr(md5(p.plane || ':' || d.dim), 1, 15))::BIGINT % 2000) - 1000) AS w
  FROM (SELECT unnest(generate_series(0, 7)) AS plane) p,
       (SELECT unnest(generate_series(0, 63)) AS dim) d
),
comps AS (
  SELECT e.vec_id AS id, w.plane,
    sum(floor(e.x::DOUBLE * 1000000)::BIGINT * w.w) AS dot
  FROM (SELECT vec_id, embedding[d.dim + 1]::DOUBLE AS x, d.dim
        FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS dim) d) e
  JOIN weights w ON e.dim = w.dim
  GROUP BY e.vec_id, w.plane
)
SELECT id, sum(CASE WHEN dot > 0 THEN (1::BIGINT << plane::INT) ELSE 0 END)::BIGINT AS bucket
FROM comps GROUP BY id ORDER BY id""",
    "salted_event_type_stats": """
SELECT event_type, count(*) AS n, sum(user_id)::BIGINT AS sum_user_id
FROM events GROUP BY event_type ORDER BY event_type""",
    "bucketed_customer_order_totals": """
SELECT c_nationkey, count(*) AS n_orders,
  sum(o_totalprice::DECIMAL(18,4))::DOUBLE AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey ORDER BY c_nationkey""",
    "tpch_q1": """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity::DECIMAL(18,4))::DOUBLE AS sum_qty,
  sum(l_extendedprice::DECIMAL(18,4))::DOUBLE AS sum_base_price,
  sum((l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(38,8))::DOUBLE AS sum_disc_price,
  count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    "tpch_q3": """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  sum((l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(38,8))::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "tpch_q5": """
SELECT n_name,
  sum((l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(38,8))::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "asof_orders_before_events": """
WITH joined AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
    row_number() OVER (PARTITION BY e.event_id
      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, ts, o_orderkey, o_orderdate
FROM joined WHERE rn = 1 ORDER BY event_id""",
    "sessionization": """
WITH gaps AS (
  SELECT user_id, ts, event_id,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN prev_ts IS NULL OR (epoch_us(ts) // 1000000) - (epoch_us(prev_ts) // 1000000) > 1800 THEN 1 ELSE 0 END AS new_session
  FROM gaps
),
sessions AS (
  SELECT user_id, ts,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq::BIGINT AS session_seq, count(*) AS n_events,
  min(ts) AS session_start, max(ts) AS session_end
FROM sessions GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",
    "event_type_stats": """
SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
  sum(value::DECIMAL(18,4))::DOUBLE AS sum_value,
  count(*) FILTER (WHERE value > 50) AS n_high
FROM events GROUP BY event_type ORDER BY event_type""",
    "tpch_q4_semijoin": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "tpch_q6_pushdown": """
SELECT
  sum((l_extendedprice::DECIMAL(18,4) * l_discount::DECIMAL(18,4))::DECIMAL(38,8))::DOUBLE AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 25""",
    "tpch_q17_smallqty": """
WITH per_part AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand, count(*) AS n_items,
  sum(l.l_extendedprice::DECIMAL(18,4))::DOUBLE AS small_qty_revenue
FROM lineitem l
JOIN per_part a ON l.l_partkey = a.l_partkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_quantity < 0.2 * a.avg_qty
GROUP BY p.p_brand ORDER BY p.p_brand""",
    "tpch_q12_priority_by_flag": """
SELECT l_returnflag,
  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag ORDER BY l_returnflag""",
    "tpch_q14_promo_revenue": """
SELECT
  100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
    THEN (l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(38,8)
    ELSE 0::DECIMAL(38,8) END)::DOUBLE
  / sum((l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(38,8))::DOUBLE
  AS promo_revenue_pct,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey""",
    "tpch_q19_disjunctive_join": """
SELECT
  sum((l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(38,8))::DOUBLE AS revenue,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)""",
    "tpch_q7_nation_pairs": """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  year(l.l_shipdate)::INT AS l_year,
  sum((l.l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l.l_discount::DECIMAL(18,4)))::DECIMAL(38,8))::DOUBLE AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year""",
    "cube_order_totals": """
SELECT o_orderpriority, o_orderstatus,
  grouping_id(o_orderpriority, o_orderstatus)::INT AS gid,
  count(*) AS n_orders,
  sum(o_totalprice::DECIMAL(18,4))::DOUBLE AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY gid ASC, o_orderpriority ASC NULLS LAST, o_orderstatus ASC NULLS LAST""",
    "topn_orders_per_customer": """
WITH ranked AS (
  SELECT o_custkey,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk,
    o_orderkey, o_totalprice
  FROM orders
)
SELECT o_custkey, rk::INT AS rk, o_orderkey, o_totalprice
FROM ranked WHERE rk <= 3
ORDER BY o_custkey, rk""",
    "tpch_q13_custdist": """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""",
    "tpch_q15_top_supplier": """
WITH per_sup AS (
  SELECT l_suppkey,
    sum((l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(38,8)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, p.total_revenue::DOUBLE AS total_revenue
FROM per_sup p JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.total_revenue = (SELECT max(total_revenue) FROM per_sup)
ORDER BY s.s_suppkey""",
    "tpch_q18_large_orders": """
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
  sum(l.l_quantity::DECIMAL(18,4))::DOUBLE AS sum_qty
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity::DECIMAL(18,4)) > 150
)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 100""",
    "tpch_q20_nested_semijoin": """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity::DECIMAL(18,4)) > 50
)
AND s.s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
ORDER BY s.s_suppkey""",
    "tpch_q21_waiting_supplier": """
SELECT s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC""",
    "tpch_q22_global_sales": """
WITH coded AS (
  SELECT right(c_name, 2) AS cntrycode, c_custkey, c_acctbal
  FROM customer
  WHERE right(c_name, 2) IN ('01','13','17','18','23','29','30','31')
), stats AS (
  SELECT sum(c_acctbal::DECIMAL(18,4)) AS tot_bal, count(*) AS n_pos
  FROM coded WHERE c_acctbal > 0.0
)
SELECT cntrycode, count(*) AS numcust,
  sum(c_acctbal::DECIMAL(18,4))::DOUBLE AS totacctbal
FROM coded, stats
WHERE c_acctbal::DECIMAL(18,4) * n_pos > tot_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = coded.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY cntrycode ORDER BY cntrycode""",
    "antijoin_dormant_customers": """
WITH stats AS (
  SELECT sum(c_acctbal::DECIMAL(18,4)) AS tot_bal, count(*) AS n_cust
  FROM customer
)
SELECT c.c_nationkey, count(*) AS n_customers,
  sum(c.c_acctbal::DECIMAL(18,4))::DOUBLE AS total_balance
FROM customer c, stats s
WHERE c.c_acctbal::DECIMAL(18,4) * s.n_cust > s.tot_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c.c_nationkey ORDER BY c.c_nationkey""",
    "rollup_order_totals": """
SELECT o_orderpriority, o_orderstatus,
  grouping_id(o_orderpriority, o_orderstatus)::INT AS gid,
  count(*) AS n_orders,
  sum(o_totalprice::DECIMAL(18,4))::DOUBLE AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY gid ASC, o_orderpriority ASC NULLS LAST, o_orderstatus ASC NULLS LAST""",
    "json_props_stats": """
SELECT event_type, count(*) AS n,
  count(json_extract(props, '$.k')) AS n_with_k,
  sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
  max(json_extract(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type""",
    "set_ops_customer_cohorts": """
WITH early AS (
  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
),
late AS (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
)
SELECT 'retained' AS cohort, o_custkey FROM (
  SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late
)
UNION ALL
SELECT 'churned', o_custkey FROM (
  SELECT DISTINCT o_custkey FROM early
  EXCEPT SELECT DISTINCT o_custkey FROM late
)
ORDER BY cohort, o_custkey""",
    "date_spine_monthly_revenue": """
WITH bounds AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi
  FROM orders
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH))::TIMESTAMP AS month_start
  FROM bounds
),
monthly AS (
  SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
    count(*) AS n_orders,
    sum(o_totalprice::DECIMAL(18,4))::DOUBLE AS revenue
  FROM orders GROUP BY 1
)
SELECT s.month_start,
  coalesce(m.n_orders, 0) AS n_orders,
  coalesce(m.revenue, 0.0) AS revenue
FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
ORDER BY s.month_start""",
    "trailing_30d_totals": """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
    datediff('day', DATE '1992-01-01', o_orderdate) AS epoch_day,
    o_totalprice::DECIMAL(18,4) AS price
  FROM orders
)
SELECT o_orderkey, o_custkey, o_orderdate,
  sum(price) OVER w::DOUBLE AS trailing_30d_total,
  count(*) OVER w AS trailing_30d_orders
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_day
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey""",
    "dq_orders_checks": """
SELECT check_name, n_violations FROM (
  SELECT 'not_null:o_orderkey' AS check_name,
    count(*) FILTER (WHERE o_orderkey IS NULL) AS n_violations FROM orders
  UNION ALL
  SELECT 'not_null:o_custkey',
    count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
  UNION ALL
  SELECT 'not_null:o_orderdate',
    count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
  UNION ALL
  SELECT 'accepted_values:o_orderstatus',
    count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('F','O','P')) FROM orders
  UNION ALL
  SELECT 'unique:o_orderkey',
    (SELECT count(*) FROM (
       SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
  UNION ALL
  SELECT 'fk:o_custkey->customer.c_custkey',
    (SELECT count(*) FROM orders o
     WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
       SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
) ORDER BY check_name""",
    "pivot_status_counts": """
SELECT o_orderpriority,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
  sum(o_totalprice::DECIMAL(18,4))::DOUBLE AS total_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "unpivot_lineitem_charges": """
SELECT component, count(*) AS n, sum(amount)::DOUBLE AS total_amount
FROM (
  SELECT 'price' AS component, l_extendedprice::DECIMAL(18,4) AS amount FROM lineitem
  UNION ALL SELECT 'discount', l_discount::DECIMAL(18,4) FROM lineitem
  UNION ALL SELECT 'tax', l_tax::DECIMAL(18,4) FROM lineitem
)
GROUP BY component ORDER BY component""",
    "embedding_norm_stats": """
WITH e AS (
  SELECT label,
    round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 6)::DECIMAL(18,6) AS norm6,
    len(list_filter(embedding, x -> x > 0)) AS n_pos
  FROM embeddings
)
SELECT label, count(*) AS n_vectors,
  sum(norm6)::DOUBLE / count(*) AS avg_l2_norm,
  sum(n_pos)::DOUBLE / count(*) AS avg_positive_dims
FROM e GROUP BY label ORDER BY label""",
    "value_percentiles": """
SELECT event_type,
  quantile_cont(value, 0.25) AS p25,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.9) AS p90,
  quantile_cont(value, 0.99) AS p99,
  count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type""",
    "window_distribution": """
SELECT event_id, event_type,
  ntile(4) OVER w AS quartile,
  percent_rank() OVER w AS pr,
  cume_dist() OVER w AS cd,
  first_value(event_id) OVER w AS first_id,
  nth_value(event_id, 2) OVER w AS second_id
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
ORDER BY event_id""",
    "pack_token_bins": """
WITH t AS (
  SELECT doc_id AS id, lang, (floor(n_chars / 4) + 1)::BIGINT AS tokens
  FROM documents
)
SELECT id, lang, tokens,
  ((sum(tokens) OVER (PARTITION BY lang ORDER BY id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens) // 4096)::BIGINT AS bin
FROM t ORDER BY id""",
}

EXTRA_ORACLES["split_stratified_counts"] = f"""
WITH s AS (
  SELECT lang, {_split_case_sql('doc_id')} AS split, n_chars FROM documents
)
SELECT lang, split, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM s GROUP BY lang, split ORDER BY lang, split"""

def _mix_thresholds_sql() -> str:
    # identical truncation to training.mixture_sample: int(rate * 65536)
    whens = " ".join(
        f"WHEN '{name}' THEN '{format(min(int(rate * 65536), 65536), '05x')}'"
        for name, rate in _MIX_RATES.items()
    )
    default = format(min(int(_MIX_DEFAULT * 65536), 65536), "05x")
    return f"CASE source {whens} ELSE '{default}' END"


EXTRA_ORACLES["mixture_sample_counts"] = f"""
WITH kept AS (
  SELECT source, doc_id FROM documents
  WHERE '0' || substr(md5('{_MIX_SEED}:' || doc_id::VARCHAR), 1, 4)
        < {_mix_thresholds_sql()}
)
SELECT source, count(*) AS n_kept, sum(doc_id)::BIGINT AS sum_ids
FROM kept GROUP BY source ORDER BY source"""

EXTRA_ORACLES["shuffle_order"] = f"""
SELECT doc_id AS id,
  row_number() OVER (
    ORDER BY md5('{_SPLIT_SEED}:' || doc_id::VARCHAR), doc_id) AS pos
FROM documents ORDER BY pos"""

EXTRA_ORACLES["card_fighters_by_wins_top50"] = _card_oracle(
    "fighters_by_wins", "wins", 50
)
EXTRA_ORACLES["card_quality_of_opposition_top25"] = _card_oracle(
    "quality_of_opposition_faced", "avg_opponent_win_pct_at_time", 25
)


def _card_title_reigns_oracle() -> str:
    from .oracle import oracle_for

    return f"""
SELECT fighter, fighter_image_url, weight_category, reign_days, is_active FROM (
  SELECT fighter, {_IMG_SQL} AS fighter_image_url, weight_category,
         reign_days, is_active, start_date
  FROM ({oracle_for('title_reigns')})
  ORDER BY reign_days DESC NULLS LAST, fighter, weight_category,
           start_date ASC NULLS LAST
  LIMIT 200
)"""


EXTRA_ORACLES["card_title_reigns_days_top200"] = _card_title_reigns_oracle()

EXTRA_ORACLES["multimodal_metadata"] = f"""
SELECT doc_id AS media_id, {_KIND_SQL} AS kind,
  octet_length(encode(text))::BIGINT AS n_bytes, md5(text) AS digest
FROM documents ORDER BY media_id"""

EXTRA_ORACLES["multimodal_frame_plan"] = f"""
WITH decoded AS (
  SELECT doc_id AS media_id,
    (1 + ('0x' || substr(md5(text), 1, 8))::BIGINT % 300)::INT AS n_frames
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id, f.frame_idx::INT AS frame_idx
FROM decoded, unnest(generate_series(0, n_frames - 1, 30)) AS f(frame_idx)
ORDER BY media_id, frame_idx"""

EXTRA_ORACLES["real_codec_decode_audit"] = """
SELECT doc_id AS media_id, 4 AS width, 4 AS height, 1 AS n_frames,
  3 * SUM(
    16 * (strpos('0123456789abcdef',
                 substr(md5(doc_id::VARCHAR), 2 * t.i + 1, 1)) - 1)
      + strpos('0123456789abcdef',
               substr(md5(doc_id::VARCHAR), 2 * t.i + 2, 1)) - 1
  )::BIGINT AS pixel_sum
FROM documents, range(16) t(i)
WHERE doc_id % 10 = 0
GROUP BY doc_id ORDER BY media_id"""

def _dbyte_sql(idx_expr: str, md5_arg: str = "doc_id::VARCHAR") -> str:
    """DuckDB expression for byte value ``idx_expr`` (0-based) of
    md5(``md5_arg``) — the digest bytes the Spark side packs into the
    synthesized media payloads."""
    return (
        f"16 * (strpos('0123456789abcdef', substr(md5({md5_arg}), "
        f"2 * ({idx_expr}) + 1, 1)) - 1) "
        f"+ strpos('0123456789abcdef', substr(md5({md5_arg}), "
        f"2 * ({idx_expr}) + 2, 1)) - 1"
    )


# Replays q_png_codec_decode_audit's expected pixels without touching a
# single PNG byte: scanline 0 is digest bytes 0-11 verbatim (filter
# None); scanlines 1-3 add tiled digest deltas mod 256 (filter Up), so
# the oracle accumulates r0..r3 per column x exactly as the decoder's
# unfilter pass must.
EXTRA_ORACLES["png_codec_decode_audit"] = f"""
WITH b AS (
  SELECT doc_id, t.x,
    {_dbyte_sql("t.x")} AS b0,
    {_dbyte_sql("(12 + t.x) % 16")} AS b1,
    {_dbyte_sql("(24 + t.x) % 16")} AS b2,
    {_dbyte_sql("(36 + t.x) % 16")} AS b3
  FROM documents, range(12) t(x)
  WHERE doc_id % 10 = 5
), r AS (
  SELECT doc_id,
    b0 AS r0,
    (b0 + b1) % 256 AS r1,
    ((b0 + b1) % 256 + b2) % 256 AS r2,
    (((b0 + b1) % 256 + b2) % 256 + b3) % 256 AS r3
  FROM b
)
SELECT doc_id AS media_id, 4 AS width, 4 AS height, 1 AS n_frames,
  SUM(r0 + r1 + r2 + r3)::BIGINT AS pixel_sum
FROM r GROUP BY doc_id ORDER BY media_id"""

# The JPEG audit's 16 constant blocks are md5 bytes; the oracle never
# builds a JPEG — the constant-block DC path is exact, so plain digest
# arithmetic IS the decoded answer.
EXTRA_ORACLES["jpeg_codec_decode_audit"] = f"""
SELECT doc_id AS media_id, 32 AS width, 32 AS height, 1 AS n_frames,
  (64 * SUM(b))::BIGINT AS gray_sum,
  MIN(b)::BIGINT AS min_byte,
  MAX(b)::BIGINT AS max_byte
FROM (
  SELECT doc_id, {_dbyte_sql("t.i")} AS b
  FROM documents, range(16) t(i)
  WHERE doc_id % 10 = 3
)
GROUP BY doc_id ORDER BY media_id"""

# GIF is lossless over an identity-gray palette: decoded gray sums ARE
# digest sums. Same arithmetic shape as the JPEG audit, different sample.
EXTRA_ORACLES["gif_codec_decode_audit"] = f"""
SELECT doc_id AS media_id, 4 AS width, 4 AS height, 1 AS n_frames,
  SUM(b)::BIGINT AS gray_sum,
  MIN(b)::BIGINT AS min_byte,
  MAX(b)::BIGINT AS max_byte
FROM (
  SELECT doc_id, {_dbyte_sql("t.i")} AS b
  FROM documents, range(16) t(i)
  WHERE doc_id % 10 = 8
)
GROUP BY doc_id ORDER BY media_id"""

# The G.711 µ-law expansion evaluated symbolically: u = 255-b;
# linear = ±(((u mod 16)·8 + 132) · 2^((u div 16) mod 8) − 132).
EXTRA_ORACLES["ulaw_codec_decode_audit"] = f"""
WITH s AS (
  SELECT doc_id,
    CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END AS smp
  FROM (
    SELECT doc_id, u,
      ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) AS t
    FROM (
      SELECT doc_id, 255 - ({_dbyte_sql("t.i")}) AS u
      FROM documents, range(16) t(i)
      WHERE doc_id % 10 = 9
    )
  )
)
SELECT doc_id AS media_id, 1 AS n_channels, 8000 AS sample_rate,
  16 AS n_samples,
  SUM(smp)::BIGINT AS sample_sum,
  MIN(smp)::BIGINT AS min_sample,
  MAX(smp)::BIGINT AS max_sample
FROM s GROUP BY doc_id ORDER BY media_id"""

# Rebuilds the 8 little-endian int16 samples (lo + 256·hi, two's
# complement) from DuckDB's md5 — the WAV bytes never exist oracle-side.
EXTRA_ORACLES["wav_codec_decode_audit"] = f"""
WITH s AS (
  SELECT doc_id,
    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS smp
  FROM (
    SELECT doc_id,
      {_dbyte_sql("2 * t.i")} + 256 * ({_dbyte_sql("2 * t.i + 1")}) AS raw
    FROM documents, range(8) t(i)
    WHERE doc_id % 10 = 2
  )
)
SELECT doc_id AS media_id, 1 AS n_channels, 8000 AS sample_rate,
  8 AS n_samples,
  SUM(smp)::BIGINT AS sample_sum,
  MIN(smp)::BIGINT AS min_sample,
  MAX(smp)::BIGINT AS max_sample
FROM s GROUP BY doc_id ORDER BY media_id"""

# Walks the 48 stored BMP bytes (d1 ∥ d2 ∥ d1, BGR interleaved) and
# groups by j % 3 — channel sums differ because the two digests differ.
EXTRA_ORACLES["bmp_codec_decode_audit"] = f"""
WITH bytes AS (
  SELECT doc_id, t.j,
    CASE WHEN t.j < 16 THEN {_dbyte_sql("t.j")}
         WHEN t.j < 32 THEN {_dbyte_sql("t.j - 16", "doc_id::VARCHAR || 'x'")}
         ELSE {_dbyte_sql("t.j - 32")} END AS v
  FROM documents, range(48) t(j)
  WHERE doc_id % 10 = 7
)
SELECT doc_id AS media_id, 4 AS width, 4 AS height, 1 AS n_frames,
  SUM(CASE WHEN j % 3 = 2 THEN v ELSE 0 END)::BIGINT AS r_sum,
  SUM(CASE WHEN j % 3 = 1 THEN v ELSE 0 END)::BIGINT AS g_sum,
  SUM(CASE WHEN j % 3 = 0 THEN v ELSE 0 END)::BIGINT AS b_sum
FROM bytes GROUP BY doc_id ORDER BY media_id"""

EXTRA_ORACLES["streaming_tumbling_counts"] = """
SELECT to_timestamp(((epoch_us(ts) // 1000000) // 300) * 300)::TIMESTAMP AS window_start,
  event_type, count(*) AS n,
  sum(value::DECIMAL(18,4))::DOUBLE AS sum_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""

EXTRA_ORACLES["streaming_windowed_distinct"] = """
SELECT to_timestamp(((epoch_us(ts) // 1000000) // 900) * 900)::TIMESTAMP AS window_start,
  count(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY 1 ORDER BY window_start"""

EXTRA_ORACLES["streaming_static_join"] = """
SELECT to_timestamp(((epoch_us(e.ts) // 1000000) // 900) * 900)::TIMESTAMP AS window_start,
  c.c_nationkey, count(*) AS n_events,
  sum(e.value::DECIMAL(18,4))::DOUBLE AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2 ORDER BY window_start, c_nationkey"""

EXTRA_ORACLES["streaming_session_windows"] = """
WITH gaps AS (
  SELECT user_id, ts,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts,
    CASE WHEN prev_ts IS NULL OR (epoch_us(ts) // 1000000) - (epoch_us(prev_ts) // 1000000) > 1800 THEN 1 ELSE 0 END AS new_session
  FROM gaps
),
sessions AS (
  SELECT user_id, ts,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, count(*) AS n_events,
  min(ts) AS session_start, max(ts) AS session_end
FROM sessions GROUP BY user_id, session_seq
ORDER BY user_id, session_start"""

EXTRA_ORACLES["streaming_stateful_profiles"] = """
WITH ranked AS (
  SELECT user_id, value, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, count(*) AS n_events,
  sum(floor(value * 100)::BIGINT)::BIGINT AS value_cents,
  max(CASE WHEN rn = 1 THEN event_type END) AS last_event_type
FROM ranked GROUP BY user_id ORDER BY user_id"""

EXTRA_ORACLES["streaming_sliding_windows"] = """
WITH contrib AS (
  SELECT user_id,
    to_timestamp(((epoch_us(ts) // 1000000) // 300) * 300 - off.o)::TIMESTAMP AS window_start
  FROM events, (SELECT unnest([0, 300]) AS o) off
)
SELECT window_start, user_id, count(*) AS n_events
FROM contrib GROUP BY 1, 2 ORDER BY window_start, user_id"""

EXTRA_ORACLES["streaming_dedup_redelivered"] = """
SELECT event_id, ts, user_id, event_type, value
FROM events ORDER BY event_id"""

EXTRA_ORACLES["text_ngram_repetition"] = """
WITH w AS (
  SELECT doc_id AS id, string_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT id,
    list_transform(range(1, greatest(len(words) - 1, 0) + 1),
                   i -> words[i] || ' ' || words[i + 1]) AS grams
  FROM w
)
SELECT id, len(grams) AS total_ngrams,
  len(list_distinct(grams)) AS distinct_ngrams,
  CASE WHEN len(grams) > 0
    THEN 1.0 - len(list_distinct(grams))::DOUBLE / len(grams)::DOUBLE
    ELSE 0.0 END AS repetition_ratio
FROM g ORDER BY id"""

EXTRA_ORACLES["embedding_quantize_int8"] = """
WITH stats AS (
  SELECT min(x)::DOUBLE AS q_min, max(x)::DOUBLE AS q_max
  FROM (SELECT unnest(embedding) AS x FROM embeddings)
),
codes AS (
  SELECT vec_id,
    list_transform(embedding, x ->
      least(255, greatest(0,
        floor((x::DOUBLE - q_min) / (q_max - q_min) * 255.0)::INT))) AS codes
  FROM embeddings, stats
)
SELECT vec_id, list_aggregate(codes, 'sum')::BIGINT AS code_sum,
  codes[1] AS first_code
FROM codes ORDER BY vec_id"""

EXTRA_ORACLES["range_join_order_window_events"] = """
SELECT s.event_id AS signup_id, count(*) AS n_purchases
FROM events s JOIN events p
  ON p.user_id = s.user_id
 AND s.event_type = 'signup' AND p.event_type = 'purchase'
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 3 DAY
GROUP BY signup_id ORDER BY signup_id"""

EXTRA_ORACLES["cohort_retention"] = """
WITH cohorts AS (
  SELECT user_id, min(ts)::DATE AS cohort_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, ts::DATE AS active_day FROM events
)
SELECT c.cohort_day,
  (a.active_day - c.cohort_day)::INT AS day_offset,
  count(DISTINCT a.user_id) AS n_active_users
FROM activity a JOIN cohorts c USING (user_id)
WHERE a.active_day - c.cohort_day >= 0
GROUP BY 1, 2 ORDER BY 1, 2"""

EXTRA_ORACLES["funnel_conversion"] = """
WITH s AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s.s_ts
    AND e.ts <= s.s_ts + INTERVAL 1 DAY GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
    AND e.ts <= c.c_ts + INTERVAL 1 DAY GROUP BY e.user_id
)
SELECT count(s.s_ts) AS n_signup,
  count(c.c_ts) AS n_click_after_signup,
  count(p.p_ts) AS n_purchase_after_click
FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""

EXTRA_ORACLES["streaming_foreach_batch_upsert"] = """
SELECT user_id, count(*) AS n_events,
  sum(floor(value * 100)::BIGINT)::BIGINT AS value_cents
FROM events GROUP BY user_id ORDER BY user_id"""

EXTRA_ORACLES["streaming_stream_stream_join"] = """
SELECT s.user_id, s.event_id AS signup_id, s.ts AS signup_ts,
  p.event_id AS purchase_id, p.ts AS purchase_ts, p.value
FROM events s JOIN events p
  ON s.user_id = p.user_id
 AND s.event_type = 'signup' AND p.event_type = 'purchase'
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
ORDER BY s.user_id, signup_id, purchase_id"""

# Heavier extra queries worth timing at sf0.1
BENCH_EXTRA = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q9_product_profit",
    "tpch_q10_returned_revenue",
    "sessionization",
    "asof_orders_before_events",
    # statistical / pandas-API / fuzzy families (one representative each)
    "ts_zscore_outliers",
    "cogroup_asof_view_purchase",
    "fuzzy_part_name_pairs",
    # iterative graph, Arrow bulk-inference, and the composed curation DAG
    "graph_pagerank_top100",
    "ann_cosine_scores_arrow",
    "curation_pipeline_e2e",
    # feature-store point-in-time assembly (one keyed window over events)
    "pit_feature_assembly",
    # grid-join spatial family and frontier-only BFS (bounded outputs)
    "spatial_nn_customers",
    "graph_bfs_hops",
    # bucket-grid range join (the no-shared-key interval containment)
    "interval_overlap_counts",
    # lexical + hybrid retrieval, distributed prefix-sum sampling, and
    # the weighted iterative-graph path
    "bm25_doc_ranking",
    "rrf_hybrid_search",
    "pps_systematic_sample",
    "graph_sssp_bounded",
    # late-interaction retrieval (Arrow einsum path), greedy coreset
    # selection, video scene cuts, and iterative LPA communities
    "ann_maxsim_arrow",
    "coreset_kcenter_selection",
    "multimodal_scene_cuts",
    "graph_label_propagation",
    # round-2 scale paths: banded simhash pairing at production width
    # (the 24-bit demo config's 3-bit bands degenerate on this
    # near-identical synthetic corpus — quadratic candidates, like the
    # un-benched prefix_filter; 48-bit/4096-way buckets is the config a
    # deployment runs), the incremental batch-vs-corpus index probe, and
    # PQ/ADC retrieval (time is dominated by one-time codebook learning —
    # 4 subspace k-means; the ADC scan itself is map-only lookups)
    "dedup_simhash48_pairs",
    "dedup_incremental_batch",
    "ann_pq_adc_topk",
    # round-3 scale paths, base-scale rows so the 10× scale tier has
    # same-session ratios: full-width 64-bit simhash (16-bit bands), the
    # candidate-restricted embedding dedup (banded hyperplane LSH → two
    # hash joins → exact cosine verify), and one AvailableNow streaming
    # pass (fresh checkpoint per run, so each timing re-processes all
    # input files — the replayable-batch cost, not a warm no-op)
    "dedup_simhash64_pairs",
    "dedup_embedding_lsh90",
    "streaming_tumbling_counts",
    # cross-doc verbatim-span coverage: one gram-keyed exchange + per-doc
    # window — the substring-dedup audit, linear in corpus size
    "dedup_repeated_spans",
    # r7 real-codec paths: PNG (zlib inflate + unfilter per payload) and
    # baseline JPEG (the heaviest — real Huffman+DCT encode AND decode
    # per row, both inside Arrow UDFs); per-payload CPU cost is the
    # design point, the bench pins the per-row constant
    "png_codec_decode_audit",
    "jpeg_codec_decode_audit",
]
# NOT benchmarked: dedup_prefix_filter / graph_triangle_census — on this
# synthetic corpus (5000 near-identical docs; a 91%-dense co-purchase
# graph) their OUTPUT is quadratic (~millions of qualifying pairs /
# ~1.5e8 real triangles), so wall time measures result size, not plan
# quality. Both stay correctness-gated at sf0.01 via their oracles.

for _name, _spec in CARD_SPECS.items():
    EXTRA_QUERIES[_name] = _make_card(_spec)
    EXTRA_ORACLES[_name] = _make_card_oracle(_spec)

# Remaining TPC-H shapes (Q2/Q8/Q9/Q10/Q11/Q16 adapted to the testdata
# schema) live in tpch_extra.py to keep this module navigable.
from .tpch_extra import TPCH_EXTRA_ORACLES, TPCH_EXTRA_QUERIES  # noqa: E402

EXTRA_QUERIES.update(TPCH_EXTRA_QUERIES)
EXTRA_ORACLES.update(TPCH_EXTRA_ORACLES)

# Training-data curation surface (PII redaction, decontamination, quota
# retention, sharded export) lives in curation_queries.py.
from .curation_queries import build_registry as _curation_registry  # noqa: E402

_CURATION_QUERIES, _CURATION_ORACLES = _curation_registry(
    _SHINGLES_SQL, _NORM_SQL, _TOKS_SQL
)
EXTRA_QUERIES.update(_CURATION_QUERIES)
EXTRA_ORACLES.update(_CURATION_ORACLES)

# Statistical/time-series analytics + grouped-map pandas API surface
# (OLS trend, z-score outliers, TWA, histogram, applyInPandas/cogroup,
# blocked fuzzy matching) live in analytics_queries.py.
from .analytics_queries import (  # noqa: E402
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)

EXTRA_QUERIES.update(ANALYTICS_QUERIES)
EXTRA_ORACLES.update(ANALYTICS_ORACLES)

# Graph algorithms (fixed-point-integer PageRank over the purchase graph)
from .graph_queries import GRAPH_ORACLES, GRAPH_QUERIES  # noqa: E402

EXTRA_QUERIES.update(GRAPH_QUERIES)
EXTRA_ORACLES.update(GRAPH_ORACLES)


def q_ann_cosine_scores_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus cosine scoring against one probe vector via mapInArrow
    (zero-copy Arrow batches + one numpy matmul per batch). The probe is
    the corpus's first vector — ONE driver-side row fetch, documented:
    the scoring pass itself is map-only and fully distributed."""
    emb = _read(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if probe is None:
        # empty corpus / missing probe id: empty result, stable schema
        return emb.select(
            "vec_id", F.lit(0.0).alias("cosine")
        ).limit(0)
    scored = simsearch.cosine_scores_arrow(emb, list(probe["embedding"]))
    return (
        scored.filter(F.col("vec_id") != 0)
        .select("vec_id", "cosine")
        .orderBy("vec_id")
    )


EXTRA_QUERIES["ann_cosine_scores_arrow"] = q_ann_cosine_scores_arrow
# float64 throughout (list_cosine_similarity computes in float32 and
# lands on the wrong side of the 6-dp comparison rounding for ~1% of rows)
EXTRA_ORACLES["ann_cosine_scores_arrow"] = """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
p AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS x, unnest(q.e)::DOUBLE AS y
  FROM embeddings, q
  WHERE vec_id <> 0
),
s AS (
  SELECT vec_id, SUM(x * y) AS dot,
         sqrt(SUM(x * x)) AS nx, sqrt(SUM(y * y)) AS ny
  FROM p GROUP BY vec_id
)
SELECT vec_id, dot / (nx * ny) AS cosine FROM s ORDER BY vec_id
"""


def q_streaming_outer_join_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join with flush sentinels:
    every signup with its purchases within 1 hour, null-completed once
    the watermark proves no match can arrive.

    Two subtleties this query pins down (both discovered empirically,
    verified via StreamingQueryProgress):

    1. The global watermark is min() across BOTH sides' watermark
       nodes, computed from rows that REACH those nodes. A finite
       replay therefore withholds null-completion for the tail of the
       stream (here: everything within 1h10m of the last signup) —
       correct streaming semantics, but it makes end-of-stream results
       partial. The flush sentinels (user_id −1, ts one day past the
       data, one per join role) raise both sides' max event time so the
       AvailableNow cleanup batch evicts — and null-completes — every
       real row, restoring an exact batch oracle.
    2. The sentinel filter must be applied to the BATCH result, not the
       streaming plan: a `user_id >= 0` predicate on the join output is
       pushed below the EventTimeWatermark operator, silently dropping
       the sentinels before they can advance the watermark.
    """
    from .streaming import events as se

    apply_runtime_confs(spark)
    joined = se.stream_stream_signup_purchase_outer(
        se.read_events_stream_with_flush(spark, sf_dir),
        se.read_events_stream_with_flush(spark, sf_dir),
    )
    out = se.run_available_now(joined, output_mode="append")
    return out.filter(F.col("user_id") >= 0).orderBy(
        "user_id", "signup_id", "purchase_id"
    )


EXTRA_QUERIES["streaming_outer_join_flush"] = q_streaming_outer_join_flush
EXTRA_ORACLES["streaming_outer_join_flush"] = """
WITH s AS (
  SELECT user_id, event_id AS signup_id, ts AS signup_ts
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id AS p_user, event_id AS purchase_id, ts AS purchase_ts, value
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT s.user_id, s.signup_id, s.signup_ts,
         p.purchase_id, p.purchase_ts, p.value
  FROM s JOIN p ON s.user_id = p.p_user
   AND p.purchase_ts >= s.signup_ts
   AND p.purchase_ts <= s.signup_ts + INTERVAL 1 HOUR
)
SELECT * FROM m
UNION ALL
SELECT s.user_id, s.signup_id, s.signup_ts, NULL, NULL, NULL
FROM s
WHERE s.signup_id NOT IN (SELECT signup_id FROM m)
ORDER BY user_id, signup_id, purchase_id"""


def q_recursive_ancestor_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): transitive ancestor
    closure of a synthetic binary-tree hierarchy over customers
    (parent(k) = k DIV 2 — deterministic, engine-neutral). Output is the
    full (node, ancestor, depth) closure — the iterative-fixpoint query
    shape (org charts, BOM explosion, graph reachability) that, before
    Spark 4, needed a driver-side loop.

    Scale note: closure size is N·log N for a balanced hierarchy (depth
    ≤ 21 at 1.5M customers); each iteration is one self-join stage and
    Spark unions the per-iteration results — the plan is the same
    repeated-join DAG a hand-rolled loop would build, minus the driver
    round-trips.
    """
    apply_runtime_confs(spark)
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "customer_rec_src"
    )
    return spark.sql(
        """
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey AS ancestor, 0 AS depth
  FROM customer_rec_src
  UNION ALL
  SELECT node, ancestor DIV 2 AS ancestor, depth + 1 AS depth
  FROM anc WHERE ancestor > 1
)
SELECT node, ancestor, depth FROM anc ORDER BY node, depth
"""
    )


def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): the events `props` JSON is
    parsed ONCE into the binary variant encoding (`parse_json`), then
    fields are extracted with `variant_get` path expressions. Unlike the
    typed `from_json` path (q_json_props_stats), variant is
    schema-flexible — new keys need no schema migration — while still
    avoiding per-field string re-parsing (`get_json_object` re-parses
    the JSON for every extracted path)."""
    ev = _read(spark, sf_dir, "events")
    v = F.parse_json("props")
    parsed = ev.select(
        "event_type",
        F.try_variant_get(v, "$.k", "long").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EXTRA_QUERIES["recursive_ancestor_closure"] = q_recursive_ancestor_closure
EXTRA_ORACLES["recursive_ancestor_closure"] = """
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey AS ancestor, 0 AS depth
  FROM customer
  UNION ALL
  SELECT node, ancestor // 2 AS ancestor, depth + 1 AS depth
  FROM anc WHERE ancestor > 1
)
SELECT node, ancestor, depth FROM anc ORDER BY node, depth"""

EXTRA_QUERIES["variant_props_stats"] = q_variant_props_stats
EXTRA_ORACLES["variant_props_stats"] = """
SELECT event_type, count(*) AS n,
  count(json_extract(props, '$.k')) AS n_with_k,
  sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
  max(json_extract(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type"""


def q_dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: ordered pairs where ≥90% of doc A's
    distinct tokens appear in doc B — the subset/quote-expansion case
    Jaccard misses (a short doc embedded in a long one scores low
    symmetric Jaccard but 100% containment). Integer threshold
    (100·shared ≥ 90·|A|) keeps the boundary engine-exact. Scale path:
    restrict to LSH/prefix-filter candidates exactly as jaccard_pairs
    does — the exhaustive token join here is the oracle-sized verify."""
    docs = _read(spark, sf_dir, "documents")
    tok = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(dedup.tokens(F.col("text")))).alias("token"),
    ).where(F.col("token") != "")
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .where(F.lit(100) * F.col("shared") >= F.lit(90) * F.col("n_a"))
        .select("id_a", "id_b", "shared", "n_a")
        .orderBy("id_a", "id_b")
    )


EXTRA_QUERIES["dedup_containment_pairs"] = q_dedup_containment_pairs
EXTRA_ORACLES["dedup_containment_pairs"] = f"""
WITH tok AS (
  SELECT DISTINCT doc_id AS id, t.tok AS token
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) d,
       unnest(toks) AS t(tok)
  WHERE t.tok <> ''
),
sizes AS (SELECT id, count(*) AS n FROM tok GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM tok a JOIN tok b ON a.token = b.token AND a.id <> b.id
  GROUP BY a.id, b.id
)
SELECT s.id_a, s.id_b, s.shared, z.n AS n_a
FROM shared s JOIN sizes z ON s.id_a = z.id
WHERE 100 * s.shared >= 90 * z.n
ORDER BY id_a, id_b
"""

# Training-pipeline batch 2 (late-interaction MaxSim, ANN recall audit,
# bigram-LM quality, curriculum phases, deterministic bootstrap CI) lives
# in pipeline_queries.py. Its two composed oracles reference oracle SQL
# defined above, so they resolve AFTER this dict is populated.
from .pipeline_queries import (  # noqa: E402
    PIPELINE_ORACLES,
    PIPELINE_QUERIES,
    build_late_oracles as _pipeline_late_oracles,
)

EXTRA_QUERIES.update(PIPELINE_QUERIES)
EXTRA_ORACLES.update(PIPELINE_ORACLES)
EXTRA_ORACLES.update(_pipeline_late_oracles())


def q_streaming_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion dedup against the historical corpus: arriving
    documents (doc_id % 10 == 0 as the stream) band-key entirely
    stateless per micro-batch via the row-local minhash, stream-static
    join the stored corpus LSH index, emit distinct collision candidates
    (streaming/events.py::streaming_lsh_dedup_probe). Candidates match
    dedup_incremental_batch's candidate stage exactly; the Jaccard verify
    stays a batch job downstream."""
    from .streaming import events as se

    apply_runtime_confs(spark)
    docs = _read(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    corpus_index = dedup.lsh_band_keys(
        dedup.minhash_signatures(dedup.word_shingles(corpus, n=3), num_hashes=16)
    )
    stream = se.read_documents_stream(spark, sf_dir).filter(
        F.col("doc_id") % 10 == 0
    )
    return se.run_available_now(
        se.streaming_lsh_dedup_probe(stream, corpus_index),
        output_mode="append",
    ).orderBy("batch_id", "corpus_id")


EXTRA_QUERIES["streaming_lsh_dedup"] = q_streaming_lsh_dedup
EXTRA_ORACLES["streaming_lsh_dedup"] = f"""
WITH {_SHINGLES_SQL.strip().lstrip(',')},
sigs AS ({_MINHASH_SQL}),
buckets AS ({_BANDS_SQL})
SELECT DISTINCT b.id AS batch_id, c.id AS corpus_id
FROM buckets b JOIN buckets c
  ON b.band = c.band AND b.bucket = c.bucket
WHERE b.id % 10 = 0 AND c.id % 10 <> 0
ORDER BY batch_id, corpus_id
"""


def q_streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT) under streaming: per event_type, an
    Apache DataSketches HLL (``hll_sketch_agg``, a true mergeable
    aggregate, so it runs as a streaming stateful agg in update mode)
    accumulates user_id sketches; the emitted estimate is then gated
    against the exact batch distinct — the output pins the within-5%
    boolean (lg_k=12 ≈ 1.6% typical error), so sketch drift FAILS the
    hash gate. This is the streaming half of the batch sketch-rollup
    pattern (operators/scale.py::hll_partial_sketches): bounded state per
    key at any throughput, no raw-row retention."""
    from .streaming import events as se

    apply_runtime_confs(spark)
    stream = se.read_events_stream(spark, sf_dir)
    sketched = stream.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sketch")
    )
    out = se.run_available_now(sketched, output_mode="update").select(
        "event_type",
        F.expr("hll_sketch_estimate(sketch)").cast("long").alias("approx"),
    )
    exact = (
        _read(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return (
        out.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("approx") - F.col("n_exact")) * 100
                <= F.col("n_exact") * 5
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


EXTRA_QUERIES["streaming_hll_distinct"] = q_streaming_hll_distinct
EXTRA_ORACLES["streaming_hll_distinct"] = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact,
  TRUE AS within_5pct
FROM events GROUP BY event_type ORDER BY event_type
"""

# r6 addition, registered LAST on purpose: the rotation sorts unverified
# names by registration position, so a new name appended at the END joins
# the BACK of the never-verified tail instead of shifting the staged
# driver window (VERDICT r5 task 1: "don't let new names shift it").
EXTRA_QUERIES["real_codec_decode_audit"] = q_real_codec_decode_audit
EXTRA_QUERIES["png_codec_decode_audit"] = q_png_codec_decode_audit
EXTRA_QUERIES["wav_codec_decode_audit"] = q_wav_codec_decode_audit
EXTRA_QUERIES["bmp_codec_decode_audit"] = q_bmp_codec_decode_audit
EXTRA_QUERIES["jpeg_codec_decode_audit"] = q_jpeg_codec_decode_audit
EXTRA_QUERIES["gif_codec_decode_audit"] = q_gif_codec_decode_audit
EXTRA_QUERIES["ulaw_codec_decode_audit"] = q_ulaw_codec_decode_audit
