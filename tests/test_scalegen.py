"""Scale-up generator invariants (scalegen.py): within-replica structure
must replay the base corpus exactly; across replicas it must decorrelate —
otherwise the bench's 10× scale tier measures the generator, not the
operator under test."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from ufc_data_warehouse_spark import scalegen


FACTOR = 3  # small factor keeps the test fast; invariants are per-replica


@pytest.fixture(scope="module")
def base_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def base_emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_documents_replica_zero_is_identity_and_ids_are_disjoint(base_docs):
    scaled = scalegen.scale_documents(base_docs, FACTOR)
    n = base_docs.count()
    assert scaled.count() == n * FACTOR
    assert scaled.select("doc_id").distinct().count() == n * FACTOR
    rep0 = scaled.filter(F.col("doc_id") % FACTOR == 0).select(
        (F.col("doc_id") / FACTOR).cast("long").alias("doc_id"), "text"
    )
    diffs = (
        rep0.alias("s")
        .join(base_docs.alias("b"), "doc_id")
        .filter(F.col("s.text") != F.col("b.text"))
        .count()
    )
    assert diffs == 0


def test_documents_replicas_share_no_tokens(base_docs, spark):
    """The Caesar rotation must make replica token sets disjoint (rotation
    by r≠0 maps every letter AND digit), so shingle/minhash/simhash
    collisions never straddle replicas by construction. The tokenizer here
    matches operators/text.tokens' whitespace split (r3 ADVICE: an
    [^a-z]+ split couldn't detect digit-token collisions)."""
    # salt the corpus with digit-bearing tokens so the digit rotation is
    # actually exercised (the synthetic corpus is pure lowercase words)
    salted = base_docs.limit(50).withColumn(
        "text", F.concat(F.col("text"), F.lit(" 2024 v2 100 42x"))
    )
    scaled = scalegen.scale_documents(salted, FACTOR)
    toks = scaled.select(
        (F.col("doc_id") % FACTOR).alias("rep"),
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") >= 2)
    cross = (
        toks.alias("a")
        .join(toks.alias("b"), "tok")
        .filter(F.col("a.rep") < F.col("b.rep"))
        .count()
    )
    assert cross == 0


def test_embeddings_within_replica_cosines_exact(base_emb):
    """dot(s⊙v, s⊙w) == dot(v, w): each replica's pairwise geometry is the
    base corpus's, bit-for-bit (±1 multiplication is exact in floats)."""
    scaled = scalegen.scale_embeddings(base_emb, FACTOR)

    def pair_dots(df, id_col):
        a = df.select(F.col(id_col).alias("ia"), F.col("embedding").alias("va"))
        b = df.select(F.col(id_col).alias("ib"), F.col("embedding").alias("vb"))
        return (
            a.join(b, F.col("ia") < F.col("ib"))
            .select(
                "ia",
                "ib",
                F.aggregate(
                    F.zip_with(
                        "va", "vb", lambda x, y: x.cast("double") * y.cast("double")
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dot"),
            )
        )

    base_sample = base_emb.filter(F.col("vec_id") < 30)
    for rep in range(FACTOR):
        rep_sample = scaled.filter(
            (F.col("vec_id") % FACTOR == rep) & (F.col("vec_id") < 30 * FACTOR)
        ).select(
            (F.col("vec_id") / FACTOR).cast("long").alias("vec_id"), "embedding"
        )
        base_d = {
            (r["ia"], r["ib"]): r["dot"]
            for r in pair_dots(base_sample, "vec_id").collect()
        }
        rep_d = {
            (r["ia"], r["ib"]): r["dot"]
            for r in pair_dots(rep_sample, "vec_id").collect()
        }
        assert base_d.keys() == rep_d.keys()
        for k in base_d:
            assert math.isclose(base_d[k], rep_d[k], rel_tol=0, abs_tol=0.0), (
                rep,
                k,
            )


def test_embeddings_norms_and_labels(base_emb):
    scaled = scalegen.scale_embeddings(base_emb, FACTOR)
    n_labels = base_emb.select(F.max("label")).first()[0] + 1
    assert (
        scaled.select(F.countDistinct("label")).first()[0]
        == base_emb.select(F.countDistinct("label")).first()[0] * FACTOR
    )
    assert scaled.filter(
        (F.col("label") < 0) | (F.col("label") >= n_labels * FACTOR)
    ).count() == 0


def test_events_graph_copies_are_disjoint(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    scaled = scalegen.scale_events(events, FACTOR)
    n_users = events.select(F.max("user_id")).first()[0] + 1
    assert scaled.count() == events.count() * FACTOR
    # replica r's users live in [r*n_users, (r+1)*n_users) — disjoint graphs
    bad = scaled.filter(
        (F.col("event_id") % FACTOR) * n_users > F.col("user_id")
    ).count()
    assert bad == 0


def test_ensure_scale_dir_idempotent(spark, tmp_path):
    out = str(tmp_path / "scaled")
    scalegen.ensure_scale_dir(spark, SF_DIR, out, factor=2)
    docs1 = spark.read.parquet(f"{out}/documents.parquet").count()
    # second call must be a no-op (marker present)
    scalegen.ensure_scale_dir(spark, SF_DIR, out, factor=2)
    assert spark.read.parquet(f"{out}/documents.parquet").count() == docs1


def test_customer_orders_referential_integrity_at_scale(spark):
    """scale_customer and scale_orders offset their custkeys independently
    (each computes n from its own table), which stays consistent only
    because the synthetic testdata has identical contiguous key ranges on
    both sides. Pin that: every scaled o_custkey must resolve to a scaled
    customer, and per-replica segment mix must replay the base."""
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    sc = scalegen.scale_customer(cust, FACTOR)
    so = scalegen.scale_orders(orders, FACTOR)
    assert sc.count() == cust.count() * FACTOR
    orphans = so.join(
        sc, so.o_custkey == sc.c_custkey, "left_anti"
    ).count()
    assert orphans == 0
    base_building = cust.filter(F.col("c_mktsegment") == "BUILDING").count()
    scaled_building = sc.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert scaled_building == base_building * FACTOR


def test_ensure_scale_dir_evicts_stale_markers(spark, tmp_path):
    """Alternating (sf_dir, factor) configs sharing one out_dir must never
    reuse the other config's data: regeneration drops every other marker."""
    import os

    out = str(tmp_path / "scaled")
    scalegen.ensure_scale_dir(spark, SF_DIR, out, factor=2)
    markers = [m for m in os.listdir(out) if m.startswith("_SCALE_")]
    assert len(markers) == 1
    scalegen.ensure_scale_dir(spark, SF_DIR, out, factor=3)
    markers = [m for m in os.listdir(out) if m.startswith("_SCALE_")]
    assert len(markers) == 1 and "_3x_" in markers[0]


def test_documents_suffix_mode_disjoint_and_replayed(base_docs, spark):
    """The factor-agnostic suffix scaler (two-decade probe) must uphold
    the same contract as the rotation mode: replica token sets pairwise
    disjoint (including digit-bearing tokens, which the suffix makes
    letter-terminated by construction), within-replica duplicate
    structure replayed 1:1, ids collision-free."""
    factor = 12  # > 10: beyond the rotation mode's cap on purpose
    # salt with digits AND tab/newline separators: tokens after non-space
    # whitespace must be suffixed too (regression: splitting on the
    # literal ' ' left them byte-identical across replicas)
    salted = base_docs.limit(40).withColumn(
        "text", F.concat(F.col("text"), F.lit(" 2024 100 42x\ttabbed\nnewlined"))
    )
    scaled = scalegen.scale_documents_suffix(salted, factor)
    n = salted.count()
    assert scaled.count() == n * factor
    assert scaled.select("doc_id").distinct().count() == n * factor

    toks = scaled.select(
        (F.col("doc_id") % factor).alias("rep"),
        F.explode(F.split("text", r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    # every token is owned by exactly ONE replica
    multi = (
        toks.groupBy("tok")
        .agg(F.countDistinct("rep").alias("n_reps"))
        .filter(F.col("n_reps") > 1)
        .count()
    )
    assert multi == 0

    # within-replica exact-dup structure replays the base: identical base
    # texts stay identical after suffixing, distinct ones stay distinct
    base_dups = (
        salted.groupBy("text").count().filter(F.col("count") > 1).count()
    )
    for rep in (0, factor - 1):
        rep_dups = (
            scaled.filter(F.col("doc_id") % factor == rep)
            .groupBy("text")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert rep_dups == base_dups

    # n_chars recomputed: matches the suffixed text length
    bad = scaled.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_documents_suffix_mode_rejects_absurd_factor(base_docs):
    with pytest.raises(ValueError):
        scalegen.scale_documents_suffix(base_docs, 677)


def test_decade_dir_per_table_markers_incremental(spark, tmp_path):
    """tools/scale_decades.ensure_decade_dir generates per-table markers:
    extending the table set must only generate the NEW table (existing
    parquet dirs untouched), and a stale-version marker for a table must
    force just that table's regeneration."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import scale_decades as sd

    out = str(tmp_path / "decade")
    sd.ensure_decade_dir(spark, SF_DIR, out, 3, ("documents",))
    doc_marker = next(
        p for p in os.listdir(out) if p.startswith("_DECADE_") and "documents" in p
    )
    doc_mtime = os.path.getmtime(os.path.join(out, "documents.parquet"))

    # extending with events generates events only
    sd.ensure_decade_dir(spark, SF_DIR, out, 3, ("documents", "events"))
    assert os.path.exists(os.path.join(out, "events.parquet"))
    assert os.path.getmtime(os.path.join(out, "documents.parquet")) == doc_mtime

    # a stale (older-version) marker for documents forces regeneration of
    # documents alone
    os.rename(
        os.path.join(out, doc_marker),
        os.path.join(out, doc_marker.replace("_v", "_v0")),
    )
    sd.ensure_decade_dir(spark, SF_DIR, out, 3, ("documents", "events"))
    assert os.path.getmtime(os.path.join(out, "documents.parquet")) > doc_mtime
    # the stale marker was evicted, the current one restored
    names = os.listdir(out)
    assert doc_marker in names
    assert doc_marker.replace("_v", "_v0") not in names

    n = spark.read.parquet(os.path.join(out, "documents.parquet")).count()
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert n == base * 3
