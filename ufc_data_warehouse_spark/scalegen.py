"""Synthetic scale-up generator for the bench's scale tier.

Derives a ``factor``× corpus from an existing testdata SF dir (default
10× of sf0.1 ≈ sf1) — deterministically, entirely in Spark, written once
and cached on disk. The point is scaling MEASUREMENT for the iterative /
ANN / dedup families (VERDICT r2 tasks 3–4): at 10× data a sub-quadratic
operator's wall time should grow ≈10×, a quadratic one ≈100×.

Replicas must be DECORRELATED, not copied: naive duplication makes every
doc an exact dup of 9 others, so dedup outputs (and band buckets) would
blow up quadratically in the replica count and measure the data
generator, not the operator. Instead each replica applies a
structure-preserving, cross-replica-decorrelating transform:

- documents: per-replica Caesar rotation of the letters (``F.translate``)
  — within a replica the near-dup structure is EXACTLY the original's
  (token identity is preserved under a character bijection, so shingles,
  minhash, simhash collisions replay 1:1); across replicas tokens share
  no hash.
- embeddings: per-replica deterministic ±1 sign pattern over the dims —
  dot(s⊙v, s⊙w) = dot(v, w), so norms, pairwise cosines, and cluster
  geometry inside a replica are EXACTLY the original's; across replicas
  the mixed pattern s_r⊙s_q has zero mean, so cross-replica dots
  decorrelate even though the corpus has nonzero-mean components (a
  plain dim rotation does NOT decorrelate such a corpus — measured 115×
  pair growth at 10×, i.e. quadratic; signs bring it to ≈10×). Labels
  offset per replica so IVF list count grows 10× at constant list size
  (the right disk shape for a 10× corpus).
- events: per-replica user-id offset — 10 disjoint copies of the
  interaction graph; iterative graph ops see 10× nodes and edges at the
  original degree distribution.
- orders + lineitem: order keys remapped consistently on both sides
  (``key * factor + replica``) and customer/supplier/part keys offset
  per replica — the customer→supplier purchase graph the graph_* family
  iterates over becomes 10 disjoint copies, again 10× nodes and edges at
  the original degrees.

All ids are remapped ``id * factor + replica`` (collision-free, keeps
id-derived query selections like ``vec_id % 50`` statistically similar).
"""

from __future__ import annotations

import os
import string

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE_TABLES = (
    "documents", "embeddings", "events", "customer", "orders", "lineitem"
)

# bump when any scaler's logic changes — part of the on-disk cache marker,
# so a stale .bench_scale10 from an older generator is regenerated instead
# of silently reused
GENERATOR_VERSION = 4


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross df with replica ids 0..factor-1 via explode (no cartesian
    join node; stays a map-side operator)."""
    return df.withColumn(
        "_rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )


def _rot_alphabet(rot: int) -> str:
    letters = string.ascii_lowercase
    return letters[rot:] + letters[:rot]


def scale_documents(docs: DataFrame, factor: int) -> DataFrame:
    if factor > 10:
        # letter rotations repeat at 26, digit rotations at 10: replicas r
        # and r+10 would map digit-ONLY tokens identically → exact dups
        # across replicas → quadratic pair growth, the failure mode this
        # module exists to avoid. 10 replicas is the bench's scale tier.
        raise ValueError("scale_documents supports factor <= 10")
    rep = _replicate(docs, factor)
    # branch per replica on the (tiny) rotation table — a CASE ladder of
    # factor translate() calls, all codegen'd JVM-side. Digits rotate too
    # (r3 ADVICE): a letters-only rotation would pass digit-bearing tokens
    # through unchanged, so replicas of a numeric-token corpus would share
    # grams and the 10× bench would re-measure generator duplication.
    digits = string.digits
    text = F.col("text")
    rotated = None
    for r in range(factor):
        src = string.ascii_lowercase + string.ascii_uppercase + digits
        dst = (
            _rot_alphabet(r % 26)
            + _rot_alphabet(r % 26).upper()
            + digits[r % 10 :]
            + digits[: r % 10]
        )
        branch = F.translate(text, src, dst)
        rotated = (
            F.when(F.col("_rep") == r, branch)
            if rotated is None
            else rotated.when(F.col("_rep") == r, branch)
        )
    return rep.select(
        (F.col("doc_id") * factor + F.col("_rep")).alias("doc_id"),
        rotated.alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def scale_documents_suffix(docs: DataFrame, factor: int) -> DataFrame:
    """Factor-agnostic documents scaler for the two-decade (100×) probe.

    ``scale_documents``' character rotation caps at factor 10 (digit
    period); this variant appends a per-replica two-letter suffix to
    EVERY whitespace token instead. The token map is injective within a
    replica (``t + sfx = u + sfx  ⟺  t = u``), so shingle / minhash /
    simhash collision structure replays the base corpus 1:1 per replica;
    across replicas every token carries a different suffix, so no gram is
    ever shared — the same decorrelation contract as the rotation mode,
    valid to factor 26² = 676. Unlike the rotation mode, replica 0 is
    ALSO transformed (all replicas are statistically identical to the
    base, none is byte-identical) — fine for the probe, which times the
    scaled corpus against the UNTOUCHED base dir. ``n_chars`` is
    recomputed from the suffixed text so length-derived columns stay
    consistent.
    """
    if factor > 26 * 26:
        raise ValueError("scale_documents_suffix supports factor <= 676")
    rep = _replicate(docs, factor)
    # suffix computed arithmetically from the replica id — no CASE ladder
    sfx = F.concat(
        F.expr("char(97 + _rep div 26)"), F.expr("char(97 + _rep % 26)")
    )
    # split on the \s+ CLASS, not the literal space: a token after a tab
    # or newline must get the suffix too, or it stays byte-identical
    # across replicas and the probe re-measures generator duplication
    # (whitespace normalizes to single spaces on rejoin — fine for the
    # contract, which is token-level, matching the \s+ tokenizers)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    text = F.array_join(
        F.transform(toks, lambda x: F.concat(x, sfx)), " "
    )
    return rep.select(
        (F.col("doc_id") * factor + F.col("_rep")).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        F.length(text).cast("long").alias("n_chars"),
    )


def scale_embeddings(emb: DataFrame, factor: int) -> DataFrame:
    rep = _replicate(emb, factor)
    n_labels = emb.select((F.max("label") + 1).alias("n")).first()["n"]
    # per-(replica, dim) sign from xxhash64 — F.transform's two-arg lambda
    # receives (element, array_index); replica 0 keeps the originals
    signed = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            (F.col("_rep") == 0)
            | (F.pmod(F.xxhash64(F.concat_ws(":", F.col("_rep"), i)), 2) == 0),
            x,
        ).otherwise(-x),
    )
    return rep.select(
        (F.col("vec_id") * factor + F.col("_rep")).alias("vec_id"),
        signed.alias("embedding"),
        (F.col("label") + F.col("_rep") * n_labels).cast("int").alias("label"),
    )


def scale_events(events: DataFrame, factor: int) -> DataFrame:
    rep = _replicate(events, factor)
    n_users = events.select((F.max("user_id") + 1).alias("n")).first()["n"]
    return rep.select(
        (F.col("event_id") * factor + F.col("_rep")).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_rep") * n_users).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def scale_customer(
    cust: DataFrame, factor: int, n_cust: int | None = None
) -> DataFrame:
    """Replica r's customers get ``c_custkey + r * n_cust`` — the SAME
    offset scale_orders applies to o_custkey, so the customer→orders
    join graph stays referentially intact at every factor (each replica
    is a disjoint customer population with the base's segment mix).

    ``n_cust`` MUST be the same value scale_orders uses; ensure_scale_dir
    computes it ONCE from the customer table and passes it to both —
    deriving it independently (customer from max(c_custkey), orders from
    max(o_custkey)) silently corrupts the scaled join graph whenever the
    max-key customer happens to place no orders."""
    rep = _replicate(cust, factor)
    if n_cust is None:
        n_cust = cust.select((F.max("c_custkey") + 1).alias("n")).first()["n"]
    return rep.select(
        (F.col("c_custkey") + F.col("_rep") * n_cust).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )


def scale_orders(
    orders: DataFrame, factor: int, n_cust: int | None = None
) -> DataFrame:
    """o_orderkey remapped ``key*factor + replica``; o_custkey offset by
    ``replica * n_cust`` (see scale_customer for why n_cust must be the
    shared customer-table constant, not max(o_custkey)+1)."""
    rep = _replicate(orders, factor)
    if n_cust is None:
        n_cust = orders.select(
            (F.max("o_custkey") + 1).alias("n")
        ).first()["n"]
    return rep.select(
        (F.col("o_orderkey") * factor + F.col("_rep")).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("_rep") * n_cust).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


def scale_lineitem(li: DataFrame, factor: int) -> DataFrame:
    rep = _replicate(li, factor)
    n_supp = li.select((F.max("l_suppkey") + 1).alias("n")).first()["n"]
    n_part = li.select((F.max("l_partkey") + 1).alias("n")).first()["n"]
    return rep.select(
        (F.col("l_orderkey") * factor + F.col("_rep")).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("_rep") * n_part).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("_rep") * n_supp).alias("l_suppkey"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )


_SCALERS = {
    "documents": scale_documents,
    "embeddings": scale_embeddings,
    "events": scale_events,
    "customer": scale_customer,
    "orders": scale_orders,
    "lineitem": scale_lineitem,
}


def ensure_scale_dir(
    spark: SparkSession, sf_dir: str, out_dir: str, factor: int = 10
) -> str:
    """Materialize the scaled tables into ``out_dir`` (skipped when the
    marker file for this (sf_dir, factor) already exists). Returns
    out_dir, usable as an ``sf_dir`` for any registered query."""
    marker = os.path.join(
        out_dir,
        f"_SCALE_{factor}x_OF_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{len(SCALE_TABLES)}tables_v{GENERATOR_VERSION}",
    )
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import glob
    import shutil

    # drop every OTHER marker before regenerating: markers are named per
    # (factor, sf_dir, table-set, generator version), and a stale one left
    # behind would make a later run with THAT config silently reuse THIS
    # config's data (e.g. alternating sf0.01/sf0.1 runs sharing the dir)
    for stale in glob.glob(os.path.join(out_dir, "_SCALE_*")):
        os.remove(stale)

    # the customer/orders scalers must share ONE custkey offset (see
    # scale_customer's docstring) — compute it from the customer table
    n_cust = (
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        .select((F.max("c_custkey") + 1).alias("n"))
        .first()["n"]
    )
    for table in SCALE_TABLES:
        src = os.path.join(sf_dir, f"{table}.parquet")
        df = spark.read.parquet(src)
        if table in ("customer", "orders"):
            scaled = _SCALERS[table](df, factor, n_cust=n_cust)
        else:
            scaled = _SCALERS[table](df, factor)
        # one bare parquet FILE per table, matching the testdata layout —
        # the streaming sources symlink "{sf_dir}/{table}.parquet" as a
        # file, and parquet is row-group-splittable so a single file does
        # not cost read parallelism
        tmp = os.path.join(out_dir, f"_tmp_{table}")
        scaled.repartition(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(out_dir, f"{table}.parquet")
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        elif os.path.exists(dest):
            os.remove(dest)
        shutil.move(part, dest)
        shutil.rmtree(tmp)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out_dir
