"""Unit tests for the dialect-sensitive scalar helpers (SURVEY §8 'what's
hard' #2): split_part out-of-range, the 4-format date cascade, null
ordering, and the image slug."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ufc_data_warehouse_spark import exprs


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_split_part_matches_postgres(spark):
    # PG split_part returns '' when n is out of range — not null
    c = F.lit("A One vs. B Two")
    assert _one(spark, exprs.split_part(c, " vs. ", 1)) == "A One"
    assert _one(spark, exprs.split_part(c, " vs. ", 2)) == "B Two"
    assert _one(spark, exprs.split_part(c, " vs. ", 3)) == ""
    # null in → null out
    assert _one(spark, exprs.split_part(F.lit(None).cast("string"), "/", 1)) is None
    # delimiter is literal, not regex
    assert _one(spark, exprs.split_part(F.lit("a.b"), ".", 2)) == "b"


def test_last_word(spark):
    assert _one(spark, exprs.last_word(F.lit("Jon Bones Jones"))) == "Jones"
    assert _one(spark, exprs.last_word(F.lit("Shogun"))) == "Shogun"


def test_date_cascade_four_formats(spark):
    cases = {
        "Apr 13, 2024": datetime.date(2024, 4, 13),
        "April 13, 2024": datetime.date(2024, 4, 13),
        "Apr 2024": datetime.date(2024, 4, 1),
        "April 2024": datetime.date(2024, 4, 1),
        "May 3, 1999": datetime.date(1999, 5, 3),  # 3-letter full month
        "TBD": None,
        "13/04/2024": None,
        "": None,
    }
    for raw, expected in cases.items():
        got = _one(spark, exprs.to_date_cascade(F.lit(raw)))
        assert got == expected, f"{raw!r}: {got} != {expected}"


def test_weight_category_normalizer(spark):
    wc = lambda s, i=True: _one(spark, exprs.weight_category(F.lit(s), i))  # noqa: E731
    assert wc("UFC Lightweight Title Bout") == "Lightweight"
    assert wc("UFC Interim Heavyweight Title Bout") == "Heavyweight"
    assert wc("UFC Interim Heavyweight Title Bout", i=False) == "Interim Heavyweight"
    assert wc("UFC Women's Bantamweight Title Bout") == "Women's Bantamweight"
    assert wc("Middleweight Bout") == "Middleweight Bout"  # no Title suffix


def test_method_group(spark):
    mg = lambda s: _one(spark, exprs.method_group(F.lit(s)))  # noqa: E731
    assert mg("KO/TKO") == "KO/TKO"
    assert mg("TKO - Doctor's Stoppage") == "KO/TKO"
    assert mg("Submission") == "Submission"
    assert mg("Decision - Split") == "Decision"
    assert mg("DQ") == "Other"
    assert mg("Could Not Continue") == "Other"


def test_fight_time_seconds(spark):
    ft = lambda t, r: _one(  # noqa: E731
        spark,
        exprs.fight_time_seconds(F.lit(t), F.lit(r).cast("int")),
    )
    assert ft("4:32", 1) == 272
    assert ft("0:05", 3) == 605
    assert ft("N/A", 2) is None
    assert ft(None, 2) is None
    assert ft("4:32", None) is None


def test_image_slug_url(spark):
    slug = lambda s: _one(spark, exprs.image_slug_url(F.lit(s)))  # noqa: E731
    assert slug("Jon Jones") == "http://localhost:8888/jon_jones.png"
    assert slug("José Aldo Jr.") == "http://localhost:8888/jos_aldo_jr.png"
    assert slug("") is None
    assert _one(spark, exprs.image_slug_url(F.lit(None).cast("string"))) is None
