"""Multimodal plumbing: synthesize → decode (stub) → resize/frame plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from ufc_data_warehouse_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def decoded(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return mm.decode_media(mm.synthesize_media(docs), fake=True).persist()


def test_real_decode_is_explicitly_stubbed(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        mm.decode_media(mm.synthesize_media(docs), fake=False)


def test_decode_is_deterministic_and_typed(decoded):
    rows = decoded.orderBy("media_id").limit(3).collect()
    again = decoded.orderBy("media_id").limit(3).collect()
    assert rows == again
    r = rows[0]
    assert len(r["features"]) == 8
    assert r["digest"] and r["width"] >= 16 and r["height"] >= 16


def test_resize_plan_caps_longest_side(decoded):
    plan = mm.resize_plan(decoded, max_side=224)
    bad = plan.filter(
        (F.greatest("width", "height") > 224)
        & (F.greatest("target_width", "target_height") > 224)
    )
    assert bad.count() == 0
    # aspect ratio preserved within integer rounding
    r = plan.filter(F.col("width") != F.col("target_width")).first()
    if r is not None:
        assert abs(
            r["width"] / r["height"] - r["target_width"] / r["target_height"]
        ) < 0.05


def test_frame_sampling_counts(decoded):
    frames = mm.sample_frames(decoded, every_n=30)
    joined = (
        frames.groupBy("media_id")
        .count()
        .join(decoded.select("media_id", "n_frames"), "media_id")
    )
    bad = joined.filter(
        F.col("count") != (F.floor((F.col("n_frames") - 1) / 30) + 1)
    )
    assert bad.count() == 0
