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
    with pytest.raises(NotImplementedError, match="CODEC CONTRACT"):
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


# ---------------------------------------------------------------------------
# THE CODEC CONTRACT (multimodal.py) — executable specification
# ---------------------------------------------------------------------------


def _contract_fake_decode(payload: bytes, kind: str) -> dict:
    """A contract-conformant stand-in for a PIL/pyav/ffmpeg wrapper —
    byte-identical to decode_media's built-in fake codec."""
    import hashlib

    digest = hashlib.md5(payload).hexdigest()
    h = int(digest[:8], 16)
    return {
        "digest": digest,
        "width": 16 + h % 2048,
        "height": 16 + (h >> 11) % 2048,
        "n_frames": 1 if kind == "image" else 1 + h % 300,
        "features": [
            ((int(digest[i * 2 : i * 2 + 2], 16) - 128) / 128.0)
            for i in range(8)
        ],
    }


def test_decode_conformance_checker_accepts_fake_codec():
    assert mm.check_decode_conformance(_contract_fake_decode)


def test_decode_conformance_checker_rejects_violations():
    def missing_key(payload, kind):
        r = _contract_fake_decode(payload, kind)
        del r["digest"]
        return r

    def nondeterministic(payload, kind):
        import random

        r = _contract_fake_decode(payload, kind)
        r["width"] = random.randint(1, 10_000)
        return r

    def multi_frame_image(payload, kind):
        r = _contract_fake_decode(payload, kind)
        r["n_frames"] = 2
        return r

    for bad in (missing_key, nondeterministic, multi_frame_image):
        with pytest.raises(AssertionError):
            mm.check_decode_conformance(bad)


def test_plugged_decode_fn_matches_fake_path(spark):
    """A conformant decode_fn plugs into the seam and every downstream op
    consumes its output unchanged — fake=True is droppable in production."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    media = mm.synthesize_media(docs)
    via_fake = mm.decode_media(media, fake=True)
    via_fn = mm.decode_media(media, decode_fn=_contract_fake_decode)
    assert sorted(map(tuple, via_fake.collect())) == sorted(
        map(tuple, via_fn.collect())
    )
    # downstream ops run over the plugged decode unchanged
    assert mm.resize_plan(via_fn).count() > 0
    assert mm.patchify_plan(via_fn).count() > 0
    assert mm.scene_cut_stats(via_fn).count() > 0


def test_undecodable_payload_yields_null_fields_not_task_failure(spark):
    """Contract point 3: decode_fn returning None marks the row corrupt
    (NULL decode fields, digest kept) instead of killing the task."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    media = mm.synthesize_media(docs)

    def flaky(payload: bytes, kind: str):
        if kind == "video":
            return None  # simulate an undecodable container
        return _contract_fake_decode(payload, kind)

    out = mm.decode_media(media, decode_fn=flaky)
    rows = out.collect()
    assert len(rows) == 30  # nothing dropped
    vids = [r for r in rows if r["kind"] == "video"]
    assert vids and all(
        r["width"] is None and r["features"] is None and r["digest"]
        for r in vids
    )
