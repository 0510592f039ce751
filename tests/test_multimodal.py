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


# ---------------------------------------------------------------------------
# the REAL uncompressed codec (r6): PPM / BMP / WAV with ground truth
# ---------------------------------------------------------------------------


def _make_ppm(w: int, h: int, rgb_rows: bytes) -> bytes:
    return b"P6\n# a comment\n%d %d\n255\n" % (w, h) + rgb_rows


def _make_bmp(w: int, h: int, rgb_rows: bytes, top_down: bool = False) -> bytes:
    """Minimal 24-bit BI_RGB BMP from top-down RGB row bytes."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    rows = [
        rgb_rows[y * w * 3 : (y + 1) * w * 3] for y in range(h)
    ]
    # convert RGB -> BGR per pixel, pad each row to the 4-byte stride
    bgr_rows = []
    for row in rows:
        bgr = bytearray()
        for x in range(w):
            r, g, b = row[x * 3 : x * 3 + 3]
            bgr += bytes((b, g, r))
        bgr_rows.append(bytes(bgr) + b"\x00" * (stride - w * 3))
    stored = bgr_rows if top_down else bgr_rows[::-1]
    pixel_data = b"".join(stored)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0,
    )
    return header + dib + pixel_data


def _make_wav(samples: list[int], rate: int = 8000, channels: int = 1) -> bytes:
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


_RGB_2x2 = bytes((255, 0, 0,  0, 255, 0,
                  0, 0, 255,  255, 255, 255))  # rows: [R G] / [B W]


def test_numpy_codec_decodes_ppm_with_ground_truth():
    rec = mm.numpy_uncompressed_decode(_make_ppm(2, 2, _RGB_2x2), "image")
    assert rec is not None
    assert (rec["width"], rec["height"], rec["n_frames"]) == (2, 2, 1)
    # channel means of [255,0,0,255]/... per channel = 510/4/255 = 0.5
    assert rec["features"][0] == pytest.approx(0.5)
    assert rec["features"][1] == pytest.approx(0.5)
    assert rec["features"][2] == pytest.approx(0.5)
    assert rec["features"][6] == pytest.approx(0.5)  # w/(w+h)


def test_numpy_codec_bmp_matches_ppm_pixels():
    """The SAME pixel grid through BMP (bottom-up AND top-down storage)
    and PPM must produce identical features — catches BGR-order and
    row-flip mistakes with real ground truth."""
    ppm = mm.numpy_uncompressed_decode(_make_ppm(2, 2, _RGB_2x2), "image")
    up = mm.numpy_uncompressed_decode(_make_bmp(2, 2, _RGB_2x2), "image")
    down = mm.numpy_uncompressed_decode(
        _make_bmp(2, 2, _RGB_2x2, top_down=True), "image"
    )
    assert up is not None and down is not None
    assert up["features"] == pytest.approx(ppm["features"])
    assert down["features"] == pytest.approx(ppm["features"])
    assert (up["width"], up["height"]) == (2, 2)


def test_numpy_codec_decodes_wav_with_ground_truth():
    rec = mm.numpy_uncompressed_decode(
        _make_wav([0, 16384, -16384, 0], rate=8000), "audio"
    )
    assert rec is not None
    assert (rec["width"], rec["height"], rec["n_frames"]) == (1, 8000, 4)
    assert rec["features"][0] == pytest.approx(0.0)       # mean
    assert rec["features"][3] == pytest.approx(0.5)       # max = 16384/32768


def test_numpy_codec_rejects_garbage_and_truncation():
    ppm = _make_ppm(4, 4, bytes(range(48)))
    assert mm.numpy_uncompressed_decode(ppm[:-1], "image") is None  # short
    assert mm.numpy_uncompressed_decode(b"P6 junk", "image") is None
    assert mm.numpy_uncompressed_decode(b"\x89PNG...", "image") is None
    assert mm.numpy_uncompressed_decode(b"RIFFxxxxWEBP", "audio") is None
    assert mm.numpy_uncompressed_decode(b"anything", "video") is None
    # kind mismatch: a valid WAV claimed as image is undecodable-as-claimed
    assert mm.numpy_uncompressed_decode(_make_wav([1]), "image") is None


def test_numpy_codec_passes_conformance_and_sparkside(spark):
    samples = [
        (_make_ppm(2, 2, _RGB_2x2), "image"),
        (_make_bmp(3, 2, bytes(range(18))), "image"),
        (_make_wav([100, -100, 5000]), "audio"),
        (b"not media at all", "video"),
    ]
    assert mm.check_decode_conformance(mm.numpy_uncompressed_decode, samples)
    rows = [
        (i, kind, payload, len(payload), "synth")
        for i, (payload, kind) in enumerate(samples)
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in mm.decode_media(media, decode_fn=mm.numpy_uncompressed_decode)
        .collect()
    }
    assert got[0]["width"] == 2 and got[0]["n_frames"] == 1
    assert got[1]["width"] == 3 and got[1]["height"] == 2
    assert got[2]["height"] == 8000 and got[2]["n_frames"] == 3
    # the video row flows through with NULL decode fields, digest intact
    assert got[3]["width"] is None and got[3]["digest"]


def test_package_codec_registered_for_by_value_pickling(spark):
    """r6 ADVICE 2: a package-defined decode_fn would pickle by reference
    (executors without the wheel fail the import); decode_media must
    register its module for by-value shipping so the no-wheel contract
    holds for the built-in codec too."""
    from pyspark import cloudpickle as cp

    media = spark.createDataFrame(
        [(1, "image", _make_ppm(2, 2, _RGB_2x2), 1, "synth")], mm.MEDIA_SCHEMA
    )
    decoded = mm.decode_media(media, decode_fn=mm.numpy_uncompressed_decode)
    assert decoded.count() == 1
    registered = {
        m if isinstance(m, str) else m.__name__
        for m in cp.list_registry_pickle_by_value()
    }
    assert mm.numpy_uncompressed_decode.__module__ in registered
