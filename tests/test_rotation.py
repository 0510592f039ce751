"""Unit tests for the driver-contract rotation in __spark_entry__.py.

No SparkSession needed — these exercise the pure ordering logic against
synthetic CORRECTNESS files (VERDICT r2 task 6 / ADVICE medium).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def _write_correctness(tmp_path, name, rows):
    path = tmp_path / name
    path.write_text(json.dumps(rows))
    return str(tmp_path)


def test_driver_verified_requires_hash_match_true(tmp_path):
    directory = _write_correctness(
        tmp_path,
        "CORRECTNESS_r01.json",
        {
            "q_green": {
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "err": None,
            },
            # missing hash_match (driver-format change) must NOT count
            "q_no_hash": {"rows_match": True, "schema_match": True, "err": None},
            "q_null_hash": {
                "rows_match": True,
                "schema_match": True,
                "hash_match": None,
                "err": None,
            },
            "q_hash_fail": {
                "rows_match": True,
                "schema_match": True,
                "hash_match": False,
                "err": None,
            },
            "q_err": {
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "err": "boom",
            },
            "q_rows_none": {
                "rows_match": None,
                "schema_match": True,
                "hash_match": True,
                "err": None,
            },
        },
    )
    assert entry._driver_verified(directory) == {"q_green"}


def test_driver_verified_merges_rounds_and_survives_bad_json(tmp_path):
    _write_correctness(
        tmp_path,
        "CORRECTNESS_r01.json",
        {
            "a": {
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "err": None,
            }
        },
    )
    directory = _write_correctness(
        tmp_path,
        "CORRECTNESS_r02.json",
        {
            "b": {
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "err": None,
            }
        },
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text("{not json")
    assert entry._driver_verified(directory) == {"a", "b"}


def test_resample_is_deterministic_and_rotates_with_round():
    verified = {f"q{i}" for i in range(20)}
    r3 = entry._resampled(verified, 3)
    assert r3 == entry._resampled(verified, 3)
    assert len(r3) == entry._REGRESSION_RESAMPLE
    assert set(r3) <= verified
    # a different round index picks a (very likely) different sample
    assert r3 != entry._resampled(verified, 4)


def test_rotation_window_prioritizes_target_families():
    """Verified names sort last, except the re-sampled regression window
    which is re-inserted inside the driver's 50-query prefix."""
    names = entry.queries()
    order = list(names)
    verified = entry._driver_verified()
    window = order[:50]
    fresh = [n for n in window if n not in verified]
    resampled = [n for n in window if n in verified]
    # the driver's window should be almost entirely fresh names from the
    # priority families, plus the small regression re-sample
    assert len(resampled) == entry._REGRESSION_RESAMPLE
    priority = tuple(entry._ROTATION_PRIORITY)
    family = [
        n for n in fresh if n.startswith(priority) or n in entry._ROTATION_NAMES
    ]
    assert len(family) >= 40, f"only {len(family)} priority names in window"
    # everything after the unverified tail is previously-verified
    tail_start = next(
        i for i in range(len(order) - 1, -1, -1) if order[i] not in verified
    )
    assert all(n in verified for n in order[tail_start + 1 :])
