"""Unit tests for tools/plan_audit.py's plan-text analyzers.

These are pure text functions — no SparkSession — so the audit rules
themselves are regression-tested, not just the (currently flag-free)
PLANS.md output they produce.
"""

import importlib.util
import os


def _load():
    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "tools", "plan_audit.py"
    )
    spec = importlib.util.spec_from_file_location("plan_audit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_lowcard_window_detector_flags_raw_fact_window():
    pa = _load()
    bad = (
        "*(3) Project [event_id#1L, rn#9]\n"
        "+- Window [row_number() windowspecdefinition(event_type#2, value#3 ASC"
        " NULLS FIRST) AS rn#9], [event_type#2], [value#3 ASC NULLS FIRST]\n"
        "   +- Sort [event_type#2 ASC, value#3 ASC], false, 0\n"
        "      +- Exchange hashpartitioning(event_type#2, 32)\n"
        "         +- FileScan parquet [event_id#1L,event_type#2,value#3]\n"
    )
    assert pa.count_lowcard_windows(bad) == 1


def test_lowcard_window_detector_ignores_grouplimit_and_highcard():
    pa = _load()
    rescued = (
        "Window [row_number() AS rn#9], [event_type#2], [value#3 ASC]\n"
        "+- WindowGroupLimit [event_type#2], [value#3 ASC], row_number(), 3\n"
        "   +- Sort [event_type#2 ASC, value#3 ASC], false, 0\n"
        "      +- Exchange hashpartitioning(event_type#2, 32)\n"
    )
    assert pa.count_lowcard_windows(rescued) == 0
    highcard = (
        "Window [row_number() AS rn#9], [user_id#2L], [value#3 ASC]\n"
        "+- Sort [user_id#2L ASC, value#3 ASC], false, 0\n"
        "   +- Exchange hashpartitioning(user_id#2L, 32)\n"
    )
    assert pa.count_lowcard_windows(highcard) == 0
    # mixed partition key (lowcard + highcard component) is fine: the key
    # space is the product, so parallelism isn't capped by the small col
    mixed = (
        "Window [row_number() AS rn#9], [event_type#2, user_id#4L],"
        " [value#3 ASC]\n"
        "+- Exchange hashpartitioning(event_type#2, user_id#4L, 32)\n"
    )
    assert pa.count_lowcard_windows(mixed) == 0
    # two-phase rank shape: partition spec leads with the bucket col
    bucketed = (
        "Window [row_number() AS rn#9], [event_type#2, _bkt#7],"
        " [value#3 ASC]\n"
        "+- Exchange hashpartitioning(event_type#2, _bkt#7, 32)\n"
    )
    assert pa.count_lowcard_windows(bucketed) == 0
    # offsets-stitch shape: low-card partition but ordered by _bkt — the
    # ≤ n_keys×n_buckets bucket-totals frame of the two-phase operators
    offsets = (
        "Window [sum(_cnt#5L) AS _we0#8L], [event_type#2],"
        " [_bkt#7 ASC NULLS FIRST]\n"
        "+- Sort [event_type#2 ASC, _bkt#7 ASC], false, 0\n"
        "   +- Exchange hashpartitioning(event_type#2, 32)\n"
    )
    assert pa.count_lowcard_windows(offsets) == 0
    # frame-free whole-partition window (empty order spec) still counts
    framefree = (
        "Window [sum(v#3L) AS s#9L], [event_type#2], []\n"
        "+- Exchange hashpartitioning(event_type#2, 32)\n"
    )
    assert pa.count_lowcard_windows(framefree) == 1


def test_lowcard_python_group_detector():
    pa = _load()
    bad = (
        "FlatMapGroupsInPandas [event_type#2], normalize(event_id#1L,"
        " event_type#2, value#3), [event_id#10L, event_type#11, value#12]\n"
        "+- Exchange hashpartitioning(event_type#2, 32)\n"
    )
    assert pa.count_lowcard_python_groups(bad) == 1
    ok = bad.replace("event_type#2]", "user_id#4L]")
    assert pa.count_lowcard_python_groups(ok) == 0
    agg = (
        "AggregateInPandas [lang#2], [median_udaf(value#3)]\n"
        "+- Exchange hashpartitioning(lang#2, 32)\n"
    )
    assert pa.count_lowcard_python_groups(agg) == 1
    # the grouped-agg pandas UDAF's ACTUAL Spark 4 node name (verified
    # against a live plan: udafs.robust_stats keyed by event_type)
    arrow_agg = (
        "+- !ArrowAggregatePython [event_type#3], [median_agg(value#4)#8],"
        " [event_type#3, n#12L]\n"
    )
    assert pa.count_lowcard_python_groups(arrow_agg) == 1
    assert (
        pa.count_lowcard_python_groups(
            arrow_agg.replace("event_type#3]", "user_id#9L]")
        )
        == 0
    )


def test_dedup_cached_subtrees_keeps_relative_indentation():
    pa = _load()
    # two InMemoryRelation bodies with the SAME node lines but DIFFERENT
    # nesting — per-line depth stripping used to flatten both to one text
    # and falsely dedup the second
    a = (
        "InMemoryRelation [x#1], StorageLevel\n"
        "   +- Filter (x#1 > 0)\n"
        "      +- Project [x#1]\n"
        "         +- Scan parquet\n"
    )
    b = (
        "InMemoryRelation [x#1], StorageLevel\n"
        "   +- Filter (x#1 > 0)\n"
        "   +- Project [x#1]\n"
        "      +- Scan parquet\n"
    )
    out = pa.dedup_cached_subtrees(a + b)
    # both bodies survive (they are structurally different)
    assert out.count("Filter (x#1 > 0)") == 2
    # a true duplicate still dedups
    out2 = pa.dedup_cached_subtrees(a + a)
    assert out2.count("Filter (x#1 > 0)") == 1
    assert out2.count("InMemoryRelation") == 2  # headers always kept


def test_dedup_cached_subtrees_recurses_into_kept_bodies():
    pa = _load()
    inner = (
        "      +- InMemoryRelation [y#2], StorageLevel\n"
        "            +- Scan parquet [y#2]\n"
    )
    outer = (
        "InMemoryRelation [x#1], StorageLevel\n"
        "   +- Join Inner\n"
        + inner
        + inner.replace("y#2", "y#2")  # identical nested body, twice
    )
    out = pa.dedup_cached_subtrees(outer)
    # the nested duplicate inside the kept body dedups too
    assert out.count("Scan parquet [y#2]") == 1
