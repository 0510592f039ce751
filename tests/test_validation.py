"""Data-quality checks: seeded violations must be detected and counted
exactly; the row-local rules must run in a single scan."""

from __future__ import annotations

from ufc_data_warehouse_spark import validation


def _checks(df, **kw):
    return {
        r["check_name"]: r["n_violations"]
        for r in validation.run_checks(df, **kw).collect()
    }


def test_seeded_violations_are_counted(spark):
    child = spark.createDataFrame(
        [
            (1, "F", 10),
            (1, "O", 20),     # duplicate key 1
            (2, None, 30),    # null status — not an accepted_values violation
            (3, "X", 40),     # bad status
            (None, "F", 50),  # null key
            (4, "P", 99),     # orphan FK (99 has no parent)
        ],
        "k int, status string, fk int",
    )
    parent = spark.createDataFrame(
        [(10,), (20,), (30,), (40,), (50,)], "pk int"
    )
    got = _checks(
        child,
        not_null=["k", "status"],
        accepted={"status": ["F", "O", "P"]},
        unique=[["k"]],
        fks=[("fk", parent, "pk", "parent")],
    )
    assert got == {
        "not_null:k": 1,
        "not_null:status": 1,
        "accepted_values:status": 1,
        "unique:k": 1,
        "fk:fk->parent.pk": 1,
    }


def test_clean_table_is_all_zeros(spark):
    df = spark.createDataFrame([(1, "F"), (2, "O")], "k int, status string")
    got = _checks(
        df, not_null=["k"], accepted={"status": ["F", "O"]}, unique=[["k"]]
    )
    assert set(got.values()) == {0}


def test_row_local_rules_share_one_scan(spark):
    df = spark.read.parquet(
        f"{__import__('tests.conftest', fromlist=['SF_DIR']).SF_DIR}/orders.parquet"
    )
    plan = (
        validation.not_null_and_accepted_counts(
            df,
            ["o_orderkey", "o_custkey", "o_orderdate"],
            {"o_orderstatus": ["F", "O", "P"]},
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1  # 4 rules, ONE scan
