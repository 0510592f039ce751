"""Engine-vs-engine parity of the synthetic UFC raw-table derivation.

If these pass, the Spark derivation and the DuckDB CTE fragment produce
byte-identical raw tables — the foundation every oracle-checked model
query builds on.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_frames_match

from ufc_data_warehouse_spark.synth import synth_ctes, ufc_raw_tables

RAW_TABLES = [
    "dim_ufc_event_details",
    "fact_ufc_fight_results",
    "title_status_changes_outside_octagon",
]


@pytest.mark.parametrize("table", RAW_TABLES)
def test_raw_table_parity(spark, duck, table):
    spark_df = ufc_raw_tables(spark, SF_DIR)[table]
    duck_df = duck.execute(
        f"WITH {synth_ctes().lstrip()} SELECT * FROM {table}"
    ).df()
    assert_frames_match(spark_df, duck_df, label=table)


def test_fight_urls_unique(spark):
    fr = ufc_raw_tables(spark, SF_DIR)["fact_ufc_fight_results"]
    assert fr.count() == fr.select("url").distinct().count()


def test_value_domains(spark):
    fr = ufc_raw_tables(spark, SF_DIR)["fact_ufc_fight_results"]
    outcomes = {r[0] for r in fr.select("outcome").distinct().collect()}
    assert outcomes == {"W/L", "L/W", "D/D", "NC/NC"}
    wc = [r[0] for r in fr.select("weightclass").distinct().collect()]
    assert any("Interim" in w for w in wc)
    assert any("Tournament" in w for w in wc)
    assert any(w.endswith(" Bout") and "Title" not in w for w in wc)
    # division 11 must have interim-only title bouts (fallback branch)
    last_div = [w for w in wc if "Women's Featherweight" in w and "Title" in w]
    assert last_div and all("Interim" in w or "Tournament" in w for w in last_div)
