"""The BI serving surface: card-shaped SQL against registered model views,
using the reference's qualified names (charts.sh:154-498 shape)."""

from __future__ import annotations

from tests.conftest import SF_DIR

from ufc_data_warehouse_spark.api import build_model, register_views, sql


def test_register_views_namespacing(spark):
    mapping = register_views(spark, SF_DIR)
    assert "fighters_extracted_goat_status.mv_title_reigns" in mapping
    assert "fighters_extracted_semantic.fct_fights" in mapping
    assert "fighters_extracted.mv_fighters_by_wins" in mapping


def test_card_sql_top_k(spark):
    # the exact query shape Metabase sends (charts.sh:171-173)
    df = sql(
        spark,
        SF_DIR,
        """
        SELECT fighter, wins
        FROM fighters_extracted.mv_fighters_by_wins
        ORDER BY wins DESC, fighter LIMIT 5
        """,
    )
    rows = df.collect()
    assert len(rows) == 5
    assert rows[0]["wins"] >= rows[-1]["wins"]
    # matches the DataFrame API result
    api_top = (
        build_model(spark, SF_DIR, "fighters_by_wins")
        .orderBy("wins", ascending=False)
        .limit(50)
        .collect()
    )
    assert rows[0]["wins"] == api_top[0]["wins"]


def test_card_sql_goat_status_schema(spark):
    df = sql(
        spark,
        SF_DIR,
        """
        SELECT weight_category, fighter, total_champ_days
        FROM fighters_extracted_goat_status.mv_total_champ_days
        ORDER BY total_champ_days DESC NULLS LAST LIMIT 3
        """,
    )
    assert df.count() == 3
