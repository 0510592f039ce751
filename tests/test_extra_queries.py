"""Beyond-parity queries vs their DuckDB oracles."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_frames_match

from ufc_data_warehouse_spark.extra_queries import EXTRA_ORACLES, EXTRA_QUERIES


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, duck, name):
    assert name in EXTRA_ORACLES, f"{name} missing oracle"
    spark_df = EXTRA_QUERIES[name](spark, SF_DIR)
    duck_df = duck.execute(EXTRA_ORACLES[name]).df()
    assert_frames_match(spark_df, duck_df, label=name)
