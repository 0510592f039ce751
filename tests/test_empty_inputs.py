"""Empty-input robustness: every registered query must degrade to an
empty (or single-summary-row) result on zero-row tables, never crash.

The failure modes this guards (all found by probing and fixed): driver
``head()``/``first()`` on an empty frame returning None and being
subscripted (probe-vector fetches), ``collect()[0]`` IndexErrors
(pagination cursors, k-means init), NULL aggregates fed to ``int()``,
``max(ts)`` None + timedelta (streaming flush sentinel), and reading
back a partitioned parquet dir that an empty write left without any
partition directories (schema inference fails unless the schema is
declared). A 100 TB pipeline hits all of these on day one via an empty
partition, a filtered-to-nothing increment, or a cold-start corpus.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

from tests.conftest import TABLES

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

SF_SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Zero-row copies of every testdata table (schemas preserved)."""
    d = tmp_path_factory.mktemp("sfempty")
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{SF_SRC}/{t}.parquet') "
            f"LIMIT 0) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.mark.slow
def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    qs = entry.queries()
    failures = []
    for name, fn in qs.items():
        try:
            fn(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, "\n".join(failures[:20])


def test_probe_queries_survive_empty_tables(spark, empty_sf_dir):
    """Fast tier: the queries with driver-side fetches that historically
    crashed on empty input (probe vectors, cursors, k-means init,
    streaming sentinels, partitioned read-back)."""
    qs = entry.queries()
    for name in [
        "pii_column_scan",
        "keyset_pagination_page3",
        "file_provenance_partition_counts",
        "ann_cosine_scores_arrow",
        "ann_ivf_partition_pruned",
        "ann_ivf_incremental_append",
        "ann_ivfpq_topk",
        "ann_pq_recall_audit",
        "ann_ivfadc_topk",
        "ann_pq_adc_topk",
        "dedup_embedding_lsh90",
        "kmeans_clusters",
    ]:
        assert qs[name](spark, empty_sf_dir).count() >= 0, name
