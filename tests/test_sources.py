"""Source layer: parquet-dir database loading (DBI-handle analog)."""

from __future__ import annotations

from p5_rdf_rdb2rdf_spark.sources import from_parquet_dir

SF_DIR = "/root/testdata/sf0.001"


def test_from_parquet_dir(spark):
    tables = from_parquet_dir(spark, SF_DIR)
    assert set(tables) >= {
        "region",
        "nation",
        "customer",
        "orders",
        "lineitem",
        "documents",
        "embeddings",
    }
    assert tables["region"].count() == 5
    # views registered for rr:sqlQuery use
    assert spark.sql("SELECT count(*) c FROM region").head().c == 5
