from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from p5_rdf_rdb2rdf_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # small core count for test speed; bench uses SPARK_GRAFT_CPUS
    s = get_spark("tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from p5_rdf_rdb2rdf_spark.fixtures import fixture_tables

    t = fixture_tables(spark)
    for name, df in t.items():
        df.createOrReplaceTempView(name)
    return t


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def tpch(spark):
    names = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for n in names:
        df = spark.read.parquet(f"{SF_DIR}/{n}.parquet")
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
