"""GraphTable (predicate-bucket partitioning, snapshots) + checkpointer."""

from __future__ import annotations

from pyspark.sql import functions as F

from p5_rdf_rdb2rdf_spark.direct_mapping import direct_map
from p5_rdf_rdb2rdf_spark.fixtures import CONSTRAINTS
from p5_rdf_rdb2rdf_spark.io.checkpoint import StageCheckpointer
from p5_rdf_rdb2rdf_spark.io.graph_table import GraphTable

BASE = "http://example.com/base/"


def test_graph_table_roundtrip_and_snapshots(spark, tables, tmp_path):
    triples = direct_map(spark, tables, CONSTRAINTS, base=BASE)
    gt = GraphTable(spark, str(tmp_path / "gt"), n_buckets=4)
    snap1 = gt.write(triples, lineage={"stage": "test"})
    back = gt.read()
    want = sorted(map(tuple, triples.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want

    # second snapshot chains to the first and both stay readable
    snap2 = gt.write(triples.where(F.col("p_value").contains("title")))
    assert gt.current_snapshot()["id"] == snap2
    assert gt.current_snapshot()["parent"] == snap1
    assert gt.read(snap1).count() == len(want)
    meta = gt.current_snapshot()
    assert meta["total_rows"] == sum(meta["partition_rows"].values())


def test_graph_table_predicate_pruning(spark, tables, tmp_path):
    triples = direct_map(spark, tables, CONSTRAINTS, base=BASE)
    gt = GraphTable(spark, str(tmp_path / "gt2"), n_buckets=4)
    gt.write(triples)
    pred = f"{BASE}books#title"
    df = gt.read_predicate(pred)
    want = triples.where(F.col("p_value") == pred).count()
    assert df.count() == want
    # partition filter must appear in the plan (directory pruning)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "pred_bucket" in plan


def test_checkpointer_resume_and_lineage(spark, tmp_path):
    ck = StageCheckpointer(spark, str(tmp_path / "ck"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).select(F.col("id"))

    a = ck.run_stage("s1", build, inputs=["src"], meta={"k": "v"})
    assert a.count() == 10 and calls["n"] == 1
    b = ck.run_stage("s1", build)
    assert b.count() == 10 and calls["n"] == 1  # resumed, not re-run
    lin = ck.lineage()["stages"]["s1"]
    assert lin["rows"] == 10 and lin["inputs"] == ["src"] and lin["meta"] == {"k": "v"}
    assert sum(p["rows"] for p in lin["partitions"]) == 10

    ck.reset_from("s1")
    ck.run_stage("s1", build)
    assert calls["n"] == 2  # re-ran after invalidation


def test_driver_side_writers_guard_collect(spark):
    """to_turtle / to_ntriples refuse to collect graphs beyond max_triples
    (big graphs must go through the distributed ntriples_lines writer)."""
    import pytest
    from pyspark.sql import functions as F

    from p5_rdf_rdb2rdf_spark.ntriples import to_ntriples
    from p5_rdf_rdb2rdf_spark.turtle_writer import to_turtle

    big = spark.range(100).select(
        F.lit("iri").alias("s_kind"),
        F.concat(F.lit("http://s/"), F.col("id")).alias("s_value"),
        F.lit("http://p/x").alias("p_value"),
        F.lit("literal").alias("o_kind"),
        F.col("id").cast("string").alias("o_value"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(None).cast("string").alias("g_value"),
    )
    with pytest.raises(ValueError, match="max_triples"):
        to_ntriples(big, max_triples=10)
    with pytest.raises(ValueError, match="max_triples"):
        to_turtle(big, max_triples=10)
    assert len(to_ntriples(big, max_triples=1000)) == 100
