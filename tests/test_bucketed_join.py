"""Co-located (bucketed) ref-object joins — the 100 TB join strategy the
scale notes promise: when both logical tables are bucketed on the join key,
the rr:joinCondition equi-join runs with ZERO shuffle exchanges (each bucket
pair joins in place), instead of shuffling the fact table.

Spark primitive: ``bucketBy(n, key).sortBy(key).saveAsTable`` + the mapping
compiler's plain equi-join — Catalyst recognizes the matching bucket specs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p5_rdf_rdb2rdf_spark.compiler import compile_mapping
from p5_rdf_rdb2rdf_spark.r2rml import r2rml_to_ir

TTL = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://e/> .
<#O> rr:logicalTable [ rr:tableName "orders_bkt" ] ;
  rr:subjectMap [ rr:template "http://e/o/{o_orderkey}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:cust ;
    rr:objectMap [ rr:parentTriplesMap <#C> ;
                   rr:joinCondition [ rr:child "o_custkey" ; rr:parent "c_custkey" ] ] ] .
<#C> rr:logicalTable [ rr:tableName "customer_bkt" ] ;
  rr:subjectMap [ rr:template "http://e/c/{c_custkey}" ] .
"""


@pytest.fixture(scope="module")
def bucketed_tables(spark, tpch, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    for name, df, key in (
        ("orders_bkt", tpch["orders"].select("o_orderkey", "o_custkey"), "o_custkey"),
        ("customer_bkt", tpch["customer"].select("c_custkey"), "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(wh / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield
    for name in ("orders_bkt", "customer_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_refobject_join_has_no_shuffle(spark, tpch, bucketed_tables):
    """Both sides bucketed on the join key with equal bucket counts -> the
    ref-object join plan contains NO shuffle exchange (co-located join)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ir = r2rml_to_ir(TTL)
        # only the join pattern: drop <#C>'s own (empty) output
        t = compile_mapping(spark, ir, dedup=False)  # isolate the join (dedup adds its own exchange)
        join_only = t.where(F.col("p_value") == "http://e/cust")
        plan = join_only._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and it computes the right thing
        n = join_only.count()
        want = (
            tpch["orders"]
            .join(tpch["customer"], F.col("o_custkey") == F.col("c_custkey"))
            .count()
        )
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_same_join_shuffles(spark, tpch):
    """Control: the identical join over plain (non-bucketed) sources does
    shuffle — proving the bucketed plan's exchange elision is real."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ttl = TTL.replace("orders_bkt", "orders").replace("customer_bkt", "customer")
        t = compile_mapping(
            spark, r2rml_to_ir(ttl),
            tables={"orders": tpch["orders"], "customer": tpch["customer"]},
            dedup=False,
        )
        join_only = t.where(F.col("p_value") == "http://e/cust")
        plan = join_only._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
