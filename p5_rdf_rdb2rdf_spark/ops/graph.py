"""Graph analytics over the constructed KG — the post-construction
consumers a knowledge-graph pipeline feeds (entity importance for ranking
and sampling, connectivity stats for corpus QA).

Inputs are plain (src, dst) edge DataFrames — e.g. the (s_value, o_value)
projection of an IRI-object triple slice, or ``pipeline.linking``'s
candidate edges. All three operators are pure DataFrame plans:

``degrees``
    in/out/total degree per node. Two partial-aggregated exchanges (one per
    direction) + a full-outer merge on node — counts are exact integers, so
    any SQL engine reproduces them bit-for-bit.

``triangle_count``
    exact global triangle count. Canonicalizes to an undirected simple
    graph (u < v, distinct, self-loops dropped), builds wedges by joining
    the edge list with itself on the middle vertex, then closes them with a
    second join against the edge list. Exactly the two-shuffle-join shape
    that survives scale; skew on hub vertices is AQE's skew-join case, and
    the count is an exact integer (DuckDB twin: the same 3-way self-join).

``pagerank``
    fixed-iteration damped PageRank. Iterative — each round is one
    aggregation over the edge list joined to the current ranks (shuffle on
    dst), with ranks checkpointed per iteration like ``pipeline.cc``.
    Dangling-node mass is redistributed uniformly each round (the standard
    convention, keeps the rank sum at 1). Floating-point sums are
    ORDER-DEPENDENT across engines/partitionings, so this op is verified
    against an exact Python twin on small graphs + structural invariants
    (sum==1, uniform on symmetric graphs) rather than a SQL hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """-> (node, out_degree, in_degree, degree); exact integer counts.
    Nodes appearing only on one side report 0 for the other direction."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def _undirected_simple(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected simple edges: (u, v) with u < v, distinct,
    self-loops dropped — direction and multiplicity never create or destroy
    a triangle."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """-> one row (n_triangles: long), the exact number of distinct
    vertex triangles. Wedge join on the middle vertex (u<v and v<w give
    each triangle exactly one canonical wedge u<v<w), closed by a second
    join checking (u, w) is an edge — each triangle counted exactly once."""
    e = _undirected_simple(edges, src, dst)
    w1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    w2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = w1.join(w2, "b")  # a < b < c by construction
    closing = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = wedges.join(closing, ["a", "c"])
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """-> (node, rank) after ``iterations`` damped power-iteration rounds,
    rank summing to 1 (dangling mass redistributed uniformly). The edge
    list and out-degrees are computed once and reused; ranks localCheckpoint
    per iteration so the lineage (and recomputation) does not grow with the
    iteration count — the same discipline as ``pipeline.cc``."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = edges.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("__deg"))
    # (src node, dst node, out-degree of src): the join frame each round
    link = (
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("node"))
        .join(deg.withColumnRenamed("node", "__src"), "__src")
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            link.join(
                ranks.withColumnRenamed("node", "__src").withColumnRenamed(
                    "rank", "__r"
                ),
                "__src",
            )
            .groupBy("node")
            .agg(F.sum(F.col("__r") / F.col("__deg")).alias("__in"))
        )
        # dangling mass = 1 - sum of ranks held by nodes WITH out-edges
        linked_mass = (
            ranks.join(deg, "node", "left_semi").agg(F.sum("rank")).first()[0]
            or 0.0
        )
        dangling = 1.0 - linked_mass
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
