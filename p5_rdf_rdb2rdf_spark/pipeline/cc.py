"""Iterative connected components over candidate entity-link edges
(SURVEY.md O38; north_star: "entity canonicalization runs as an iterative
connected-components merge over candidate links").

Algorithm: min-label propagation (the alternating large-star/small-star
optimization is unnecessary for link graphs whose components are shallow
stars — surface/alias clusters; iterations needed ~= graph diameter, 2-3).

Scale mechanics:
- labels and edges are hash-partitioned on the join key; each iteration is
  one shuffle join + one groupBy-min;
- ``localCheckpoint`` every iteration cuts the lineage chain (otherwise the
  plan doubles per iteration and the driver OOMs planning iteration ~20);
- convergence test is a count of changed labels (cheap aggregate), bounded
  by ``max_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """-> (node, component) where component = min node id in the component.

    Graphs at or below ``driver_threshold`` edges take a driver-side
    union-find fast path: the entity-link graph is |surfaces|+|entities|
    sized — corpus-size-INVARIANT — so even a 10^12-doc run usually has a
    tiny graph here, and the iterative path's ~10 Spark jobs of pure
    scheduling latency dominate end-to-end pipeline time (measured in
    BENCH/BASELINE.md round-2 stage profile). Both paths produce identical
    (node, min-member) output; the distributed path remains for genuinely
    large graphs (set ``driver_threshold=0`` to force it).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    spark = edges.sparkSession

    if driver_threshold > 0:
        sample = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).limit(
            driver_threshold + 1
        ).collect()
        if len(sample) <= driver_threshold:
            parent: dict[str, str] = {}

            def find(x: str) -> str:
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in sample:
                for n in (row.u, row.v):
                    if n not in parent:
                        parent[n] = n
                ru, rv = find(row.u), find(row.v)
                if ru != rv:
                    parent[ru] = rv
            comp_min: dict[str, str] = {}
            for n in parent:
                r = find(n)
                if r not in comp_min or n < comp_min[r]:
                    comp_min[r] = n
            rows = [(n, comp_min[find(n)]) for n in sorted(parent)]
            return spark.createDataFrame(rows, "node string, component string")

    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint()
    # right-size the iteration: per-round shuffle overhead dominates on small
    # graphs, so shrink partitions to match |V| (entity-link graphs are often
    # tiny after the broadcast-link stage even when the corpus is huge)
    n_nodes = labels.count()
    parts = max(1, min(edges.sparkSession.sparkContext.defaultParallelism, n_nodes // 50_000 + 1))
    labels = labels.repartition(parts, "node").localCheckpoint()
    sym = sym.repartition(parts, "u").localCheckpoint()

    for _ in range(max_iter):
        # (1) neighbor's current label, propagated over edges (1 hop)
        neighbor = (
            sym.join(labels, sym["u"] == labels["node"], "inner")
            .select(F.col("v").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("nbr_min"))
        )
        hop = labels.join(neighbor, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
        )
        # (2) pointer doubling: component <- label(component); gives the
        # O(log diameter) convergence plain propagation lacks
        ptr = hop.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        doubled = (
            hop.join(ptr, hop["component"] == ptr["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("p_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            doubled.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = doubled
        if changed == 0:
            break
    return labels


def canonical_mapping(components: DataFrame, prefix: str = "e:") -> DataFrame:
    """Pick each component's canonical entity: the min ``e:``-prefixed member
    (entity nodes win over surface nodes). -> (node, canonical_entity)."""
    entities = components.where(F.col("node").startswith(prefix)).groupBy("component").agg(
        F.min("node").alias("canonical_entity")
    )
    return (
        components.join(entities, "component", "inner")
        .select("node", F.expr(f"substring(canonical_entity, {len(prefix) + 1})").alias("canonical_entity"))
    )
