"""Entity linking: surface forms -> candidate entities, with vectorized
scoring and skew-aware joins (BASELINE.json north_star: "entity-link scoring
done in vectorized pandas/Arrow UDFs", "broadcast dictionaries for hot
entities, salted hash joins for skewed predicates"; SURVEY.md O39).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def entity_dictionary(spark: SparkSession, vocab_rows: list[tuple[str, str, str]]) -> DataFrame:
    """(entity_id, surface, type, canonical) dictionary DataFrame.

    The canonical surface (min per entity) is computed driver-side — the
    vocab is already a Python list, and deriving it with a groupBy + join
    would cost two extra Spark jobs of pure scheduling latency per pipeline
    run on what is by definition broadcast-sized data."""
    canon: dict[str, str] = {}
    for eid, surface, _t in vocab_rows:
        canon[eid] = surface if eid not in canon else min(canon[eid], surface)
    rows = [(eid, s, t, canon[eid]) for eid, s, t in vocab_rows]
    # via pandas so createDataFrame takes the Arrow path (enabled in
    # session.py): the plain-list path pickles every row through py4j,
    # measured ~0.3s per pipeline run for a ~30k-row vocabulary (r8)
    pdf = pd.DataFrame(
        rows, columns=["entity_id", "surface", "type", "canonical"]
    )
    return spark.createDataFrame(
        pdf, "entity_id string, surface string, type string, canonical string"
    )


@F.pandas_udf(T.DoubleType())
def link_score(surface: pd.Series, canonical: pd.Series) -> pd.Series:
    """Vectorized link scoring: exact-canonical 1.0, alias 0.9 - small
    length penalty (a stand-in for a real embedding/edit-distance scorer;
    the Spark-side plumbing — Arrow batches, two string columns in, one
    double out — is the production shape)."""
    exact = (surface == canonical).astype(float)
    lp = (surface.str.len() - canonical.str.len()).abs().clip(upper=10) / 100.0
    return exact + (1.0 - exact) * (0.9 - lp)


def link_mentions(
    mentions: DataFrame,
    dictionary: DataFrame,
    surface_col: str = "surface",
    min_score: float = 0.5,
) -> DataFrame:
    """Join mentions to entity candidates and score.

    The dictionary is a hot-entity-skewed small dimension -> **broadcast**
    (north_star mandate): the join is map-side, no shuffle of the (huge)
    mention fact table, and a hot surface (20% of docs) can't create a
    skewed shuffle partition because there is no shuffle.
    """
    if "canonical" in dictionary.columns:
        dict_c = dictionary
    else:  # dictionaries built elsewhere: derive canonical distributedly
        canon = dictionary.groupBy("entity_id").agg(F.min("surface").alias("canonical"))
        dict_c = dictionary.join(F.broadcast(canon), "entity_id")
    out = mentions.join(
        F.broadcast(dict_c), mentions[surface_col] == dict_c["surface"], "inner"
    ).drop(dict_c["surface"])
    out = out.withColumn("score", link_score(F.col(surface_col), F.col("canonical")))
    return out.where(F.col("score") >= min_score)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
) -> DataFrame:
    """Explicit skew-salted equi-join (SURVEY.md O39) for when the dimension
    is too big to broadcast: fact keys get a deterministic salt from a
    sibling column hash, dim rows are replicated across all salts.

    Used as the fallback strategy; AQE's skew-join handles moderate skew, a
    single mega-key on a non-broadcastable join needs this.
    """
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(salt)).cast("int"))
    d = dim.withColumn("__salt", F.explode(F.array([F.lit(i) for i in range(salt)])))
    out = f.join(d, on=[key, "__salt"], how="inner").drop("__salt")
    return out


def candidate_edges(linked: DataFrame) -> DataFrame:
    """Linked mentions -> candidate entity-link edges for canonicalization:
    (surface-node, entity-node) pairs, deduped. Node namespace prefixes keep
    the bipartite graph unambiguous."""
    return (
        linked.select(
            F.concat(F.lit("s:"), F.col("surface")).alias("src"),
            F.concat(F.lit("e:"), F.col("entity_id")).alias("dst"),
        )
        .distinct()
    )
