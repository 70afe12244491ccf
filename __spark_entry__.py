"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: Direct-Map the sf0.001 TPC-H-ish star schema to
an RDF triples DataFrame (the engine's core capability, SURVEY.md M1) and
aggregate triple counts per predicate.

``queries()`` / ``oracle_sql()`` — per-operator correctness contract; the
DuckDB oracle re-derives the same result in ANSI SQL (SURVEY.md §5 item 2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

TPCH_TABLES = [
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

BASE = "http://example.com/base/"

# constraints manifest for the TPC-H-ish star schema (FIXTURES.md §3 role:
# replaces DBI primary_key/foreign_key_info for Direct Mapping)
TPCH_CONSTRAINTS = {
    "region": {"pk": ["r_regionkey"], "fks": []},
    "nation": {
        "pk": ["n_nationkey"],
        "fks": [{"cols": ["n_regionkey"], "parent": "region", "parent_cols": ["r_regionkey"]}],
    },
    "customer": {
        "pk": ["c_custkey"],
        "fks": [{"cols": ["c_nationkey"], "parent": "nation", "parent_cols": ["n_nationkey"]}],
    },
    "supplier": {
        "pk": ["s_suppkey"],
        "fks": [{"cols": ["s_nationkey"], "parent": "nation", "parent_cols": ["n_nationkey"]}],
    },
    "part": {"pk": ["p_partkey"], "fks": []},
    "orders": {
        "pk": ["o_orderkey"],
        "fks": [{"cols": ["o_custkey"], "parent": "customer", "parent_cols": ["c_custkey"]}],
    },
    "lineitem": {
        "pk": ["l_orderkey", "l_linenumber"],
        # the synthetic generator does NOT enforce the composite key: at
        # sf0.1, 600k rows carry only 456,861 distinct (orderkey, linenumber)
        # pairs, and same-key rows share low-cardinality column values —
        # real triple duplicates. This flag keeps PK-templated subjects but
        # routes lineitem through its own dedup slice in direct_map's PK
        # fast path (every enforced-key table skips the dedup shuffle).
        "pk_enforced": False,
        "fks": [
            {"cols": ["l_orderkey"], "parent": "orders", "parent_cols": ["o_orderkey"]},
            {"cols": ["l_partkey"], "parent": "part", "parent_cols": ["p_partkey"]},
            {"cols": ["l_suppkey"], "parent": "supplier", "parent_cols": ["s_suppkey"]},
        ],
    },
    "events": {"pk": ["event_id"], "fks": []},
}


def _load(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    out = {}
    for n in names or TPCH_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        df.createOrReplaceTempView(n)
        out[n] = df
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: Direct-Map nation+region -> triples -> counts
    per predicate (driver checks rows>0, stable schema)."""
    from p5_rdf_rdb2rdf_spark.direct_mapping import direct_map

    tables = _load(spark, "/root/testdata/sf0.001", ["region", "nation", "customer", "orders"])
    triples = direct_map(
        spark, tables, TPCH_CONSTRAINTS, base=BASE, only=["region", "nation", "customer", "orders"]
    )
    return (
        triples.groupBy("p_value")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .orderBy("p_value")
    )


# ---------------------------------------------------------------------------
# queries + DuckDB oracle (driver runs at sf0.01)

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


# --- O1/O30/O32/O33: DM row nodes + type triples + typed literals ----------
@_q(
    "dm_nation_triples",
    f"""
    WITH t AS (
      SELECT '{BASE}nation/n_nationkey=' || CAST(n_nationkey AS VARCHAR) AS s,
             'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
             '{BASE}nation' AS o
      FROM nation
      UNION ALL
      SELECT '{BASE}nation/n_nationkey=' || CAST(n_nationkey AS VARCHAR),
             '{BASE}nation#n_nationkey', CAST(n_nationkey AS VARCHAR)
      FROM nation
      UNION ALL
      SELECT '{BASE}nation/n_nationkey=' || CAST(n_nationkey AS VARCHAR),
             '{BASE}nation#n_name', n_name
      FROM nation WHERE n_name IS NOT NULL
      UNION ALL
      SELECT '{BASE}nation/n_nationkey=' || CAST(n_nationkey AS VARCHAR),
             '{BASE}nation#n_regionkey', CAST(n_regionkey AS VARCHAR)
      FROM nation WHERE n_regionkey IS NOT NULL
      UNION ALL
      SELECT '{BASE}nation/n_nationkey=' || CAST(n_nationkey AS VARCHAR),
             '{BASE}nation#ref-n_regionkey',
             '{BASE}region/r_regionkey=' || CAST(n_regionkey AS VARCHAR)
      FROM nation WHERE n_regionkey IS NOT NULL
    )
    SELECT DISTINCT s AS s_value, p AS p_value, o AS o_value FROM t
    ORDER BY s_value, p_value, o_value
    """,
)
def dm_nation_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.direct_mapping import direct_map

    tables = _load(spark, sf_dir, ["region", "nation"])
    t = direct_map(spark, tables, TPCH_CONSTRAINTS, base=BASE, only=["nation", "region"])
    return (
        t.where(F.col("s_value").startswith(f"{BASE}nation/"))
        .select("s_value", "p_value", "o_value")
        .distinct()
        .orderBy("s_value", "p_value", "o_value")
    )


# --- O18: distinct-triple materialization, counts per predicate ------------
_DM_CUSTOMER_PRED_COUNTS_SQL = f"""
    WITH t AS (
      SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p FROM customer
      UNION ALL SELECT '{BASE}customer#c_custkey' FROM customer
      UNION ALL SELECT '{BASE}customer#c_name' FROM customer WHERE c_name IS NOT NULL
      UNION ALL SELECT '{BASE}customer#c_nationkey' FROM customer WHERE c_nationkey IS NOT NULL
      UNION ALL SELECT '{BASE}customer#c_acctbal' FROM customer WHERE c_acctbal IS NOT NULL
      UNION ALL SELECT '{BASE}customer#c_mktsegment' FROM customer WHERE c_mktsegment IS NOT NULL
      UNION ALL SELECT '{BASE}customer#ref-c_nationkey' FROM customer WHERE c_nationkey IS NOT NULL
    )
    SELECT p AS p_value, COUNT(*) AS n_triples FROM t GROUP BY p ORDER BY p
    """


@_q("dm_predicate_counts", _DM_CUSTOMER_PRED_COUNTS_SQL)
def dm_predicate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.direct_mapping import direct_map

    tables = _load(spark, sf_dir, ["nation", "customer"])
    t = direct_map(spark, tables, TPCH_CONSTRAINTS, base=BASE, only=["customer"])
    return (
        t.groupBy("p_value").agg(F.count(F.lit(1)).alias("n_triples")).orderBy("p_value")
    )


# --- incremental delta-merge materialization (GraphTable.merge) ------------
@_q("graph_incremental_merge", _DM_CUSTOMER_PRED_COUNTS_SQL)
def graph_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental set-semantics materialization: the customer DM triples
    arrive in three OVERLAPPING batches (subject-hash ranges 0-60%, 40-100%,
    then a full re-merge), each GraphTable.merge() writing only the delta
    not already in the chained snapshots (null-safe anti-join). The final
    chain must equal the one-shot materialization exactly — same closed-form
    per-predicate oracle as dm_predicate_counts — which also witnesses
    idempotent resume (the third merge is an empty delta)."""
    import tempfile

    from p5_rdf_rdb2rdf_spark.direct_mapping import direct_map
    from p5_rdf_rdb2rdf_spark.io.graph_table import GraphTable

    tables = _load(spark, sf_dir, ["nation", "customer"])
    t = direct_map(spark, tables, TPCH_CONSTRAINTS, base=BASE, only=["customer"])
    h = F.pmod(F.xxhash64(F.col("s_value")), F.lit(10))
    with tempfile.TemporaryDirectory() as wd:
        gt = GraphTable(spark, f"{wd}/graph", n_buckets=4)
        gt.merge(t.where(h < 6))
        gt.merge(t.where(h >= 4))
        gt.merge(t)  # idempotence: already fully known -> empty delta
        assert gt.current_snapshot()["delta_rows"] == 0
        out = (
            gt.read()
            .groupBy("p_value")
            .agg(F.count(F.lit(1)).alias("n_triples"))
            .orderBy("p_value")
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # detach from tmpdir
    return out


# --- O13: R2RML referencing-object join (rr:joinCondition) -----------------
_R2RML_ORDERS = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://example.org/tpch#> .
<#Orders>
  rr:logicalTable [ rr:tableName "orders" ] ;
  rr:subjectMap [ rr:template "http://example.org/order/{o_orderkey}" ;
                  rr:class ex:Order ] ;
  rr:predicateObjectMap [
    rr:predicate ex:status ;
    rr:objectMap [ rr:column "o_orderstatus" ] ] ;
  rr:predicateObjectMap [
    rr:predicate ex:customer ;
    rr:objectMap [ rr:parentTriplesMap <#Customer> ;
                   rr:joinCondition [ rr:child "o_custkey" ; rr:parent "c_custkey" ] ] ] .
<#Customer>
  rr:logicalTable [ rr:tableName "customer" ] ;
  rr:subjectMap [ rr:template "http://example.org/customer/{c_custkey}" ;
                  rr:class ex:Customer ] ;
  rr:predicateObjectMap [
    rr:predicate ex:segment ;
    rr:objectMap [ rr:column "c_mktsegment" ] ] .
"""


@_q(
    "r2rml_orders_customer_join",
    """
    WITH t AS (
      SELECT 'http://example.org/order/' || CAST(o_orderkey AS VARCHAR) AS s,
             'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
             'http://example.org/tpch#Order' AS o
      FROM orders
      UNION ALL
      SELECT 'http://example.org/order/' || CAST(o_orderkey AS VARCHAR),
             'http://example.org/tpch#status', o_orderstatus
      FROM orders WHERE o_orderstatus IS NOT NULL
      UNION ALL
      SELECT 'http://example.org/order/' || CAST(o_orderkey AS VARCHAR),
             'http://example.org/tpch#customer',
             'http://example.org/customer/' || CAST(c.c_custkey AS VARCHAR)
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'http://example.org/customer/' || CAST(c_custkey AS VARCHAR),
             'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
             'http://example.org/tpch#Customer'
      FROM customer
      UNION ALL
      SELECT 'http://example.org/customer/' || CAST(c_custkey AS VARCHAR),
             'http://example.org/tpch#segment', c_mktsegment
      FROM customer WHERE c_mktsegment IS NOT NULL
    )
    SELECT DISTINCT s AS s_value, p AS p_value, o AS o_value FROM t
    """,
)
def r2rml_orders_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.compiler import compile_mapping
    from p5_rdf_rdb2rdf_spark.r2rml import r2rml_to_ir

    tables = _load(spark, sf_dir, ["orders", "customer"])
    ir = r2rml_to_ir(_R2RML_ORDERS)
    t = compile_mapping(spark, ir, tables=tables, broadcast_parents={"#Customer"})
    return t.select("s_value", "p_value", "o_value").distinct()


# --- Simple front end over supplier (property + rel + typeof) --------------
@_q(
    "simple_supplier_mapping",
    """
    WITH t AS (
      SELECT 'http://example.org/supplier/' || CAST(s_suppkey AS VARCHAR) AS s,
             'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
             'http://example.org/tpch#Supplier' AS o
      FROM supplier
      UNION ALL
      SELECT 'http://example.org/supplier/' || CAST(s_suppkey AS VARCHAR),
             'http://xmlns.com/foaf/0.1/name', s_name
      FROM supplier WHERE s_name IS NOT NULL
      UNION ALL
      SELECT 'http://example.org/supplier/' || CAST(s_suppkey AS VARCHAR),
             'http://example.org/tpch#nation',
             'http://example.org/nation/' || CAST(s_nationkey AS VARCHAR)
      FROM supplier WHERE s_nationkey IS NOT NULL
    )
    SELECT DISTINCT s AS s_value, p AS p_value, o AS o_value FROM t
    """,
)
def simple_supplier_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.compiler import compile_mapping
    from p5_rdf_rdb2rdf_spark.simple import simple_to_ir

    tables = _load(spark, sf_dir, ["supplier"])
    doc = {
        "namespaces": {"ex": "http://example.org/tpch#", "foaf": "http://xmlns.com/foaf/0.1/"},
        "mappings": {
            "supplier": {
                "from": "supplier",
                "about": "supplier/{s_suppkey}",
                "typeof": ["ex:Supplier"],
                "columns": {
                    "s_name": [{"property": "foaf:name"}],
                    "s_nationkey": [{"rel": "ex:nation", "resource": "nation/{s_nationkey}"}],
                },
            }
        },
    }
    ir = simple_to_ir(doc, base="http://example.org/")
    t = compile_mapping(spark, ir, tables=tables)
    return t.select("s_value", "p_value", "o_value").distinct()


# --- O2/O17: rr:sqlQuery view with aggregation -----------------------------
_R2RML_VIEW = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://example.org/tpch#> .
<#LineStats>
  rr:logicalTable [ rr:sqlQuery \"\"\"
     SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS sum_qty
     FROM lineitem GROUP BY l_returnflag, l_linestatus
  \"\"\" ] ;
  rr:subjectMap [ rr:template "http://example.org/linestats/{l_returnflag}/{l_linestatus}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:nLines ;
                          rr:objectMap [ rr:column "n_lines" ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:sumQty ;
                          rr:objectMap [ rr:column "sum_qty" ] ] .
"""


@_q(
    "r2rml_sql_view_agg",
    """
    WITH v AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    ), t AS (
      SELECT 'http://example.org/linestats/' || l_returnflag || '/' || l_linestatus AS s,
             'http://example.org/tpch#nLines' AS p, CAST(n_lines AS VARCHAR) AS o
      FROM v
      UNION ALL
      SELECT 'http://example.org/linestats/' || l_returnflag || '/' || l_linestatus,
             'http://example.org/tpch#sumQty', CAST(sum_qty AS VARCHAR)
      FROM v
    )
    SELECT s AS s_value, p AS p_value, o AS o_value FROM t
    """,
)
def r2rml_sql_view_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.compiler import compile_mapping
    from p5_rdf_rdb2rdf_spark.r2rml import r2rml_to_ir

    _load(spark, sf_dir, ["lineitem"])  # registers temp view for rr:sqlQuery
    ir = r2rml_to_ir(_R2RML_VIEW)
    t = compile_mapping(spark, ir)
    return t.select("s_value", "p_value", "o_value")


# --- interleaved-docs pipeline ops (north_star) ------------------------------

_MENTION_VOCAB = ["spark", "customer", "vector", "window", "merge", "filter"]


@_q(
    "kg_spans_flat",
    """
    WITH spans AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'text' AS kind, text,
             CAST(NULL AS VARCHAR) AS media_ref, 0 AS "offset"
      FROM documents
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR), 'image', NULL,
             'media://image/' || CAST(doc_id AS VARCHAR) || '/1', 1
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR), 'audio', NULL,
             'media://audio/' || CAST(doc_id AS VARCHAR) || '/2', 2
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id, kind, media_ref, "offset" FROM spans
    """,
)
def kg_spans_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-shape derivation + span explode (input_hint schema)."""
    from p5_rdf_rdb2rdf_spark.pipeline.corpus import spans_from_documents
    from p5_rdf_rdb2rdf_spark.pipeline.spans import explode_spans

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return explode_spans(spans_from_documents(docs)).select(
        "doc_id", "kind", "media_ref", "offset"
    )


@_q(
    "kg_doc_mentions",
    """
    WITH v(surface) AS (
      VALUES ('spark'), ('customer'), ('vector'), ('window'), ('merge'), ('filter')
    )
    SELECT 'http://example.org/doc/' || CAST(d.doc_id AS VARCHAR) AS s_value,
           'http://example.org/kg/mentions' AS p_value,
           'http://example.org/kg/' || v.surface AS o_value
    FROM documents d JOIN v
      ON contains(' ' || d.text || ' ', ' ' || v.surface || ' ')
    """,
)
def kg_doc_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-vocab mention detection through the vectorized pandas-UDF path
    (input_hint: no per-row Python) -> provenance triples."""
    from p5_rdf_rdb2rdf_spark.pipeline.corpus import spans_from_documents
    from p5_rdf_rdb2rdf_spark.pipeline.mentions import detect_mentions
    from p5_rdf_rdb2rdf_spark.pipeline.spans import explode_spans

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    spans = explode_spans(spans_from_documents(docs))
    m = detect_mentions(spans.where("kind = 'text'"), _MENTION_VOCAB)
    return m.select(
        F.concat(F.lit("http://example.org/doc/"), F.col("doc_id")).alias("s_value"),
        F.lit("http://example.org/kg/mentions").alias("p_value"),
        F.concat(F.lit("http://example.org/kg/"), F.col("surface")).alias("o_value"),
    )


def _kg_synth_expected_sql(n_docs: int = 300) -> str:
    """Closed-form per-predicate distinct-triple counts for the synthetic
    corpus, as a DuckDB VALUES oracle (corpus.py's generators are pure
    integer arithmetic, so the expectation is computable without running
    the engine — see pipeline/corpus.py `expected_triples`)."""
    from collections import Counter

    from p5_rdf_rdb2rdf_spark.pipeline import corpus as C

    cnt: Counter[str] = Counter()
    for _s, pred, _o in C.expected_triples(n_docs):
        cnt[pred] += 1
    mentions = set()
    for d in range(n_docs):
        for i in range(C._n_spans(d)):
            if C._is_text(d, i):
                mentions.add((d, C._a_idx(d, i)))
    cnt[C.KG + "mentions"] = len(mentions)
    rows = ",\n      ".join(
        f"('{p}', CAST({n} AS BIGINT))" for p, n in sorted(cnt.items())
    )
    return (
        "SELECT p_value, n_triples FROM (VALUES\n      "
        + rows
        + "\n    ) AS t(p_value, n_triples) ORDER BY p_value"
    )


@_q("kg_pipeline_synth", _kg_synth_expected_sql(300))
def kg_pipeline_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full KG pipeline (spans -> relations -> linking -> CC -> materialize)
    on the deterministic synthetic interleaved corpus; the oracle is the
    closed-form expected per-predicate count (P/R = 1.0 is also enforced
    pairwise in tests/test_pipeline.py)."""
    import tempfile

    from p5_rdf_rdb2rdf_spark.pipeline.corpus import synth_corpus
    from p5_rdf_rdb2rdf_spark.pipeline.kgpipeline import run_pipeline

    docs = synth_corpus(spark, 300, partitions=8)
    with tempfile.TemporaryDirectory() as wd:
        result = run_pipeline(spark, docs, wd, n_buckets=4)
        out = result.triples.groupBy("p_value").agg(
            F.count(F.lit(1)).alias("n_triples")
        ).orderBy("p_value")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach from tmpdir
    return out


# --- training-data ops over documents/embeddings ---------------------------


@_q(
    "text_token_stats",
    r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens,
           length(text) AS n_chars,
           len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS stopword_hits
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.ops.text import STOPWORDS, bpeish_token_count, token_count

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    toks = F.split(F.trim("text"), r"\s+")

    def _eq(w):
        return lambda x: x == F.lit(w)

    n_stop = None
    for w in STOPWORDS:
        c = F.size(F.filter(toks, _eq(w)))
        n_stop = c if n_stop is None else (n_stop + c)
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpeish_token_count(F.col("text")).alias("bpeish_tokens"),
        F.length("text").alias("n_chars"),
        n_stop.alias("stopword_hits"),
    )


@_q(
    "text_lang_id",
    r"""
    WITH scored AS (
      SELECT doc_id,
        len(list_filter(string_split_regex(trim(text),'\s+'), x -> list_contains(['the','a','and','of'], x))) AS s_en,
        len(list_filter(string_split_regex(trim(text),'\s+'), x -> list_contains(['der','die','und','nicht'], x))) AS s_de,
        len(list_filter(string_split_regex(trim(text),'\s+'), x -> list_contains(['le','la','et','les'], x))) AS s_fr,
        len(list_filter(string_split_regex(trim(text),'\s+'), x -> list_contains(['el','los','que','y'], x))) AS s_es
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
           WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
           WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
           WHEN s_fr > 0 THEN 'fr'
           ELSE 'und' END AS lang_guess
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.ops.text import lang_id

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_guess"))


@_q(
    "dedup_exact",
    r"""
    SELECT min(doc_id) AS doc_id, count(*) AS n_dupes
    FROM documents
    GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.ops.dedup import exact_dedup

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return exact_dedup(docs).select("doc_id", "n_dupes")


@_q(
    "text_repetition",
    r"""
    WITH base AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS t,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n
      FROM documents
    ), ng AS (
      SELECT doc_id, n, t,
             CASE WHEN n >= 2
                  THEN list_transform(range(1, n), i -> t[i] || ' ' || t[i + 1])
                  ELSE [] END AS g
      FROM base
    )
    SELECT doc_id,
           n AS n_tokens,
           CASE WHEN n > 0
                THEN round(1.0 - len(list_distinct(t)) / CAST(n AS DOUBLE), 9)
                ELSE 0.0 END AS dup_token_frac,
           CASE WHEN n >= 2 THEN n - 1 ELSE 0 END AS n_ngrams,
           CASE WHEN n >= 2
                THEN round(1.0 - len(list_distinct(g)) / CAST(n - 1 AS DOUBLE), 9)
                ELSE 0.0 END AS dup_ngram_frac
    FROM ng
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filter signals (duplicate
    token / 2-gram fractions) — exact integer-count divisions, so the
    DuckDB twin reproduces every fraction bit-for-bit."""
    from p5_rdf_rdb2rdf_spark.ops.text import repetition_features

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return repetition_features(docs, ngram=2)


@_q(
    "text_vocabulary",
    r"""
    WITH tok AS (
      SELECT doc_id, t.tok AS token
      FROM documents, unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
      WHERE t.tok != ''
    )
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM tok GROUP BY token HAVING COUNT(*) >= 5
    """,
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (term + document frequency) — the tokenizer-
    building pass. Exact-count threshold (not top-k: ties make top-k
    engine-ambiguous); whitespace tokenization matches token_count. The
    Spark plan explodes per-doc (token, count) pairs built array-side and
    aggregates them in one token-keyed exchange."""
    from p5_rdf_rdb2rdf_spark.ops.text import vocabulary

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return vocabulary(docs, min_count=5)


_CONTAM_PHRASES = ["key agg row", "spark a a", "slow fast table", "zzz-never-present"]


@_q(
    "text_contamination",
    f"""
    WITH p(ph) AS (VALUES {", ".join(f"('{p}')" for p in _CONTAM_PHRASES)}),
    h AS (
      SELECT d.doc_id, p.ph
      FROM documents d JOIN p ON strpos(d.text, p.ph) > 0
    )
    SELECT d.doc_id,
           COALESCE(c.n, 0) > 0 AS contaminated,
           CAST(COALESCE(c.n, 0) AS INT) AS n_hits
    FROM documents d
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id) c USING (doc_id)
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination flags: verbatim-phrase containment over a
    small closed phrase list (one pure-JVM scan, per-phrase contains, no
    join/shuffle/Python). The DuckDB twin is strpos()>0 — substring
    semantics are exactly portable. One phrase is guaranteed absent, so
    the oracle also witnesses the no-hit path."""
    from p5_rdf_rdb2rdf_spark.ops.text import contamination_flags

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return contamination_flags(docs, _CONTAM_PHRASES).select(
        "doc_id", "contaminated", "n_hits"
    )


@_q(
    "text_contamination_open",
    r"""
    WITH dt AS (
      SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS t
      FROM documents
    ),
    dsh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) < 8 THEN array_to_string(t, ' ')
                  ELSE array_to_string(t[r.i : r.i + 7], ' ') END AS sh
      FROM dt, unnest(range(1, greatest(len(t) - 6, 2))) AS r(i)
    ),
    ph AS (
      SELECT array_to_string(t[1:8], ' ') AS phrase FROM dt WHERE doc_id % 5 = 0
      UNION ALL
      SELECT 'absentA-' || g.i || ' absentB-' || g.i FROM range(10000) AS g(i)
    ),
    pt AS (SELECT string_split_regex(trim(phrase), '\s+') AS t FROM ph),
    psh AS (
      SELECT DISTINCT CASE WHEN len(t) < 8 THEN array_to_string(t, ' ')
                           ELSE array_to_string(t[r.i : r.i + 7], ' ') END AS sh
      FROM pt, unnest(range(1, greatest(len(t) - 6, 2))) AS r(i)
    ),
    hits AS (
      SELECT doc_id, count(*) AS n
      FROM dsh
      WHERE sh <> '' AND sh IN (SELECT sh FROM psh WHERE sh <> '')
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           h.doc_id IS NOT NULL AS contaminated,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
)
def text_contamination_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPEN-SET decontamination (VERDICT r5 #7): the phrase corpus is a
    DataFrame — here 100 real eval-set leaks (the first 8 tokens of every
    doc_id%5==0 document) plus 10,000 synthetic never-present phrases, far
    past what a literal array should carry — semi-joined against document
    word-8-gram shingles on 128-bit digest pairs (no text through the
    shuffle). The DuckDB twin rebuilds both shingle sets via unnest/slice
    and intersects them exactly; the 10k absent phrases also witness that
    scale on the phrase side cannot produce false hits."""
    from p5_rdf_rdb2rdf_spark.ops.text import contamination_semijoin

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    toks = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    real = docs.where(F.col("doc_id") % 5 == 0).select(
        F.concat_ws(" ", F.slice(toks, 1, 8)).alias("phrase")
    )
    absent = spark.range(10000).select(
        F.concat(
            F.lit("absentA-"),
            F.col("id").cast("string"),
            F.lit(" absentB-"),
            F.col("id").cast("string"),
        ).alias("phrase")
    )
    return contamination_semijoin(
        docs, real.unionByName(absent), shingle_k=8
    )


@_q(
    "text_bpe_tokens",
    """
    SELECT doc_id,
           CAST(length(replace(text, ' ', '')) -
                (length(text) - length(replace(text, 'ab', ''))) / 2
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real vocab-driven BPE token counting (VERDICT r6 #6) under an exact
    oracle: a SINGLE merge ("a","b") has the closed form
    non-whitespace-chars - occurrences("ab") (one pass merges every
    non-overlapping occurrence; a!=b so none overlap, and the corpus text
    is single-spaced so "ab" never spans words), which DuckDB expresses
    with length/replace arithmetic. Multi-merge chains are inherently
    iterative — those are pinned by the pytest reference-twin equality
    test (test_text_ops.py) per the driver contract's documented
    inexpressibility escape."""
    from p5_rdf_rdb2rdf_spark.ops.text import bpe_token_counts

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return bpe_token_counts(docs, [("a", "b")]).select("doc_id", "n_bpe_tokens")


@_q(
    "text_chunk_windows",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(coalesce(text, '')) = ''
                  THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(text), '\s+') END AS tk
      FROM documents
    ), k AS (
      SELECT doc_id, tk, len(tk) AS n, r.i AS chunk_id
      FROM t, unnest(range(CAST(ceil(len(tk) / 8.0) AS BIGINT))) AS r(i)
      WHERE len(tk) > 0
    )
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(chunk_id * 8 AS BIGINT) AS start_token,
           CAST(least(16, n - chunk_id * 8) AS BIGINT) AS n_chunk_tokens,
           array_to_string(tk[chunk_id * 8 + 1 : chunk_id * 8 + 16], ' ')
             AS chunk_text
    FROM k
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (16-token windows, stride 8 — the
    RAG-indexing shape) under an exact oracle: window starts, lengths and
    rebuilt chunk text are integer arithmetic + slicing both engines
    reproduce verbatim. Pure Column plan — one scan, explode, no Python."""
    from p5_rdf_rdb2rdf_spark.ops.text import chunk_documents

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return chunk_documents(docs, chunk_tokens=16, stride=8)


@_q(
    "events_sessionize",
    """
    WITH s AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > CAST(28800000000 AS BIGINT) THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts ASC NULLS FIRST, event_id)
    ), x AS (
      SELECT user_id, ts,
             CAST(SUM(ns) OVER (PARTITION BY user_id
                                ORDER BY ts ASC NULLS FIRST, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS session_idx
      FROM s
    )
    SELECT user_id, session_idx,
           count(*) AS n_events,
           min(ts) AS start_ts,
           max(ts) AS end_ts,
           (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
             AS duration_seconds
    FROM x GROUP BY user_id, session_idx
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (8h inactivity gap) + per-session stats
    under an exact oracle: boundaries are strict integer-microsecond
    comparisons with an (ts, event_id) tiebreak, so both engines cut
    sessions bit-for-bit; duration is one IEEE division of an exact
    integer. The behavioral-analytics pass that turns an event stream
    into KG visit observations / training examples."""
    from p5_rdf_rdb2rdf_spark.ops.sessions import session_stats

    events = _load(spark, sf_dir, ["events"])["events"]
    return session_stats(events, gap_minutes=480)


@_q(
    "text_pack_sequences",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS prefix
      FROM t
    )
    SELECT doc_id, n_tokens, prefix // 512 AS seq_id, prefix % 512 AS seq_offset
    FROM c
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (LLM batch prep) under an exact oracle: documents
    laid head-to-tail in doc_id order and cut into 512-token sequences,
    each doc assigned where it starts (cumsum-bin policy). The Spark side
    is the DISTRIBUTED prefix sum (range partition + per-partition totals
    + Arrow cumsum — never a single-task global Window); the DuckDB twin
    is the one-window-aggregate definition, so a green row proves the
    distributed decomposition equals the sequential semantics exactly."""
    from p5_rdf_rdb2rdf_spark.ops.text import pack_sequences

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return pack_sequences(docs, budget=512)


@_q(
    "sample_split_assignment",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 100 < 98 THEN 'train'
                WHEN doc_id % 100 < 99 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sample_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (98/1/1) via modulo_split:
    portable integer arithmetic, so the oracle reproduces MEMBERSHIP
    exactly, not just sizes. (hashed_split is the production default for
    clustered ids; its xxhash64 buckets are engine-specific, so it is
    pinned by structural pytest invariants instead — disjoint, exhaustive,
    seed-independent.)"""
    from p5_rdf_rdb2rdf_spark.ops.sample import modulo_split

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return modulo_split(
        docs, "doc_id", {"train": (0, 98), "val": (98, 99), "test": (99, 100)}
    ).select("doc_id", "split")


@_q(
    "sample_stratified",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE doc_id % 100 <
          CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 50 ELSE 100 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus rebalancing under an exact MEMBERSHIP oracle:
    keep 10% of English, 50% of German, all of everything else, decided by
    portable modulo arithmetic (hashed=False) so DuckDB reproduces the
    exact surviving row set. The production hashed=True variant shares
    the code path and is pinned by structural pytest invariants (nested
    samples, per-stratum rate bounds) like hashed_split."""
    from p5_rdf_rdb2rdf_spark.ops.sample import stratified_sample

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return stratified_sample(
        docs, "lang", {"en": 10, "de": 50}, default_pct=100, hashed=False
    ).select("doc_id", "lang")


def _derived_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dense-ish graph derived from doc_ids by pure integer
    arithmetic — both engines rebuild the identical edge set, so graph
    statistics get exact oracles: src = doc_id % 50,
    dst = (doc_id*doc_id + 1) % 50, one edge per doc."""
    docs = _load(spark, sf_dir, ["documents"])["documents"]
    return docs.select(
        F.pmod(F.col("doc_id"), F.lit(50)).alias("src"),
        F.pmod(F.col("doc_id") * F.col("doc_id") + 1, F.lit(50)).alias("dst"),
    )


_EDGES_SQL = """
      SELECT doc_id % 50 AS src, (doc_id * doc_id + 1) % 50 AS dst
      FROM documents
"""


@_q(
    "graph_degrees",
    f"""
    WITH e AS ({_EDGES_SQL}),
    o AS (SELECT src AS node, COUNT(*) AS out_degree FROM e GROUP BY 1),
    i AS (SELECT dst AS node, COUNT(*) AS in_degree FROM e GROUP BY 1)
    SELECT COALESCE(o.node, i.node) AS node,
           COALESCE(out_degree, 0) AS out_degree,
           COALESCE(in_degree, 0) AS in_degree,
           COALESCE(out_degree, 0) + COALESCE(in_degree, 0) AS degree
    FROM o FULL OUTER JOIN i ON o.node = i.node
    """,
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node in/out/total degree over the derived edge multigraph —
    exact integer counts, full-outer merged so one-sided nodes report 0."""
    from p5_rdf_rdb2rdf_spark.ops.graph import degrees

    return degrees(_derived_edges(spark, sf_dir))


@_q(
    "graph_triangles",
    f"""
    WITH e0 AS ({_EDGES_SQL}),
    e AS (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM e0 WHERE src != dst
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e w1 JOIN e w2 ON w1.v = w2.u JOIN e c ON c.u = w1.u AND c.v = w2.v
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global triangle count over the canonicalized undirected simple
    graph (u<v, distinct, no self-loops): the Spark wedge-join shape must
    equal DuckDB's 3-way self-join to the row."""
    from p5_rdf_rdb2rdf_spark.ops.graph import triangle_count

    return triangle_count(_derived_edges(spark, sf_dir))


def _pagerank_unrolled_sql(iters: int = 5) -> str:
    """DuckDB twin of 5 damped power-iteration rounds over the derived
    graph, UNROLLED into one CTE per round (plain SQL, no recursion). On
    the derived graph every one of the 50 nodes has out-edges (src =
    doc_id % 50 covers all residues), so the dangling term is exactly 0
    and each round is rank' = 0.15/50 + 0.85 * sum_in(rank/deg). Ranks
    are emitted as integer PARTS-PER-MILLION: cross-engine float
    summation differs in the last ulps, which a micro-unit round makes
    hash-identical (the boundary-collision probability at 1e-14 relative
    error is negligible) — the same drop-the-raw-float discipline as the
    ANN oracles."""
    parts = [
        "e AS (SELECT doc_id % 50 AS src, (doc_id*doc_id + 1) % 50 AS dst"
        " FROM documents)",
        "deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src)",
        "nd AS (SELECT DISTINCT src AS node FROM e"
        " UNION SELECT DISTINCT dst AS node FROM e)",
        "r0 AS (SELECT node, 1.0/50 AS r FROM nd)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT nd.node, 0.15/50 + 0.85*coalesce(s.c, 0) AS r"
            f" FROM nd LEFT JOIN (SELECT e.dst AS node,"
            f" sum(p.r / deg.dg) AS c FROM e"
            f" JOIN r{i-1} p ON p.node = e.src"
            f" JOIN deg ON deg.src = e.src"
            f" GROUP BY e.dst) s USING (node))"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, CAST(round(r * 1000000) AS BIGINT) AS rank_ppm"
        f" FROM r{iters}"
    )


@_q("graph_pagerank", _pagerank_unrolled_sql(5))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (5 iterations) over the derived graph, now under a
    FULL oracle (was rows-only through r6): the DuckDB twin unrolls the
    five rounds into CTE layers and both engines emit integer ppm ranks,
    sidestepping order-dependent float stringification while pinning the
    values to 1e-6 absolute. Exact 1e-12 Python-twin equality of the raw
    doubles stays in tests/test_graph_ops.py."""
    from p5_rdf_rdb2rdf_spark.ops.graph import pagerank

    return pagerank(_derived_edges(spark, sf_dir), iterations=5).select(
        "node", F.round(F.col("rank") * 1_000_000).cast("long").alias("rank_ppm")
    )


@_q(
    "graph_reachability",
    f"""
    WITH RECURSIVE e AS (
      SELECT DISTINCT src, dst FROM ({_EDGES_SQL})
    ),
    r(src, dst) AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src
    )
    SELECT src, dst FROM r
    """,
)
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure (ops.graph.transitive_closure — the relational
    answer to a SPARQL p+ path / taxonomy-ancestor expansion) of the
    derived deterministic graph: PATH-DOUBLING (each round self-joins the
    distinct reachability pairs, so depth D closes in log2(D) rounds),
    never the enumerate-every-path loop. The DuckDB twin is the textbook
    single-step recursive CTE — green proves the doubling decomposition
    equals the one-hop fixpoint semantics exactly."""
    from p5_rdf_rdb2rdf_spark.ops.graph import transitive_closure

    return transitive_closure(_derived_edges(spark, sf_dir))


@_q(
    "graph_components",
    f"""
    WITH RECURSIVE e0 AS (
      SELECT DISTINCT src, dst FROM ({_EDGES_SQL})
    ),
    ue AS (
      SELECT src AS u, dst AS v FROM e0 UNION SELECT dst, src FROM e0
    ),
    nodes AS (SELECT DISTINCT u AS n FROM ue),
    r(a, b) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.a, ue.v FROM r JOIN ue ON r.b = ue.u
    )
    SELECT a AS node, min(b) AS component FROM r GROUP BY a
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (pipeline.cc — the kernel behind near-dup
    cluster canonicalization and entity canonicalization) over the derived
    graph, undirected, min-member labels. The DuckDB twin computes each
    node's minimum reachable node via a recursive CTE over the
    symmetrized edges — exactly the label-propagation fixpoint the
    distributed kernel converges to. Previously pinned only by pytest
    union-find twins; this puts the kernel itself under the driver gate."""
    from p5_rdf_rdb2rdf_spark.pipeline.cc import connected_components

    return connected_components(_derived_edges(spark, sf_dir))


@_q(
    "ann_threshold_search",
    """
    SELECT q.vec_id AS query_id, c.vec_id
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 5
      AND list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                 CAST(c.embedding AS DOUBLE[])) >= 0.2
    """,
)
def ann_threshold_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.ops.similarity import cosine_threshold_search

    emb = _load(spark, sf_dir, ["embeddings"])["embeddings"]
    queries_df = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # pair membership only: cross-engine float summation differs in the
    # last ulp, so the cosine value itself is not hash-comparable
    return cosine_threshold_search(emb, queries_df, threshold=0.2).select(
        "query_id", "vec_id"
    )


@_q(
    "ann_topk_bruteforce",
    """
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 9) AS cosine
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ), ranked AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k; the engine rounds cosine to 9dp and tie-breaks by id
    (similarity.py), so ranks are oracle-stable. The cosine value itself is
    omitted from the output: cross-engine float SUMMATION can differ in the
    last ulp, which 9dp rounding makes rank-stable but not always
    string-identical."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import cosine_topk

    emb = _load(spark, sf_dir, ["embeddings"])["embeddings"]
    queries_df = emb.where("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries_df, k=5).select("query_id", "vec_id", "rank")


@_q(
    "ann_ivf_topk",
    """
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 9) AS cosine
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ), ranked AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer search with nprobe = nlist (exhaustive probing
    degrades to exact brute force — proving the build/assign/probe/rerank
    machinery end-to-end against the oracle; the narrow-probe recall path is
    covered in tests/test_similarity.py)."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import ivf_build, ivf_topk

    emb = _load(spark, sf_dir, ["embeddings"])["embeddings"]
    queries_df = emb.where("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = ivf_build(emb, nlist=8, iters=2)
    return ivf_topk(emb, queries_df, cents, k=5, nprobe=8).select(
        "query_id", "vec_id", "rank"
    )


@_q(
    "ann_sq8_topk",
    """
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 9) AS cosine
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ), ranked AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 quantized two-stage search (VERDICT r6 #7) with an exhaustive
    shortlist (rerank_factor=None): the int8 coarse stage then only
    reorders candidates and the exact float re-rank — the stage this
    oracle pins — must reproduce brute force bit-for-bit, proving
    quantize/coarse/shortlist/re-rank end-to-end (the ivf_topk
    nprobe=nlist trick). The small-factor recall path and the
    JVM-only-coarse plan shape are pinned in tests/test_similarity.py."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import sq8_topk

    emb = _load(spark, sf_dir, ["embeddings"])["embeddings"]
    queries_df = emb.where("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sq8_topk(emb, queries_df, k=5, rerank_factor=None).select(
        "query_id", "vec_id", "rank"
    )


@_q(
    "ann_lsh_topk",
    """
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 9) AS cosine
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ), ranked AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH search, oracle-checked via the same exhaustive-coverage
    trick as IVF (VERDICT r2 next-round #4): with ``n_planes=1`` there are
    exactly two sign buckets and ``multiprobe=1`` probes the query's bucket
    PLUS its Hamming-1 neighbor — i.e. both — so the bucket-join provably
    covers the whole corpus and the result equals brute force (9dp rounding
    + id tie-break make exact top-k DuckDB-reproducible). This proves the
    bucket/probe/re-rank machinery end-to-end; the narrow-probe approximate
    path (recall vs brute force at n_planes=4) stays covered in
    tests/test_similarity.py."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import lsh_topk

    emb = _load(spark, sf_dir, ["embeddings"])["embeddings"]
    queries_df = emb.where("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries_df, k=5, n_planes=1, multiprobe=1).select(
        "query_id", "vec_id", "rank"
    )


# exact word-5-gram Jaccard over ALL pairs — the DuckDB twin of the engine's
# candidate-generation + exact-verify two-stage. The engine only ever looks at
# LSH/simhash candidates; the oracle brute-forces every pair, so a green row
# proves candidate generation achieved full recall on the true near-dup set.
_JACCARD_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
        CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
             ELSE list_transform(range(1, len(t) - 3),
                                 i -> array_to_string(t[i:i+4], ' '))
        END AS s
      FROM toks
    ), d AS (SELECT doc_id, list_distinct(s) AS s FROM sh)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))), 9) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
"""


@_q("dedup_minhash_lsh", _JACCARD_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates (64 hashes x 32 bands: miss prob for a J>=0.8
    pair is (1-J^2)^32 < 1e-13) -> exact shingle-Jaccard verification >= 0.8.
    The verified output is deterministic and engine-independent, so the
    brute-force DuckDB oracle checks it exactly — including recall."""
    from p5_rdf_rdb2rdf_spark.ops.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    sigs = minhash_signatures(docs, num_hashes=64, shingle_k=5)
    cand = minhash_lsh_pairs(sigs, bands=32, threshold=0.0, num_hashes=64)
    ver = ngram_jaccard_pairs(docs, cand.select("id_a", "id_b"), shingle_k=5, threshold=0.8)
    return ver.select("id_a", "id_b", F.round("jaccard", 9).alias("jaccard"))


@_q(
    "dedup_cluster_keep",
    r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
        CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
             ELSE list_transform(range(1, len(t) - 3),
                                 i -> array_to_string(t[i:i+4], ' '))
        END AS s
      FROM toks
    ), d AS (SELECT doc_id, list_distinct(s) AS s FROM sh),
    p AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ),
    e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
    reach(a, b) AS (
      SELECT a, b FROM e
      UNION
      SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
    ),
    comp AS (SELECT a AS doc_id, least(min(b), a) AS cid FROM reach GROUP BY a)
    SELECT doc.doc_id,
           coalesce(c.cid, doc.doc_id) AS cluster_id,
           coalesce(c.cid, doc.doc_id) = doc.doc_id AS keep
    FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.doc_id
    """,
)
def dedup_cluster_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster canonicalization end-to-end under the oracle gate:
    MinHash-LSH candidates -> exact Jaccard>=0.8 verify -> connected
    components (the SAME cc kernel that canonicalizes KG entities) ->
    min-id representative per cluster, one (cluster_id, keep) row per
    document. The DuckDB twin brute-forces the true pair set and closes it
    with a recursive CTE (transitive closure + min label), so a green row
    proves candidate recall AND the clustering/keep policy exactly."""
    from p5_rdf_rdb2rdf_spark.ops.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        neardup_clusters,
        ngram_jaccard_pairs,
    )

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    sigs = minhash_signatures(docs, num_hashes=64, shingle_k=5)
    cand = minhash_lsh_pairs(sigs, bands=32, threshold=0.0, num_hashes=64)
    pairs = ngram_jaccard_pairs(
        docs, cand.select("id_a", "id_b"), shingle_k=5, threshold=0.8
    )
    return neardup_clusters(docs, pairs.select("id_a", "id_b"))


@_q("dedup_simhash", _JACCARD_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pigeonhole candidates (max_hamming=12 gives ample margin: the
    sf0.01 true near-dup pairs all sit at hamming <= 9) -> exact Jaccard
    verification >= 0.8, checked against the same brute-force oracle."""
    from p5_rdf_rdb2rdf_spark.ops.dedup import ngram_jaccard_pairs, simhash_pairs

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    cand = simhash_pairs(docs, max_hamming=12, shingle_k=2)
    ver = ngram_jaccard_pairs(docs, cand.select("id_a", "id_b"), shingle_k=5, threshold=0.8)
    return ver.select("id_a", "id_b", F.round("jaccard", 9).alias("jaccard"))


@_q(
    "text_fingerprints",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), meta AS (
      SELECT doc_id, t,
             greatest(CAST(ceil(len(t) / 64.0) AS INT), 1) AS n_chunks
      FROM toks
    ), idx AS (
      SELECT doc_id, n_chunks, t, unnest(range(n_chunks)) AS i FROM meta
    ), ch AS (
      SELECT doc_id, n_chunks,
             array_to_string(t[i * 64 + 1 : i * 64 + 64], ' ') AS chunk
      FROM idx
    )
    SELECT doc_id, any_value(n_chunks) AS n_chunks,
           CAST(count(DISTINCT chunk) AS INT) AS n_distinct_chunks
    FROM ch GROUP BY doc_id
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked-fingerprint STRUCTURE oracle (VERDICT r2 next-round #9):
    xxhash64 doesn't exist in DuckDB, so the hash VALUES are pytest-twinned
    (tests/test_text_ops.py determinism + edit-localization), but the chunk
    count (ceil(tokens/64)) and the number of DISTINCT chunk hashes are
    DuckDB-reproducible — the latter equals distinct chunk TEXTS unless
    xxhash64 spuriously collides, so a green row also witnesses hash
    non-degeneracy over the corpus."""
    from p5_rdf_rdb2rdf_spark.ops.text import fingerprint64_chunks

    docs = _load(spark, sf_dir, ["documents"])["documents"]
    chunks = fingerprint64_chunks(F.col("text"), chunk_tokens=64)
    return docs.select(
        "doc_id",
        F.size(chunks).alias("n_chunks"),
        F.size(F.array_distinct(chunks)).alias("n_distinct_chunks"),
    )


@_q(
    "multimodal_video_meta",
    """
    SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_ref,
           CAST(600 + (doc_id % 5) * 300 AS BIGINT) AS timescale,
           CAST(1000 + doc_id * 7 AS BIGINT) AS duration_units
    FROM documents WHERE doc_id < 200
    """,
)
def multimodal_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF mvhd parsing under oracle check: each doc gets a
    deterministic MP4 payload (ftyp + moov/mvhd; version 0/1 alternating by
    doc parity, exercising both header layouts) whose timescale/duration are
    pure integer arithmetic of doc_id; the box-walk kernel must recover
    exactly the closed-form values DuckDB computes. This puts the binary
    media plumbing (Arrow binary transfer + struct-read kernel) under the
    same oracle gate as the relational operators."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import probe_video_duration

    docs = _load(spark, sf_dir, ["documents"])["documents"].where("doc_id < 200")

    @F.pandas_udf("binary")
    def mp4(doc_ids: pd.Series) -> pd.Series:
        import struct

        def build(d: int) -> bytes:
            ts, dur = 600 + (d % 5) * 300, 1000 + d * 7
            ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
            if d % 2 == 0:
                body = b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, ts, dur)
            else:
                body = b"\x01\x00\x00\x00" + struct.pack(">QQIQ", 0, 0, ts, dur)
            mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
            return ftyp + struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd

        return doc_ids.map(build)

    media = docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("video").alias("kind"),
        mp4(F.col("doc_id")).alias("payload"),
    )
    return probe_video_duration(media).select(
        "media_ref", "timescale", "duration_units"
    )


@_q(
    "multimodal_features",
    """
    WITH d AS (
      SELECT doc_id,
             100 + doc_id % 97 AS n,
             (16 - doc_id % 16) % 16 AS r0
      FROM documents WHERE doc_id < 200
    ), c AS (
      SELECT doc_id,
             CAST((n - r0 + 15) // 16 AS DOUBLE) AS c0,
             CAST(n % 16 AS DOUBLE) AS s,
             CAST(n // 16 AS DOUBLE) AS q
      FROM d
    )
    SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_ref,
           round(c0 / sqrt(s * (q + 1) * (q + 1) + (16 - s) * q * q), 5) AS f0
    FROM c
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media_features under a CLOSED-FORM oracle (VERDICT r3 next-round #3,
    same trick as multimodal_video_meta): each doc gets a payload of
    n = 100 + doc_id % 97 bytes with byte_i = (i + doc_id) % 16, so the
    dim-16 histogram bucket counts are integer arithmetic of doc_id —
    bucket 0 holds ceil((n - r0)/16) bytes with r0 = (-doc_id) mod 16, and
    the squared norm is s(q+1)^2 + (16-s)q^2 for n = 16q + s (the rotation
    by doc_id permutes buckets, leaving the norm doc-independent). DuckDB
    computes f0 = c0/||hist|| exactly; the kernel's numpy histogram fold +
    normalize must reproduce it. Rounded at 5dp, not 6: the feature column
    is array<float> (float32), and 3 of the 200 payloads round differently
    at 6dp through float32 — verified exhaustively offline; at 5dp all 200
    agree and the inputs are deterministic, so the gate is stable."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import media_features

    docs = _load(spark, sf_dir, ["documents"])["documents"].where("doc_id < 200")

    @F.pandas_udf("binary")
    def payload(doc_ids: pd.Series) -> pd.Series:
        def build(d: int) -> bytes:
            n = 100 + d % 97
            return bytes((i + d) % 16 for i in range(n))

        return doc_ids.map(build)

    media = docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("kind"),
        payload(F.col("doc_id")).alias("payload"),
    )
    return media_features(media, dim=16).select(
        "media_ref", F.round(F.element_at("feature", 1).cast("double"), 5).alias("f0")
    )


@_q(
    "multimodal_pixel_stats",
    """
    WITH d AS (
      SELECT doc_id,
             8 + doc_id % 5 AS w,
             6 + doc_id % 7 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents WHERE doc_id < 200
    )
    SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_ref,
           CASE WHEN doc_id % 2 = 0 THEN 'pgm' ELSE 'bmp' END AS format,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(ch AS INT) AS channels,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(ch * w * (h * doc_id + h * (h - 1) // 2) AS BIGINT) AS px_sum,
           CAST(doc_id AS INT) AS px_min,
           CAST(doc_id + h - 1 AS INT) AS px_max,
           CAST(doc_id AS DOUBLE) + (h - 1) / 2.0 AS px_mean
    FROM d
    """,
)
def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode under the oracle gate (VERDICT r4 next-round #4):
    each doc gets a codec-free image payload — even doc_ids a binary PGM
    (with a header comment, exercising the tokenizer), odd doc_ids a 24-bit
    bottom-up BMP whose rows carry 4-byte padding the decoder must strip —
    where every sample in row r equals r + doc_id (all < 256 for doc_id <
    200, so no modular wrap). Sum/min/max/mean are then pure integer
    arithmetic of doc_id: sum = ch*w*(h*d + h(h-1)/2), min = d, max =
    d+h-1, mean = d + (h-1)/2 (exact in IEEE double — .0 or .5). A green
    row witnesses byte-exact pixel extraction: BMP padding stripped, row
    order irrelevant to the stats, PGM raster offset exact. The sha256
    metadata fallback is unreachable for these formats."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import decode_pixel_stats

    return decode_pixel_stats(_closed_form_image_media(spark, sf_dir))


def _closed_form_image_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_ref, kind, payload) with codec-free closed-form rasters: even
    doc_ids a binary PGM (header comment exercises the tokenizer), odd
    doc_ids a 24-bit BOTTOM-UP BMP with 4-byte row padding; every sample in
    row r equals r + doc_id (< 256 for doc_id < 200). Shared by the
    pixel-stat and resize oracle queries."""
    docs = _load(spark, sf_dir, ["documents"])["documents"].where("doc_id < 200")

    @F.pandas_udf("binary")
    def payload(doc_ids: pd.Series) -> pd.Series:
        import struct

        def build(d: int) -> bytes:
            w, h = 8 + d % 5, 6 + d % 7
            if d % 2 == 0:
                hdr = b"P5\n# synthetic closed-form raster\n%d %d\n255\n" % (w, h)
                return hdr + b"".join(bytes([r + d]) * w for r in range(h))
            stride = (3 * w + 3) & ~3
            px = b"".join(
                (bytes([r + d]) * (3 * w)).ljust(stride, b"\x00")
                for r in reversed(range(h))  # bottom-up row order
            )
            off = 14 + 40
            file_hdr = b"BM" + struct.pack("<IHHI", off + len(px), 0, 0, off)
            dib = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0
            )
            return file_hdr + dib + px

        return doc_ids.map(build)

    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("kind"),
        payload(F.col("doc_id")).alias("payload"),
    )


@_q(
    "multimodal_pixel_hist",
    """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 7 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents WHERE doc_id < 200
    ),
    r_ AS (
      SELECT doc_id, w, ch, (t.r + doc_id) // 16 AS bin
      FROM d, unnest(range(h)) AS t(r)
    ),
    b_ AS (
      SELECT doc_id, ch, bin, CAST(count(*) * any_value(w) AS BIGINT) AS n
      FROM r_ GROUP BY doc_id, ch, bin
    )
    SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_ref,
           CASE WHEN doc_id % 2 = 0 THEN 'pgm' ELSE 'bmp' END AS format,
           CAST(c.c AS INT) AS channel,
           CAST(bin AS INT) AS bin,
           n
    FROM b_, unnest(range(ch)) AS c(c)
    """,
)
def multimodal_pixel_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel pixel-value histograms under the closed-form oracle
    (VERDICT r5 next-round #8): row r of every closed-form raster holds
    sample value r + doc_id in every channel, so the 16-bin counts are
    pure integer arithmetic — bin (r+d)//16 gains w samples per row per
    channel, identically across channels. A green row witnesses byte-exact
    decode (BMP padding stripped, PGM offsets) AND the binning arithmetic
    end-to-end; zero-count bins are absent on both sides by construction."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import decode_pixel_histograms

    return decode_pixel_histograms(
        _closed_form_image_media(spark, sf_dir), n_bins=16
    )


@_q(
    "multimodal_resize",
    """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 7 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents WHERE doc_id < 200
    ),
    rs AS (SELECT doc_id, w, h, ch, t.i AS i FROM d, unnest(range(3)) AS t(i))
    SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_ref,
           CASE WHEN doc_id % 2 = 0 THEN 'pgm' ELSE 'bmp' END AS format,
           4 AS width, 3 AS height, CAST(ch AS INT) AS channels,
           CAST(SUM(4 * ch * (doc_id + (i * h) // 3)) AS BIGINT) AS px_sum
    FROM rs GROUP BY doc_id, ch
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize under the oracle gate: the closed-form
    rasters (row r == doc_id + r) resize to 4x3 grids whose row i is
    uniformly doc_id + (i*h)//3 AFTER orientation normalization — so the
    resized pixel sum is exact integer arithmetic in both engines, and a
    green row witnesses the bottom-up BMP flip, the padding strip, and the
    floor-NN index map all at once."""
    from p5_rdf_rdb2rdf_spark.ops.multimodal import resize_images

    return resize_images(_closed_form_image_media(spark, sf_dir), 4, 3).select(
        "media_ref", "format", "width", "height", "channels", "px_sum"
    )


# --- O40: span-sequence invariant, checked through the contract ------------
@_q("kg_span_invariant", "SELECT 0 AS n_violations")
def kg_span_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode -> reassemble must preserve every doc's span sequence."""
    from p5_rdf_rdb2rdf_spark.pipeline.corpus import spans_from_documents
    from p5_rdf_rdb2rdf_spark.pipeline.spans import (
        explode_spans,
        reassemble_docs,
        span_invariant_violations,
    )

    docs = spans_from_documents(_load(spark, sf_dir, ["documents"])["documents"])
    back = reassemble_docs(explode_spans(docs))
    v = span_invariant_violations(docs, back)
    return v.agg(F.count(F.lit(1)).alias("n_violations"))


@_q(
    "streaming_windowed_events",
    """
    WITH m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events)
    SELECT window_start, event_type, n_events, max_value FROM (
      SELECT date_trunc('day', ts) AS window_start, event_type,
             count(*) AS n_events, round(max(value), 9) AS max_value
      FROM events GROUP BY 1, 2
    ) w
    WHERE w.window_start + INTERVAL 1 DAY <= (SELECT wm FROM m)
    """,
)
def streaming_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCTURED STREAMING under the oracle gate: the events table is read
    through the file STREAM source (availableNow), aggregated by
    watermarked 1-day event-time windows (streaming/incremental.py's
    windowed shape), written through the exactly-once parquet sink, and the
    sink contents are returned. The DuckDB twin is the equivalent batch
    GROUP BY restricted to windows the final watermark (max ts - 1h)
    passed — append mode emits exactly those, so the comparison also pins
    the watermark finalization boundary, not just the aggregate values.
    max(value) is order-independent (exact double), safe to hash-compare."""
    import tempfile

    sch = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(sch)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)  # file source needs a directory; filter to the table
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> event time
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("value"), 9).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "max_value"
        )
    )
    out, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout with the query still running;
    # reading the sink then compares a PARTIAL write and surfaces as an opaque
    # oracle hash mismatch — fail loudly instead (ADVICE r4)
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("streaming_windowed_events: availableNow query exceeded 180s")
    return spark.read.parquet(out)


@_q(
    "streaming_sessions",
    """
    WITH m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events),
    s AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > CAST(28800000000 AS BIGINT) THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), x AS (
      SELECT user_id, ts,
             CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS sid
      FROM s
    ), g AS (
      SELECT user_id, sid, count(*) AS n_events,
             min(ts) AS start_ts, max(ts) AS end_ts,
             max(ts) + INTERVAL 8 HOUR AS session_end
      FROM x GROUP BY user_id, sid
    )
    SELECT user_id, start_ts, end_ts, n_events, session_end
    FROM g, m WHERE g.session_end <= m.wm
    """,
)
def streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window streaming aggregation under the oracle gate:
    events stream through the file source (availableNow), merge into
    per-user 8h-gap sessions with a 1h watermark, and append mode emits a
    session exactly once when the watermark passes its end. The DuckDB
    twin is the batch gap-island sessionization (same strict-> boundary,
    pinned by test) restricted to sessions the final watermark closed —
    so the comparison checks merge semantics AND the emission boundary."""
    import tempfile

    from p5_rdf_rdb2rdf_spark.streaming import streaming_session_stats

    sch = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(sch)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> event time
    )
    sess = streaming_session_stats(
        stream, gap="8 hours", watermark="1 hour"
    )
    out, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
    q = (
        sess.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("streaming_sessions: availableNow query exceeded 180s")
    return spark.read.parquet(out)


@_q(
    "streaming_first_seen",
    """
    SELECT event_type,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           MIN(ts) AS first_ts
    FROM events GROUP BY 1, 2
    """,
)
def streaming_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState first-seen dedup operator under the oracle
    gate (VERDICT r4 next-round #5). The events table streams through the
    file source in one availableNow micro-batch; keys are the xxhash64
    digest of (event_type, day) — digest keys per the operator's contract,
    so the state store never holds payloads — and the operator emits each
    key's min-event-time row exactly once (running-min kernel, no batch
    concat). The DuckDB twin is GROUP BY key with MIN(ts): the emitted row
    IS the min-ts row and only (event_type, day, ts) are compared, so the
    comparison is deterministic even if a key's min ts were tied."""
    import tempfile

    from p5_rdf_rdb2rdf_spark.streaming import streaming_first_seen as first_seen

    sch = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(sch)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> event time
        .withColumn("day", F.to_date("ts").cast("string"))
        .withColumn("k", F.xxhash64("event_type", "day"))
    )
    fs = first_seen(stream, ["k"], ts_col="ts", watermark="1 hour", state_ttl_hours=None)
    out, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
    q = (
        fs.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("streaming_first_seen: availableNow query exceeded 180s")
    return spark.read.parquet(out).select(
        "event_type", "day", F.col("ts").alias("first_ts")
    )


# --- temporal rr:sqlQuery view over the events table -----------------------
_R2RML_EVENTS = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://example.org/tpch#> .
<#Daily>
  rr:logicalTable [ rr:sqlQuery \"\"\"
    SELECT CAST(CAST(ts AS DATE) AS STRING) AS day, event_type,
           COUNT(*) AS n_events
    FROM events GROUP BY CAST(CAST(ts AS DATE) AS STRING), event_type
  \"\"\" ] ;
  rr:subjectMap [ rr:template "http://example.org/daily/{day}/{event_type}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:nEvents ;
                          rr:objectMap [ rr:column "n_events" ] ] .
"""


@_q(
    "r2rml_events_daily",
    """
    WITH v AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT 'http://example.org/daily/' || day || '/' || event_type AS s_value,
           'http://example.org/tpch#nEvents' AS p_value,
           CAST(n_events AS VARCHAR) AS o_value
    FROM v
    """,
)
def r2rml_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p5_rdf_rdb2rdf_spark.compiler import compile_mapping
    from p5_rdf_rdb2rdf_spark.r2rml import r2rml_to_ir

    _load(spark, sf_dir, ["events"])
    t = compile_mapping(spark, r2rml_to_ir(_R2RML_EVENTS))
    return t.select("s_value", "p_value", "o_value")


# --- O12: lazy Direct-Mapping store, bound-predicate pattern ----------------
@_q(
    "store_bound_predicate",
    f"""
    SELECT '{BASE}customer/c_custkey=' || CAST(c_custkey AS VARCHAR) AS s_value,
           c_mktsegment AS o_value
    FROM customer WHERE c_mktsegment IS NOT NULL
    """,
)
def store_bound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_statements(p=<customer#c_mktsegment>) — decoded driver-side into a
    pushed-down single-table scan (SURVEY.md §4.3)."""
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["customer"])
    store = DirectMappingStore(
        spark, {"customer": tables["customer"]}, TPCH_CONSTRAINTS, base=BASE
    )
    t = store.get_statements(p=f"{BASE}customer#c_mktsegment")
    return t.select("s_value", "o_value")


@_q(
    "store_bgp_join",
    f"""
    SELECT '{BASE}customer/c_custkey=' || CAST(c.c_custkey AS VARCHAR) AS cust,
           '{BASE}nation/n_nationkey=' || CAST(n.n_nationkey AS VARCHAR) AS nat,
           n.n_name AS nat_name,
           '{BASE}region/r_regionkey=' || CAST(n.n_regionkey AS VARCHAR) AS reg
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name IS NOT NULL
    """,
)
def store_bgp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive basic-graph-pattern match over the VIRTUAL Direct-Mapping
    store (store.match_bgp): a 3-pattern chain

        (?c  customer#ref-c_nationkey  ?n)
        (?n  nation#n_name             ?nm)
        (?n  nation#ref-n_regionkey    ?r)

    Each pattern compiles to its own pruned single-table plan (bound
    predicate decoded driver-side, no materialized graph), then the
    patterns equi-join on the shared variable's full term identity
    (kind+value+datatype+lang structs). The DuckDB twin is the equivalent
    relational join — the FK ref-object triples ARE the join edges, so the
    BGP solution set equals customer x nation with IRIs rebuilt by string
    arithmetic. Exercises variable-kind discrimination (?n binds an IRI in
    all three patterns) and the selectivity ordering path."""
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["customer", "nation", "region"])
    store = DirectMappingStore(
        spark,
        {t: tables[t] for t in ("customer", "nation", "region")},
        TPCH_CONSTRAINTS,
        base=BASE,
    )
    sol = store.bgp(
        [
            ("?c", f"{BASE}customer#ref-c_nationkey", "?n"),
            ("?n", f"{BASE}nation#n_name", "?nm"),
            ("?n", f"{BASE}nation#ref-n_regionkey", "?r"),
        ]
    )
    return sol.select(
        F.col("c.value").alias("cust"),
        F.col("n.value").alias("nat"),
        F.col("nm.value").alias("nat_name"),
        F.col("r.value").alias("reg"),
    )


@_q(
    "store_optional",
    f"""
    SELECT '{BASE}customer/c_custkey=' || CAST(c.c_custkey AS VARCHAR) AS cust,
           c.c_name AS name,
           coalesce('{BASE}orders/o_orderkey=' || CAST(o.o_orderkey AS VARCHAR),
                    '(unbound)') AS urgent
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
           ON o.o_custkey = c.c_custkey
    """,
)
def store_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL OPTIONAL (algebra.optional) over the virtual DM store:

        { ?c customer#c_name ?nm }
        OPTIONAL { ?o orders#ref-o_custkey ?c .
                   ?o orders#o_orderpriority ?pr . FILTER(?pr = '1-URGENT') }

    A left-outer equi-join on the shared variable's full term struct —
    customers with no urgent order survive with ?o unbound (203 of 1500 at
    sf0.01). The DuckDB twin is the relational LEFT JOIN; unbound is
    surfaced as the literal '(unbound)' in BOTH engines so the value hash
    covers the null positions instead of skipping them."""
    from p5_rdf_rdb2rdf_spark import algebra as A
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["customer", "orders"])
    store = DirectMappingStore(
        spark,
        {t: tables[t] for t in ("customer", "orders")},
        TPCH_CONSTRAINTS,
        base=BASE,
    )
    left = store.bgp([("?c", f"{BASE}customer#c_name", "?nm")])
    right = store.bgp(
        [
            ("?o", f"{BASE}orders#ref-o_custkey", "?c"),
            ("?o", f"{BASE}orders#o_orderpriority", "?pr"),
        ]
    )
    right = A.filter_solutions(right, A.var_value("pr") == "1-URGENT")
    sol = A.optional(left, A.project(right, "o", "c"))
    return sol.select(
        F.col("c.value").alias("cust"),
        F.col("nm.value").alias("name"),
        F.coalesce(F.col("o.value"), F.lit("(unbound)")).alias("urgent"),
    )


@_q(
    "store_union_filter",
    f"""
    SELECT '{BASE}nation/n_nationkey=' || CAST(n_nationkey AS VARCHAR) AS node,
           n_name AS name
    FROM nation WHERE n_name < 'M'
    UNION ALL
    SELECT '{BASE}region/r_regionkey=' || CAST(r_regionkey AS VARCHAR) AS node,
           r_name AS name
    FROM region WHERE r_name < 'M'
    """,
)
def store_union_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UNION + FILTER (algebra.union / filter_solutions):

        { ?x nation#n_name ?name } UNION { ?x region#r_name ?name }
        FILTER(STR(?name) < 'M')

    Bag union of two independently-pruned BGP frames (zero-shuffle
    unionByName) with the filter applied above the union — Catalyst pushes
    it back into both pruned scans (each branch's parquet scan carries the
    pushed predicate). The DuckDB twin is the relational UNION ALL with
    the WHERE in each branch."""
    from p5_rdf_rdb2rdf_spark import algebra as A
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["nation", "region"])
    store = DirectMappingStore(
        spark,
        {t: tables[t] for t in ("nation", "region")},
        TPCH_CONSTRAINTS,
        base=BASE,
    )
    u = A.union(
        store.bgp([("?x", f"{BASE}nation#n_name", "?name")]),
        store.bgp([("?x", f"{BASE}region#r_name", "?name")]),
    )
    out = A.filter_solutions(u, A.var_value("name") < "M")
    return out.select(
        F.col("x.value").alias("node"), F.col("name.value").alias("name")
    )


@_q(
    "kg_validate_shapes",
    f"""
    WITH ord_cnt AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS n
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT '{BASE}customer/c_custkey=' || CAST(c_custkey AS VARCHAR) AS focus,
           'cust-min-orders' AS shape_id, 'minCount' AS violation,
           CAST(n AS VARCHAR) AS detail
    FROM ord_cnt WHERE n < 3
    UNION ALL
    SELECT '{BASE}customer/c_custkey=' || CAST(c_custkey AS VARCHAR),
           'cust-name-format', 'pattern', c_name
    FROM customer WHERE NOT regexp_matches(c_name, '^Customer#00000000[0-9]$')
    UNION ALL
    SELECT '{BASE}customer/c_custkey=' || CAST(c_custkey AS VARCHAR),
           'cust-balance-nonneg', 'minValue', printf('%.2f', c_acctbal)
    FROM customer WHERE c_acctbal < 0
    """,
)
def kg_validate_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-lite validation (ops.validate) over the Direct-Mapped graph of
    customer+orders — five shapes, three of which fire:

    - cust-min-orders: every Customer has >= 3 Orders (inverse path over
      the FK edge; violations carry the observed count);
    - cust-name-format: c_name matches ^Customer#00000000[0-9]$ (every
      custkey >= 10 violates — pins pattern + per-value semantics);
    - cust-balance-nonneg: sh:minInclusive 0 on c_acctbal (negative
      balances violate);
    - order-cust-class (sh:class on the FK objects) and cust-one-segment
      (maxCount 1) hold — zero rows, pinning the no-false-positive side.

    All cardinality shapes share ONE aggregation exchange (plan-asserted in
    tests/test_validate.py). The minValue detail is re-rendered %.2f in
    BOTH engines: the graph carries Java shortest-round-trip double
    lexicals, DuckDB prints its own — a fixed-point format makes the value
    hash engine-neutral without weakening the check (inputs have <= 2dp)."""
    from p5_rdf_rdb2rdf_spark.direct_mapping import direct_map
    from p5_rdf_rdb2rdf_spark.ops.validate import Shape, validate_shapes

    tables = _load(spark, sf_dir, ["customer", "orders"])
    triples = direct_map(
        spark,
        {t: tables[t] for t in ("customer", "orders")},
        TPCH_CONSTRAINTS,
        base=BASE,
    )
    cust_cls = f"{BASE}customer"
    v = validate_shapes(
        triples,
        [
            Shape("cust-min-orders", f"{BASE}orders#ref-o_custkey",
                  inverse=True, focus_class=cust_cls, min_count=3),
            Shape("cust-name-format", f"{BASE}customer#c_name",
                  focus_class=cust_cls,
                  pattern="^Customer#00000000[0-9]$"),
            Shape("cust-balance-nonneg", f"{BASE}customer#c_acctbal",
                  focus_class=cust_cls, min_value=0.0),
            Shape("order-cust-class", f"{BASE}orders#ref-o_custkey",
                  object_class=cust_cls),
            Shape("cust-one-segment", f"{BASE}customer#c_mktsegment",
                  focus_class=cust_cls, max_count=1),
        ],
    )
    return v.withColumn(
        "detail",
        F.when(
            F.col("violation") == "minValue",
            F.format_string("%.2f", F.col("detail").try_cast("double")),
        ).otherwise(F.col("detail")),
    )


@_q(
    "store_not_exists",
    f"""
    SELECT '{BASE}customer/c_custkey=' || CAST(c.c_custkey AS VARCHAR) AS cust,
           c.c_name AS name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def store_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL FILTER NOT EXISTS (algebra.not_exists) — customers with NO
    urgent order (203 of 1500 at sf0.01): a LEFT ANTI equi-join on the
    shared variable's full term struct, the exact complement of
    `store_optional`'s unmatched rows. The DuckDB twin is the relational
    NOT EXISTS."""
    from p5_rdf_rdb2rdf_spark import algebra as A
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["customer", "orders"])
    store = DirectMappingStore(
        spark,
        {t: tables[t] for t in ("customer", "orders")},
        TPCH_CONSTRAINTS,
        base=BASE,
    )
    left = store.bgp([("?c", f"{BASE}customer#c_name", "?nm")])
    right = store.bgp(
        [
            ("?o", f"{BASE}orders#ref-o_custkey", "?c"),
            ("?o", f"{BASE}orders#o_orderpriority", "?pr"),
        ]
    )
    right = A.filter_solutions(right, A.var_value("pr") == "1-URGENT")
    sol = A.not_exists(left, A.project(right, "c"))
    return sol.select(
        F.col("c.value").alias("cust"), F.col("nm.value").alias("name")
    )


@_q(
    "store_construct",
    f"""
    SELECT '{BASE}customer/c_custkey=' || CAST(c_custkey AS VARCHAR) AS s_value,
           '{BASE}derived#memberOf' AS p_value,
           '{BASE}nation/n_nationkey=' || CAST(c_nationkey AS VARCHAR) AS o_value
    FROM customer
    UNION
    SELECT '{BASE}nation/n_nationkey=' || CAST(c_nationkey AS VARCHAR),
           '{BASE}derived#hasMember',
           '{BASE}customer/c_custkey=' || CAST(c_custkey AS VARCHAR)
    FROM customer
    """,
)
def store_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT (algebra.construct): derive a new symmetric
    membership edge pair from the FK BGP — the KG-construction move of
    turning matched patterns back into graph. Two templates instantiate
    per solution (forward memberOf, inverse hasMember with a constant
    predicate each); output is a DISTINCT triple set. The DuckDB twin is
    the relational UNION (set semantics = CONSTRUCT's graph-is-a-set)."""
    from p5_rdf_rdb2rdf_spark import algebra as A
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["customer", "nation"])
    store = DirectMappingStore(
        spark,
        {t: tables[t] for t in ("customer", "nation")},
        TPCH_CONSTRAINTS,
        base=BASE,
    )
    sol = store.bgp([("?c", f"{BASE}customer#ref-c_nationkey", "?n")])
    g = A.construct(
        sol,
        [
            ("?c", f"{BASE}derived#memberOf", "?n"),
            ("?n", f"{BASE}derived#hasMember", "?c"),
        ],
    )
    return g.select("s_value", "p_value", "o_value")


@_q(
    "store_group_agg",
    f"""
    SELECT '{BASE}nation/n_nationkey=' || CAST(c_nationkey AS VARCHAR) AS nat,
           count(*) AS n_cust,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def store_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL GROUP BY + aggregates (algebra.aggregate_solutions):

        SELECT ?n (COUNT(*) AS ?n_cust) (MIN(?b) AS ?min_bal)
               (MAX(?b) AS ?max_bal)
        WHERE { ?c customer#ref-c_nationkey ?n .
                ?c customer#c_acctbal ?b } GROUP BY ?n

    Grouping is on full term identity; MIN/MAX go through var_num (the
    lexical re-parsed to double — exact, since the lexical is the Java
    shortest round-trip of that same double). MIN/MAX are selection
    aggregates (no summation), so the values are bit-identical across
    engines with no rounding bridge needed. One hash aggregation exchange
    with map-side partial aggregates."""
    from p5_rdf_rdb2rdf_spark import algebra as A
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["customer"])
    store = DirectMappingStore(
        spark, {"customer": tables["customer"]}, TPCH_CONSTRAINTS, base=BASE
    )
    sol = store.bgp(
        [
            ("?c", f"{BASE}customer#ref-c_nationkey", "?n"),
            ("?c", f"{BASE}customer#c_acctbal", "?b"),
        ]
    )
    out = A.aggregate_solutions(
        sol,
        ["n"],
        {
            "n_cust": ("count", None),
            "min_bal": ("min", "b"),
            "max_bal": ("max", "b"),
        },
    )
    return out.select(F.col("n.value").alias("nat"), "n_cust", "min_bal", "max_bal")


@_q(
    "kg_rdfs_inference",
    f"""
    SELECT '{BASE}customer/c_custkey=' || CAST(c_custkey AS VARCHAR) AS node,
           cls
    FROM customer CROSS JOIN (
      VALUES ('{BASE}customer'), ('http://ex/Buyer'),
             ('http://ex/Agent'), ('http://ex/Thing')
    ) t(cls)
    UNION
    SELECT '{BASE}nation/n_nationkey=' || CAST(n_nationkey AS VARCHAR), cls
    FROM nation CROSS JOIN (
      VALUES ('{BASE}nation'), ('http://ex/Place'), ('http://ex/Thing')
    ) t(cls)
    UNION
    SELECT '{BASE}nation/n_nationkey=' || CAST(n_nationkey AS VARCHAR),
           'http://ex/Country'
    FROM nation WHERE EXISTS (
      SELECT 1 FROM customer WHERE c_nationkey = n_nationkey
    )
    """,
)
def kg_rdfs_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFS-lite (rhoDF) forward chaining (reasoning.rdfs_materialize) over
    the DM graph of customer+nation with a 7-triple ontology:

        customer subClassOf Buyer subClassOf Agent subClassOf Thing
        nation   subClassOf Place subClassOf Thing
        domain(customer#ref-c_nationkey) = Buyer
        range(customer#ref-c_nationkey)  = Country subClassOf Place

    Every customer entails 4 classes (asserted + 3-level subclass climb,
    with the domain rule converging on the same Buyer type); every nation
    entails nation/Place/Thing plus Country iff some customer references
    it (the range rule fires on actual edges, not on the class). The
    DuckDB twin cross-joins the closed class sets — the closure is a
    constant of the query's own ontology, so hardcoding it is the
    independent ground truth, while the generic closure/stratification
    logic is pinned in tests/test_reasoning.py. Schema joins broadcast;
    the instance graph never shuffles except the final set-distinct."""
    from p5_rdf_rdb2rdf_spark.direct_mapping import direct_map
    from p5_rdf_rdb2rdf_spark.reasoning import (
        RDFS_DOMAIN,
        RDFS_RANGE,
        RDFS_SUBCLASSOF,
        rdfs_materialize,
    )
    from p5_rdf_rdb2rdf_spark.terms import RDF_TYPE, TRIPLE_SCHEMA

    tables = _load(spark, sf_dir, ["customer", "nation"])
    triples = direct_map(
        spark,
        {t: tables[t] for t in ("customer", "nation")},
        TPCH_CONSTRAINTS,
        base=BASE,
    )
    ref = f"{BASE}customer#ref-c_nationkey"
    ont_rows = [
        (f"{BASE}customer", RDFS_SUBCLASSOF, "http://ex/Buyer"),
        ("http://ex/Buyer", RDFS_SUBCLASSOF, "http://ex/Agent"),
        ("http://ex/Agent", RDFS_SUBCLASSOF, "http://ex/Thing"),
        (f"{BASE}nation", RDFS_SUBCLASSOF, "http://ex/Place"),
        ("http://ex/Place", RDFS_SUBCLASSOF, "http://ex/Thing"),
        (ref, RDFS_DOMAIN, "http://ex/Buyer"),
        (ref, RDFS_RANGE, "http://ex/Country"),
        ("http://ex/Country", RDFS_SUBCLASSOF, "http://ex/Place"),
    ]
    ont = spark.createDataFrame(
        [("iri", s, p, "iri", o, None, None, None) for s, p, o in ont_rows],
        TRIPLE_SCHEMA,
    )
    closed = rdfs_materialize(triples, schema=ont)
    return (
        closed.where(F.col("p_value") == RDF_TYPE)
        .select(F.col("s_value").alias("node"), F.col("o_value").alias("cls"))
        .distinct()
    )


@_q(
    "store_describe",
    f"""
    WITH picked AS (SELECT * FROM nation WHERE n_regionkey = 0),
    nat_iri AS (
      SELECT '{BASE}nation/n_nationkey=' || CAST(n_nationkey AS VARCHAR) AS iri,
             * FROM picked
    )
    SELECT iri AS s_value,
           'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p_value,
           '{BASE}nation' AS o_value
    FROM nat_iri
    UNION ALL
    SELECT iri, '{BASE}nation#n_nationkey', CAST(n_nationkey AS VARCHAR)
    FROM nat_iri
    UNION ALL
    SELECT iri, '{BASE}nation#n_name', n_name FROM nat_iri
    UNION ALL
    SELECT iri, '{BASE}nation#n_regionkey', CAST(n_regionkey AS VARCHAR)
    FROM nat_iri
    UNION ALL
    SELECT iri, '{BASE}nation#ref-n_regionkey',
           '{BASE}region/r_regionkey=' || CAST(n_regionkey AS VARCHAR)
    FROM nat_iri
    UNION ALL
    SELECT '{BASE}customer/c_custkey=' || CAST(c.c_custkey AS VARCHAR),
           '{BASE}customer#ref-c_nationkey', n.iri
    FROM customer c JOIN nat_iri n ON c.c_nationkey = n.n_nationkey
    """,
)
def store_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE (algebra.describe): the node set comes from a BGP
    with a bound typed object — (?n, nation#n_regionkey, "0"), decoded to
    a pushed n_regionkey=0 scan — and the description is every statement
    with those nations as SUBJECT (their 5 DM triples each) or OBJECT
    (every customer's FK edge into them). Subject side semi-joins on
    value, object side on full term identity with null-safe datatype/lang
    (IRI objects carry NULL datatype — a plain equi-join would match
    nothing). The DuckDB twin enumerates both sides relationally."""
    from p5_rdf_rdb2rdf_spark import algebra as A
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["nation", "customer"])
    store = DirectMappingStore(
        spark,
        {t: tables[t] for t in ("nation", "customer")},
        TPCH_CONSTRAINTS,
        base=BASE,
    )
    nodes = A.project(
        store.bgp([("?n", f"{BASE}nation#n_regionkey", "0")]), "n"
    )
    d = A.describe(store, nodes)
    return d.select("s_value", "p_value", "o_value")


@_q(
    "sparql_text_query",
    f"""
    SELECT '{BASE}customer/c_custkey=' || CAST(c_custkey AS VARCHAR) AS cust,
           c_name AS name, c_mktsegment AS seg
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal >= 9000
    ORDER BY c_name LIMIT 100
    """,
)
def sparql_text_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SPARQL TEXT front end (sparql.sparql) end-to-end against the
    virtual DM store: tokenizer -> recursive-descent parser -> algebra ->
    Catalyst plan. Exercises multi-pattern BGP with ';' abbreviation,
    FILTER with ||, numeric comparison through var_num, ORDER BY on a
    unique key + LIMIT (TakeOrderedAndProject — per-partition top-k). The
    LIMIT selection is deterministic because c_name is unique; the DuckDB
    twin is the equivalent relational query."""
    from p5_rdf_rdb2rdf_spark.sparql import sparql
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["customer"])
    store = DirectMappingStore(
        spark, {"customer": tables["customer"]}, TPCH_CONSTRAINTS, base=BASE
    )
    sol = sparql(
        store,
        f"""
        SELECT ?c ?nm ?seg WHERE {{
          ?c <{BASE}customer#c_mktsegment> ?seg ;
             <{BASE}customer#c_name> ?nm ;
             <{BASE}customer#c_acctbal> ?b .
          FILTER ((?seg = "BUILDING" || ?seg = "MACHINERY") && ?b >= 9000)
        }} ORDER BY ?nm LIMIT 100
        """,
    )
    return sol.select(
        F.col("c.value").alias("cust"),
        F.col("nm.value").alias("name"),
        F.col("seg.value").alias("seg"),
    )


@_q(
    "sparql_text_agg",
    """
    SELECT c_mktsegment AS seg, count(*) AS n, min(c_acctbal) AS lo
    FROM customer GROUP BY c_mktsegment
    """,
)
def sparql_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-form SPARQL aggregation end-to-end: the parser's
    (AGG(...) AS ?out) projections + GROUP BY compile to
    algebra.aggregate_solutions — one hash aggregation exchange. MIN is a
    selection aggregate (bit-identical cross-engine; the lexical→double
    round trip is exact for Java shortest-round-trip lexicals)."""
    from p5_rdf_rdb2rdf_spark.sparql import sparql
    from p5_rdf_rdb2rdf_spark.store import DirectMappingStore

    tables = _load(spark, sf_dir, ["customer"])
    store = DirectMappingStore(
        spark, {"customer": tables["customer"]}, TPCH_CONSTRAINTS, base=BASE
    )
    sol = sparql(
        store,
        f"""
        SELECT ?seg (COUNT(*) AS ?n) (MIN(?b) AS ?lo) WHERE {{
          ?c <{BASE}customer#c_mktsegment> ?seg ;
             <{BASE}customer#c_acctbal> ?b .
        }} GROUP BY ?seg
        """,
    )
    return sol.select(F.col("seg.value").alias("seg"), "n", "lo")


# --- W3C conformance-style cases through the driver contract ----------------
# (tests/test_w3c_cases.py holds the full spec corpus; these three expose the
# composite-PK, IRI-encoding, language-tag and named-graph constructs to the
# DuckDB oracle at sf0.01.)


@_q(
    "w3c_dm_composite_pk",
    f"""
    SELECT DISTINCT
           '{BASE}lineitem/l_orderkey=' || CAST(l_orderkey AS VARCHAR)
             || ';l_linenumber=' || CAST(l_linenumber AS VARCHAR) AS s_value,
           '{BASE}lineitem#l_linenumber' AS p_value,
           CAST(l_linenumber AS VARCHAR) AS o_value
    FROM lineitem
    """,
)
def w3c_dm_composite_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DirectGraphTC0008-style composite primary key at TPC-H scale: the
    lineitem row node is <lineitem/l_orderkey=..;l_linenumber=..>."""
    from p5_rdf_rdb2rdf_spark.direct_mapping import direct_map

    tables = _load(spark, sf_dir, ["lineitem"])
    t = direct_map(spark, {"lineitem": tables["lineitem"]}, TPCH_CONSTRAINTS,
                   base=BASE, only=["lineitem"])
    return t.where(F.col("p_value") == f"{BASE}lineitem#l_linenumber").select(
        "s_value", "p_value", "o_value"
    )


_R2RML_W3C_ENC = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://example.org/tpch#> .
<#Cust>
  rr:logicalTable [ rr:tableName "customer" ; rr:sqlVersion rr:SQL2008 ] ;
  rr:subjectMap [ rr:template "http://example.org/c/{c_name}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:balance ;
    rr:objectMap [ rr:template "bal-{c_custkey}" ; rr:termType rr:Literal ] ] .
"""


@_q(
    "w3c_r2rml_template_encoding",
    """
    SELECT 'http://example.org/c/' || replace(c_name, '#', '%23') AS s_value,
           'bal-' || CAST(c_custkey AS VARCHAR) AS o_value
    FROM customer
    """,
)
def w3c_r2rml_template_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2RMLTC0010b-style IRI-safe template encoding ('#' -> %23 in c_name)
    plus rr:sqlVersion accept-and-ignore and a template-valued Literal."""
    from p5_rdf_rdb2rdf_spark.compiler import compile_mapping
    from p5_rdf_rdb2rdf_spark.r2rml import r2rml_to_ir

    _load(spark, sf_dir, ["customer"])
    t = compile_mapping(spark, r2rml_to_ir(_R2RML_W3C_ENC))
    return t.select("s_value", "o_value")


_R2RML_W3C_LANG_GRAPH = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://example.org/tpch#> .
<#Nation>
  rr:logicalTable [ rr:tableName "nation" ] ;
  rr:subjectMap [ rr:template "http://example.org/nation/{n_nationkey}" ;
                  rr:graphMap [ rr:template "http://example.org/g/{n_regionkey}" ] ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ;
    rr:objectMap [ rr:column "n_name" ; rr:language "en" ] ] .
"""


@_q(
    "w3c_r2rml_language_and_graph",
    """
    SELECT 'http://example.org/nation/' || CAST(n_nationkey AS VARCHAR) AS s_value,
           n_name AS o_value,
           'en' AS o_lang,
           'http://example.org/g/' || CAST(n_regionkey AS VARCHAR) AS g_value
    FROM nation
    WHERE n_name IS NOT NULL AND n_regionkey IS NOT NULL
    """,
)
def w3c_r2rml_language_and_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2RMLTC0012a language tags + template-valued named graphs (quads)
    through the driver contract."""
    from p5_rdf_rdb2rdf_spark.compiler import compile_mapping
    from p5_rdf_rdb2rdf_spark.r2rml import r2rml_to_ir

    _load(spark, sf_dir, ["nation"])
    t = compile_mapping(spark, r2rml_to_ir(_R2RML_W3C_LANG_GRAPH))
    return t.select("s_value", "o_value", "o_lang", "g_value")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
