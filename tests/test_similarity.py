"""ANN ops vs numpy exact oracle on the driver testdata embeddings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from p5_rdf_rdb2rdf_spark.ops.similarity import (
    cosine_threshold_search,
    cosine_topk,
    hyperplane_bucket,
    lsh_topk,
    topk_pandas,
)


@pytest.fixture(scope="module")
def emb(spark, tpch):
    return tpch["embeddings"]


def _np_index(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def test_cosine_topk_matches_numpy(spark, emb):
    ids, mat = _np_index(emb)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(emb, queries, k=5)
    got_map = {}
    for r in got.collect():
        got_map.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    for q in range(3):
        sims = mat @ mat[np.where(ids == q)[0][0]]
        order = sorted(zip(-np.round(sims, 9), ids))  # desc cos, asc id
        want = [i for negc, i in order if i != q][:5]
        got_ids = [v for _, v in sorted(got_map[q])]
        assert got_ids == want, q


def test_topk_pandas_matches_expression_path(spark, emb):
    q = [(str(r.vec_id), list(r.embedding)) for r in emb.where("vec_id < 3").collect()]
    a = topk_pandas(emb.where("vec_id >= 3"), q, k=5)
    queries = emb.where("vec_id < 3").select(
        F.col("vec_id").cast("string").alias("query_id"), "embedding"
    )
    b = cosine_topk(emb.where("vec_id >= 3"), queries, k=5, exclude_self=False)
    ga = sorted((r.query_id, r.rank, r.vec_id) for r in a.collect())
    gb = sorted((r.query_id, r.rank, r.vec_id) for r in b.collect())
    assert ga == gb


def test_threshold_search_self_similarity(spark, emb):
    queries = emb.where("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    out = cosine_threshold_search(emb, queries, threshold=0.999999)
    got = {(r.query_id, r.vec_id) for r in out.collect()}
    for q in range(5):
        assert (q, q) in got  # self-cosine == 1.0


def test_lsh_recall_reasonable(spark, emb):
    """Single-probe LSH with few planes: recall vs exact top-5 must beat the
    random-baseline by a wide margin (labels cluster the space)."""
    queries = emb.where("vec_id < 20").select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, k=5, n_planes=4, multiprobe=1)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, recall
    # buckets must be deterministic across runs
    b1 = emb.select(hyperplane_bucket(F.col("embedding").cast("array<double>")).alias("b"))
    b2 = emb.select(hyperplane_bucket(F.col("embedding").cast("array<double>")).alias("b"))
    assert [r.b for r in b1.collect()] == [r.b for r in b2.collect()]


def test_ivf_exhaustive_probe_equals_bruteforce(spark, emb):
    """nprobe = nlist degrades to exact brute force: identical top-k."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import cosine_topk, ivf_build, ivf_topk

    queries = emb.where("vec_id < 5").selectExpr("vec_id as query_id", "embedding")
    cents = ivf_build(emb, nlist=8, iters=2)
    exact = cosine_topk(emb, queries, k=5)
    ivf = ivf_topk(emb, queries, cents, k=5, nprobe=8)
    a = sorted(map(tuple, exact.select("query_id", "vec_id", "rank").collect()))
    b = sorted(map(tuple, ivf.select("query_id", "vec_id", "rank").collect()))
    assert a == b


def test_ivf_narrow_probe_recall(spark, emb):
    """Small nprobe keeps useful recall while scanning only probed buckets."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import cosine_topk, ivf_build, ivf_topk

    queries = emb.where("vec_id < 10").selectExpr("vec_id as query_id", "embedding")
    cents = ivf_build(emb, nlist=8, iters=2)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=3).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, recall
    # every query still returns k results
    from collections import Counter

    per_q = Counter(q for q, _ in got)
    assert all(v == 5 for v in per_q.values())


def test_sq8_exhaustive_rerank_equals_bruteforce(spark, emb):
    """rerank_factor=None keeps every candidate, so the quantized path must
    degenerate to exact brute force — proving quantize/coarse/shortlist/
    re-rank end-to-end (VERDICT r6 #7)."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import sq8_topk

    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank)
        for r in sq8_topk(emb, queries, k=5, rerank_factor=None).collect()
    }
    assert got == exact


def test_sq8_shortlist_recall_beats_unquantized_bounds(spark, emb):
    """Small-factor SQ8 recall vs exact top-5 must beat the unquantized
    approximate paths' pinned bounds (LSH 0.3, IVF-narrow 0.5) — int8
    cosine error is tiny, so a 4x shortlist should be near-exact."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import sq8_topk

    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in sq8_topk(emb, queries, k=5, rerank_factor=4).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, recall


def test_sq8_coarse_path_jvm_only_and_quantization_shape(spark, emb):
    """The coarse stage must contain NO Python eval nodes (the mandate:
    quantized coarse scoring is a JVM byte-payload path); re-rank touches
    floats only for the shortlist. Quantization edge cases: zero vector ->
    all-zero int8 with norm 0, never null/error."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import sq8_quantize, sq8_topk

    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        sq8_topk(emb, queries, k=5, rerank_factor=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan, plan  # no Batch/ArrowEvalPython anywhere

    z = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in sq8_quantize(z).collect()}
    assert rows[1].sq8 == [0, 0, 0] and rows[1].sq8_norm == 0.0
    assert rows[2].sq8 == [64, -127, 32]  # round(x*127/2)
    # zero-vector rows: coarse scores a guarded 0, exact cosine is NULL
    # (undefined), and the job never aborts on an ANSI divide-by-zero
    got = sq8_topk(
        z,
        z.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=1,
        rerank_factor=1,
    ).collect()
    assert len(got) == 2
    assert all(r.cosine is None for r in got)  # every pair involves the zero vec
