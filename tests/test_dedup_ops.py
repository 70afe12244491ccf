"""Dedup family on planted near-duplicates: every method must recover the
planted pairs and reject clearly-different docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p5_rdf_rdb2rdf_spark.ops.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_blocked_pairs,
    simhash_pairs,
)

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey"
).split()


def _doc(i: int, n: int = 60) -> str:
    import hashlib

    toks = []
    for j in range(n):
        h = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)
        toks.append(WORDS[h % len(WORDS)])
    return " ".join(toks)


@pytest.fixture(scope="module")
def planted(spark):
    """40 base docs; docs 100..103 are near-copies of doc 0 (one word edit);
    doc 200 is an exact copy of doc 1."""
    rows = [(i, _doc(i)) for i in range(40)]
    base = _doc(0).split()
    for j, k in enumerate(range(100, 104)):
        mutated = list(base)
        mutated[10 + j] = "zulu"
        rows.append((k, " ".join(mutated)))
    rows.append((200, _doc(1)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, planted):
    out = exact_dedup(planted)
    reps = {r.doc_id: r.n_dupes for r in out.collect()}
    assert reps[1] == 2  # doc 200 collapsed into doc 1
    assert 200 not in reps
    assert out.count() == planted.count() - 1


def test_minhash_lsh_recovers_neardups(spark, planted):
    sigs = minhash_signatures(planted, num_hashes=64, shingle_k=3)
    pairs = minhash_lsh_pairs(sigs, bands=16, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # the exact copy pair must be found with est_jaccard 1.0
    assert (1, 200) in got
    # each near-copy of doc 0 should be found (1-word edit of 60 -> J ~ .9)
    for k in range(100, 104):
        assert (0, k) in got, k
    # distinct base docs don't collide at threshold 0.5
    assert not any(a < 40 and b < 40 for a, b in got)


def test_minhash_est_close_to_exact_jaccard(spark, planted):
    sigs = minhash_signatures(planted, num_hashes=64, shingle_k=3)
    pairs = minhash_lsh_pairs(sigs, bands=16, threshold=0.3)
    exact = ngram_jaccard_pairs(
        planted, pairs.select("id_a", "id_b"), shingle_k=3, threshold=0.0
    )
    j = {(r.id_a, r.id_b): r.jaccard for r in exact.collect()}
    est = {(r.id_a, r.id_b): r.est_jaccard for r in pairs.collect()}
    for key in est:
        assert abs(est[key] - j[key]) < 0.25, (key, est[key], j[key])


def test_simhash_pairs(spark, planted):
    pairs = simhash_pairs(planted, max_hamming=8, shingle_k=2)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got.get((1, 200)) == 0  # identical docs -> identical simhash
    for k in range(100, 104):
        assert (0, k) in got  # near-copies within hamming 8
    # unrelated docs stay out
    assert not any(a < 40 and b < 40 and (a, b) != (1, 200) for a, b in got)


def test_ngram_jaccard_threshold(spark, planted):
    cand = spark.createDataFrame(
        [(0, 100), (0, 5), (1, 200)], "id_a long, id_b long"
    )
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(planted, cand, shingle_k=3, threshold=0.0).collect()
    }
    assert out[(1, 200)] == 1.0
    assert out[(0, 100)] > 0.8
    assert out[(0, 5)] < 0.2


def test_minhash_families_are_independent(spark):
    """Regression: the 64 signature slots must be DIFFERENT hash functions.
    With the (element, index) lambda trap the seed binds to the array index,
    every slot computes the same min, and a prefix-extended near-copy whose
    argmin shingle is the new suffix shows 0/64 agreement. A valid family
    agrees on ~J of the slots."""
    base = _doc(7, 40)
    ext = base + " zulu yankee xray whiskey victor"
    df = spark.createDataFrame([(1, base), (2, ext)], "doc_id long, text string")
    sigs = {r.doc_id: r.sig for r in minhash_signatures(df, num_hashes=64, shingle_k=5).collect()}
    # slots are distinct functions: a single doc's signature is not constant
    assert len(set(sigs[1])) > 32
    agree = sum(1 for x, y in zip(sigs[1], sigs[2]) if x == y)
    # true J ~ 36/41 ~ 0.88; binomial(64, .88) is >40 agreements essentially surely
    assert agree > 40, f"agreement {agree}/64 — hash families are not independent"


def test_simhash_opposite_sign_segment0(spark):
    """Regression (ADVICE r1): pairs whose ONLY agreeing segment is segment 0
    and whose simhashes have opposite signs must still share a bucket —
    Spark `%` follows the dividend's sign, so the old extraction missed them.
    max_hamming=3 -> 4 segments of 16 bits; y flips one bit in each of
    segments 1..3 (incl. the sign bit 63)."""
    x = 0xABCD  # bits only in segment 0; positive
    y_u = x ^ (1 << 20) ^ (1 << 40) ^ (1 << 63)
    y = y_u - (1 << 64)  # as signed long: negative
    sh = spark.createDataFrame([(1, x), (2, y)], "doc_id long, simhash long")
    pairs = simhash_blocked_pairs(sh, max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got == {(1, 2): 3}


def test_lsh_bucket_cap_bounds_candidates(spark, planted):
    """A planted mega-bucket (60 identical boilerplate docs) must not fan out
    quadratically when max_bucket_size caps it; real near-dup pairs outside
    the hot bucket survive."""
    boiler = [(1000 + i, "the same boilerplate header text repeated") for i in range(60)]
    df = planted.union(spark.createDataFrame(boiler, "doc_id long, text string"))
    sigs = minhash_signatures(df, num_hashes=64, shingle_k=3)
    capped = minhash_lsh_pairs(sigs, bands=16, threshold=0.5, max_bucket_size=20)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert not any(a >= 1000 for a, _ in got)  # hot bucket dropped entirely
    assert (1, 200) in got and (0, 100) in got  # planted pairs still found
    uncapped = minhash_lsh_pairs(sigs, bands=16, threshold=0.5, max_bucket_size=None)
    n_boiler_pairs = uncapped.where("id_a >= 1000").count()
    assert n_boiler_pairs == 60 * 59 // 2  # what the cap is protecting against

    sim_capped = simhash_pairs(df, max_hamming=8, shingle_k=2, max_bucket_size=20)
    sgot = {(r.id_a, r.id_b) for r in sim_capped.collect()}
    assert not any(a >= 1000 for a, _ in sgot)
    assert (1, 200) in sgot


def test_embedding_neardup_auto_bucket_never_cartesian(spark):
    """bucket_col=None must auto-bucket (hyperplane signs), not degrade to an
    all-pairs cross join; a scaled copy (cosine 1.0) is always co-bucketed."""
    rng = [(i, [float((i * 13 + d * 7) % 11 - 5) for d in range(8)]) for i in range(20)]
    rows = rng + [(100, [2.0 * v for v in rng[0][1]])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_neardup_pairs(df, threshold=0.999, dim=8)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 100) in got


def test_embedding_neardup_auto_bucket_infers_dim(spark):
    """Regression (ADVICE r2 #2): round 2 hardcoded dim=64 in auto-bucketing,
    so 8-dim vectors null-padded every hyperplane dot product and ALL rows
    collapsed into bucket 0 — the exact all-pairs degradation the bucketing
    exists to prevent. With inference the 8-dim buckets must be non-trivial,
    and an explicitly-wrong dim must now bucket identically to the inferred
    one (element_at treats missing components as 0)."""
    from p5_rdf_rdb2rdf_spark.ops.similarity import hyperplane_bucket

    rows = [(i, [float((i * 13 + d * 7) % 11 - 5) for d in range(8)]) for i in range(40)]
    # ADVICE r3 #2: an EMPTY embedding must not crash dim inference —
    # sequence(0, size-1) with size=0 is sequence(0,-1)=[0,-1] and
    # try_element_at(vec, 0) throws INVALID_INDEX_OF_ZERO without the clamp.
    # It lands deterministically in bucket 0 (every dot is exactly 0).
    rows_with_empty = rows + [(999, [])]
    df = spark.createDataFrame(rows_with_empty, "vec_id long, embedding array<double>")
    inferred = df.select(
        "vec_id", hyperplane_bucket(F.col("embedding"), n_planes=4).alias("b")
    )
    empty_bucket = {r.b for r in inferred.where("vec_id = 999").collect()}
    assert empty_bucket == {0}
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    inferred = df.select(
        "vec_id", hyperplane_bucket(F.col("embedding"), n_planes=4).alias("b")
    )
    n_buckets = inferred.select("b").distinct().count()
    assert n_buckets > 1, "8-dim vectors must spread across hyperplane buckets"
    wrong_dim = df.select(
        "vec_id", hyperplane_bucket(F.col("embedding"), n_planes=4, dim=64).alias("b")
    )
    assert sorted(map(tuple, inferred.collect())) == sorted(map(tuple, wrong_dim.collect()))
    # and the full op with default dim still finds the planted pair, bucketed
    planted = rows + [(100, [2.0 * v for v in rows[0][1]])]
    pdf = spark.createDataFrame(planted, "vec_id long, embedding array<double>")
    pairs = embedding_neardup_pairs(pdf, threshold=0.999)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert (0, 100) in {(r.id_a, r.id_b) for r in pairs.collect()}


def test_embedding_neardup(spark):
    import numpy as np

    rng = [(i, [float((i * 13 + d * 7) % 11 - 5) for d in range(8)], i % 2) for i in range(20)]
    # plant: vec 100 = vec 0 scaled (cosine 1.0), same bucket
    rows = rng + [(100, [2.0 * v for v in rng[0][1]], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    pairs = embedding_neardup_pairs(df, bucket_col="label", threshold=0.999)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 100) in got
    # bucketing respected: no cross-label pair can appear
    labels = {r[0]: r[2] for r in rows}
    assert all(labels[a] == labels[b] for a, b in got)


def test_neardup_clusters_keep_one_per_component(spark):
    """Cluster canonicalization: transitive chains collapse to the min id,
    singletons are their own cluster and are kept, exactly one keep=True
    per cluster."""
    from p5_rdf_rdb2rdf_spark.ops.dedup import neardup_clusters

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 7)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in neardup_clusters(docs, pairs).collect()
    }
    assert out == {
        0: (0, True),
        1: (1, True),
        2: (2, True),
        3: (1, False),
        4: (4, True),
        5: (1, False),
        6: (6, True),
        7: (6, False),
    }
    kept = [k for k, (_, keep) in out.items() if keep]
    clusters = {c for c, _ in out.values()}
    assert sorted(kept) == sorted(clusters)  # exactly one survivor each
