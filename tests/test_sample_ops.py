"""Deterministic sampling / split assignment (ops/sample.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p5_rdf_rdb2rdf_spark.ops.sample import (
    deterministic_sample,
    hashed_split,
    modulo_split,
)

SPLITS = {"train": (0, 98), "val": (98, 99), "test": (99, 100)}


def test_modulo_split_exact_membership(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    got = {r.doc_id: r.split for r in modulo_split(df, "doc_id", SPLITS).collect()}
    for i in range(1000):
        want = "train" if i % 100 < 98 else ("val" if i % 100 == 98 else "test")
        assert got[i] == want
    # uncovered buckets -> NULL (not sampled)
    part = {r.doc_id: r.split for r in modulo_split(
        df, "doc_id", {"keep": (0, 10)}).collect()}
    assert part[5] == "keep" and part[10] is None


def test_hashed_split_structural_invariants(spark):
    """Engine-deterministic but not portable: pin structure — exhaustive,
    disjoint (one assignment per row), stable across partitionings, seed
    changes membership but preserves coverage, and bucket sizes are
    plausibly uniform."""
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    s1 = hashed_split(df, "doc_id", SPLITS, seed=0)
    a = {r.doc_id: r.split for r in s1.collect()}
    assert set(a.values()) == {"train", "val", "test"}  # exhaustive ranges
    b = {r.doc_id: r.split
         for r in hashed_split(df.repartition(13), "doc_id", SPLITS, seed=0).collect()}
    assert a == b  # partitioning-independent
    c = {r.doc_id: r.split for r in hashed_split(df, "doc_id", SPLITS, seed=7).collect()}
    assert a != c and set(c.values()) == {"train", "val", "test"}
    n_train = sum(1 for v in a.values() if v == "train")
    assert 9600 < n_train < 9950  # ~9800 expected; loose binomial bounds


def test_deterministic_sample_and_validation(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    s = deterministic_sample(df, "doc_id", rate_pct=10)
    n = s.count()
    assert 800 < n < 1200  # ~1000
    assert s.count() == n  # re-run selects the SAME rows
    assert s.columns == ["doc_id"]
    exact = deterministic_sample(df, "doc_id", rate_pct=10, hashed=False)
    assert exact.count() == 1000  # id % 100 < 10: exactly 10%
    assert deterministic_sample(df, "doc_id", rate_pct=0).count() == 0
    assert deterministic_sample(df, "doc_id", rate_pct=100).count() == 10_000

    with pytest.raises(ValueError):
        modulo_split(df, "doc_id", {"a": (0, 50), "b": (40, 60)})  # overlap
    with pytest.raises(ValueError):
        modulo_split(df, "doc_id", {"a": (0, 101)})  # out of range


def test_split_ops_plan_pure_jvm_no_shuffle(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    for out in (modulo_split(df, "doc_id", SPLITS), hashed_split(df, "doc_id", SPLITS)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan


def test_stratified_sample_rates_and_nesting(spark):
    """Per-stratum rates honored, unlisted strata take default_pct, NULL
    strata take default, raising a rate only ADDS rows (nested samples),
    and the modulo variant matches exact arithmetic membership."""
    from p5_rdf_rdb2rdf_spark.ops.sample import stratified_sample

    rows = [(i, ["en", "de", "fr", None][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    out = stratified_sample(
        df, "lang", {"en": 10, "de": 50}, default_pct=0, hashed=False
    )
    got = {(r.doc_id, r.lang) for r in out.collect()}
    want = {
        (i, lang)
        for i, lang in rows
        if i % 100 < {"en": 10, "de": 50}.get(lang or "", 0)
    }
    assert got == want
    assert all(lang in ("en", "de") for _, lang in got)  # default 0 drops

    # default applies to unlisted AND null strata
    out2 = stratified_sample(df, "lang", {"en": 10}, default_pct=100, hashed=False)
    assert out2.where("lang IS NULL").count() == 100  # all null rows kept

    # nested: raising en 10 -> 30 strictly grows the en sample (same ids kept)
    lo = {r.doc_id for r in stratified_sample(
        df, "lang", {"en": 10}, hashed=True, seed=7).collect()}
    hi = {r.doc_id for r in stratified_sample(
        df, "lang", {"en": 30}, hashed=True, seed=7).collect()}
    assert lo <= hi and len(hi) > len(lo)

    # rate bounds validated
    import pytest as _pytest
    with _pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 101})
