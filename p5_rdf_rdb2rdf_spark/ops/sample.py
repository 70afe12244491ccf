"""Deterministic sampling and split assignment for training-data curation.

A 10^12-doc pipeline cannot use ``rand()``-based sampling: re-runs must
select the SAME documents (resumable stages, auditable lineage), adding a
shard must not reshuffle earlier assignments, and a row's fate must be
computable from the row alone (no global state, no ordering dependence).
Both operators here are pure Column expressions — zero shuffle, zero
Python, fully pushdown-friendly — keyed on a caller-named id column:

``modulo_split``
    splits on ``id % total`` against explicit integer bucket ranges. Exact,
    portable arithmetic (any engine reproduces it — the DuckDB oracle twin
    is literally the same expression), but assumes ids are roughly
    uniformly distributed mod ``total``; sequential ids are fine, ids with
    stride structure are not.

``hashed_split``
    same contract but buckets on ``xxhash64(id, seed)`` first, so ANY id
    distribution (clustered, strided, string keys) splits uniformly;
    different seeds give independent splits. Engine-deterministic (stable
    across runs, partitionings and cluster sizes) but not portable SQL —
    cross-engine checks must compare structure (sizes, disjointness,
    exhaustiveness), not membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _split_col(bucket: Column, splits: dict[str, tuple[int, int]], total: int) -> Column:
    expr = F.lit(None).cast("string")
    # build WHEN chain lo <= bucket < hi; validation done by callers
    out = None
    for name, (lo, hi) in splits.items():
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    return out.otherwise(expr) if out is not None else expr


def _validate(splits: dict[str, tuple[int, int]], total: int) -> None:
    if total <= 0:
        raise ValueError("total must be positive")
    for name, (lo, hi) in splits.items():
        if not (0 <= lo < hi <= total):
            raise ValueError(f"split {name!r}: need 0 <= lo < hi <= total, got ({lo}, {hi})")
    ranges = sorted(splits.values())
    for (al, ah), (bl, bh) in zip(ranges, ranges[1:]):
        if bl < ah:
            raise ValueError(f"overlapping split ranges ({al},{ah}) and ({bl},{bh})")


def modulo_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, tuple[int, int]],
    total: int = 100,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a named split from ``id % total`` bucket ranges.

    ``splits`` maps name -> [lo, hi) bucket range over ``[0, total)``;
    ranges must be disjoint; uncovered buckets get NULL (= "not sampled",
    filterable). E.g. ``{"train": (0, 98), "val": (98, 99), "test":
    (99, 100)}`` is a 98/1/1 split. Portable: the oracle twin is the same
    integer arithmetic in any SQL engine."""
    _validate(splits, total)
    bucket = F.pmod(F.col(id_col).cast("long"), F.lit(total))
    return df.withColumn(out_col, _split_col(bucket, splits, total))


def hashed_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, tuple[int, int]],
    total: int = 100,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Like :func:`modulo_split` but bucket = ``pmod(xxhash64(id, seed),
    total)``: uniform for any id distribution, independent across seeds.
    Deterministic within the engine; NOT portable arithmetic (xxhash64
    differs across engines — verify structure, not membership,
    cross-engine)."""
    _validate(splits, total)
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(total))
    return df.withColumn(out_col, _split_col(bucket, splits, total))


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    rate_pct: int,
    total: int = 100,
    seed: int = 0,
    hashed: bool = True,
) -> DataFrame:
    """Keep a deterministic ~``rate_pct``/``total`` fraction of rows.

    Sugar over the split operators: bucket < rate_pct. ``hashed=False``
    selects ``id % total < rate_pct`` (portable, id-uniformity caveat).
    ``rate_pct=0`` keeps nothing (valid for dynamically-computed rates and
    ablation sweeps — review r5); ``rate_pct=total`` keeps everything."""
    if rate_pct == 0:
        return df.where(F.lit(False))
    fn = hashed_split if hashed else modulo_split
    kw = {"seed": seed} if hashed else {}
    out = fn(df, id_col, {"keep": (0, rate_pct)}, total=total, out_col="__s", **kw)
    return out.where(F.col("__s").isNotNull()).drop("__s")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 0,
    total: int = 100,
    seed: int = 0,
    hashed: bool = True,
) -> DataFrame:
    """Per-stratum deterministic downsampling — the language/source
    rebalancing pass of corpus curation (keep 100% of rare languages, 10%
    of English, drop unlisted sources).

    ``rates`` maps a stratum value -> keep rate over ``[0, total]``;
    strata not listed keep ``default_pct``. A row survives iff
    ``bucket(id) < rate(stratum)``, with bucket = pmod(xxhash64(id, seed))
    (uniform for any id distribution; engine-specific) or pmod(id) when
    ``hashed=False`` (portable integer arithmetic — exact cross-engine
    oracles). The bucket depends only on the id, so a row's fate is stable
    under rate changes: raising one stratum's rate only ADDS rows — nested
    samples, the property ablation sweeps and reproducible re-curation
    need. NULL strata take ``default_pct``.

    One pure-JVM scan: the rate lookup is a literal CASE chain over the
    (small, driver-side) rates map — no shuffle, no Python, filter pushed
    where the source supports it."""
    for k, v in rates.items():
        if not 0 <= v <= total:
            raise ValueError(f"rate for {k!r} must be in [0, {total}]")
    if not 0 <= default_pct <= total:
        raise ValueError(f"default_pct must be in [0, {total}]")
    bucket = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(total))
        if hashed
        else F.pmod(F.col(id_col).cast("long"), F.lit(total))
    )
    rate = F.lit(default_pct)
    for k, v in rates.items():
        rate = F.when(F.col(strata_col) == F.lit(k), F.lit(v)).otherwise(rate)
    return df.where(bucket < rate)
