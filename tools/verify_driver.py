"""Drive the grading contract exactly as the per-round verifier does.

Runs __spark_entry__.entry() as a smoke check, then every queries() entry at
sf0.01 against its oracle_sql() twin in DuckDB, comparing row count, sorted
column names, and an order-insensitive stringified value hash — the same
three gates recorded in CORRECTNESS_r{N}.json. Exit code 0 only if every
oracle-checked query is green.

Usage: python tools/verify_driver.py [query ...]   (no args = all queries)
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF = "/root/testdata/sf0.01"


def _hash_df(pdf) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        "\x1f".join(_canon(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def _canon(v) -> str:
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(round(v, 6))
    # pandas NaN from DuckDB NULLs
    try:
        import pandas as pd

        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, int):
        return str(v)
    return str(v)


def main(only: list[str]) -> int:
    import __spark_entry__ as m
    from p5_rdf_rdb2rdf_spark.session import get_spark

    spark = get_spark(
        "verify",
        cores=4,
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    smoke = m.entry(spark).collect()
    assert len(smoke) > 0, "entry() smoke produced 0 rows"
    print(f"smoke: entry() -> {len(smoke)} rows", flush=True)

    con = duckdb.connect()
    for t in m.TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    oracles = m.oracle_sql()
    results: dict[str, dict] = {}
    failed = []
    for name, fn in m.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF).toPandas()
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                r = {
                    "rows_match": len(sdf) == len(ddf),
                    "schema_match": sorted(sdf.columns) == sorted(ddf.columns),
                    "hash_match": _hash_df(sdf) == _hash_df(ddf),
                    "spark_rows": len(sdf),
                    "oracle_rows": len(ddf),
                    "err": None,
                }
            else:
                r = {"no_oracle": True, "spark_rows": len(sdf), "err": None}
        except Exception as e:  # noqa: BLE001
            r = {"err": f"{type(e).__name__}: {e}"[:500]}
        r["sec"] = round(time.time() - t0, 2)
        results[name] = r
        ok = r.get("err") is None and (
            r.get("no_oracle") or (r["rows_match"] and r["schema_match"] and r["hash_match"])
        )
        if not ok:
            failed.append(name)
        print(f"{'PASS' if ok else 'FAIL'} {name}: {json.dumps(r)}", flush=True)

    print(f"\n{len(results) - len(failed)}/{len(results)} green; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
