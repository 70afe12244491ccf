"""Deterministic relational fixtures (FIXTURES.md §2/§3; SURVEY.md O41).

Mirrors the reference's test style — tiny books/authors tables built
in-memory per test (its ``t/*.t`` files create DBD::SQLite fixtures inline) —
plus the W3C R2RML spec's EMP/DEPT running example and edge-case tables
(no-PK, composite-PK, binary). Seed-free: all values are literal constants,
so goldens are stable by construction.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CONSTRAINTS = {
    "books": {
        "pk": ["book_id"],
        "fks": [{"cols": ["author_id"], "parent": "authors", "parent_cols": ["author_id"]}],
    },
    "authors": {"pk": ["author_id"], "fks": []},
    "emp": {
        "pk": ["empno"],
        "fks": [{"cols": ["deptno"], "parent": "dept", "parent_cols": ["deptno"]}],
    },
    "dept": {"pk": ["deptno"], "fks": []},
    "nopk_log": {"pk": [], "fks": []},
    "composite": {"pk": ["k1", "k2"], "fks": []},
    "binaries": {"pk": ["id"], "fks": []},
}


def fixture_tables(spark: SparkSession) -> dict[str, DataFrame]:
    books_schema = T.StructType(
        [
            T.StructField("book_id", T.IntegerType(), False),
            T.StructField("title", T.StringType(), False),
            T.StructField("author_id", T.IntegerType(), True),
            T.StructField("published", T.DateType(), True),
            T.StructField("price", T.DecimalType(8, 2), True),
            T.StructField("in_print", T.BooleanType(), False),
        ]
    )
    books = spark.createDataFrame(
        [
            (1, "Utopia of Rules", 10, dt.date(2015, 2, 1), Decimal("12.50"), True),
            (2, "Læring å lese", 11, dt.date(1999, 5, 20), Decimal("8.00"), False),
            (3, "Spaces / Slashes", None, None, Decimal("99.99"), True),  # NULL fk (O10)
            (4, "Plain", 10, dt.date(2020, 1, 2), None, True),
        ],
        books_schema,
    )
    authors_schema = T.StructType(
        [
            T.StructField("author_id", T.IntegerType(), False),
            T.StructField("forename", T.StringType(), False),
            T.StructField("surname", T.StringType(), False),
            T.StructField("born", T.TimestampType(), True),
        ]
    )
    authors = spark.createDataFrame(
        [
            (10, "David", "Graeber", dt.datetime(1961, 2, 12, 6, 30, 0)),
            (11, "Åse", "Nordmann", None),
        ],
        authors_schema,
    )
    emp_schema = T.StructType(
        [
            T.StructField("empno", T.IntegerType(), False),
            T.StructField("ename", T.StringType(), False),
            T.StructField("job", T.StringType(), False),
            T.StructField("deptno", T.IntegerType(), True),
        ]
    )
    emp = spark.createDataFrame(
        [
            (7369, "SMITH", "CLERK", 10),
            (7499, "ALLEN", "SALESMAN", 20),
            (7521, "WARD", "SALESMAN", None),
        ],
        emp_schema,
    )
    dept_schema = T.StructType(
        [
            T.StructField("deptno", T.IntegerType(), False),
            T.StructField("dname", T.StringType(), False),
            T.StructField("loc", T.StringType(), False),
        ]
    )
    dept = spark.createDataFrame(
        [(10, "APPSERVER", "NEW YORK"), (20, "RESEARCH", "BOSTON")], dept_schema
    )
    nopk_schema = T.StructType(
        [
            T.StructField("ts", T.StringType(), True),
            T.StructField("msg", T.StringType(), True),
        ]
    )
    nopk_log = spark.createDataFrame(
        [("t1", "started"), ("t1", "started"), ("t2", "stopped"), ("t3", None)],
        nopk_schema,
    )
    composite_schema = T.StructType(
        [
            T.StructField("k1", T.IntegerType(), False),
            T.StructField("k2", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    composite = spark.createDataFrame(
        [(1, "a;b", "x"), (2, "c=d", "y"), (3, "p%q", "z")], composite_schema
    )
    binaries_schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    binaries = spark.createDataFrame(
        [(1, bytearray(b"\x00\xffAB")), (2, bytearray(b"hello"))], binaries_schema
    )
    return {
        "books": books,
        "authors": authors,
        "emp": emp,
        "dept": dept,
        "nopk_log": nopk_log,
        "composite": composite,
        "binaries": binaries,
    }
