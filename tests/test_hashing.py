"""Parity of the Python Murmur3 twin with Spark's hash()/bucket_expr.

The lake's physical layout depends on pmod(hash(keys), B); the Python
twin (lake/hashing.py) places rows in buckets from outside Spark jobs
(native streaming sink, driver point lookups). Any divergence corrupts
bucket pruning — so parity is pinned exhaustively per type, for
multi-column folds, and for the bucket expression itself.
"""

import datetime as dt
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.lake.hashing import bucket_of, spark_hash
from encode_ingest_spark.lake.table import bucket_expr

random.seed(20260819)


def _check(spark, values, dtype):
    schema = T.StructType([T.StructField("v", dtype, True)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    got = [r.h for r in df.select(F.hash("v").alias("h")).collect()]
    want = [spark_hash([v], [dtype]) for v in values]
    assert got == want, f"{dtype}: {list(zip(values, got, want))[:5]}"


def test_string_parity(spark):
    vals = [
        "", "a", "ab", "abc", "abcd", "abcde", None,
        "répo/päth", "日本語テキスト", "🚀🛰️", "x" * 257,
        "\x00\x01\x02", " ", "tab\tnewline\n",
    ] + ["".join(random.choices("abcdefghij/._-", k=random.randint(0, 40)))
         for _ in range(50)]
    _check(spark, vals, T.StringType())


def test_integral_parity(spark):
    ints = [0, 1, -1, 42, -42, 2**31 - 1, -(2**31), None] + [
        random.randint(-(2**31), 2**31 - 1) for _ in range(30)
    ]
    _check(spark, ints, T.IntegerType())
    longs = [0, 1, -1, 2**63 - 1, -(2**63), None] + [
        random.randint(-(2**63), 2**63 - 1) for _ in range(30)
    ]
    _check(spark, longs, T.LongType())
    _check(spark, [0, 1, -128, 127, None], T.ShortType())


def test_bool_float_double_parity(spark):
    _check(spark, [True, False, None], T.BooleanType())
    floats = [0.0, -0.0, 1.5, -3.25, 1e30, -1e-30, None] + [
        random.uniform(-1e6, 1e6) for _ in range(20)
    ]
    _check(spark, floats, T.FloatType())
    _check(spark, floats, T.DoubleType())


def test_binary_date_timestamp_parity(spark):
    bins = [b"", b"\x00", b"abc", b"\xff\xfe\x80", bytes(range(256)), None]
    _check(spark, [bytearray(b) if b is not None else None for b in bins],
           T.BinaryType())
    dates = [dt.date(1970, 1, 1), dt.date(2026, 8, 19), dt.date(1969, 12, 31),
             dt.date(1, 1, 1), None]
    _check(spark, dates, T.DateType())
    tss = [
        dt.datetime(1970, 1, 1), dt.datetime(2026, 8, 19, 12, 34, 56, 789012),
        dt.datetime(1969, 6, 1, 23, 59, 59, 999999), None,
    ]
    _check(spark, tss, T.TimestampType())


def test_multi_column_fold_and_bucket_expr(spark):
    rows = [
        ("repo-%d" % i, "src/f%d.py" % (i * 7), "c%032x" % i)
        for i in range(200)
    ] + [("r", None, "c"), (None, None, None), ("", "", "")]
    schema = T.StructType([
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
    ])
    df = spark.createDataFrame(rows, schema)
    dtypes = [T.StringType()] * 3
    got = [
        (r.h, r.b)
        for r in df.select(
            F.hash("repo", "path", "commit").alias("h"),
            bucket_expr(["repo", "path", "commit"], 32).alias("b"),
        ).collect()
    ]
    want = [
        (spark_hash(row, dtypes), bucket_of(row, dtypes, 32)) for row in rows
    ]
    assert got == want


def test_mixed_type_fold(spark):
    schema = T.StructType([
        T.StructField("s", T.StringType(), True),
        T.StructField("l", T.LongType(), True),
        T.StructField("b", T.BooleanType(), True),
    ])
    rows = [("k%d" % i, i * 37 - 500, i % 2 == 0) for i in range(50)]
    rows += [(None, 1, True), ("x", None, False), ("y", 2, None)]
    df = spark.createDataFrame(rows, schema)
    dtypes = [T.StringType(), T.LongType(), T.BooleanType()]
    got = [r.h for r in df.select(F.hash("s", "l", "b").alias("h")).collect()]
    want = [spark_hash(row, dtypes) for row in rows]
    assert got == want
