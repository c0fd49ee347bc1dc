"""r6 optimization pin: the long-cents aggregation rewrite (q1/q3/q5)
must be value-identical to the decimal formulation it replaced."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from encode_ingest_spark.suite import QUERIES, _cents, dec  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def test_cents_matches_decimal_cast(spark):
    """floor(x*100+0.5) == unscaled(cast(x as decimal(18,2))) for the
    2-decimal money domain, including 0 and large magnitudes."""
    vals = [0.0, 0.01, 0.07, 0.1, 0.5, 1.0, 1.01, 1.99, 123.45, 999.99,
            10000.04, 99999.95, 1234567.89, 9999999.99]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = df.select(
        _cents("x").alias("cents"),
        (F.col("x").cast("decimal(18,2)") * 100).cast("long").alias("dec_cents"),
    ).collect()
    for r in rows:
        assert r["cents"] == r["dec_cents"], r


def _q1_decimal(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(
            dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
        ).cast("double").alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def test_q1_cents_bitwise_equal_decimal(spark):
    got = sorted(map(tuple, QUERIES["q1_pricing_summary"](spark, SF_DIR).collect()))
    exp = sorted(map(tuple, _q1_decimal(spark, SF_DIR).collect()))
    assert got == exp  # tuple equality on doubles = bitwise-equal values


def test_q3_q5_cents_vs_decimal_sum(spark):
    """Revenue via long cents == revenue via decimal sum, per group."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pc, dc = _cents("l_extendedprice"), _cents("l_discount")
    both = li.groupBy("l_orderkey").agg(
        (F.sum(pc * (F.lit(100) - dc)).cast("decimal(38,0)") / 10000)
        .cast("double").alias("cents_rev"),
        F.sum(
            dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
        ).cast("double").alias("dec_rev"),
    )
    bad = both.filter(F.col("cents_rev") != F.col("dec_rev")).count()
    assert bad == 0
