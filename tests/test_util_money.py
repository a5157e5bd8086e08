"""Direct units for the r12 money-contract helpers (util.money_sum /
util.exact_avg / util.disc_price) — the board exercises them through 30+
driver queries, but the contract itself deserves point-blank coverage:
exactness against Decimal ground truth, NULL semantics, and the decimal
types that keep products inside the 38-digit cap."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.util import (
    disc_price,
    exact_avg,
    money_sum,
)

# 2-dp money values whose NAIVE double accumulation lands one ULP off
# the exact decimal total (sum() of these floats = 233.57999999999998,
# exact = 233.58), so the == assert below is a live tripwire for any
# regression back to a double accumulator. (A true half-cent .xx5
# boundary cannot arise HERE: money_sum casts each value to
# DECIMAL(18,2) first, and a sum of 2-dp decimals is itself 2-dp — the
# historical splitters were rounded sums of 4-dp+ products, covered by
# the disc_price/pricing tests.)
VALUES = [0.01, 0.02, 10.10, 99.99, 123.45, 0.005 * 2]  # last = 0.01


def test_money_sum_matches_decimal_ground_truth(spark):
    rows = [(float(v),) for v in VALUES] + [(None,)]
    df = spark.createDataFrame(rows, "v double")
    got = df.agg(money_sum("v").alias("s")).collect()[0].s
    want = float(sum(Decimal(str(round(v, 2))) for v in VALUES))
    assert got == want  # exact, and NULL is skipped like SUM


def test_exact_avg_divides_by_nonnull_count(spark):
    # AVG semantics: NULLs excluded from BOTH numerator and denominator
    df = spark.createDataFrame(
        [(1.00,), (2.00,), (None,), (4.00,)], "v double"
    )
    got = df.agg(exact_avg("v").alias("a")).collect()[0].a
    assert got == (1.00 + 2.00 + 4.00) / 3  # NOT / 4
    # integer path (cents=False): exact long sum, one IEEE division
    df2 = spark.createDataFrame([(1,), (2,), (None,), (4,)], "k long")
    got2 = df2.agg(exact_avg("k", cents=False).alias("a")).collect()[0].a
    assert got2 == 7 / 3


def test_disc_price_type_and_values(spark):
    df = spark.createDataFrame(
        [(100.00, 0.05), (19.99, 0.10), (0.01, 0.00)],
        "l_extendedprice double, l_discount double",
    )
    out = df.select(disc_price().alias("dp"))
    # tight factor types: (12,2) x ((3,2)-(3,2) -> (4,2)) -> DECIMAL(17,4),
    # so even the 3-factor charge product stays under the 38-digit cap
    # (the pricing_summary contract)
    assert out.schema["dp"].dataType.simpleString() == "decimal(17,4)"
    got = [r.dp for r in out.collect()]
    assert got == [
        Decimal("95.0000"),
        Decimal("17.9910"),
        Decimal("0.0100"),
    ]
