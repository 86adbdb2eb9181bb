"""Scale-strategy tests: bucketed co-located joins plan without a
shuffle on the bucketed sides; salted joins return exactly the plain
join's rows."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from mysql_cdc_redis_spark.operators.scale import salted_join, write_bucketed
from mysql_cdc_redis_spark.sources import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8)
    try:
        # broadcast would bypass bucketing at this tiny SF — force it off
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges == 0, f"bucketed join must not shuffle:\n{plan}"
        assert "SortMergeJoin" in plan
        # and it returns the same rows as the unbucketed join
        expected = lineitem.join(
            orders.select("o_orderkey", "o_totalprice"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", n_salts=5)
    cols = sorted(plain.columns)
    a = sorted(tuple(str(r[c]) for c in cols) for r in plain.collect())
    b = sorted(tuple(str(r[c]) for c in cols) for r in salted.collect())
    assert a == b
