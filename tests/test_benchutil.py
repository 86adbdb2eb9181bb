"""benchutil.checksum_row — the bench harness's one materializing
action.  Round-8 advice #4: normalization must recurse into nested
types, or doubles inside arrays/structs/maps hash raw and cross-pass
checksums look spuriously unstable whenever reduction order shifts a
last ulp."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_cdc_redis_spark.benchutil import checksum_row

# a last-ulp perturbation: far below the 4-dp rounding granularity, the
# scale of cross-pass floating reduction-order jitter
_EPS = 1e-12


def _df(spark, eps: float):
    return spark.range(8).select(
        F.col("id"),
        # top level (the r7 case), plus every nested shape of advice #4
        (F.col("id") * 1.1 + eps).alias("top_d"),
        F.array(
            (F.col("id") * 2.2 + eps), (F.col("id") * 3.3 - eps)
        ).alias("arr_d"),
        F.struct(
            (F.col("id") * 4.4 + eps).alias("x"),
            F.array((F.col("id") * 5.5 - eps)).alias("ys"),
        ).alias("st"),
        F.create_map(
            F.lit("k"), (F.col("id") * 6.6 + eps)
        ).alias("mp"),
    )


def test_checksum_stable_under_last_ulp_jitter_at_any_depth(spark):
    """Two computations of the same values differing only by ~1e-12 —
    the cross-pass jitter class — must checksum identically, including
    doubles nested in arrays, structs, struct-nested arrays, and map
    values."""
    a = checksum_row(_df(spark, 0.0))
    b = checksum_row(_df(spark, _EPS))
    c = checksum_row(_df(spark, -_EPS))
    assert a["n"] == b["n"] == c["n"] == 8
    assert a["chk"] == b["chk"] == c["chk"]


def test_checksum_detects_real_value_changes_at_any_depth(spark):
    """The flip side: a change ABOVE rounding granularity in a nested
    position must flip the checksum — normalization is rounding, not
    erasure."""
    base = checksum_row(_df(spark, 0.0))
    for delta in (0.01,):
        changed = checksum_row(
            _df(spark, 0.0).withColumn(
                "st",
                F.struct(
                    (F.col("id") * 4.4).alias("x"),
                    F.array((F.col("id") * 5.5 + delta)).alias("ys"),
                ),
            )
        )
        assert changed["chk"] != base["chk"]
    changed_map = checksum_row(
        _df(spark, 0.0).withColumn(
            "mp", F.create_map(F.lit("k"), (F.col("id") * 6.6 + 0.01))
        )
    )
    assert changed_map["chk"] != base["chk"]


def test_checksum_handles_nan_inf_and_pure_jvm_types(spark):
    """NaN/Infinity normalize to null (never abort under ANSI), and
    non-floating columns pass through untouched."""
    df = spark.range(4).select(
        F.col("id"),
        F.when(F.col("id") == 0, float("nan"))
        .when(F.col("id") == 1, float("inf"))
        .otherwise(F.col("id") * 1.5)
        .alias("d"),
        F.array(F.when(F.col("id") == 2, float("nan")).otherwise(F.lit(1.0))).alias(
            "ad"
        ),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    row = checksum_row(df)
    assert row["n"] == 4 and row["chk"] is not None
