"""Round-4 regression tests.

Pins the default-path AQE fix: every build-critical range shuffle
passes an explicit partition count so AQE's advisory-size coalescing
can never collapse a small-to-mid corpus to ONE partition (the
documented 18.6 s vs 1.6 s trap on 32 cores at 100k docs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.indexer import (
    _n_eff,
    _rank_within_groups,
    assign_dense_ids,
)


def test_n_eff_default_covers_all_cores(spark):
    n = _n_eff(spark)
    assert n >= 2 * spark.sparkContext.defaultParallelism
    assert _n_eff(spark, 7) == 7


def test_assign_dense_ids_default_not_single_partition(spark):
    # tiny input (well under AQE's 64MB advisory target) + default
    # num_partitions must still spread across the explicit count
    df = spark.range(1000).select(F.col("id").alias("pid"))
    out = assign_dense_ids(df, ["pid"])
    assert out.rdd.getNumPartitions() == _n_eff(spark)
    assert out.count() == 1000


def test_rank_within_groups_default_not_single_partition(spark):
    df = spark.range(2000).select(
        (F.col("id") % 13).alias("g"), F.col("id").alias("o")
    )
    out = _rank_within_groups(df, "g", "o", "rnk")
    assert out.rdd.getNumPartitions() == _n_eff(spark)
    # rank semantics unchanged: 0-based dense rank inside each group
    row = out.filter((F.col("g") == 3) & (F.col("o") == 3)).collect()[0]
    assert row["rnk"] == 0
