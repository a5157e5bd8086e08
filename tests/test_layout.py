"""Z-order layout tests: Morton interleave math, range-write plan shape,
and the actual multi-dimensional clustering property on written files."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.sources.layout import (
    interleave_bits,
    minmax_rank,
    write_zordered,
    zorder_key,
)


def test_morton_interleave_known_values(spark):
    """Pin the bit math: rank_x=0b11, rank_y=0b101 with 3 bits ->
    z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
      = 1 + 2 + 4 + 0 + 0 + 32 = 39."""
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    out = df.select(
        interleave_bits([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()[0]
    assert out.z == 39


def test_minmax_rank_bounds(spark):
    """min ranks 0, max ranks 2^bits - 1, degenerate span ranks 0."""
    df = spark.createDataFrame([(0,), (50,), (100,)], "v long")
    stats = df.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    out = sorted(
        r.r
        for r in df.crossJoin(F.broadcast(stats))
        .select(minmax_rank("v", 8, F.col("mn"), F.col("mx")).alias("r"))
        .collect()
    )
    assert out[0] == 0 and out[-1] == 255 and 0 < out[1] < 255
    flat = spark.createDataFrame([(7,), (7,)], "v long")
    fstats = flat.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    assert all(
        r.r == 0
        for r in flat.crossJoin(F.broadcast(fstats))
        .select(minmax_rank("v", 8, F.col("mn"), F.col("mx")).alias("r"))
        .collect()
    )


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    """The written layout must give every file a SMALL bounding box in
    BOTH interleaved dimensions — the property single-column range
    layout cannot provide. 32x32 grid -> 16 files: mean per-file box
    area must be far below the global area (each dimension's span
    should shrink roughly with sqrt(n_files) on a Morton curve)."""
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    path = str(tmp_path / "zordered")
    write_zordered(df, path, ["x", "y"], bits=5, n_files=16)
    back = spark.read.parquet(path).withColumn("f", F.input_file_name())
    boxes = (
        back.groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(boxes) > 4  # range partitioner actually split the curve
    mean_area = sum((b.dx + 1) * (b.dy + 1) for b in boxes) / len(boxes)
    assert mean_area < (32 * 32) / 4, mean_area
    # plan shape: the clustering is a RANGE exchange on the morton key
    keyed = zorder_key(df, ["x", "y"], bits=5).repartitionByRange(16, "z_key")
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower().replace(" ", "")


def test_compact_files_rewrites_small_files(spark, tmp_path):
    """64 tiny files -> right-sized file count from total bytes (no data
    scan for the sizing decision), identical data after the atomic swap,
    and no staging dirs left behind."""
    import os

    from azure_etl_databricks_sql_powerbi_spark.sources.layout import compact_files

    path = str(tmp_path / "small_files")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before == 64

    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    stats = compact_files(spark, path, target_file_bytes=(total // 2) + 1)
    assert stats["files_before"] == 64
    assert stats["files_after"] <= 2
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after == stats["files_after"]
    assert not os.path.exists(path + ".__compact_tmp")
    assert not os.path.exists(path + ".__compact_old")
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10_000))
