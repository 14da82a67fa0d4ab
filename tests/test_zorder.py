"""Z-order layout (operators/maintenance.py zorder_key): key
correctness and the file-skipping locality property it exists for.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arcon_spark.operators.maintenance import zorder_key


def test_zorder_key_bit_interleave(spark):
    """z(3, 5): x=0b11 → bits 0,2; y=0b101 → bits 1,5 ⇒ 1+2+4+32 = 39."""
    row = spark.range(1).select(zorder_key(F.lit(3), F.lit(5)).alias("z")).first()
    assert row.z == 39


def test_zorder_chunks_bound_both_dimensions(spark):
    """On a 256×256 grid split into 16 equal chunks by zkey, each chunk
    is one aligned 64×64 block (top two Morton bits per dimension), so
    a stripe query x ∈ [0, 63] overlaps exactly 4 chunks' bounding
    boxes — while a y-sorted layout leaves every chunk spanning all of
    x (16/16 overlap). This is the scan-skipping claim, made exact."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )

    def boxes(order_col):
        c = grid.withColumn("chunk", F.ntile(16).over(W.orderBy(order_col, "x", "y")))
        return c.groupBy("chunk").agg(
            F.min("x").alias("x0"), F.max("x").alias("x1")
        ).collect()

    z = boxes(zorder_key(F.col("x"), F.col("y")))
    lin = boxes(F.col("y"))
    z_hits = sum(1 for r in z if r.x1 >= 0 and r.x0 <= 63)
    lin_hits = sum(1 for r in lin if r.x1 >= 0 and r.x0 <= 63)
    assert z_hits == 4, [(r.x0, r.x1) for r in z]
    assert lin_hits == 16
