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


def test_hilbert_key_matches_reference_recurrence(spark):
    """hilbert_key must equal the classic xy2d rotate-and-reflect
    recurrence on a corner/edge sample (the expression chain rewrites
    XOR arithmetically — verify no step drifted)."""
    from arcon_spark.operators.maintenance import hilbert_key

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = [(0, 0), (255, 255), (1, 0), (0, 1), (128, 127), (127, 128), (200, 3)]
    df = spark.createDataFrame(pts, "px long, py long")
    for r in hilbert_key(df, "px", "py").collect():
        assert r.hkey == xy2d(256, r.px, r.py), (r.px, r.py)


def test_hilbert_chunks_never_jump(spark):
    """Locality, made exact: on a 256×256 grid split into 16 equal
    chunks by hkey, every chunk's bounding box covers at most 1/4 of
    each dimension (Hilbert chunks of size 4096 are 64×64 regions),
    and the x ∈ [0, 63] stripe overlaps exactly 4 chunks — matching
    z-order's block property here, with tighter boxes in general
    because the curve never teleports across the plane."""
    from arcon_spark.operators.maintenance import hilbert_key

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    keyed = hilbert_key(grid, "x", "y")
    c = keyed.withColumn("chunk", F.ntile(16).over(W.orderBy("hkey", "x", "y")))
    boxes = c.groupBy("chunk").agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).collect()
    for r in boxes:
        assert (r.x1 - r.x0 + 1) <= 64 and (r.y1 - r.y0 + 1) <= 64, r
    hits = sum(1 for r in boxes if r.x1 >= 0 and r.x0 <= 63)
    assert hits == 4, [(r.x0, r.x1) for r in boxes]
