"""Spatial proximity primitives: grid-cell-bucketed distance joins.

The all-pairs "points within radius r" join is quadratic if expressed
naively; the scalable formulation buckets points into an r-sized grid and
joins each point's 3×3 cell neighborhood against cell-resident points —
every qualifying pair is found exactly once (the replicated side is the
canonical smaller id), and the shuffle is keyed by cell, never all-pairs.
Geometry stays in exact integer arithmetic (squared distances), so the
predicate cannot drift across engines.

Reference parity note: the reference engine (a 3-stage Cassandra
extract/transform/load shell, src/main/scala — see SURVEY.md §2) has no
spatial surface; this module is part of the large-scale curation toolkit
the engine adds (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_points(
    df: DataFrame,
    id_col: str,
    grid: int = 1000,
    salt_x: str = "sx",
    salt_y: str = "sy",
) -> DataFrame:
    """Deterministic synthetic (x, y) placement on a ``grid``×``grid``
    integer lattice from the md5-prefix of the id — the same content-hash
    convention the sampling module uses, reproducible in any engine."""

    def coord(salt: str) -> F.Column:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        )
        return (h.cast("bigint") % grid).alias(salt)

    return df.select(F.col(id_col).alias("id"), coord(salt_x), coord(salt_y)).select(
        "id", F.col(salt_x).alias("x"), F.col(salt_y).alias("y")
    )


def proximity_join(points: DataFrame, radius: int) -> DataFrame:
    """All pairs of points within Euclidean distance ``radius``, as
    (id_a < id_b, dist_sq) — grid-cell bucketed, never all-pairs.

    Cell size = radius, so any qualifying pair is at most one cell apart
    on each axis. The LEFT side replicates each point to its 3×3 cell
    neighborhood (constant ×9 fan-out); the RIGHT side sits in its home
    cell; the equi-join on (cell_x, cell_y) finds pair (a, b) exactly once
    — a is replicated onto b's home cell exactly once, and the id_a < id_b
    canonicalization kills the mirror match. Distances compare as exact
    integer squares (no sqrt, no floats). At 100 TB the shuffle is keyed
    by cell; a hot cell (skewed point density) is the same salting problem
    as any hot join key — split the cell id, not the algorithm."""
    cell = int(radius)
    pts = points.select(
        "id",
        "x",
        "y",
        F.expr(f"x div {cell}").alias("cx"),
        F.expr(f"y div {cell}").alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = (
        pts.select("id", "x", "y", "cx", "cy", F.explode(offsets).alias("o"))
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("o.dx")).alias("jx"),
            (F.col("cy") + F.col("o.dy")).alias("jy"),
        )
    )
    right = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    dist_sq = dx * dx + dy * dy
    return (
        left.join(right, ["jx", "jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist_sq <= radius * radius)
        .select(
            F.col("id_a"),
            F.col("id_b"),
            dist_sq.cast("bigint").alias("dist_sq"),
        )
    )
