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


def proximity_join(
    points: DataFrame,
    radius: int,
    salt_buckets: int = 16,
    skew_threshold: int = 5000,
) -> DataFrame:
    """All pairs of points within Euclidean distance ``radius``, as
    (id_a < id_b, dist_sq) — grid-cell bucketed, never all-pairs.

    Cell size = radius, so any qualifying pair is at most one cell apart
    on each axis. The LEFT side replicates each point to its 3×3 cell
    neighborhood (constant ×9 fan-out); the RIGHT side sits in its home
    cell; the equi-join on (cell_x, cell_y) finds pair (a, b) exactly once
    — a is replicated onto b's home cell exactly once, and the id_a < id_b
    canonicalization kills the mirror match. Distances compare as exact
    integer squares (no sqrt, no floats).

    **Hot-cell salting** (``salt_buckets`` > 1): point density is rarely
    uniform — a dense cell (city-center skew) makes one (cx, cy) join key
    quadratic on a single reducer. Cells whose RESIDENT count reaches
    ``skew_threshold`` are split via the shared hot-block helper
    (:func:`~.blocking.salt_hot_blocks`, ``count_side="right"`` — the
    resident side carries the density): left rows landing on a hot key
    take a deterministic salt; right rows resident in a hot cell are
    replicated once per salt value — each (a, b) pair still meets exactly
    once (on a's salt), but the hot cell's work spreads across
    ``salt_buckets`` reducers. Cold cells join with salt 0, unreplicated.
    The pair set is identical to the unsalted join (adversarial dense-cell
    pytest asserts this); the detection probe is one map-side-combinable
    agg that doubles as the checkpoint materialization, and healthy
    layouts keep the plain 2-key join. ``salt_buckets=0`` disables."""
    from arc_cassandra_pipeline_plugin_spark.operators.blocking import salt_hot_blocks

    cell = int(radius)
    pts = points.select(
        "id",
        "x",
        "y",
        F.expr(f"x div {cell}").alias("cx"),
        F.expr(f"y div {cell}").alias("cy"),
    )
    if salt_buckets > 1:
        # lazy checkpoint: the hot-cell probe's job materializes the blocks,
        # so the probe rides the pass instead of paying a separate job
        pts = pts.localCheckpoint(eager=False)
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
    left, right, join_keys = salt_hot_blocks(
        left,
        right,
        ["jx", "jy"],
        left_salt_col="id_a",
        salt_buckets=salt_buckets,
        skew_threshold=skew_threshold,
        count_side="right",
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    dist_sq = dx * dx + dy * dy
    return (
        left.join(right, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist_sq <= radius * radius)
        .select(
            F.col("id_a"),
            F.col("id_b"),
            dist_sq.cast("bigint").alias("dist_sq"),
        )
    )
