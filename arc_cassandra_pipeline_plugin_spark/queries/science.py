"""Statistical / ML-adjacent certified queries (round 4, late wave).

Time-series diagnostics (autocorrelation, rolling median, seasonal
decomposition), text readability, chi-squared keyword selection, decision
stump induction, target encoding — each expressed as exact integer
aggregation followed by a FIXED-SHAPE double expression (every +,-,*,/ and
sqrt on doubles is IEEE correctly-rounded, so identical integer inputs and
an identical expression tree produce bit-identical doubles on Spark and
DuckDB; no accumulation-order drift is possible because floats never enter
an aggregate).

Reference parity: the reference plugin (417-line Scala shell,
``src/main/scala/.../CassandraLoad.scala``) delegates all query semantics
to Spark SQL; these queries certify the delegated-analytics surface a
pipeline user would run through it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arc_cassandra_pipeline_plugin_spark.queries import register
from arc_cassandra_pipeline_plugin_spark.sources import load_table


# --------------------------------------------------------------------------
# autocorrelation of daily activity per event type (lags 1..3)
# --------------------------------------------------------------------------


@register(
    "timeseries_acf",
    category="timeseries",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, y,
         lag(y, 1) OVER w AS y1,
         lag(y, 2) OVER w AS y2,
         lag(y, 3) OVER w AS y3
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
sums AS (
  SELECT event_type,
         count(y1) AS n1, CAST(sum(y1) AS BIGINT) AS sx1,
         CAST(sum(y) FILTER (WHERE y1 IS NOT NULL) AS BIGINT) AS sy1,
         CAST(sum(y * y1) AS BIGINT) AS sxy1,
         CAST(sum(y1 * y1) AS BIGINT) AS sxx1,
         CAST(sum(y * y) FILTER (WHERE y1 IS NOT NULL) AS BIGINT) AS syy1,
         count(y2) AS n2, CAST(sum(y2) AS BIGINT) AS sx2,
         CAST(sum(y) FILTER (WHERE y2 IS NOT NULL) AS BIGINT) AS sy2,
         CAST(sum(y * y2) AS BIGINT) AS sxy2,
         CAST(sum(y2 * y2) AS BIGINT) AS sxx2,
         CAST(sum(y * y) FILTER (WHERE y2 IS NOT NULL) AS BIGINT) AS syy2,
         count(y3) AS n3, CAST(sum(y3) AS BIGINT) AS sx3,
         CAST(sum(y) FILTER (WHERE y3 IS NOT NULL) AS BIGINT) AS sy3,
         CAST(sum(y * y3) AS BIGINT) AS sxy3,
         CAST(sum(y3 * y3) AS BIGINT) AS sxx3,
         CAST(sum(y * y) FILTER (WHERE y3 IS NOT NULL) AS BIGINT) AS syy3
  FROM lagged GROUP BY event_type),
stacked AS (
  SELECT event_type, 1 AS lag, n1 AS n, sx1 AS sx, sy1 AS sy,
         sxy1 AS sxy, sxx1 AS sxx, syy1 AS syy FROM sums
  UNION ALL
  SELECT event_type, 2, n2, sx2, sy2, sxy2, sxx2, syy2 FROM sums
  UNION ALL
  SELECT event_type, 3, n3, sx3, sy3, sxy3, sxx3, syy3 FROM sums)
SELECT event_type, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
            THEN round((CAST(n AS DOUBLE) * sxy
                        - CAST(sx AS DOUBLE) * sy)
                       / sqrt((CAST(n AS DOUBLE) * sxx
                               - CAST(sx AS DOUBLE) * sx)
                              * (CAST(n AS DOUBLE) * syy
                                 - CAST(sy AS DOUBLE) * sy)), 6) END AS acf
FROM stacked
""",
)
def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-total series per event type at lags
    1–3 — the stationarity probe run before fitting any forecasting model
    on activity data.

    Daily totals are exact cents (bigint); the Pearson numerator and
    denominator are assembled from exact integer sums (n, Σx, Σy, Σxy,
    Σx², Σy²) computed in ONE pass (lag columns + FILTER aggregates — one
    event_type-keyed shuffle for the window, one for the aggregate, no
    self-join), then combined in a fixed-shape double expression whose
    every operation is IEEE correctly-rounded, so both engines produce
    bit-identical doubles. Lags index the *observed* day sequence (gaps
    collapse), which is the standard treatment for activity series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 2).over(w).alias("y2"),
        F.lag("y", 3).over(w).alias("y3"),
    )
    aggs = []
    for k in (1, 2, 3):
        yk = F.col(f"y{k}")
        present = yk.isNotNull()
        aggs += [
            F.count(yk).alias(f"n{k}"),
            F.sum(yk).cast("bigint").alias(f"sx{k}"),
            F.sum(F.when(present, F.col("y"))).cast("bigint").alias(f"sy{k}"),
            F.sum(F.col("y") * yk).cast("bigint").alias(f"sxy{k}"),
            F.sum(yk * yk).cast("bigint").alias(f"sxx{k}"),
            F.sum(F.when(present, F.col("y") * F.col("y")))
            .cast("bigint")
            .alias(f"syy{k}"),
        ]
    sums = lagged.groupBy("event_type").agg(*aggs)
    parts = [
        sums.select(
            "event_type",
            F.lit(k).cast("int").alias("lag"),
            F.col(f"n{k}").alias("n"),
            F.col(f"sx{k}").alias("sx"),
            F.col(f"sy{k}").alias("sy"),
            F.col(f"sxy{k}").alias("sxy"),
            F.col(f"sxx{k}").alias("sxx"),
            F.col(f"syy{k}").alias("syy"),
        )
        for k in (1, 2, 3)
    ]
    stacked = parts[0].unionAll(parts[1]).unionAll(parts[2])
    nd = F.col("n").cast("double")
    varx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    return stacked.select(
        "event_type",
        "lag",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.when(varx * vary > 0, F.round(num / F.sqrt(varx * vary), 6)).alias("acf"),
    )


# --------------------------------------------------------------------------
# rolling exact median of daily spend per user
# --------------------------------------------------------------------------


@register(
    "timeseries_rolling_median",
    category="timeseries",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2)
SELECT user_id, day,
       CAST(count(*) OVER w AS BIGINT) AS n_days,
       round(median(y) OVER w, 6) AS med_cents,
       CAST(min(y) OVER w AS BIGINT) AS min_cents,
       CAST(max(y) OVER w AS BIGINT) AS max_cents
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def timeseries_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-observation EXACT median of daily spend per user — the
    robust rolling center that a mean-based feature can't give you when a
    single whale day distorts the window.

    The median is the exact interpolated percentile over at most 7 integer
    cent values held in the frame (state bounded by the frame, one
    user-keyed shuffle); integer inputs make the 0.5-interpolation land on
    .0/.5 exactly in both engines. min/max ride the same frame for free."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days"),
        F.round(F.expr("percentile(y, 0.5)").over(w), 6).alias("med_cents"),
        F.min("y").over(w).cast("bigint").alias("min_cents"),
        F.max("y").over(w).cast("bigint").alias("max_cents"),
    )


# --------------------------------------------------------------------------
# additive seasonal decomposition of daily order revenue
# --------------------------------------------------------------------------


@register(
    "timeseries_seasonal_decompose",
    category="timeseries",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1),
trended AS (
  SELECT day, y,
         CASE WHEN count(*) OVER w = 7
              THEN CAST(sum(y) OVER w AS BIGINT) END AS sum7,
         CAST(isodow(day) AS INT) AS wd
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
seasonal AS (
  SELECT wd,
         CAST(sum(7 * y - sum7) AS BIGINT) AS s_num,
         CAST(7 * count(*) AS BIGINT) AS s_den
  FROM trended WHERE sum7 IS NOT NULL GROUP BY wd)
SELECT t.day, CAST(t.y AS BIGINT) AS y_cents,
       CAST(round(CAST(t.sum7 AS DOUBLE) * 1000 / 7) AS BIGINT) AS trend_mc,
       CAST(round(CAST(s.s_num AS DOUBLE) * 1000 / s.s_den) AS BIGINT)
         AS seasonal_mc,
       CASE WHEN t.sum7 IS NOT NULL
            THEN CAST(round((7 * CAST(s.s_den AS DOUBLE) * t.y
                             - CAST(s.s_den AS DOUBLE) * t.sum7
                             - 7 * CAST(s.s_num AS DOUBLE)) * 1000
                            / (7 * CAST(s.s_den AS DOUBLE))) AS BIGINT)
            END AS residual_mc
FROM trended t JOIN seasonal s ON t.wd = s.wd
""",
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily order revenue into trend
    (centered 7-day moving average), day-of-week seasonal component, and
    residual — the decomposition every revenue-anomaly monitor starts from.

    Everything is assembled from exact integers: daily revenue in cents,
    trend as the UNDIVIDED 7-day sum (only full windows), the seasonal
    component as the rational Σ(7y − sum7) / (7·count) per weekday, and
    the residual collapsed to a SINGLE division with common denominator
    7·s_den — and every emitted component is an exact integer MILLI-CENT
    (``round()`` to an integer is unambiguous across engines, unlike
    fractional-dp rounding of 15-significant-digit doubles, which diverges
    between Spark's exact-expansion HALF_UP and DuckDB's scaled nearbyint
    — measured at sf0.01). The seasonal table is
    7 rows, joined back by broadcast; the detrending window is a single
    unpartitioned pass over ~O(days) rows, bounded by the calendar, not
    the data (the same posture as the other intentional global windows
    under ``test_unpartitioned_windows_sit_above_bounded_inputs``)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "y",
        F.when(F.count(F.lit(1)).over(w) == 7, F.sum("y").over(w).cast("bigint"))
        .alias("sum7"),
        # ISO weekday (Mon=1..Sun=7) matches DuckDB's isodow.
        F.expr("CAST(weekday(day) + 1 AS INT)").alias("wd"),
    )
    seasonal = (
        trended.where(F.col("sum7").isNotNull())
        .groupBy("wd")
        .agg(
            F.sum(7 * F.col("y") - F.col("sum7")).cast("bigint").alias("s_num"),
            (F.lit(7) * F.count(F.lit(1))).cast("bigint").alias("s_den"),
        )
    )
    j = trended.join(F.broadcast(seasonal), "wd")
    s_den_d = F.col("s_den").cast("double")
    return j.select(
        "day",
        F.col("y").cast("bigint").alias("y_cents"),
        F.round(F.col("sum7").cast("double") * 1000 / 7)
        .cast("bigint")
        .alias("trend_mc"),
        F.round(F.col("s_num").cast("double") * 1000 / F.col("s_den"))
        .cast("bigint")
        .alias("seasonal_mc"),
        F.when(
            F.col("sum7").isNotNull(),
            F.round(
                (
                    7 * s_den_d * F.col("y")
                    - s_den_d * F.col("sum7")
                    - 7 * F.col("s_num").cast("double")
                )
                * 1000
                / (7 * s_den_d)
            ).cast("bigint"),
        ).alias("residual_mc"),
    )
