"""Temporal join queries over ``events`` — as-of and range joins, the
§7 extension operators the reference's join surface (one inner
equi-join, SURVEY.md §2.4) lacks entirely.

Both are oracle-checked via window/non-equi ANSI SQL (NOT DuckDB's
ASOF JOIN syntax, which is nondeterministic under timestamp ties — see
operators/asof.py for the determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward, asof_join_nearest
from ._util import t

RANGE_WINDOW_US = 600_000_000  # 10 minutes, microseconds
ATTRIB_DAYS = 7  # last-touch attribution lookback


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the same
    user's most recent view/click at-or-before it, but only if that
    touch is within the 7-day lookback — otherwise the purchase is
    'direct'. The classic warehouse attribution query, expressed as the
    row-atomic backward as-of join (operators/asof.py: the touch's
    (ts, id, type) travel as ONE struct, so a credited purchase can
    never mix fields from different touches) plus per-row window
    arithmetic. One shuffle on user_id total.

    Timestamp math is integer microseconds (unix_micros ↔ epoch_us,
    the pairing events_range_join verified) — no float time anywhere."""
    e = t(spark, sf_dir, "events")
    touches = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        "ts",
        F.col("ts").alias("touch_ts"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    j = asof_join_backward(
        purch,
        touches,
        on=["user_id"],
        ts_col="ts",
        right_value_cols=["touch_ts", "touch_id", "touch_type"],
        right_tiebreak="touch_id",
    )
    within = F.col("touch_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ATTRIB_DAYS} DAYS"
    )
    return j.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(within, F.col("touch_type")).otherwise("direct").alias(
            "attributed_to"
        ),
        F.when(within, F.col("touch_ts")).alias("touch_ts"),
        F.when(within, F.col("touch_id")).alias("touch_id"),
        F.when(
            within, F.unix_micros("ts") - F.unix_micros("touch_ts")
        ).alias("micros_since_touch"),
    )


ATTRIB_WINDOW_US = ATTRIB_DAYS * 86_400_000_000


def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — the fairness-minded twin of
    ``events_attribution``'s last-touch: every view/click in the 7-day
    window before a purchase shares the credit equally (1/k each),
    rolled up per touch type: touches involved, distinct purchases
    influenced, and total fractional credit.

    Candidate pairs come from the same bucketized interval-join shape
    as ``events_range_join`` (touches explode to two 7-day buckets,
    purchases probe their own — every qualifying pair generated exactly
    once by an equi-join, no unbounded non-equi explosion). The 1/k
    credit is fixed-point (floor(10⁹/k), summed as BIGINT — PERF 29),
    so the per-type totals are bit-exact under any partitioning."""
    e = t(spark, sf_dir, "events")
    touches = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.unix_micros("ts").alias("t_us"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("p_us"),
    )
    tb = touches.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"t_us DIV {ATTRIB_WINDOW_US}"),
                F.expr(f"t_us DIV {ATTRIB_WINDOW_US} + 1"),
            )
        ),
    )
    pb = purch.withColumn("bucket", F.expr(f"p_us DIV {ATTRIB_WINDOW_US}"))
    delta = F.col("p_us") - F.col("t_us")
    pairs = (
        tb.join(pb, ["user_id", "bucket"])
        .filter((delta >= 0) & (delta <= ATTRIB_WINDOW_US))
        .select("purchase_id", "touch_id", "touch_type")
    )
    k = F.count(F.lit(1)).over(W.partitionBy("purchase_id"))
    credited = pairs.withColumn(
        "credit_fp", F.floor(F.lit(1e9) / k.cast("double")).cast("bigint")
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("purchase_id").alias("n_purchases_influenced"),
        (F.sum("credit_fp").cast("double") / F.lit(1e9)).alias("total_credit"),
    )


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the value of the same user's most recent view at
    or before the click (NULL before any view). Backward as-of join as
    union+window — one shuffle on user_id (operators/asof.py)."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.col("value").alias("last_view_value")
    )
    return asof_join_backward(
        clicks,
        views,
        on=["user_id"],
        ts_col="ts",
        right_value_cols=["last_view_value"],
        right_tiebreak="event_id",
    )


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click conversion pairs: clicks within 10 minutes AFTER a
    view by the same user, with the exact microsecond delta.

    Range joins explode at scale if expressed as a raw non-equi join
    (every user's views × clicks). This plan bucketizes time into
    range-width buckets and equi-joins on (user, bucket) with the view
    side exploded to {bucket, bucket+1} — each candidate pair is
    generated exactly once, the shuffle is an ordinary equi-join
    shuffle, and the exact range predicate runs only on same-bucket
    candidates. This is the standard interval-join physical plan (what
    Spark's Structured Streaming interval joins do internally)."""
    e = t(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.unix_micros("ts").alias("view_us"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("click_us"),
    )
    w = F.lit(RANGE_WINDOW_US).cast("long")
    vb = v.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"view_us DIV {RANGE_WINDOW_US}"),
                F.expr(f"view_us DIV {RANGE_WINDOW_US} + 1"),
            )
        ),
    )
    cb = c.withColumn("bucket", F.expr(f"click_us DIV {RANGE_WINDOW_US}"))
    delta = F.col("click_us") - F.col("view_us")
    return (
        vb.join(cb, ["user_id", "bucket"])
        .filter((delta > 0) & (delta <= w))
        .select("view_id", "click_id", delta.alias("delta_us"))
    )


def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the same user's NEAREST error event in either
    direction (the incident-correlation probe: was a failure adjacent to
    this purchase?) with the signed direction and microsecond distance.
    Backward wins exact-distance ties (pandas merge_asof 'nearest'
    semantics). One shuffle on user_id, two window passes over the same
    partitioning (operators/asof.py: asof_join_nearest)."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", F.col("value").alias("near_error_value")
    )
    res = asof_join_nearest(
        purchases,
        errors,
        on=["user_id"],
        ts_col="ts",
        right_value_cols=["near_error_value"],
        right_tiebreak="event_id",
        matched_ts_col="_mts",
    )
    delta = F.abs(F.unix_micros("ts") - F.unix_micros("_mts"))
    direction = (
        F.when(F.col("_mts").isNull(), F.lit(None).cast("string"))
        .when(F.col("_mts") <= F.col("ts"), F.lit("backward"))
        .otherwise(F.lit("forward"))
    )
    return res.select(
        "event_id",
        "user_id",
        "ts",
        "near_error_value",
        delta.alias("delta_us"),
        direction.alias("direction"),
    )


QUERIES = {
    "events_asof_join": events_asof_join,
    "events_asof_nearest": events_asof_nearest,
    "events_range_join": events_range_join,
    "events_attribution": events_attribution,
    "events_multitouch_attribution": events_multitouch_attribution,
}

ORACLES = {
    "events_asof_join": """
        WITH u AS (
          SELECT user_id, ts, event_id AS tb, 0 AS side,
                 value AS view_value, NULL::BIGINT AS event_id_out
          FROM events WHERE event_type = 'view'
          UNION ALL
          SELECT user_id, ts, NULL::BIGINT AS tb, 1 AS side,
                 NULL::DOUBLE AS view_value, event_id AS event_id_out
          FROM events WHERE event_type = 'click'
        ),
        f AS (
          SELECT *, last_value(view_value IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, side, tb ASC NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS last_view_value
          FROM u
        )
        SELECT event_id_out AS event_id, user_id, ts, last_view_value
        FROM f WHERE side = 1
    """,
    "events_range_join": f"""
        SELECT v.event_id AS view_id, c.event_id AS click_id,
               epoch_us(c.ts) - epoch_us(v.ts) AS delta_us
        FROM events v
        JOIN events c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND epoch_us(c.ts) - epoch_us(v.ts) > 0
         AND epoch_us(c.ts) - epoch_us(v.ts) <= {RANGE_WINDOW_US}
    """,
}

# Mirror of events_attribution: same union+window backward as-of (struct
# packed for row atomicity), same 7-day CASE, integer-microsecond time.
ORACLES["events_attribution"] = f"""
    WITH u AS (
      SELECT user_id, ts, event_id AS tb, 0 AS side,
             struct_pack(touch_ts := ts, touch_id := event_id,
                         touch_type := event_type) AS tv,
             NULL::BIGINT AS purchase_id
      FROM events WHERE event_type IN ('view', 'click')
      UNION ALL
      SELECT user_id, ts, NULL::BIGINT AS tb, 1 AS side,
             CAST(NULL AS STRUCT(touch_ts TIMESTAMP, touch_id BIGINT,
                                 touch_type VARCHAR)) AS tv,
             event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ),
    f AS (
      SELECT *, last_value(tv IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, side, tb ASC NULLS LAST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS lt
      FROM u
    )
    SELECT purchase_id, user_id, ts AS purchase_ts,
           CASE WHEN lt.touch_ts >= ts - INTERVAL {ATTRIB_DAYS} DAY
                THEN lt.touch_type ELSE 'direct' END AS attributed_to,
           CASE WHEN lt.touch_ts >= ts - INTERVAL {ATTRIB_DAYS} DAY
                THEN lt.touch_ts END AS touch_ts,
           CASE WHEN lt.touch_ts >= ts - INTERVAL {ATTRIB_DAYS} DAY
                THEN lt.touch_id END AS touch_id,
           CASE WHEN lt.touch_ts >= ts - INTERVAL {ATTRIB_DAYS} DAY
                THEN epoch_us(ts) - epoch_us(lt.touch_ts)
           END AS micros_since_touch
    FROM f WHERE side = 1
"""

# Mirror of events_multitouch_attribution: the oracle uses the direct
# non-equi interval join (fine at oracle scale; the engine side stays
# bucketized), identical inclusive bounds and fixed-point 1/k credit.
ORACLES["events_multitouch_attribution"] = f"""
    WITH pairs AS (
      SELECT p.event_id AS purchase_id, tch.event_id AS touch_id,
             tch.event_type AS touch_type
      FROM events p
      JOIN events tch
        ON p.user_id = tch.user_id
       AND p.event_type = 'purchase'
       AND tch.event_type IN ('view', 'click')
       AND epoch_us(p.ts) - epoch_us(tch.ts) >= 0
       AND epoch_us(p.ts) - epoch_us(tch.ts) <= {ATTRIB_WINDOW_US}
    ),
    credited AS (
      SELECT *,
             CAST(floor(1000000000.0
                        / CAST(count(1) OVER (PARTITION BY purchase_id)
                               AS DOUBLE)) AS BIGINT) AS credit_fp
      FROM pairs
    )
    SELECT touch_type, count(1) AS n_touches,
           count(DISTINCT purchase_id) AS n_purchases_influenced,
           CAST(sum(credit_fp) AS DOUBLE) / 1000000000.0 AS total_credit
    FROM credited GROUP BY 1
"""

# Mirror of events_asof_nearest: per purchase, lateral pick of the
# minimal |Δts| error row — backward preferred on exact-distance ties,
# then the operator's per-direction tiebreak (backward: latest ts wins
# via max event_id at equal ts; forward: min event_id at equal ts).
ORACLES["events_asof_nearest"] = """
    SELECT v.event_id, v.user_id, v.ts,
           x.near_error_value, x.delta_us, x.direction
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') v
    LEFT JOIN LATERAL (
      SELECT value AS near_error_value,
             abs(epoch_us(e.ts) - epoch_us(v.ts)) AS delta_us,
             CASE WHEN e.ts <= v.ts THEN 'backward'
                  ELSE 'forward' END AS direction
      FROM events e
      WHERE e.event_type = 'error' AND e.user_id = v.user_id
      ORDER BY abs(epoch_us(e.ts) - epoch_us(v.ts)),
               (e.ts > v.ts),
               CASE WHEN e.ts <= v.ts THEN -e.event_id
                    ELSE e.event_id END
      LIMIT 1
    ) x ON TRUE
"""
