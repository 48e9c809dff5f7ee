"""Temporal / forecasting / monitoring queries."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from chronographer_spark.data.transcripts import transcripts_from_events
from chronographer_spark.extraction.mentions import extract_mentions
from chronographer_spark.graph.materialize import materialize_event_graph

from ._shared import (
    TX_SQL,
    _duck_msb16,
    _hourly_series_sql,
    _t,
)

# ---------------------------------------------------------------------------
# Temporal joins (beyond the reference's equi-joins): as-of, interval, session
# ---------------------------------------------------------------------------


def q_asof_join_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event, the most recent prior purchase by the same
    user (backward-inclusive as-of join; union+window, one shuffle)."""
    from chronographer_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        # one row per (user, ts): ties pinned to max event_id on BOTH engines
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_id"))
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts_col="ts",
        right_cols=["p_id"],
        tie_col="p_id",
    )
    return out.select(
        "event_id",
        F.col("p_id_asof").alias("prior_purchase_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_asof").cast("timestamp"))
        ).alias("gap_us"),
    )

ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, max(event_id) AS p_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id,
       p.p_id AS prior_purchase_id,
       date_diff('microsecond', p.ts, c.ts) AS gap_us
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""

def q_interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within 24h — the time-binned band join."""
    from chronographer_spark.operators.temporal import interval_self_join

    ev = _t(spark, sf_dir, "events")
    return interval_self_join(
        ev, on=["user_id"], ts_col="ts", id_col="event_id", max_gap_seconds=86400
    )

INTERVAL_SQL = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
)
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
       b.sec - a.sec AS gap_seconds
FROM e a JOIN e b
  ON a.user_id = b.user_id AND b.sec > a.sec AND b.sec <= a.sec + 86400
"""

def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (1h) per user — lag + running sum, one shuffle."""
    from chronographer_spark.operators.temporal import sessionize

    ev = _t(spark, sf_dir, "events")
    out = sessionize(ev, on=["user_id"], ts_col="ts", tie_col="event_id", gap_seconds=3600)
    return out.select("user_id", "event_id", F.col("session_seq").cast("long").alias("session_seq"))

SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec,
         ts
  FROM events
)
SELECT user_id, event_id,
  CAST(sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 3600 THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM o
"""

def q_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen interval relations between each user's per-event-type activity
    spans [min ts, max ts] — pure comparisons on the canonical pair order,
    so labels are engine-exact."""
    from chronographer_spark.operators.temporal import allen_relations

    ev = _t(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("begin"), F.max("ts").alias("end")
    )
    return allen_relations(
        iv, on=["user_id"], id_col="event_type", begin_col="begin", end_col="end"
    )

ALLEN_SQL = """
WITH iv AS (
  SELECT user_id, event_type, min(ts) AS bg, max(ts) AS en
  FROM events GROUP BY 1, 2
)
SELECT x.user_id, x.event_type AS id_a, y.event_type AS id_b,
  CASE
    WHEN x.bg = y.bg AND x.en = y.en THEN 'equals'
    WHEN x.bg = y.bg THEN 'starts'
    WHEN x.en < y.bg THEN 'before'
    WHEN x.en = y.bg THEN 'meets'
    WHEN x.en < y.en THEN 'overlaps'
    WHEN x.en = y.en THEN 'finished_by'
    ELSE 'contains'
  END AS relation
FROM iv x JOIN iv y
  ON x.user_id = y.user_id
 AND (x.bg, x.en, x.event_type) < (y.bg, y.en, y.event_type)
"""

def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 compaction / temporal fact scoping (operators/temporal.py
    scd2_compact): per (user, event_type), the bucketed value stream
    collapses to validity intervals — one row per maximal equal-value
    run, half-open, current run open-ended. The oracle replays the
    change-point lag, the island sum, and the lead."""
    from chronographer_spark.operators.temporal import scd2_compact

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") / 25).cast("long").alias("v"),
    )
    out = scd2_compact(
        ev, keys=["user_id", "event_type"], value_col="v", tiebreak="event_id"
    )
    return out.select(
        "user_id",
        "event_type",
        "value",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("from_str"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"), F.lit("")
        ).alias("to_str"),
        "n_obs",
    )

SCD2_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, ts,
         CAST(floor(value / 25) AS BIGINT) AS v
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(v) OVER w IS NOT DISTINCT FROM v THEN 0 ELSE 1 END
              AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
isl AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
runs AS (
  SELECT user_id, event_type, island, min(v) AS value,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_obs
  FROM isl GROUP BY user_id, event_type, island
)
SELECT user_id, event_type, value,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS from_str,
       coalesce(strftime(lead(valid_from) OVER (PARTITION BY user_id,
                  event_type ORDER BY valid_from), '%Y-%m-%d %H:%M:%S'),
                '') AS to_str,
       n_obs
FROM runs
"""

# ---------------------------------------------------------------------------
# Q: burst detection (integer-exact rate anomaly per user-hour)
# ---------------------------------------------------------------------------


def q_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.temporal import burst_buckets

    ev = _t(spark, sf_dir, "events")
    return burst_buckets(ev, key="user_id", ts_col="ts", bucket="hour", factor=2)

BURST_HOURS_SQL = """
WITH c AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id, bucket_ts
),
k AS (
  SELECT user_id, CAST(sum(n_events) AS BIGINT) AS total_events,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM c GROUP BY user_id
)
SELECT c.user_id, c.bucket_ts, c.n_events, k.total_events, k.n_buckets
FROM c JOIN k USING (user_id)
WHERE c.n_events * k.n_buckets > 2 * k.total_events
"""

# ---------------------------------------------------------------------------
# Q: dialogue-aware curation (metrics gate + burst-user exclusion, composed)
# ---------------------------------------------------------------------------


def q_dialogue_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of the dialogue family into an eligibility filter:
    keep conversations long enough (n_turns >= 60) without pathological
    stalls (max gap <= ~61h), and drop every conversation of a user with
    a burst hour (runaway/replayed traffic) via a broadcast anti-join.
    Thresholds sit at the sf0.01 quartiles so the gate verifies a real
    three-way split, not a pass-through."""
    from chronographer_spark.operators.dialogue import conversation_metrics
    from chronographer_spark.operators.temporal import burst_buckets

    tx = transcripts_from_events(spark, sf_dir)
    met = conversation_metrics(tx, long_gap_s=3600)
    ev = _t(spark, sf_dir, "events")
    burst_convs = (
        burst_buckets(ev, key="user_id", ts_col="ts", bucket="hour", factor=2)
        .select(
            F.concat(
                F.lit("conv"), F.lpad(F.col("user_id").cast("string"), 6, "0")
            ).alias("conv_id")
        )
        .distinct()
    )
    return (
        met.filter(
            (F.col("n_turns") >= 60)
            & (F.col("max_gap_us") <= F.lit(220_000_000_000))
        )
        .join(F.broadcast(burst_convs), "conv_id", "left_anti")
        .select("conv_id", "n_turns", "max_gap_us")
    )

DIALOGUE_CURATION_SQL = f"""
{TX_SQL},
lagged AS (
  SELECT conv_id,
         epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM tx
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
met AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(coalesce(max(gap_us), 0) AS BIGINT) AS max_gap_us
  FROM lagged GROUP BY conv_id
),
bc AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id, bucket_ts
),
bk AS (
  SELECT user_id, CAST(sum(n_events) AS BIGINT) AS total_events,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM bc GROUP BY user_id
),
burst_convs AS (
  SELECT DISTINCT 'conv' || lpad(CAST(bc.user_id AS VARCHAR), 6, '0') AS conv_id
  FROM bc JOIN bk USING (user_id)
  WHERE bc.n_events * bk.n_buckets > 2 * bk.total_events
)
SELECT conv_id, n_turns, max_gap_us
FROM met
WHERE n_turns >= 60 AND max_gap_us <= 220000000000
  AND conv_id NOT IN (SELECT conv_id FROM burst_convs)
"""

def q_temporal_kg_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time KG snapshot: the temporal-scoping read that the SCD-2
    fact table exists for — "what did the graph believe at T" (north-star
    temporal ordering surface; the reference keeps only current values,
    make_narrative_graph's dict overwrite). Composes the gated
    scd2_compact on the same (user, event_type) fixture, then selects the
    interval covering T = 2024-01-15 00:00:00: valid_from <= T < valid_to
    (open current run counts). Half-open semantics make the snapshot
    unique per key by construction. At rest this is the partition-pruned
    read of a history table partitioned on a valid_to bucket — a filter,
    never a window."""
    from chronographer_spark.operators.temporal import scd2_compact

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") / 25).cast("long").alias("v"),
    )
    out = scd2_compact(
        ev, keys=["user_id", "event_type"], value_col="v", tiebreak="event_id"
    )
    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return out.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select(
        "user_id",
        "event_type",
        "value",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("from_str"),
        "n_obs",
    )

TEMPORAL_KG_ASOF_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, ts,
         CAST(floor(value / 25) AS BIGINT) AS v
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(v) OVER w IS NOT DISTINCT FROM v THEN 0 ELSE 1 END
              AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
isl AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
runs AS (
  SELECT user_id, event_type, island, min(v) AS value,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_obs
  FROM isl GROUP BY user_id, event_type, island
),
iv AS (
  SELECT user_id, event_type, value, valid_from, n_obs,
         lead(valid_from) OVER (PARTITION BY user_id, event_type
                                ORDER BY valid_from) AS valid_to
  FROM runs
)
SELECT user_id, event_type, value,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS from_str, n_obs
FROM iv
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
"""

# ---------------------------------------------------------------------------
# Q: coalesce per-(user, type) activity intervals (gaps-and-islands)
# ---------------------------------------------------------------------------


def q_coalesce_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event opens a 1-hour activity window; overlapping windows per
    (user, event_type) conflate to disjoint validity intervals — ~13
    events per key over 30 days yields a mix of singletons and chained
    merges."""
    from chronographer_spark.operators.temporal import coalesce_intervals

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("start"),
        (F.unix_timestamp("ts") + 3600).alias("end"),
    )
    return coalesce_intervals(
        ev, ["user_id", "event_type"], "start", "end"
    ).select("user_id", "event_type", "start", "end", "n_merged")

COALESCE_INTERVALS_SQL = """
WITH iv AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS e
  FROM events
),
flg AS (
  SELECT user_id, event_type, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
              THEN 1 ELSE 0 END AS nw
  FROM iv
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT user_id, event_type, s, e,
         sum(nw) OVER (PARTITION BY user_id, event_type ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flg
)
SELECT user_id, event_type,
       CAST(min(s) AS BIGINT) AS start,
       CAST(max(e) AS BIGINT) AS "end",
       CAST(count(*) AS BIGINT) AS n_merged
FROM isl GROUP BY user_id, event_type, island
"""

# ---------------------------------------------------------------------------
# Q: time-series resample + gap-fill (linear) per (event_type, user)
# ---------------------------------------------------------------------------


def q_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6h buckets per (event_type, user_id): ~13 events per key over 30
    days → most of the 120-slot spine is gaps, exercising interpolation,
    boundary fallbacks, and the obs path in one run."""
    from chronographer_spark.operators.temporal import resample_timeseries

    ev = _t(spark, sf_dir, "events")
    return resample_timeseries(
        ev, keys=["event_type", "user_id"], bucket_seconds=21600,
        value_scale=100, method="linear",
    ).select("event_type", "user_id", "bucket_ts", "n_events", "v_x", "fill")

RESAMPLE_GAPFILL_SQL = """
WITH obs AS (
  SELECT event_type, user_id,
         CAST(floor(epoch(ts) / 21600) AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) // count(*)
              AS BIGINT) AS v_obs
  FROM events GROUP BY 1, 2, 3
),
bounds AS (
  SELECT event_type, user_id, min(b) AS lo, max(b) AS hi
  FROM obs GROUP BY 1, 2
),
spine AS (
  SELECT event_type, user_id, unnest(generate_series(lo, hi)) AS b
  FROM bounds
),
grid AS (
  SELECT s.event_type, s.user_id, s.b, o.n_events, o.v_obs,
         CASE WHEN o.n_events IS NOT NULL THEN 'obs' ELSE 'gap' END AS fill
  FROM spine s
  LEFT JOIN obs o ON o.event_type = s.event_type
    AND o.user_id = s.user_id AND o.b = s.b
),
w AS (
  SELECT *,
    last_value(v_obs IGNORE NULLS) OVER
      (PARTITION BY event_type, user_id ORDER BY b
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN fill = 'obs' THEN b END IGNORE NULLS) OVER
      (PARTITION BY event_type, user_id ORDER BY b
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
    first_value(v_obs IGNORE NULLS) OVER
      (PARTITION BY event_type, user_id ORDER BY b
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN fill = 'obs' THEN b END IGNORE NULLS) OVER
      (PARTITION BY event_type, user_id ORDER BY b
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM grid
)
SELECT event_type, user_id, b * 21600 AS bucket_ts,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       CAST(CASE WHEN fill = 'obs' THEN v_obs
                 WHEN pv IS NULL THEN nv
                 WHEN nv IS NULL THEN pv
                 ELSE pv + (nv - pv) * (b - pb) // (nb - pb)
            END AS BIGINT) AS v_x,
       fill
FROM w
"""

# ---------------------------------------------------------------------------
# Q: CUSUM level-shift alarms over daily event-type rates
# ---------------------------------------------------------------------------


def q_cusum_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic events table is rate-uniform, so a deterministic
    level shift is injected in-query: 'click' events from Jan 21 on are
    duplicated (rate doubles for the last third). CUSUM accumulates the
    sustained surplus and alarms in the shifted tail; the other four keys
    stay silent, proving the max(0, .) reset absorbs uniform noise. The
    oracle replays the identical union + prefix-sum identity."""
    from chronographer_spark.operators.temporal import cusum_alarms

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    shift = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return cusum_alarms(
        ev.unionAll(shift), key="event_type", ts_col="ts",
        bucket="day", thr_buckets=2,
    ).select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "n_events", "s_scaled", "total_events", "n_buckets",
    )

CUSUM_LEVEL_SHIFT_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM ev GROUP BY 1, 2
),
pk AS (
  SELECT event_type, CAST(sum(n_events) AS BIGINT) AS total_events,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM cnt GROUP BY event_type
),
st AS (
  SELECT c.event_type, c.bucket_ts, c.n_events, p.total_events, p.n_buckets,
         CAST(sum(c.n_events * p.n_buckets - p.total_events) OVER w
              AS BIGINT) AS pre
  FROM cnt c JOIN pk p USING (event_type)
  WINDOW w AS (PARTITION BY c.event_type ORDER BY c.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s2 AS (
  SELECT event_type, bucket_ts, n_events, total_events, n_buckets,
         CAST(pre - least(CAST(0 AS BIGINT), min(pre) OVER
              (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              AS BIGINT) AS s_scaled
  FROM st
)
SELECT event_type, strftime(bucket_ts, '%Y-%m-%d') AS day,
       n_events, s_scaled, total_events, n_buckets
FROM s2 WHERE s_scaled > 2 * total_events
"""

# ---------------------------------------------------------------------------
# Q: inter-arrival gap histogram per event type
# ---------------------------------------------------------------------------


def q_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~2000 events per type over 30 days → mean gap ~20 min: mass
    concentrates in the lt_1h band with honest tails both ways — the
    empirical input to sessionize's threshold."""
    from chronographer_spark.operators.temporal import gap_histogram

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    return gap_histogram(ev, id_col="event_id").select(
        "event_type", "band", "n", "share_x1e6"
    )

GAP_HISTOGRAM_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gp
  FROM events
),
banded AS (
  SELECT event_type,
         CASE WHEN gp < 60 THEN 'lt_1m'
              WHEN gp < 600 THEN 'lt_10m'
              WHEN gp < 3600 THEN 'lt_1h'
              WHEN gp < 21600 THEN 'lt_6h'
              WHEN gp < 86400 THEN 'lt_1d'
              ELSE 'ge_1d' END AS band
  FROM g WHERE gp IS NOT NULL
),
c AS (
  SELECT event_type, band, CAST(count(*) AS BIGINT) AS n
  FROM banded GROUP BY 1, 2
),
t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.event_type, c.band, c.n,
       CAST(c.n * 1000000 // t.tot AS BIGINT) AS share_x1e6
FROM c JOIN t ON c.event_type = t.event_type
"""

# ---------------------------------------------------------------------------
# Q: hour-of-day x day-of-week seasonal profile
# ---------------------------------------------------------------------------


def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity rhythm of the events stream — uniform by construction, so
    every occupied cell's share hovers near 1/168; the value is the
    engine-neutral calendar arithmetic being hash-gated."""
    from chronographer_spark.operators.temporal import seasonal_profile

    ev = _t(spark, sf_dir, "events").select("ts")
    return seasonal_profile(ev).select("dow", "hour", "n", "share_x1e6")

SEASONAL_PROFILE_SQL = """
WITH c AS (
  SELECT CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS INT)
           AS dow,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS INT)
           AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT dow, hour, n,
       CAST(n * 1000000 // t.tot AS BIGINT) AS share_x1e6
FROM c CROSS JOIN t
"""

# ---------------------------------------------------------------------------
# Q: median/MAD robust outlier screen over event values
# ---------------------------------------------------------------------------


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value outliers at 3 MADs, cents quantization: the events
    value column is uniform so outliers are the distribution's tails —
    exact doubled-integer medians make the whole screen hash-gateable."""
    from chronographer_spark.operators.temporal import robust_outlier_report

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    return robust_outlier_report(
        ev, key="event_type", value_col="value", scale=100, k_mad=3
    ).select("event_type", "n", "med2", "mad2", "n_outliers", "outlier_x1e6")

VALUE_OUTLIERS_SQL = """
WITH q AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
med AS (
  SELECT event_type, CAST(median(v) * 2 AS BIGINT) AS med2
  FROM q GROUP BY event_type
),
dev AS (
  SELECT q.event_type, q.v, med.med2, abs(q.v * 2 - med.med2) AS d
  FROM q JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, CAST(median(d) * 2 AS BIGINT) AS mad2
  FROM dev GROUP BY event_type
)
SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(max(dev.med2) AS BIGINT) AS med2,
       CAST(max(mad.mad2) AS BIGINT) AS mad2,
       CAST(sum(CASE WHEN dev.d * 2 > 3 * mad.mad2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(sum(CASE WHEN dev.d * 2 > 3 * mad.mad2 THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS outlier_x1e6
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""

# ---------------------------------------------------------------------------
# Q: survival / at-risk life table over user activity spans
# ---------------------------------------------------------------------------


def q_survival_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM life-table ingredients over the events fixture: most users'
    first/last events cluster near the corpus edges (13 draws over 30
    days), so endings ramp up toward the censoring boundary — the shape a
    retention analyst expects from a bounded observation window."""
    from chronographer_spark.operators.temporal import survival_table

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return survival_table(ev, bucket="day").select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "n_starting", "n_ending", "n_at_risk", "censored", "hazard_x1e6",
    )

SURVIVAL_USERS_SQL = """
WITH span AS (
  SELECT user_id, min(date_trunc('day', ts)) AS f,
         max(date_trunc('day', ts)) AS l
  FROM events GROUP BY user_id
),
mx AS (SELECT max(l) AS maxb FROM span),
st AS (SELECT f AS b, CAST(count(*) AS BIGINT) AS n_starting
       FROM span GROUP BY f),
en AS (SELECT l AS b, CAST(count(*) AS BIGINT) AS n_ending
       FROM span GROUP BY l),
m AS (
  SELECT coalesce(st.b, en.b) AS b,
         CAST(coalesce(n_starting, 0) AS BIGINT) AS n_starting,
         CAST(coalesce(n_ending, 0) AS BIGINT) AS n_ending
  FROM st FULL OUTER JOIN en ON st.b = en.b
),
c AS (
  SELECT b, n_starting, n_ending,
         CAST(sum(n_starting) OVER w - sum(n_ending) OVER w + n_ending
              AS BIGINT) AS n_at_risk
  FROM m
  WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT strftime(b, '%Y-%m-%d') AS day, n_starting, n_ending, n_at_risk,
       CAST(CASE WHEN b = mx.maxb THEN n_ending ELSE 0 END AS BIGINT)
         AS censored,
       CAST(n_ending * 1000000 // n_at_risk AS BIGINT) AS hazard_x1e6
FROM c CROSS JOIN mx
"""

# ---------------------------------------------------------------------------
# Q: co-burst cross-correlation between event-type series
# ---------------------------------------------------------------------------


def q_coburst_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH click and view get the Jan-21 duplication, so the pair
    (click, view) co-bursts (r² strongly positive) while pairs with
    untouched keys hover near zero — the co-movement readout beside
    cusum/acf/mk on the same fixture family."""
    from chronographer_spark.operators.temporal import cross_correlation

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    shift = ev.filter(
        F.col("event_type").isin("click", "view")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return cross_correlation(
        ev.unionAll(shift), key="event_type", ts_col="ts", bucket="day"
    ).select("key_a", "key_b", "n_joint", "num", "r2_x1e6")

COBURST_XCORR_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type IN ('click', 'view')
    AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
pk AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS nb
  FROM cnt GROUP BY 1
),
dev AS (
  SELECT c.event_type AS k, c.b,
         least(CAST(1000000 AS BIGINT), greatest(CAST(-1000000 AS BIGINT),
           (c.n * p.nb - p.t) // p.t * 1000
           + (c.n * p.nb - p.t) % p.t * 1000 // p.t)) AS d
  FROM cnt c JOIN pk p USING (event_type)
),
paired AS (
  SELECT a.k AS key_a, b.k AS key_b, a.d AS da, b.d AS db
  FROM dev a JOIN dev b ON a.b = b.b AND a.k < b.k
),
rolled AS (
  SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS n_joint,
         CAST(sum(da * db) AS BIGINT) AS num,
         CAST(sum(da * da) AS BIGINT) AS da2,
         CAST(sum(db * db) AS BIGINT) AS db2
  FROM paired GROUP BY key_a, key_b
)
SELECT key_a, key_b, n_joint, num,
       CAST(CASE WHEN da2 = 0 OR db2 = 0 THEN 0
                 ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                      * (abs(num) * 1000 // da2)
                      * (abs(num) * 1000 // db2)
            END AS BIGINT) AS r2_x1e6
FROM rolled
"""

# ---------------------------------------------------------------------------
# Q: trailing 7-day rolling counts per event type
# ---------------------------------------------------------------------------


def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar RANGE frames over daily counts: the first six days ramp
    the trailing sum up (partial frames), then it plateaus — per-key,
    both trailing aggregates from ONE window."""
    from chronographer_spark.operators.temporal import rolling_counts

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    return rolling_counts(
        ev, key="event_type", ts_col="ts", bucket="day", trail_buckets=7
    ).select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "n_events", "trail_sum", "trail_active",
    )

ROLLING_7D_SQL = """
WITH cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS ep,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, strftime(b, '%Y-%m-%d') AS day, n AS n_events,
       CAST(sum(n) OVER w AS BIGINT) AS trail_sum,
       CAST(count(*) OVER w AS BIGINT) AS trail_active
FROM cnt
WINDOW w AS (PARTITION BY event_type ORDER BY ep
             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
"""

# ---------------------------------------------------------------------------
# Q: recency-weighted activity scores per user
# ---------------------------------------------------------------------------


def q_decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot asof the day after the fixture's last event (2024-01-31),
    half-life one week: ~13 events per user spread over 30 days give every
    user a distinct mix of full/half/quarter weights."""
    from chronographer_spark.operators.temporal import decayed_activity

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return decayed_activity(
        ev, key="user_id", ts_col="ts", asof="2024-01-31", halflife_days=7
    ).select("key", "n_events", "last_age_days", "score_x1e6")

DECAYED_ACTIVITY_SQL = """
SELECT user_id AS key,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(date_diff('day', CAST(ts AS DATE), DATE '2024-01-31'))
            AS BIGINT) AS last_age_days,
       CAST(sum(1000000 // (CAST(1 AS BIGINT) << CAST(least(40, greatest(0,
              CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-01-31')
                   AS BIGINT) // 7)) AS INT)))
            AS BIGINT) AS score_x1e6
FROM events GROUP BY user_id
"""

# ---------------------------------------------------------------------------
# Q: Mann-Kendall trend over daily event-type rates
# ---------------------------------------------------------------------------


def q_mk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third lens on the injected 'click' level shift (with cusum and acf):
    a step change is monotone-ish in the pair order, so click reads a
    strongly positive Kendall tau while the uniform keys straddle zero."""
    from chronographer_spark.operators.temporal import mk_trend

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    shift = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return mk_trend(
        ev.unionAll(shift), key="event_type", ts_col="ts", bucket="day"
    ).select("event_type", "n_buckets", "n_pairs", "s_stat", "tau_x1e6")

MK_TREND_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
pk AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets
  FROM cnt GROUP BY 1
),
pairs AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN c.n > a.n THEN 1
                       WHEN c.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM cnt a JOIN cnt c ON a.event_type = c.event_type AND c.b > a.b
  GROUP BY a.event_type
)
SELECT p.event_type, pk.n_buckets, p.n_pairs, p.s_stat,
       CAST(p.s_stat * 1000000 // p.n_pairs AS BIGINT) AS tau_x1e6
FROM pairs p JOIN pk ON p.event_type = pk.event_type
"""

# ---------------------------------------------------------------------------
# Q: lag-k autocorrelation of daily event-type rates
# ---------------------------------------------------------------------------


def q_acf_daily_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same injected 'click' level shift as cusum_level_shift, read through
    the stationarity lens: the shifted key's sustained deviation shows up
    as strong positive low-lag ACF while the untouched uniform keys hover
    near zero — the two operators corroborate on one fixture."""
    from chronographer_spark.operators.temporal import acf_buckets

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    shift = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return acf_buckets(
        ev.unionAll(shift), key="event_type", ts_col="ts",
        bucket="day", lags=(1, 2, 3),
    ).select("event_type", "lag", "n_buckets", "n_pairs", "acf_x1e3")

ACF_DAILY_RATES_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
pk AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS nb
  FROM cnt GROUP BY 1
),
dev AS (
  SELECT c.event_type, c.b, p.nb,
         least(CAST(1000000 AS BIGINT), greatest(CAST(-1000000 AS BIGINT),
           (c.n * p.nb - p.t) // p.t * 1000
           + (c.n * p.nb - p.t) % p.t * 1000 // p.t)) AS d
  FROM cnt c JOIN pk p USING (event_type)
),
led AS (
  SELECT event_type, nb, d,
         lead(d, 1) OVER w AS l1,
         lead(d, 2) OVER w AS l2,
         lead(d, 3) OVER w AS l3
  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY b)
),
roll AS (
  SELECT event_type, CAST(max(nb) AS BIGINT) AS n_buckets,
         CAST(sum(d * d) AS BIGINT) AS den,
         CAST(sum(d * l1) AS BIGINT) AS num1, CAST(count(l1) AS BIGINT) AS np1,
         CAST(sum(d * l2) AS BIGINT) AS num2, CAST(count(l2) AS BIGINT) AS np2,
         CAST(sum(d * l3) AS BIGINT) AS num3, CAST(count(l3) AS BIGINT) AS np3
  FROM led GROUP BY event_type
),
fan AS (
  SELECT event_type, n_buckets, den,
         unnest([
           struct_pack(lag := 1, num := num1, np := np1),
           struct_pack(lag := 2, num := num2, np := np2),
           struct_pack(lag := 3, num := num3, np := np3)
         ]) AS x
  FROM roll
)
SELECT event_type, CAST(x.lag AS INT) AS lag, n_buckets,
       CAST(x.np AS BIGINT) AS n_pairs,
       CAST(CASE WHEN den = 0 THEN 0
                 ELSE x.num * 1000 // den END AS BIGINT) AS acf_x1e3
FROM fan
"""

# ---------------------------------------------------------------------------
# Q: cohort retention matrix over daily user activity
# ---------------------------------------------------------------------------


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-granularity cohorts over the events table: users average ~13
    events across 30 days, so per-day activity probability is ~0.35 —
    retention decays from the mandatory 1e6 at age 0 to a non-trivial
    plateau, exercising the full (cohort, age) matrix."""
    from chronographer_spark.operators.temporal import cohort_retention

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return cohort_retention(ev, bucket="day").select(
        "cohort", "age", "n_active", "cohort_size", "retention_x1e6"
    )

COHORT_RETENTION_SQL = """
WITH act AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS b FROM events
),
coh AS (SELECT u, min(b) AS c FROM act GROUP BY u),
mat AS (
  SELECT c, CAST(date_diff('day', c, b) AS BIGINT) AS age,
         CAST(count(*) AS BIGINT) AS n_active
  FROM act JOIN coh USING (u) GROUP BY c, age
),
sz AS (SELECT c, n_active AS cohort_size FROM mat WHERE age = 0)
SELECT strftime(mat.c, '%Y-%m-%d') AS cohort, age, n_active,
       cohort_size,
       CAST(n_active * 1000000 // cohort_size AS BIGINT) AS retention_x1e6
FROM mat JOIN sz ON mat.c = sz.c
"""

# ---------------------------------------------------------------------------
# Q: two-sample Kolmogorov-Smirnov drift on the event value column
# ---------------------------------------------------------------------------


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer two-sample KS between even-event values and odd-event
    values shifted by +25 (pre-scaled to x1e6 integers per row) — the
    ordered-value drift lens beside type_drift's categorical TVD. The
    injected +25 shift guarantees a decisive D; the even/odd split is the
    same-distribution null underneath it."""
    from chronographer_spark.operators.temporal import ks_two_sample

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    scaled = F.floor(
        F.col("value") * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    a = ev.filter(F.col("event_id") % 2 == 0).select(scaled.alias("v"))
    b = ev.filter(F.col("event_id") % 2 == 1).select(
        (scaled + F.lit(25000000)).alias("v")
    )
    return ks_two_sample(a, b, "v")

KS_DRIFT_SQL = """
WITH av AS (
  SELECT CAST(floor(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
  FROM events WHERE event_id % 2 = 0
),
bv AS (
  SELECT CAST(floor(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) + 25000000 AS v
  FROM events WHERE event_id % 2 = 1
),
cnt AS (
  SELECT v,
         CAST(sum(ia) AS BIGINT) AS ca,
         CAST(sum(ib) AS BIGINT) AS cb
  FROM (
    SELECT v, 1 AS ia, 0 AS ib FROM av
    UNION ALL
    SELECT v, 0, 1 FROM bv
  )
  GROUP BY v
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM cnt
),
cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
  FROM cnt
),
d AS (
  SELECT v, abs(cuma * t.nb - cumb * t.na) AS dnum
  FROM cum, tot t
),
sel AS (SELECT v, dnum FROM d ORDER BY dnum DESC, v ASC LIMIT 1)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST(s.dnum AS BIGINT) AS d_num,
       CAST(CAST(s.dnum AS BIGINT) * CAST(1000000 AS BIGINT)
            // (t.na * t.nb) AS BIGINT) AS ks_x1e6,
       s.v AS at_value
FROM sel s, tot t
"""

# ---------------------------------------------------------------------------
# Q: Wasserstein-1 drift on unit-bucketed event values
# ---------------------------------------------------------------------------


def q_w1_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth-mover distance between even-event unit-bucketed values and
    odd-event values shifted +25: W1 prices the shift at ~25 units
    (w1_x1e6 ~ 25e6) where ks_drift only reports the crossing — the
    integral drift lens beside KS's max and TVD's categorical view."""
    from chronographer_spark.operators.temporal import wasserstein_two_sample

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    bucket = F.floor(F.col("value")).cast("long")
    a = ev.filter(F.col("event_id") % 2 == 0).select(bucket.alias("v"))
    b = ev.filter(F.col("event_id") % 2 == 1).select(
        (bucket + F.lit(25)).alias("v")
    )
    return wasserstein_two_sample(a, b, "v")

W1_DRIFT_SQL = """
WITH av AS (
  SELECT CAST(floor(value) AS BIGINT) AS v
  FROM events WHERE event_id % 2 = 0
),
bv AS (
  SELECT CAST(floor(value) AS BIGINT) + 25 AS v
  FROM events WHERE event_id % 2 = 1
),
cnt AS (
  SELECT v,
         CAST(sum(ia) AS BIGINT) AS ca,
         CAST(sum(ib) AS BIGINT) AS cb
  FROM (
    SELECT v, 1 AS ia, 0 AS ib FROM av
    UNION ALL
    SELECT v, 0, 1 FROM bv
  )
  GROUP BY v
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM cnt
),
cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb,
         lead(v) OVER (ORDER BY v) AS nv
  FROM cnt
),
d AS (
  SELECT abs(cuma * t.nb - cumb * t.na) * (coalesce(nv, v) - v) AS term
  FROM cum, tot t
)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST(coalesce(sum(term), 0) AS BIGINT) AS w1_num,
       -- staged quotient: same headroom contract as the operator
       CAST(CAST(coalesce(sum(term), 0) AS BIGINT)
              // greatest(t.na, 1) // greatest(t.nb, 1)
              * CAST(1000000 AS BIGINT)
            + CAST(coalesce(sum(term), 0) AS BIGINT)
              % (greatest(t.na, 1) * greatest(t.nb, 1))
              * CAST(1000000 AS BIGINT)
              // (greatest(t.na, 1) * greatest(t.nb, 1)) AS BIGINT)
         AS w1_x1e6
FROM d, tot t
GROUP BY t.na, t.nb
"""

# ---------------------------------------------------------------------------
# Q: dispersion (variance-to-mean) index per event type
# ---------------------------------------------------------------------------


def q_dispersion_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher dispersion of daily counts per type, with 'click' events on
    2024-01-21 tripled in — the clumped key reads D >> the untouched
    keys, calibrating what the burst/CUSUM detectors should assume."""
    from chronographer_spark.operators.temporal import dispersion_index

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    burst = ev.filter(
        (F.col("event_type") == "click")
        & (F.to_date("ts") == F.lit("2024-01-21"))
    )
    return dispersion_index(
        ev.unionAll(burst).unionAll(burst), "event_type", "ts", "day"
    )

DISPERSION_TYPES_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '2024-01-21'
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(n) AS BIGINT) AS total,
       CAST(sum(n * n) AS BIGINT) AS sum_sq,
       CAST(CASE WHEN count(*) <= 1 OR sum(n) = 0 THEN 0
            ELSE (count(*) * CAST(sum(n * n) AS BIGINT)
                  - CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT)) * 1000000
                 // ((count(*) - 1) * CAST(sum(n) AS BIGINT))
            END AS BIGINT) AS dispersion_x1e6
FROM cnt GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# Q: seasonally-adjusted residual anomalies per (type, dow, hour) cell
# ---------------------------------------------------------------------------


def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cells whose hourly counts spike against their OWN day-of-week x
    hour baseline: 'click' events on 2024-01-21 12:00-13:00 UTC are
    quadrupled, so exactly that cell family flags — anomalies the raw
    median screen dilutes away. Returns only flagged cells (bounded)."""
    from chronographer_spark.operators.temporal import seasonal_anomaly_report

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    spike = ev.filter(
        (F.col("event_type") == "click")
        & (F.to_date("ts") == F.lit("2024-01-21"))
        & (F.expr("CAST(unix_timestamp(ts) AS BIGINT) % 86400 DIV 3600") == 12)
    )
    fixture = ev.unionAll(spike).unionAll(spike).unionAll(spike)
    out = seasonal_anomaly_report(fixture, "event_type", "ts", k_mad=3)
    return out.filter(F.col("n_anom") > 0)

SEASONAL_ANOMALIES_SQL = """
WITH base AS (
  SELECT event_type, ts FROM events
),
spike AS (
  SELECT event_type, ts FROM base
  WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '2024-01-21'
    AND CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 = 12
),
ev AS (
  SELECT * FROM base
  UNION ALL SELECT * FROM spike
  UNION ALL SELECT * FROM spike
  UNION ALL SELECT * FROM spike
),
obs AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS INT)
           AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2, 3
),
cells AS (
  SELECT event_type, CAST((d + 4) % 7 AS INT) AS dow, hour, n FROM obs
),
med AS (
  SELECT event_type, dow, hour, CAST(median(n) * 2 AS BIGINT) AS med2
  FROM cells GROUP BY 1, 2, 3
),
dev AS (
  SELECT c.event_type, c.dow, c.hour, c.n, m.med2,
         abs(c.n * 2 - m.med2) AS dd
  FROM cells c JOIN med m USING (event_type, dow, hour)
),
mad AS (
  SELECT event_type, dow, hour, CAST(median(dd) * 2 AS BIGINT) AS mad2
  FROM dev GROUP BY 1, 2, 3
)
SELECT d.event_type, d.dow, d.hour,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(max(d.med2) AS BIGINT) AS med2,
       CAST(max(m.mad2) AS BIGINT) AS mad2,
       CAST(sum(CASE WHEN d.dd * 2 > 3 * m.mad2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anom
FROM dev d JOIN mad m USING (event_type, dow, hour)
GROUP BY 1, 2, 3
HAVING sum(CASE WHEN d.dd * 2 > 3 * m.mad2 THEN 1 ELSE 0 END) > 0
"""

# ---------------------------------------------------------------------------
# Q: Theil-Sen robust daily trend per event type
# ---------------------------------------------------------------------------


def q_theilsen_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of daily counts per type with a linear ramp
    injected on 'click' (one extra copy of each click per day-index
    step is approximated by doubling the last third of days) — the
    spiked key reads a positive slope, the stationary keys hover near
    zero; magnitude beside mk_trend's sign."""
    from chronographer_spark.operators.temporal import theilsen_trend

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    ramp = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return theilsen_trend(ev.unionAll(ramp), "event_type", "ts", "day")

THEILSEN_TYPES_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS t,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         (b.n - a.n) * CAST(1000000 AS BIGINT) // (b.t - a.t) AS slope
  FROM cnt a JOIN cnt b
    ON a.event_type = b.event_type AND a.t < b.t
),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets
  FROM cnt GROUP BY event_type
),
med AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(median(slope) * 2 AS BIGINT) AS slope2_x1e6
  FROM pairs GROUP BY event_type
)
SELECT s.event_type, s.n_buckets,
       coalesce(m.n_pairs, 0) AS n_pairs,
       coalesce(m.slope2_x1e6, 0) AS slope2_x1e6
FROM stats s LEFT JOIN med m ON m.event_type = s.event_type
"""

# ---------------------------------------------------------------------------
# Q: exact global quantiles of scaled event values
# ---------------------------------------------------------------------------


def q_global_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99/p999 of the x100-scaled value column via
    distributed rank selection — the 100TB-correct global quantile
    (no global sort, no percentile_approx error bars)."""
    from chronographer_spark.operators.temporal import exact_quantiles

    ev = _t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v")
    )
    return exact_quantiles(ev, "v", ps_x100=(50, 90, 99))

GLOBAL_QUANTILES_SQL = """
WITH q AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events
),
cnt AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY v),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cnt),
cum AS (
  SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum FROM cnt
),
ks AS (
  SELECT CAST(p AS BIGINT) AS p_x100,
         greatest((p * t.nt + 99) // 100, 1) AS k_rank
  FROM (VALUES (50), (90), (99)) AS ps(p), tot t
)
SELECT k.p_x100, CAST(k.k_rank AS BIGINT) AS k_rank,
       CAST(min(c.v) AS BIGINT) AS value
FROM cum c JOIN ks k ON c.cum >= k.k_rank
GROUP BY k.p_x100, k.k_rank
"""

# ---------------------------------------------------------------------------
# Q: Bowley quartile skewness per event type
# ---------------------------------------------------------------------------


def q_bowley_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust tail-asymmetry per type with a right tail injected on
    'click' (values re-appended at 3x): the spiked key reads positive
    Bowley skew, the symmetric keys hover near 0."""
    from chronographer_spark.operators.temporal import bowley_skew

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    tail = ev.filter(F.col("event_type") == "click").select(
        "event_type", (F.col("value") * 3).alias("value")
    )
    return bowley_skew(ev.unionAll(tail), "event_type", "value", scale=100)

BOWLEY_TYPES_SQL = """
WITH ev AS (
  SELECT event_type, value FROM events
  UNION ALL
  SELECT event_type, value * 3 FROM events WHERE event_type = 'click'
),
q AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
  FROM ev
),
per AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(quantile_cont(v, 0.25) * 4 AS BIGINT) AS q1_4,
         CAST(quantile_cont(v, 0.5) * 4 AS BIGINT) AS q2_4,
         CAST(quantile_cont(v, 0.75) * 4 AS BIGINT) AS q3_4
  FROM q GROUP BY event_type
)
SELECT event_type, n, q1_4, q2_4, q3_4,
       CAST(CASE WHEN q3_4 = q1_4 THEN 0
            ELSE (CASE WHEN q3_4 + q1_4 - 2 * q2_4 < 0 THEN -1 ELSE 1 END)
                 * (abs(q3_4 + q1_4 - 2 * q2_4) * 1000000
                    // (q3_4 - q1_4)) END AS BIGINT) AS bowley_x1e6
FROM per
"""

# ---------------------------------------------------------------------------
# Q: per-type exact quantiles via grouped rank selection
# ---------------------------------------------------------------------------


def q_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type p50/p90/p99 of x100-scaled values via grouped rank
    selection on the collapsed value table — the scale-correct per-key
    quantile (quantiles_by_type's production caveat, answered)."""
    from chronographer_spark.operators.temporal import grouped_exact_quantiles

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    return grouped_exact_quantiles(ev, "event_type", "v", ps_x100=(50, 90, 99))

GROUPED_QUANTILES_SQL = """
WITH q AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
cnt AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY event_type, v
),
cum AS (
  SELECT event_type, v,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) AS cum
  FROM cnt
),
tot AS (
  SELECT event_type, CAST(max(cum) AS BIGINT) AS nt FROM cum
  GROUP BY event_type
),
ks AS (
  SELECT event_type, CAST(p AS BIGINT) AS p_x100,
         greatest((p * nt + 99) // 100, 1) AS k_rank
  FROM tot, (VALUES (50), (90), (99)) AS ps(p)
)
SELECT c.event_type, k.p_x100, CAST(k.k_rank AS BIGINT) AS k_rank,
       CAST(min(c.v) AS BIGINT) AS value
FROM cum c JOIN ks k ON k.event_type = c.event_type AND c.cum >= k.k_rank
GROUP BY c.event_type, k.p_x100, k.k_rank
"""

# ---------------------------------------------------------------------------
# Q: winsorized mean per event type
# ---------------------------------------------------------------------------


def q_winsorized_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile-winsorized mean of the value column per type, with a
    garbage tail injected on 'click' (values x100, first 1000 clicks by
    event_id — deterministic, matching the oracle's ORDER BY) — the
    robust center barely moves while a plain mean would triple;
    completes the robust family's location estimate."""
    from chronographer_spark.operators.temporal import winsorized_mean

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    tail = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .orderBy("event_id")
        .limit(1000)
        .select("event_type", (F.col("value") * 100).alias("value"))
    )
    fixture = ev.unionAll(tail)
    return winsorized_mean(fixture, "event_type", "value", scale=100)

WINSORIZED_VALUE_SQL = """
WITH tail AS (
  SELECT event_type, value * 100 AS value
  FROM events WHERE event_type = 'click'
  ORDER BY event_id LIMIT 1000
),
ev AS (
  SELECT event_type, value FROM events
  UNION ALL
  SELECT event_type, value FROM tail
),
q AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
  FROM ev
),
bounds AS (
  SELECT event_type,
         CAST(quantile_cont(v, 0.25) * 4 AS BIGINT) AS lo4,
         CAST(quantile_cont(v, 0.75) * 4 AS BIGINT) AS hi4
  FROM q GROUP BY event_type
),
clamped AS (
  SELECT q.event_type, b.lo4, b.hi4,
         least(greatest(q.v * 4, b.lo4), b.hi4) AS c4
  FROM q JOIN bounds b USING (event_type)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       lo4, hi4,
       CAST(sum(c4) AS BIGINT) AS sum4,
       CAST(CAST(sum(c4) AS BIGINT) // (4 * count(*))
              * CAST(1000000 AS BIGINT)
            + CAST(sum(c4) AS BIGINT) % (4 * count(*))
              * CAST(1000000 AS BIGINT) // (4 * count(*)) AS BIGINT)
         AS wmean_x1e6
FROM clamped GROUP BY event_type, lo4, hi4
"""

# ---------------------------------------------------------------------------
# Q: Spearman rank correlation (value vs time) per type
# ---------------------------------------------------------------------------


def q_spearman_value_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone association between event time and value per type, with
    opposite-sign injections: 'click' values get +epoch (rank-perfectly
    increasing, r2 -> +1e6), 'view' gets -epoch (decreasing, -1e6), the
    untouched types read near zero — sign handling, tie midranks, and
    the quantized-grid spec all exercised in one readout."""
    from chronographer_spark.operators.temporal import spearman_corr

    ev = _t(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    rows = ev.select(
        "event_type",
        sec.alias("x"),
        (
            F.floor(F.col("value").cast("double") * 100 + F.lit(0.5)).cast("long")
            + F.when(F.col("event_type") == "click", sec)
            .when(F.col("event_type") == "view", -sec)
            .otherwise(F.lit(0))
        ).alias("y"),
    )
    return spearman_corr(rows, key="event_type", x_col="x", y_col="y")

SPEARMAN_VALUE_TS_SQL = """
WITH rows_t AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS x,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
         + CASE WHEN event_type = 'click' THEN CAST(floor(epoch(ts)) AS BIGINT)
                WHEN event_type = 'view' THEN -CAST(floor(epoch(ts)) AS BIGINT)
                ELSE 0 END AS y
  FROM events
),
ranked AS (
  SELECT event_type,
         rank() OVER (PARTITION BY event_type ORDER BY x)
         + count(*) OVER (PARTITION BY event_type ORDER BY x
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dx,
         rank() OVER (PARTITION BY event_type ORDER BY y)
         + count(*) OVER (PARTITION BY event_type ORDER BY y
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dy,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM rows_t
),
grid AS (
  SELECT event_type, n,
         (dx - (n + 1)) * CAST(1000000 AS BIGINT) // n AS gx,
         (dy - (n + 1)) * CAST(1000000 AS BIGINT) // n AS gy
  FROM ranked
),
m AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n,
         CAST(sum(gx * gy) AS BIGINT) AS num,
         CAST(sum(gx * gx) AS BIGINT) AS sxx,
         CAST(sum(gy * gy) AS BIGINT) AS syy
  FROM grid GROUP BY event_type
)
SELECT event_type, n, num,
       CAST(CASE WHEN sxx = 0 OR syy = 0 THEN 0 ELSE
            (CASE WHEN num < 0 THEN -1 ELSE 1 END)
            * (abs(num) // greatest(sxx // 1000, 1))
            * (abs(num) // greatest(syy // 1000, 1)) END AS BIGINT)
         AS spearman_r2_x1e6
FROM m
"""

# ---------------------------------------------------------------------------
# Q: exact-integer OLS slope of daily counts per type
# ---------------------------------------------------------------------------


def q_ols_slope_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope on the IDENTICAL ramp fixture as theilsen_types (click
    doubled from Jan 21): the least-squares readout to hold against
    Theil-Sen's median-of-slopes — click reads strongly positive, the
    untouched keys hover near zero."""
    from chronographer_spark.operators.temporal import ols_slope

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    ramp = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return ols_slope(ev.unionAll(ramp), "event_type", "ts", "day")

OLS_SLOPE_TYPES_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM cnt GROUP BY event_type
)
SELECT event_type, n_buckets,
       CAST(n_buckets * sxy - sx * sy AS BIGINT) AS num,
       CAST(n_buckets * sxx - sx * sx AS BIGINT) AS den,
       CAST(CASE WHEN n_buckets * sxx - sx * sx = 0 THEN 0 ELSE
            (n_buckets * sxy - sx * sy) // (n_buckets * sxx - sx * sx)
              * CAST(1000000 AS BIGINT)
            + (n_buckets * sxy - sx * sy) % (n_buckets * sxx - sx * sx)
              * CAST(1000000 AS BIGINT)
              // (n_buckets * sxx - sx * sx) END AS BIGINT) AS slope_x1e6
FROM m
"""

# ---------------------------------------------------------------------------
# Q: RFM segmentation of users
# ---------------------------------------------------------------------------


def q_rfm_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation over events: recency anchored to the
    corpus max timestamp, monetary in exact cents, band scores by
    pinned rank position — the whole segmentation hash-gates."""
    from chronographer_spark.operators.temporal import rfm_segments

    ev = _t(spark, sf_dir, "events")
    return rfm_segments(
        ev, key="user_id", ts_col="ts", value_col="value",
        scale=100, n_bands=5,
    )

RFM_USERS_SQL = """
WITH per AS (
  SELECT user_id,
         max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_sec,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS monetary_cents
  FROM events GROUP BY 1
),
gmax AS (SELECT max(last_sec) AS g FROM per),
base AS (
  SELECT p.user_id,
         (g.g - p.last_sec) // 86400 AS recency_days,
         p.frequency, p.monetary_cents
  FROM per p CROSS JOIN gmax g
),
ranked AS (
  SELECT *,
         CAST(count(*) OVER () AS BIGINT) AS n,
         row_number() OVER (ORDER BY recency_days DESC, user_id) AS rr,
         row_number() OVER (ORDER BY frequency ASC, user_id) AS fr,
         row_number() OVER (ORDER BY monetary_cents ASC, user_id) AS mr
  FROM base
)
SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
       frequency, monetary_cents,
       CAST(5 * (rr - 1) // n + 1 AS BIGINT) AS r_score,
       CAST(5 * (fr - 1) // n + 1 AS BIGINT) AS f_score,
       CAST(5 * (mr - 1) // n + 1 AS BIGINT) AS m_score,
       CAST((5 * (rr - 1) // n + 1) * 100 + (5 * (fr - 1) // n + 1) * 10
            + (5 * (mr - 1) // n + 1) AS BIGINT) AS rfm_code
FROM ranked
"""

# ---------------------------------------------------------------------------
# Q: pairwise Spearman correlation matrix over event features
# ---------------------------------------------------------------------------


def q_corr_matrix_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-association profile: every feature PAIR becomes one key
    of `spearman_corr` via a single explode fan (the fd-profile
    pattern), so the whole C(4,2)-pair matrix costs one scan + the two
    rank windows per pair key — completing the association trio beside
    decision_stump (label) and chi2/TVD (categorical). `boosted` is the
    planted signal: hour dominates its rank order, so (boosted~hour)
    reads near +1e6 while the organic pairs calibrate the null."""
    from chronographer_spark.operators.temporal import spearman_corr

    ev = _t(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    vc = F.floor(F.col("value").cast("double") * 100 + F.lit(0.5)).cast("long")
    hr = F.expr("CAST(unix_timestamp(ts) AS BIGINT) % 86400 DIV 3600")
    dow = F.expr("(CAST(unix_timestamp(ts) AS BIGINT) DIV 86400 + 4) % 7")
    boosted = vc + hr * 100000
    feats = [("vcents", vc), ("hour", hr), ("dow", dow), ("boosted", boosted)]
    pairs = [
        (f"{na}~{nb}", ca, cb)
        for i, (na, ca) in enumerate(feats)
        for (nb, cb) in [f for f in feats[i + 1 :]]
    ]
    fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(nm).alias("pair"),
                    ca.alias("x"),
                    cb.alias("y"),
                )
                for nm, ca, cb in pairs
            ]
        )
    )
    rows = ev.select(fan.alias("p")).select("p.pair", "p.x", "p.y")
    return spearman_corr(rows, key="pair", x_col="x", y_col="y")

CORR_MATRIX_EVENTS_SQL = """
WITH rows_t AS (
  SELECT p.pair AS pair, p.x AS x, p.y AS y
  FROM (
    SELECT CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vc,
           CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS hr,
           (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow
    FROM events
  ), unnest([
    {'pair': 'vcents~hour', 'x': vc, 'y': hr},
    {'pair': 'vcents~dow', 'x': vc, 'y': dow},
    {'pair': 'vcents~boosted', 'x': vc, 'y': vc + hr * 100000},
    {'pair': 'hour~dow', 'x': hr, 'y': dow},
    {'pair': 'hour~boosted', 'x': hr, 'y': vc + hr * 100000},
    {'pair': 'dow~boosted', 'x': dow, 'y': vc + hr * 100000}
  ]) AS t(p)
),
ranked AS (
  SELECT pair,
         rank() OVER (PARTITION BY pair ORDER BY x)
         + count(*) OVER (PARTITION BY pair ORDER BY x
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dx,
         rank() OVER (PARTITION BY pair ORDER BY y)
         + count(*) OVER (PARTITION BY pair ORDER BY y
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dy,
         count(*) OVER (PARTITION BY pair) AS n
  FROM rows_t
),
grid AS (
  SELECT pair, n,
         (dx - (n + 1)) * CAST(1000000 AS BIGINT) // n AS gx,
         (dy - (n + 1)) * CAST(1000000 AS BIGINT) // n AS gy
  FROM ranked
),
m AS (
  SELECT pair,
         CAST(max(n) AS BIGINT) AS n,
         CAST(sum(gx * gy) AS BIGINT) AS num,
         CAST(sum(gx * gx) AS BIGINT) AS sxx,
         CAST(sum(gy * gy) AS BIGINT) AS syy
  FROM grid GROUP BY pair
)
SELECT pair, n, num,
       CAST(CASE WHEN sxx = 0 OR syy = 0 THEN 0 ELSE
            (CASE WHEN num < 0 THEN -1 ELSE 1 END)
            * (abs(num) // greatest(sxx // 1000, 1))
            * (abs(num) // greatest(syy // 1000, 1)) END AS BIGINT)
         AS spearman_r2_x1e6
FROM m
"""

# ---------------------------------------------------------------------------
# Q: multi-touch attribution of purchases to click/view touches
# ---------------------------------------------------------------------------


def q_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution of purchases to the click/view
    touches in the preceding 7 days, remainder pinned to the last
    touch so total credit is exactly 1e6 per attributed conversion."""
    from chronographer_spark.operators.temporal import touch_attribution

    ev = _t(spark, sf_dir, "events")
    return touch_attribution(
        ev, key="user_id", type_col="event_type", ts_col="ts",
        id_col="event_id", conversion="purchase",
        touch_types=("click", "view"), window_seconds=7 * 86400,
    )

ATTRIBUTION_TOUCH_SQL = """
WITH base AS (
  SELECT user_id AS k, event_type AS t,
         CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id AS id
  FROM events
),
conv AS (SELECT k, s AS cs, id AS cid FROM base WHERE t = 'purchase'),
touch AS (SELECT k, t AS touch_type, s AS ts2, id AS tid FROM base
          WHERE t IN ('click', 'view')),
pairs AS (
  SELECT c.k, c.cid, t.touch_type, t.ts2, t.tid
  FROM conv c JOIN touch t ON t.k = c.k
  WHERE t.ts2 <= c.cs AND c.cs - t.ts2 <= 7 * 86400 AND t.tid <> c.cid
),
credited AS (
  SELECT touch_type, cid,
         CAST(1000000 AS BIGINT)
           // count(*) OVER (PARTITION BY k, cid)
         + CASE WHEN row_number() OVER (PARTITION BY k, cid
                                        ORDER BY ts2 DESC, tid DESC) = 1
                THEN CAST(1000000 AS BIGINT)
                     % count(*) OVER (PARTITION BY k, cid)
                ELSE 0 END AS credit,
         CASE WHEN row_number() OVER (PARTITION BY k, cid
                                      ORDER BY ts2 ASC, tid ASC) = 1
              THEN 1 ELSE 0 END AS is_first,
         CASE WHEN row_number() OVER (PARTITION BY k, cid
                                      ORDER BY ts2 DESC, tid DESC) = 1
              THEN 1 ELSE 0 END AS is_last
  FROM pairs
),
per_type AS (
  SELECT touch_type,
         CAST(count(*) AS BIGINT) AS n_touches,
         CAST(count(DISTINCT cid) AS BIGINT) AS n_conversions_touched,
         CAST(sum(credit) AS BIGINT) AS credit_x1e6,
         CAST(sum(is_first) AS BIGINT) AS first_touch,
         CAST(sum(is_last) AS BIGINT) AS last_touch
  FROM credited GROUP BY 1
),
unattr AS (
  SELECT '__unattributed__' AS touch_type,
         CAST(0 AS BIGINT) AS n_touches,
         CAST(count(*) AS BIGINT) AS n_conversions_touched,
         CAST(0 AS BIGINT) AS credit_x1e6,
         CAST(0 AS BIGINT) AS first_touch,
         CAST(0 AS BIGINT) AS last_touch
  FROM conv WHERE cid NOT IN (SELECT DISTINCT cid FROM credited)
)
SELECT * FROM per_type UNION ALL SELECT * FROM unattr
"""

# ---------------------------------------------------------------------------
# Q: peak concurrent 1-hour windows per event type
# ---------------------------------------------------------------------------


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneously-open 1-hour windows per event type and the
    earliest second it is hit — the capacity readout over the same
    interval fixture as wis_sessions."""
    from chronographer_spark.operators.temporal import peak_concurrency

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("s"),
        (F.unix_timestamp("ts").cast("long") + 3600).alias("e"),
    )
    return peak_concurrency(
        ev, key="event_type", start_col="s", end_col="e", id_col="event_id"
    )

PEAK_CONCURRENCY_SQL = """
WITH base AS (
  SELECT event_type AS k,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS e,
         event_id AS id
  FROM events
),
tagged AS (
  SELECT k, s AS at, 1 AS d, id FROM base
  UNION ALL
  SELECT k, e AS at, -1 AS d, id FROM base
),
run AS (
  SELECT k, at, d,
         sum(d) OVER (PARTITION BY k ORDER BY at, d, id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c
  FROM tagged
),
mx AS (
  SELECT *, max(c) OVER (PARTITION BY k) AS m FROM run
)
SELECT k AS event_type,
       CAST(count(*) / 2 AS BIGINT) AS n_intervals,
       CAST(max(c) AS BIGINT) AS peak,
       CAST(min(CASE WHEN c = m THEN at END) AS BIGINT) AS peak_at
FROM mx
GROUP BY k
"""

# ---------------------------------------------------------------------------
# Q: growth accounting of active users per 30-day period
# ---------------------------------------------------------------------------


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAU bridge over events: per 30-epoch-day period, active users
    split into new / retained / resurrected, churn attributed into the
    first inactive period — the bridge identities reconcile exactly."""
    from chronographer_spark.operators.temporal import growth_accounting

    ev = _t(spark, sf_dir, "events")
    return growth_accounting(ev, key="user_id", ts_col="ts", period="month")

GROWTH_ACCOUNTING_SQL = """
WITH act AS (
  SELECT DISTINCT user_id AS k,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 // 30 AS p
  FROM events
),
lagged AS (
  SELECT k, p,
         lag(p) OVER (PARTITION BY k ORDER BY p) AS prev,
         lead(p) OVER (PARTITION BY k ORDER BY p) AS nxt
  FROM act
),
classed AS (
  SELECT p,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(sum(CASE WHEN p - prev = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(sum(CASE WHEN p - prev > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resurrected
  FROM lagged GROUP BY p
),
gmax AS (SELECT max(p) AS g FROM act),
churned AS (
  SELECT p + 1 AS p, CAST(count(*) AS BIGINT) AS n_churned
  FROM lagged CROSS JOIN gmax
  WHERE (nxt IS NULL OR nxt - p > 1) AND p + 1 <= gmax.g
  GROUP BY p + 1
)
SELECT coalesce(c.p, ch.p) AS period,
       CAST(coalesce(c.n_active, 0) AS BIGINT) AS n_active,
       CAST(coalesce(c.n_new, 0) AS BIGINT) AS n_new,
       CAST(coalesce(c.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(coalesce(c.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
FROM classed c FULL OUTER JOIN churned ch ON ch.p = c.p
"""

# ---------------------------------------------------------------------------
# Q: running-maximum record counts per user
# ---------------------------------------------------------------------------


def q_record_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict record counts of value cents per user in event order —
    exchangeable values read ~H(n) ≈ ln n records, the zero-parameter
    trend null."""
    from chronographer_spark.operators.temporal import record_counts

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
        F.col("event_id").alias("id"),
    )
    return record_counts(ev, key="user_id", ts_col="ts", val_col="v",
                         id_col="id")

RECORD_COUNTS_SQL = """
WITH rows_t AS (
  SELECT user_id AS k,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                     event_id) AS pos,
         CASE WHEN CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
                   > coalesce(max(CAST(floor(CAST(value AS DOUBLE) * 100
                                              + 0.5) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                       event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING),
                        CAST(-4611686018427387904 AS BIGINT))
              THEN 1 ELSE 0 END AS rec
  FROM events
)
SELECT k AS user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(rec) AS BIGINT) AS n_records,
       CAST(max(CASE WHEN rec = 1 THEN pos END) AS BIGINT)
         AS last_record_pos
FROM rows_t GROUP BY k
"""

def q_changepoint_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM maximum-deviation changepoint per event type with a planted
    level shift: 'click' values gain +500.00 from 2024-01-15 on, so the
    click key's gmax spikes at the boundary while untouched types
    calibrate the no-shift null. The split is found on exact integer
    cents — no per-key float mean ever exists."""
    from chronographer_spark.operators.temporal import changepoint_scan

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        (
            F.col("value")
            + F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.lit("2024-01-15").cast("timestamp")),
                500.0,
            ).otherwise(0.0)
        ).alias("value"),
    )
    return changepoint_scan(ev)

CHANGEPOINT_SCAN_SQL = """
WITH ev AS (
  SELECT event_type AS key, event_id, ts,
         CAST(floor((value + CASE WHEN event_type = 'click'
                                   AND ts >= TIMESTAMP '2024-01-15'
                              THEN 500.0 ELSE 0.0 END) * 100 + 0.5)
              AS BIGINT) AS v
  FROM events
),
pref AS (
  SELECT key, event_id AS split_id,
         CAST(row_number() OVER w AS BIGINT) AS split_i,
         CAST(sum(v) OVER w AS BIGINT) AS si,
         CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS n,
         CAST(sum(v) OVER (PARTITION BY key) AS BIGINT) AS sn
  FROM ev
  WINDOW w AS (PARTITION BY key ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
stat AS (
  SELECT key, n, split_i, split_id,
         CAST(abs(n * si - split_i * sn) AS BIGINT) AS gmax
  FROM pref WHERE split_i < n
)
SELECT key, n, split_i, split_id, gmax
FROM stat
QUALIFY row_number() OVER (
  PARTITION BY key ORDER BY gmax DESC, split_i ASC) = 1
"""

def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano-factor burstiness per event type over hourly buckets with a
    planted burst: error timestamps are floored to 8-hour boundaries, so
    every error bucket carries ~8 hours of mass and 7 of 8 are empty —
    IoD reads >> 1 while organic near-uniform types calibrate ~1."""
    from chronographer_spark.operators.temporal import fano_burstiness

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_type") == "error",
            F.expr(
                "timestamp_seconds(CAST(unix_timestamp(ts) AS BIGINT)"
                " DIV 28800 * 28800)"
            ),
        )
        .otherwise(F.col("ts"))
        .alias("ts"),
    )
    return fano_burstiness(ev, bucket_seconds=3600)

FANO_BURSTINESS_SQL = """
WITH ev AS (
  SELECT event_type AS key,
         CASE WHEN event_type = 'error'
              THEN CAST(floor(epoch(ts)) AS BIGINT) // 28800 * 28800
              ELSE CAST(floor(epoch(ts)) AS BIGINT) END // 3600 AS b
  FROM events
),
counts AS (
  SELECT key, b, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY key, b
),
rolled AS (
  SELECT key,
         CAST(max(b) - min(b) + 1 AS BIGINT) AS n_buckets_span,
         CAST(count(*) AS BIGINT) AS n_active_buckets,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(c * c) AS BIGINT) AS sum_sq
  FROM counts GROUP BY key
)
SELECT key, n_buckets_span, n_active_buckets, n_events, sum_sq,
       CAST((n_buckets_span * sum_sq - n_events * n_events)
              // (n_buckets_span * n_events) * CAST(1000000 AS BIGINT)
            + (n_buckets_span * sum_sq - n_events * n_events)
              % (n_buckets_span * n_events) * CAST(1000000 AS BIGINT)
              // (n_buckets_span * n_events) AS BIGINT) AS iod_x1e6
FROM rolled
"""

# ---------------------------------------------------------------------------
# Q: Kaplan-Meier survival curves per event type (censoring-aware)
# ---------------------------------------------------------------------------


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier per event type over per-user activity spans:
    t = seconds between a user's first and last event of the type,
    observed = the user logged >= 3 such events (others are censored —
    still under observation). Exact-integer curve in 16*log2 units via
    the msb16 device; exhausted risk sets (S hits exact 0) emit NULL."""
    from chronographer_spark.operators.temporal import kaplan_meier

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", F.unix_timestamp("ts").alias("sec")
    )
    per = ev.groupBy("event_type", "user_id").agg(
        (F.max("sec") - F.min("sec")).cast("long").alias("t"),
        (F.count(F.lit(1)) >= 3).cast("long").alias("obs"),
    )
    out = kaplan_meier(per, "event_type", "t", "obs")
    return out.select(
        F.col("key").alias("event_type"), "t", "n_risk", "d", "c",
        "log2_surv_x16", "cumhaz_x1e6",
    )

KAPLAN_MEIER_SQL = f"""
WITH per AS (
  SELECT event_type AS key, user_id,
         CAST(floor(epoch(max(ts))) AS BIGINT)
           - CAST(floor(epoch(min(ts))) AS BIGINT) AS t,
         CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS obs
  FROM events GROUP BY event_type, user_id
),
dd AS (
  SELECT key, t, CAST(sum(obs) AS BIGINT) AS d,
         CAST(sum(1 - obs) AS BIGINT) AS c
  FROM per GROUP BY key, t
),
risk AS (
  SELECT *, CAST(sum(d + c) OVER (
    PARTITION BY key ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS n_risk
  FROM dd
),
st AS (
  SELECT *, CASE WHEN d = 0 THEN CAST(0 AS BIGINT)
                 WHEN n_risk > d THEN -(CAST(
                   {_duck_msb16('n_risk * 1048576 // (n_risk - d)')}
                   AS BIGINT) - 320)
                 ELSE CAST(0 AS BIGINT) END AS step
  FROM risk
),
wk AS (
  SELECT *, max(CASE WHEN d >= n_risk AND d > 0 THEN 1 ELSE 0 END) OVER (
              PARTITION BY key ORDER BY t ASC ROWS UNBOUNDED PRECEDING)
              AS dead,
            sum(step) OVER (
              PARTITION BY key ORDER BY t ASC ROWS UNBOUNDED PRECEDING)
              AS cum,
            sum(d * 1000000 // n_risk) OVER (
              PARTITION BY key ORDER BY t ASC ROWS UNBOUNDED PRECEDING)
              AS haz
  FROM st
)
SELECT key AS event_type, t, n_risk, d, c,
       CASE WHEN dead = 1 THEN NULL ELSE CAST(cum AS BIGINT) END
         AS log2_surv_x16,
       CAST(haz AS BIGINT) AS cumhaz_x1e6
FROM wk
"""

# ---------------------------------------------------------------------------
# Q: two-group log-rank test per event type (planted survival difference)
# ---------------------------------------------------------------------------


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test per event type between user-parity groups, with a
    PLANTED survival difference: for 'error', odd users' activity spans
    are quartered (they 'churn' 4x sooner), so its z2_log2_x16 reads far
    above the 16*log2(3.84) ~ 31 five-percent line while parity splits
    of the untouched types calibrate the null."""
    from chronographer_spark.operators.temporal import logrank_test

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", F.unix_timestamp("ts").alias("sec")
    )
    per = ev.groupBy("event_type", "user_id").agg(
        (F.max("sec") - F.min("sec")).cast("long").alias("t0"),
        (F.count(F.lit(1)) >= 3).cast("long").alias("obs"),
    )
    per = per.select(
        "event_type",
        F.expr(
            "CASE WHEN event_type = 'error' AND user_id % 2 = 1"
            " THEN t0 DIV 4 ELSE t0 END"
        ).alias("t"),
        "obs",
        F.expr("user_id % 2").cast("long").alias("g"),
    )
    out = logrank_test(per, "event_type", "t", "obs", "g")
    return out.select(
        F.col("key").alias("event_type"),
        "o1",
        "e1_x1e6",
        "v_x1e6",
        "diff_x1e6",
        "z2_log2_x16",
    )

LOGRANK_TEST_SQL = f"""
WITH per0 AS (
  SELECT event_type AS key, user_id,
         CAST(floor(epoch(max(ts))) AS BIGINT)
           - CAST(floor(epoch(min(ts))) AS BIGINT) AS t0,
         CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS obs
  FROM events GROUP BY event_type, user_id
),
per AS (
  SELECT key,
         CASE WHEN key = 'error' AND user_id % 2 = 1 THEN t0 // 4
              ELSE t0 END AS t,
         obs, CAST(user_id % 2 AS BIGINT) AS g
  FROM per0
),
dd AS (
  SELECT key, t,
         CAST(sum(CASE WHEN g = 0 THEN obs ELSE 0 END) AS BIGINT) AS d0,
         CAST(sum(CASE WHEN g = 0 THEN 1 - obs ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN g = 1 THEN obs ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN g = 1 THEN 1 - obs ELSE 0 END) AS BIGINT) AS c1
  FROM per GROUP BY key, t
),
risk AS (
  SELECT *,
         CAST(sum(d0 + c0) OVER (
           PARTITION BY key ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS n0,
         CAST(sum(d1 + c1) OVER (
           PARTITION BY key ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS n1
  FROM dd
),
terms AS (
  SELECT key, d1,
         CASE WHEN d0 + d1 > 0
              THEN (d0 + d1) * n1 * 1000000 // (n0 + n1)
              ELSE CAST(0 AS BIGINT) END AS e1_term,
         CASE WHEN d0 + d1 > 0 AND n0 + n1 > 1 THEN
              (((d0 + d1) * n1 * 1000 // (n0 + n1)) * n0 * 1000
               // (n0 + n1)) * (n0 + n1 - d0 - d1) // (n0 + n1 - 1)
              ELSE CAST(0 AS BIGINT) END AS v_term
  FROM risk
),
agg AS (
  SELECT key, CAST(sum(d1) AS BIGINT) AS o1,
         CAST(sum(e1_term) AS BIGINT) AS e1_x1e6,
         CAST(sum(v_term) AS BIGINT) AS v_x1e6
  FROM terms GROUP BY key
)
SELECT key AS event_type, o1, e1_x1e6, v_x1e6,
       CAST(o1 * 1000000 - e1_x1e6 AS BIGINT) AS diff_x1e6,
       CAST(2 * {_duck_msb16('abs(o1 * 1000000 - e1_x1e6)')}
            - {_duck_msb16('greatest(v_x1e6, CAST(1 AS BIGINT))')}
            - 318 AS BIGINT) AS z2_log2_x16
FROM agg
"""

# ---------------------------------------------------------------------------
# Q: Shewhart / Western Electric control-chart flags per event type
# ---------------------------------------------------------------------------


def q_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control-chart monitoring per event type with two planted
    late-period shifts (last 10% of event_ids): 'click' +300.00 spikes
    past the 3-sigma line (rule1), 'view' +150.00 is a sustained small
    shift the run rule catches (rule2, 9 consecutive above-mean).
    Baselines freeze on each type's clean first half. Emits only
    flagged points (rule1 or rule2) — the alert stream."""
    from chronographer_spark.operators.temporal import control_chart_flags

    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("event_id").cast("long").alias("__mx"))
    x = (
        ev.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            F.col("event_id").cast("long").alias("event_id"),
            F.expr(
                "CAST(floor(value * 100 + 0.5) AS BIGINT)"
                " + CASE WHEN event_type = 'click'"
                "        AND event_id > __mx * 9 DIV 10 THEN 30000"
                "   WHEN event_type = 'view'"
                "        AND event_id > __mx * 9 DIV 10 THEN 15000"
                "   ELSE 0 END"
            ).alias("cents"),
        )
    )
    out = control_chart_flags(x, "event_type", "event_id", "cents")
    return out.filter(F.col("rule1") | F.col("rule2")).select(
        F.col("key").alias("event_type"), "o", "x", "side", "rule1", "rule2"
    )

CONTROL_CHART_SQL = """
WITH mx AS (SELECT CAST(max(event_id) AS BIGINT) AS m FROM events),
pts AS (
  SELECT event_type AS key, CAST(event_id AS BIGINT) AS o,
         CAST(floor(value * 100 + 0.5) AS BIGINT)
           + CASE WHEN event_type = 'click'
                  AND event_id > (SELECT m FROM mx) * 9 // 10 THEN 30000
             WHEN event_type = 'view'
                  AND event_id > (SELECT m FROM mx) * 9 // 10 THEN 15000
             ELSE 0 END AS x
  FROM events
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY key ORDER BY o) AS BIGINT)
              AS rn,
            CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS cnt
  FROM pts
),
stats AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS q
  FROM ranked WHERE rn <= cnt // 2 GROUP BY key
),
dev AS (
  SELECT r.key, r.o, r.x,
         CAST(CASE WHEN st.n * r.x - st.s > 0 THEN 1
                   WHEN st.n * r.x - st.s < 0 THEN -1 ELSE 0 END AS BIGINT)
           AS side,
         (CAST(st.n AS HUGEINT) * r.x - st.s)
           * (CAST(st.n AS HUGEINT) * r.x - st.s)
           > 9 * (CAST(st.n AS HUGEINT) * st.q
                  - CAST(st.s AS HUGEINT) * st.s) AS rule1
  FROM ranked r JOIN stats st ON r.key = st.key
),
runs AS (
  SELECT *,
         (count(*) OVER w9 >= 9
          AND min(side) OVER w9 = max(side) OVER w9
          AND side <> 0) AS rule2
  FROM dev
  WINDOW w9 AS (PARTITION BY key ORDER BY o
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
)
SELECT key AS event_type, o, x, side, rule1, rule2
FROM runs WHERE rule1 OR rule2
"""

# ---------------------------------------------------------------------------
# Q: Haar wavelet multiscale energy over hourly event-type series
# ---------------------------------------------------------------------------


def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar energy per event type over the hourly count
    series (absolute hour index, 6 levels = up to the 64-hour scale):
    the per-resolution breakdown that says which scale carries each
    type's variance — the multiscale companion to fano_burstiness."""
    from chronographer_spark.operators.temporal import haar_energy

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_timestamp(ts) DIV 3600").alias("hr")
    )
    series = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return haar_energy(series, "event_type", "hr", "c", levels=6).select(
        F.col("key").alias("event_type"), "level", "n_blocks",
        "nonzero_blocks", "energy",
    )

HAAR_ENERGY_SQL = """
WITH series AS (
  SELECT event_type AS key,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS idx,
         CAST(count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
fan AS (
  SELECT key, l, idx // (CAST(1 AS BIGINT) << l) AS block,
         v * (CASE WHEN (idx // (CAST(1 AS BIGINT) << (l - 1))) % 2 = 0
              THEN 1 ELSE -1 END) AS sv
  FROM series, (SELECT unnest(range(1, 7)) AS l)
),
det AS (
  SELECT key, l AS level, block, CAST(sum(sv) AS BIGINT) AS d
  FROM fan GROUP BY key, l, block
)
SELECT key AS event_type, level,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN d <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS nonzero_blocks,
       CAST(sum(d * d) AS BIGINT) AS energy
FROM det GROUP BY key, level
"""

# ---------------------------------------------------------------------------
# Q: Hill tail-index contrast — Pareto-by-construction vs bounded values
# ---------------------------------------------------------------------------


def q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator (k=50) on two populations: 'pareto' =
    1e6 DIV (1 + custkey % 1000) — the inverse-uniform construction IS
    Pareto(alpha=1), so alpha_x1e3 reads ~1000 — vs the bounded
    'balances' population whose truncated tail reads a much larger
    alpha. The is-my-metric-heavy-tailed readout behind every skew
    mitigation in this repo."""
    from chronographer_spark.operators.temporal import hill_tail_index

    c = _t(spark, sf_dir, "customer")
    pops = c.select(
        F.lit("pareto").alias("pop"),
        F.expr("CAST(1000000 DIV (1 + c_custkey % 1000) AS BIGINT)").alias(
            "v"
        ),
    ).unionByName(
        c.select(
            F.lit("balances").alias("pop"),
            F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").alias("v"),
        )
    )
    return hill_tail_index(pops, "pop", "v", k=50).select(
        F.col("key").alias("pop"), "k", "x_k1", "hill_log2_x16e3",
        "alpha_x1e3",
    )

HILL_TAIL_SQL = f"""
WITH pops AS (
  SELECT 'pareto' AS key,
         CAST(1000000 // (1 + c_custkey % 1000) AS BIGINT) AS v
  FROM customer
  UNION ALL
  SELECT 'balances', CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
  FROM customer
),
pos AS (SELECT key, v FROM pops WHERE v > 0),
topk AS (
  SELECT key, v,
         CAST(row_number() OVER (PARTITION BY key ORDER BY v DESC)
              AS BIGINT) AS rn
  FROM pos QUALIFY rn <= 51
),
wk AS (
  SELECT key, v, rn,
         CAST(min(v) OVER (PARTITION BY key) AS BIGINT) AS x_k1,
         CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS nk
  FROM topk
),
agg AS (
  SELECT key, max(x_k1) AS x_k1,
         CAST(sum({_duck_msb16('v * 1048576 // x_k1')} - 320) AS BIGINT) AS s
  FROM wk WHERE nk = 51 AND rn <= 50 GROUP BY key
)
SELECT key AS pop, CAST(50 AS BIGINT) AS k, x_k1,
       CAST(s // 50 * 1000 + s % 50 * 1000 // 50 AS BIGINT)
         AS hill_log2_x16e3,
       CAST(23083000 // greatest(s // 50 * 1000 + s % 50 * 1000 // 50,
                                 CAST(1 AS BIGINT)) AS BIGINT) AS alpha_x1e3
FROM agg
"""

def q_ses_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=1/2 exponential-smoothing level + one-step residual over each
    event type's hourly count series (temporal.ses_forecast): bit-shift
    weights over the last 16 observations, exact integers, one window
    shuffle."""
    from chronographer_spark.operators.temporal import ses_forecast

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type", F.expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS BIGINT)").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    return ses_forecast(series, "event_type", "hr", "c", window=16)

def _ses_sql() -> str:
    terms = []
    pres = []
    for i in range(16):
        wt = 1 << (15 - i)
        lag = "x" if i == 0 else f"lag(x, {i}) OVER w"
        terms.append(f"CASE WHEN {lag} IS NOT NULL THEN ({lag}) * {wt} ELSE 0 END")
        pres.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0 END")
    num = " + ".join(terms)
    den = " + ".join(pres)
    return f"""
WITH {_hourly_series_sql().strip().rstrip()},
lagged AS (
  SELECT key, o, x,
         CAST({num} AS BIGINT) AS nm,
         CAST({den} AS BIGINT) AS dn,
         lead(x) OVER w AS nxt
  FROM series
  WINDOW w AS (PARTITION BY key ORDER BY o)
)
SELECT key, o, x, CAST(nm // dn AS BIGINT) AS ses,
       CAST(nxt - nm // dn AS BIGINT) AS next_err
FROM lagged
"""

SES_HOURLY_SQL = _ses_sql()

def q_page_hinkley_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift alarms over the hourly count series
    (temporal.page_hinkley, train_n=8, λ=5): deviation accumulated
    against each key's trained baseline, everything scaled by the
    training count — no float mean, one shuffle."""
    from chronographer_spark.operators.temporal import page_hinkley

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type", F.expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS BIGINT)").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    return page_hinkley(series, "event_type", "hr", "c", train_n=8, lam=5)

PAGE_HINKLEY_SQL = f"""
WITH {_hourly_series_sql().strip()},
rn AS (
  SELECT key, o, x, row_number() OVER (PARTITION BY key ORDER BY o) AS rn
  FROM series
),
tr AS (
  SELECT key, CAST(sum(x) AS BIGINT) AS s_tr, CAST(count(*) AS BIGINT) AS n_tr
  FROM rn WHERE rn <= 8 GROUP BY key
),
post AS (
  SELECT r.key, r.o, r.x, t.s_tr, t.n_tr,
         r.x * t.n_tr - t.s_tr - 0 * t.n_tr AS inc
  FROM rn r JOIN tr t USING (key) WHERE r.rn > 8
),
cum1 AS (
  SELECT key, o, x, n_tr, sum(inc) OVER w AS ph
  FROM post
  WINDOW w AS (PARTITION BY key ORDER BY o
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cum AS (
  SELECT key, o, x, n_tr, ph, min(ph) OVER w2 AS mn
  FROM cum1
  WINDOW w2 AS (PARTITION BY key ORDER BY o
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT key, o, x,
       CAST(ph - mn AS BIGINT) AS gap_scaled,
       CAST(CASE WHEN ph - mn > 5 * n_tr THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM cum
"""

def q_mase_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE of the SES forecaster on the hourly count series
    (temporal.forecast_mase): exact integer ratio of model vs
    random-walk absolute-error sums per event type."""
    from chronographer_spark.operators.temporal import forecast_mase

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS BIGINT)"
        ).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return forecast_mase(series, "event_type", "hr", "c", window=16)

def _mase_sql() -> str:
    terms = []
    pres = []
    for i in range(16):
        wt = 1 << (15 - i)
        lag = "x" if i == 0 else f"lag(x, {i}) OVER w"
        terms.append(
            f"CASE WHEN {lag} IS NOT NULL THEN ({lag}) * {wt} ELSE 0 END"
        )
        pres.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0 END")
    num = " + ".join(terms)
    den = " + ".join(pres)
    return f"""
WITH {_hourly_series_sql().strip()},
lagged AS (
  SELECT key, o, x,
         CAST({num} AS BIGINT) AS nm,
         CAST({den} AS BIGINT) AS dn,
         lead(x) OVER w AS nxt
  FROM series
  WINDOW w AS (PARTITION BY key ORDER BY o)
)
SELECT key,
       CAST(count(*) AS BIGINT) AS n_evals,
       CAST(sum(abs(nxt - nm // dn)) AS BIGINT) AS mae_model_sum,
       CAST(sum(abs(nxt - x)) AS BIGINT) AS mae_naive_sum,
       CAST(CASE WHEN sum(abs(nxt - x)) > 0 THEN
         sum(abs(nxt - nm // dn)) * 1000000 // sum(abs(nxt - x))
       END AS BIGINT) AS mase_x1e6
FROM lagged
WHERE nxt IS NOT NULL
GROUP BY key
"""

MASE_HOURLY_SQL = _mase_sql()

def q_durbin_watson_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson on the SES one-step residuals per event type
    (temporal.durbin_watson over temporal.ses_forecast): is the smoother
    leaving autocorrelated errors."""
    from chronographer_spark.operators.temporal import durbin_watson, ses_forecast

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS BIGINT)"
        ).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    ses = ses_forecast(series, "event_type", "hr", "c", window=16)
    return durbin_watson(ses, "key", "o", "next_err")

def _durbin_sql() -> str:
    terms = []
    pres = []
    for i in range(16):
        wt = 1 << (15 - i)
        lag = "x" if i == 0 else f"lag(x, {i}) OVER w"
        terms.append(
            f"CASE WHEN {lag} IS NOT NULL THEN ({lag}) * {wt} ELSE 0 END"
        )
        pres.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0 END")
    num = " + ".join(terms)
    den = " + ".join(pres)
    return f"""
WITH {_hourly_series_sql().strip()},
lagged AS (
  SELECT key, o, x,
         CAST({num} AS BIGINT) AS nm,
         CAST({den} AS BIGINT) AS dn,
         lead(x) OVER w AS nxt
  FROM series
  WINDOW w AS (PARTITION BY key ORDER BY o)
),
resid AS (
  SELECT key, o, CAST(nxt - nm // dn AS BIGINT) AS e
  FROM lagged WHERE nxt IS NOT NULL
),
lag2 AS (
  SELECT key, e, lag(e) OVER (PARTITION BY key ORDER BY o) AS pe FROM resid
)
SELECT key, CAST(count(*) AS BIGINT) AS n_resid,
  CAST(CASE WHEN sum(CAST(e AS HUGEINT) * e) <= 0 THEN NULL ELSE
    sum(CASE WHEN pe IS NOT NULL THEN CAST(e - pe AS HUGEINT) * (e - pe)
        ELSE CAST(0 AS HUGEINT) END) * 1000000
    // sum(CAST(e AS HUGEINT) * e)
  END AS BIGINT) AS dw_x1e6
FROM lag2 GROUP BY key
"""

DURBIN_WATSON_SQL = _durbin_sql()

def q_sessionizer_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition agreement between two sessionizers (30-min vs 60-min
    gaps) as purity/Rand/ARI — clustering_agreement reused to quantify
    how much a sessionization threshold actually changes the segmentation
    (ARI near 1e6 ⇒ the cheaper/coarser setting is safe)."""
    from chronographer_spark.operators.clustering import clustering_agreement
    from chronographer_spark.operators.temporal import sessionize

    ev = _t(spark, sf_dir, "events")
    s30 = sessionize(ev, ["user_id"], gap_seconds=1800).select(
        "event_id",
        F.concat_ws("#", F.col("user_id"), F.col("session_seq")).alias("c30"),
    )
    s60 = sessionize(ev, ["user_id"], gap_seconds=3600).select(
        "event_id",
        F.concat_ws("#", F.col("user_id"), F.col("session_seq")).alias("c60"),
    )
    j = s30.join(s60, "event_id")
    return clustering_agreement(j, "c30", "c60")

SESSIONIZER_AGREEMENT_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
seqs AS (
  SELECT CAST(user_id AS VARCHAR) || '#' || CAST(
           sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER w2 AS VARCHAR) AS ci,
         CAST(user_id AS VARCHAR) || '#' || CAST(
           sum(CASE WHEN gap IS NULL OR gap > 3600 THEN 1 ELSE 0 END)
           OVER w2 AS VARCHAR) AS lj
  FROM o
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cells AS (SELECT ci, lj, CAST(count(*) AS BIGINT) AS nij
          FROM seqs GROUP BY ci, lj),
tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
               CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS s_ij
        FROM cells),
aa AS (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS s_a
       FROM (SELECT sum(nij) AS ai FROM cells GROUP BY ci)),
bb AS (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS s_b
       FROM (SELECT sum(nij) AS bj FROM cells GROUP BY lj)),
pp AS (SELECT CAST(sum(mx) AS BIGINT) AS pure
       FROM (SELECT max(nij) AS mx FROM cells GROUP BY ci)),
d AS (SELECT n, s_ij, s_a, s_b, pure,
             CAST(n * (n - 1) // 2 AS HUGEINT) AS c2
      FROM tot, aa, bb, pp),
d2 AS (SELECT n, pure, c2,
             2 * (c2 * s_ij - CAST(s_a AS HUGEINT) * s_b) AS num,
             c2 * (s_a + s_b) - 2 * CAST(s_a AS HUGEINT) * s_b AS den,
             CAST(c2 + 2 * s_ij - s_a - s_b AS HUGEINT) * 1000000 AS rnum
      FROM d)
SELECT n,
       CAST(pure * 1000000 // n AS BIGINT) AS purity_x1e6,
       CAST(rnum // greatest(c2, 1) AS BIGINT) AS rand_x1e6,
       CAST(CASE WHEN den = 0 THEN 1000000
                 ELSE (num // den) * 1000000 + ((num % den) * 1000000) // den
            END AS BIGINT) AS ari_x1e6
FROM d2
"""

QUERIES = {
    "sessionizer_agreement": q_sessionizer_agreement,
    "durbin_watson_ses": q_durbin_watson_ses,
    "mase_hourly": q_mase_hourly,
    "ses_hourly": q_ses_hourly,
    "page_hinkley_hourly": q_page_hinkley_hourly,
    "hill_tail": q_hill_tail,
    "haar_energy": q_haar_energy,
    "control_chart": q_control_chart,
    "logrank_test": q_logrank_test,
    "kaplan_meier": q_kaplan_meier,
    "fano_burstiness": q_fano_burstiness,
    "changepoint_scan": q_changepoint_scan,
    "asof_join_latest": q_asof_join_latest,
    "interval_join_pairs": q_interval_join_pairs,
    "sessionize_events": q_sessionize_events,
    "allen_relations_events": q_allen_relations,
    "burst_hours": q_burst_hours,
    "temporal_kg_asof": q_temporal_kg_asof,
    "scd2_intervals": q_scd2_intervals,
    "dialogue_curation": q_dialogue_curation,
    "resample_gapfill": q_resample_gapfill,
    "coalesce_intervals": q_coalesce_intervals,
    "cusum_level_shift": q_cusum_level_shift,
    "cohort_retention": q_cohort_retention,
    "acf_daily_rates": q_acf_daily_rates,
    "mk_trend": q_mk_trend,
    "decayed_activity": q_decayed_activity,
    "rolling_7d": q_rolling_7d,
    "coburst_xcorr": q_coburst_xcorr,
    "survival_users": q_survival_users,
    "value_outliers": q_value_outliers,
    "seasonal_profile": q_seasonal_profile,
    "gap_histogram": q_gap_histogram,
    "ks_drift": q_ks_drift,
    "w1_drift": q_w1_drift,
    "dispersion_types": q_dispersion_types,
    "seasonal_anomalies": q_seasonal_anomalies,
    "theilsen_types": q_theilsen_types,
    "global_quantiles": q_global_quantiles,
    "bowley_types": q_bowley_types,
    "grouped_quantiles": q_grouped_quantiles,
    "winsorized_value": q_winsorized_value,
    "spearman_value_ts": q_spearman_value_ts,
    "ols_slope_types": q_ols_slope_types,
    "rfm_users": q_rfm_users,
    "corr_matrix_events": q_corr_matrix_events,
    "attribution_touch": q_attribution_touch,
    "peak_concurrency": q_peak_concurrency,
    "growth_accounting": q_growth_accounting,
    "record_counts": q_record_counts,
}

ORACLE_SQL = {
    "sessionizer_agreement": SESSIONIZER_AGREEMENT_SQL,
    "durbin_watson_ses": DURBIN_WATSON_SQL,
    "mase_hourly": MASE_HOURLY_SQL,
    "ses_hourly": SES_HOURLY_SQL,
    "page_hinkley_hourly": PAGE_HINKLEY_SQL,
    "hill_tail": HILL_TAIL_SQL,
    "haar_energy": HAAR_ENERGY_SQL,
    "control_chart": CONTROL_CHART_SQL,
    "logrank_test": LOGRANK_TEST_SQL,
    "kaplan_meier": KAPLAN_MEIER_SQL,
    "fano_burstiness": FANO_BURSTINESS_SQL,
    "changepoint_scan": CHANGEPOINT_SCAN_SQL,
    "asof_join_latest": ASOF_SQL,
    "interval_join_pairs": INTERVAL_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "allen_relations_events": ALLEN_SQL,
    "burst_hours": BURST_HOURS_SQL,
    "temporal_kg_asof": TEMPORAL_KG_ASOF_SQL,
    "scd2_intervals": SCD2_SQL,
    "dialogue_curation": DIALOGUE_CURATION_SQL,
    "resample_gapfill": RESAMPLE_GAPFILL_SQL,
    "coalesce_intervals": COALESCE_INTERVALS_SQL,
    "cusum_level_shift": CUSUM_LEVEL_SHIFT_SQL,
    "cohort_retention": COHORT_RETENTION_SQL,
    "acf_daily_rates": ACF_DAILY_RATES_SQL,
    "mk_trend": MK_TREND_SQL,
    "decayed_activity": DECAYED_ACTIVITY_SQL,
    "rolling_7d": ROLLING_7D_SQL,
    "coburst_xcorr": COBURST_XCORR_SQL,
    "survival_users": SURVIVAL_USERS_SQL,
    "value_outliers": VALUE_OUTLIERS_SQL,
    "seasonal_profile": SEASONAL_PROFILE_SQL,
    "gap_histogram": GAP_HISTOGRAM_SQL,
    "ks_drift": KS_DRIFT_SQL,
    "w1_drift": W1_DRIFT_SQL,
    "dispersion_types": DISPERSION_TYPES_SQL,
    "seasonal_anomalies": SEASONAL_ANOMALIES_SQL,
    "theilsen_types": THEILSEN_TYPES_SQL,
    "global_quantiles": GLOBAL_QUANTILES_SQL,
    "bowley_types": BOWLEY_TYPES_SQL,
    "grouped_quantiles": GROUPED_QUANTILES_SQL,
    "winsorized_value": WINSORIZED_VALUE_SQL,
    "spearman_value_ts": SPEARMAN_VALUE_TS_SQL,
    "ols_slope_types": OLS_SLOPE_TYPES_SQL,
    "rfm_users": RFM_USERS_SQL,
    "corr_matrix_events": CORR_MATRIX_EVENTS_SQL,
    "attribution_touch": ATTRIBUTION_TOUCH_SQL,
    "peak_concurrency": PEAK_CONCURRENCY_SQL,
    "growth_accounting": GROWTH_ACCOUNTING_SQL,
    "record_counts": RECORD_COUNTS_SQL,
}
