"""Temporal join operators beyond the reference's equality joins.

The reference (muhai-project/chronographer) only ever joins on equality
(SURVEY.md §2.3: src/framework.py, src/interface.py); its temporal logic is
the lexical date-range filter (reference src/filtering.py:52-63). A
transcript pipeline additionally needs order/interval-aware joins, and each
must be expressed so it survives a 100TB input:

- ``asof_join``: attach the most recent prior right-row per key (e.g. the
  last tool invocation before each turn, the last config change before each
  event). Implemented as union + ordered window ``last(ignorenulls)`` —
  ONE shuffle on the key, no range explosion, no per-key crossJoin. This is
  the canonical scalable as-of pattern (a sort-merge within each key
  partition); memory per task is O(1) beyond the sort.
- ``interval_self_join``: pairs of rows on the same key within ``max_gap``
  seconds of each other. Implemented by time-binning: bin width == max_gap,
  the left side is duplicated into (bin, bin+1) so every qualifying pair
  shares a (key, bin) bucket; candidate space is O(rows_per_bin²) per key
  instead of O(rows_per_key²), then an exact range filter. High-cardinality
  (key, bin) bucket keys keep the shuffle well spread; AQE splits residual
  skew.
- ``sessionize``: gap-based session ids per key via lag + running sum — two
  window functions over one (key, ts) sort, one shuffle, no iteration.

All orderings carry an explicit integer tie-break column so results are
deterministic under any partitioning (SURVEY.md §7.4 determinism rule).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    right_cols: Sequence[str] | None = None,
    tie_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for every left row, the right row with the
    greatest ``right_ts <= left_ts`` on the same key (inclusive).

    Returns all left columns plus ``<right_col><suffix>`` for each requested
    right column and ``<ts_col><suffix>`` (null when no prior right row).

    When several right rows share the matching timestamp the one with the
    greatest ``tie_col`` wins (callers pass a unique id column); this pins
    determinism where naive implementations rely on partition order.

    All right columns are packed into ONE struct and a single
    ``last(struct, ignorenulls=True)`` selects the matching right row, so
    every ``*_asof`` output column comes from the SAME right row even when
    some of its columns are legitimately NULL (per-column last() would
    stitch fields from different rows).
    """
    from pyspark.sql.types import StructField, StructType

    on = list(on)
    right_ts_col = right_ts_col or ts_col
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_ts_col)]
    right_cols = list(right_cols)
    left_payload = [c for c in left.columns if c not in (*on, ts_col)]

    # one struct holds the whole right row (payload cols + its ts, aliased
    # "__rts" so a right payload column can never collide with it)
    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
        + [StructField("__rts", right.schema[right_ts_col].dataType)]
    )
    l_tag = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts_col).alias("__ts"),
        F.lit(0).alias("__is_left"),
        (F.col(tie_col).cast("long") if tie_col else F.lit(0).cast("long")).alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(right_ts_col).alias("__rts"),
        ).alias("__r"),
    )
    # right rows sort BEFORE left rows at equal ts (__is_left asc) => inclusive
    # <=; __tie orders equal-ts right rows so `last` picks the max tie_col.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("__r"), ignorenulls=True).over(w)
    filled = l_tag.unionByName(r_tag).select(
        *on,
        "__ts",
        "__is_left",
        *left_payload,
        *[matched[c].alias(f"{c}{suffix}") for c in right_cols],
        matched["__rts"].alias(f"{ts_col}{suffix}"),
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left").withColumnRenamed(
        "__ts", ts_col
    )


def interval_self_join(
    df: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_gap_seconds: int = 60,
) -> DataFrame:
    """Pairs ``(id_a, id_b, gap_seconds)`` on the same key with
    ``ts_a < ts_b <= ts_a + max_gap_seconds``.

    Time-binned band join: bin width equals the gap, so a qualifying pair is
    always in the same or adjacent bins; the left row is replicated into its
    own and the next bin (2x, constant factor), and the equi-join on
    (key, bin) prunes everything farther apart before the exact filter.
    """
    on = list(on)
    sec = F.unix_timestamp(F.col(ts_col))
    binned = df.select(
        *on,
        F.col(id_col),
        F.col(ts_col),
        sec.alias("__sec"),
        F.floor(sec / max_gap_seconds).alias("__bin"),
    )
    a = binned.select(
        *on,
        F.col(id_col).alias("id_a"),
        F.col("__sec").alias("sec_a"),
        F.explode(F.array(F.col("__bin"), F.col("__bin") + 1)).alias("__jbin"),
    )
    b = binned.select(
        *on,
        F.col(id_col).alias("id_b"),
        F.col("__sec").alias("sec_b"),
        F.col("__bin").alias("__jbin"),
    )
    return (
        a.join(b, [*on, "__jbin"])
        .filter(
            (F.col("sec_b") > F.col("sec_a"))
            & (F.col("sec_b") <= F.col("sec_a") + max_gap_seconds)
        )
        .select(*on, "id_a", "id_b", (F.col("sec_b") - F.col("sec_a")).alias("gap_seconds"))
        .dropDuplicates([*on, "id_a", "id_b"])
    )


def sessionize(
    df: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    tie_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session numbers per key.

    A new session starts when the time since the previous row on the same key
    exceeds ``gap_seconds``. Adds ``session_seq`` (1-based per key) — the
    session key is (key..., session_seq). One shuffle; both window passes
    share the (key) exchange and (ts, tie) sort.
    """
    on = list(on)
    w = Window.partitionBy(*on).orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
    sec = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(sec).over(w)
    new_flag = F.when(prev.isNull() | (sec - prev > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(new_flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def allen_relations(
    df: DataFrame,
    on: Sequence[str],
    id_col: str = "event_id",
    begin_col: str = "begin",
    end_col: str = "end",
) -> DataFrame:
    """Allen interval-algebra classification of same-key interval pairs.

    For every pair of intervals sharing the `on` key, emits the Allen
    relation of the canonically-first interval (ordered by (begin, end, id),
    a total order) relative to the second. Under that ordering the 13 Allen
    relations collapse to 7 reachable ones: equals / starts (shared begin —
    the ordering makes started_by unreachable, since begin ties sort by
    end), before / meets (disjoint or touching), overlaps / finished_by /
    contains (begin_a < begin_b with increasing end overlap). Pure
    comparisons — no float arithmetic — so any engine derives identical
    labels.

    The reference orders events only linearly by date (sem:hasBeginTimeStamp
    min/max, src/graph_construction.py); interval algebra between
    co-occurring events is added capability for the event-centric KG
    (e.g. sub-event candidates = `contains`, causal candidates = `before`/
    `meets`).

    Shape: one self-join shuffled on the key; pair count is quadratic in
    per-key interval count BY CONTRACT (same bounded-key shape as
    sessionize/funnel — conversations, users). For unbounded keys compose
    with a time-band pre-join (interval_self_join) instead.

    Returns (on..., id_a, id_b, relation:string).
    """
    on = list(on)
    cols = [F.col(c) for c in on]
    iv = df.select(*cols, F.col(id_col), F.col(begin_col).alias("__b"), F.col(end_col).alias("__e"))
    a = iv.select(*on, F.col(id_col).alias("id_a"), F.col("__b").alias("b_a"), F.col("__e").alias("e_a"))
    b = iv.select(*on, F.col(id_col).alias("id_b"), F.col("__b").alias("b_b"), F.col("__e").alias("e_b"))
    pairs = a.join(b, on).filter(
        F.struct("b_a", "e_a", "id_a") < F.struct("b_b", "e_b", "id_b")
    )
    rel = (
        F.when((F.col("b_a") == F.col("b_b")) & (F.col("e_a") == F.col("e_b")), "equals")
        # begin tie: ordering guarantees e_a < e_b here (started_by unreachable)
        .when(F.col("b_a") == F.col("b_b"), "starts")
        .when(F.col("e_a") < F.col("b_b"), "before")
        .when(F.col("e_a") == F.col("b_b"), "meets")
        .when(F.col("e_a") < F.col("e_b"), "overlaps")
        .when(F.col("e_a") == F.col("e_b"), "finished_by")
        .otherwise("contains")
    )
    return pairs.select(*on, "id_a", "id_b", rel.alias("relation"))


def burst_buckets(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "hour",
    factor: int = 2,
) -> DataFrame:
    """Integer-exact burst detection: bucket the event stream per key into
    `bucket`-sized time bins and flag bins whose count exceeds `factor`
    times the key's mean rate over its ACTIVE bins. The comparison is the
    cross-multiplied integer form

        n_events * n_buckets > factor * total_events

    (i.e. n_events > factor * mean-per-active-bin) so there is no float
    division to reconcile cross-engine. This is the anomaly gate a
    transcript-ingest pipeline runs before KG construction: a key whose
    event rate spikes (runaway agent, replayed log) gets its burst bins
    surfaced for quarantine rather than poisoning temporal edges.

    Scale shape: one (key, bin) count with map-side combine, one per-key
    rollup, one join back keyed by `key` — all shuffles carry aggregated
    rows (bins, not events). Hot keys are bounded by their bin count, not
    their event count.

    Returns flagged rows (key, bucket_ts, n_events, total_events,
    n_buckets); thresholds are longs.
    """
    binned = df.select(key, F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"))
    # counts feeds BOTH the per-key rollup and the flag join — eager
    # localCheckpoint (the tf/df shared-subtree rule) so the input is
    # scanned once; the checkpointed table is |keys × buckets|, tiny.
    counts = (
        binned.groupBy(key, "bucket_ts")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)
    )
    per_key = counts.groupBy(key).agg(
        F.sum("n_events").alias("total_events"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    return (
        counts.join(per_key, key)
        .filter(
            F.col("n_events") * F.col("n_buckets")
            > F.lit(factor).cast("long") * F.col("total_events")
        )
        .select(key, "bucket_ts", "n_events", "total_events", "n_buckets")
    )


def scd2_compact(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 compaction — equivalently, temporal
    fact scoping for the KG: an assertion stream (entity keys, value,
    observed-at) collapses to validity intervals, one row per maximal run
    of the SAME value, [valid_from, valid_to) half-open with the current
    run's valid_to NULL. The operator that turns 10^12 observed turns
    into the O(#changes) fact table a temporal KG actually stores, and
    the standard lakehouse history-table shape (MERGE-friendly: only
    change points write).

    One window pass keyed by the entity (change-point flag via null-safe
    lag compare -> running-sum island id -> per-island min/max), then a
    second window over the O(#changes) island table for valid_to — the
    lag/island idiom shared with sessionize and repeated-span merge.
    Entity-popularity skew is the usual window hot-partition; keys should
    include the attribute (one partition per (entity, attr), not per
    entity).

    Returns keys + (value, valid_from, valid_to, n_obs).
    """
    from pyspark.sql.window import Window

    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    chg = F.when(
        F.lag(value_col).over(w).eqNullSafe(F.col(value_col)), 0
    ).otherwise(1)
    islands = df.withColumn("__chg", chg).withColumn(
        "__isl", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = islands.groupBy(*keys, "__isl").agg(
        F.first(value_col).alias("value"),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w2 = Window.partitionBy(*keys).orderBy("valid_from")
    return runs.select(
        *keys,
        "value",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("n_obs").cast("long").alias("n_obs"),
    )


def resample_timeseries(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 86400,
    value_scale: int = 100,
    method: str = "ffill",
) -> DataFrame:
    """Regularize an irregular event series onto a fixed-step grid with
    gap filling — the resample/upsample pass a metrics or feature
    pipeline runs before window models (pandas resample().ffill() /
    .interpolate(), TimescaleDB time_bucket_gapfill re-expressed for
    Spark; the reference has no time-series surface at all).

    Per key: bucket events (floor of epoch/step), aggregate each bucket
    to (n_events, mean value as an exact scaled integer — per-row
    floor(v·scale+0.5) summed THEN integer-divided, the order-free
    discipline from the working notes), build the full bucket spine
    min..max via sequence() explode, then fill empty buckets:

    - method='ffill': carry the last observed bucket mean forward
      (leading gaps stay NULL);
    - method='linear': integer linear interpolation between the
      surrounding observed buckets — quotients truncate toward zero
      (Spark `DIV`, identical to DuckDB's integer `//` including
      negative deltas); boundary gaps fall back to the one-sided
      neighbor.

    fill ∈ ('obs','gap'). Scale shape: one groupBy (key, bucket) —
    map-side combinable — then the spine explode is a per-key
    projection (spine length = range/step, bounded by retention) and
    the fills are TWO ordered windows over (key, bucket): one shuffle
    on keys, sort cost linear in spine length; hot keys are ordinary
    window skew. Nothing driver-side.

    Returns keys + (bucket_ts LONG epoch-seconds, n_events, v_x
    BIGINT scaled value, fill).
    """
    if method not in ("ffill", "linear"):
        raise ValueError("method must be 'ffill' or 'linear'")
    kcols = [F.col(k) for k in keys]
    b = (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    obs = (
        df.withColumn("__b", b)
        .withColumn(
            "__vx", F.floor(F.col(value_col) * value_scale + F.lit(0.5)).cast("long")
        )
        .groupBy(*kcols, F.col("__b"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # truncate-toward-zero (Spark DIV == DuckDB integer `//`,
            # measured: -5266 // 11 = -478 in both) — NOT pmod-floor
            F.expr("CAST(sum(__vx) DIV count(1) AS BIGINT)").alias("v_obs"),
        )
    )
    spine = (
        obs.groupBy(*kcols)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            *kcols,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__b"),
        )
    )
    grid = spine.join(obs, [*keys, "__b"], "left").withColumn(
        "fill", F.when(F.col("n_events").isNotNull(), "obs").otherwise("gap")
    )
    w = Window.partitionBy(*kcols).orderBy("__b")
    prev_v = F.last("v_obs", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    if method == "ffill":
        filled = grid.withColumn("v_x", prev_v)
    else:
        prev_b = F.last(F.when(F.col("fill") == "obs", F.col("__b")), True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        next_v = F.first("v_obs", ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
        next_b = F.first(F.when(F.col("fill") == "obs", F.col("__b")), True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
        filled = (
            grid.withColumn("__pv", prev_v)
            .withColumn("__pb", prev_b)
            .withColumn("__nv", next_v)
            .withColumn("__nb", next_b)
            .withColumn(
                "v_x",
                F.when(F.col("fill") == "obs", F.col("v_obs"))
                .when(F.col("__pv").isNull(), F.col("__nv"))
                .when(F.col("__nv").isNull(), F.col("__pv"))
                .otherwise(
                    F.col("__pv")
                    + F.expr(
                        "CAST((__nv - __pv) * (__b - __pb)"
                        " DIV (__nb - __pb) AS BIGINT)"
                    )
                ),
            )
        )
    return filled.select(
        *kcols,
        (F.col("__b") * bucket_seconds).alias("bucket_ts"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "v_x",
        "fill",
    )


def coalesce_intervals(
    df: DataFrame,
    keys: list,
    start_col: str = "start",
    end_col: str = "end",
    max_gap: int = 0,
) -> DataFrame:
    """Merge overlapping (or within-``max_gap``) validity intervals per
    key — the temporal-KG conflation pass: many extracted assertions of
    the same (subj, pred, obj) with ragged validity windows collapse to
    the minimal set of disjoint intervals (scd2_compact builds intervals
    from change events; this is its dual, normalizing intervals that
    already exist). Classic gaps-and-islands: per key, ordered by start,
    an interval opens a new island iff its start exceeds the running max
    of prior ends by more than max_gap; islands aggregate to
    (min start, max end, n_merged).

    Scale shape: ONE hash partition by key with an in-partition sort
    (window functions over partitionBy(keys) — no global sort, no
    single-partition WindowExec); two stacked windows (running max, then
    running island count) share the same partitioning+ordering so
    Catalyst plans ONE exchange + ONE sort; the island agg reuses the
    partitioning. Works on numeric or timestamp bounds (max_gap > 0
    requires numeric bounds, in the column's own units); ordering ties on
    (start, end) are deterministic because max-end and island sums are
    order-insensitive under equal starts.

    Returns keys + (start, end, n_merged), one row per coalesced island.
    """
    ks = [F.col(k) for k in keys]
    w = Window.partitionBy(*keys).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    bound = prev_max_end if max_gap == 0 else prev_max_end + F.lit(max_gap)
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > bound),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = df.withColumn("__new", opens).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(*ks, F.col("__island"))
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__island")
    )


def cusum_alarms(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    thr_buckets: int = 2,
) -> DataFrame:
    """CUSUM level-shift detection (Page 1954) per key over bucketed
    counts — the sustained-drift complement to burst_buckets' single-bin
    spikes: a rate that creeps up 20% never trips a 2x burst factor but
    accumulates in the CUSUM statistic. Exact integers throughout: with
    B = the key's active-bucket count and T = its total events, the
    deviation d_t = n_t·B − T is zero-mean by construction (no float
    mean), and the classic recurrence S_t = max(0, S_{t−1} + d_t) is
    computed WINDOW-ONLY via the prefix-sum identity
    S_t = P_t − min(0, min_{j≤t} P_j) — no recursive UDF, no driver loop.
    A bucket alarms when S_t > thr_buckets·T, i.e. the cumulative surplus
    (in count·B units) exceeds ``thr_buckets`` bucket-means' worth of
    excess above the key's own rate.

    Contract: the statistic runs over the key's ACTIVE buckets in order
    (empty buckets contribute nothing, like burst_buckets); no post-alarm
    reset — S is the textbook running statistic.

    Scale shape: one (key, bucket) count with map-side combine, a per-key
    rollup joined back on aggregated rows, then ONE per-key window
    exchange shared by the prefix sum and running min.

    Returns alarm rows (key, bucket_ts, n_events, s_scaled, total_events,
    n_buckets), s_scaled being S_t in count·B units.
    """
    binned = df.select(key, F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"))
    # counts feeds BOTH the per-key rollup and the window stage — eager
    # localCheckpoint (the tf/df shared-subtree rule) so the input is
    # scanned once; the checkpointed table is |keys × buckets|, tiny.
    counts = (
        binned.groupBy(key, "bucket_ts")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)
    )
    per_key = counts.groupBy(key).agg(
        F.sum("n_events").alias("total_events"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = F.col("n_events") * F.col("n_buckets") - F.col("total_events")
    staged = (
        counts.join(per_key, key)
        .withColumn("__p", F.sum(d).over(w))
        .withColumn("__m", F.min(F.col("__p")).over(w))
    )
    s = F.col("__p") - F.least(F.lit(0).cast("long"), F.col("__m"))
    return (
        staged.withColumn("s_scaled", s.cast("long"))
        .filter(
            F.col("s_scaled")
            > F.lit(int(thr_buckets)).cast("long") * F.col("total_events")
        )
        .select(key, "bucket_ts", "n_events", "s_scaled", "total_events", "n_buckets")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Cohort retention matrix — the standard "what fraction of the users
    first seen in bucket C are still active k buckets later" readout a
    production pipeline runs on any user-keyed event table (and a transcript
    pipeline runs per conv-author to measure corpus churn).

    Exact integers: age is a day-difference (DIV 7 for week buckets) and
    retention_x1e6 = n_active·1e6 DIV cohort_size, where cohort_size is BY
    DEFINITION the age-0 active count (every user is active in their own
    first bucket), so the age-0 row always reads 1000000.

    Scale shape: distinct (user, bucket) is one combinable shuffle; the
    per-user min-bucket cohort agg and the activity→cohort join share the
    user hash partitioning; the (cohort, age) rollup collapses to a
    dimension-scale matrix (#cohorts × #ages), and cohort sizes re-enter by
    a broadcast self-join on the age-0 slice. No windows, no driver
    collect; a 10^9-user table costs two user-keyed exchanges + one tiny
    rollup.
    """
    per = 7 if bucket == "week" else 1
    act = df.select(
        F.col(user_col).alias("__u"),
        F.date_trunc(bucket, F.col(ts_col)).alias("__b"),
    ).distinct()
    cohort = act.groupBy("__u").agg(F.min("__b").alias("__c"))
    matrix = (
        act.join(cohort, "__u")
        .select(
            "__c",
            (F.datediff(F.col("__b"), F.col("__c")) / per)
            .cast("long")
            .alias("age"),
        )
        .groupBy("__c", "age")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    size = (
        matrix.filter(F.col("age") == 0)
        .select("__c", F.col("n_active").alias("cohort_size"))
    )
    return (
        matrix.join(F.broadcast(size), "__c")
        .select(
            F.date_format("__c", "yyyy-MM-dd").alias("cohort"),
            "age",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.expr("n_active * 1000000 DIV cohort_size")
            .cast("long")
            .alias("retention_x1e6"),
        )
    )


def acf_buckets(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    lags: Sequence[int] = (1, 2, 3),
) -> DataFrame:
    """Lag-k autocorrelation of per-key bucketed event counts — the
    stationarity readout that complements cusum_alarms: a level shift or
    trend shows up as strong positive low-lag ACF, while a well-mixed
    stream reads near zero at every lag.

    Exact-integer contract: deviations are milli-mean units
    d_t = (n_t·B − T)·1000 / T computed by the STAGED quotient
    (a DIV T)·1000 + (a % T)·1000 DIV T (exact — both engines truncate
    DIV and % toward zero identically), then clamped to ±1e6 (a bucket
    1000× its key's mean saturates; documented). With B ≤ ~9000 active
    buckets per key (a quarter-century of days), Σd² ≤ 1e12·B keeps
    num·1000 under 2^63 — n-INDEPENDENT in the event count. ACF is
    emitted as acf_x1e3 = num·1000 DIV den (truncated toward zero, like
    every ratio oracle in this repo); den = 0 (a constant series) reads 0.

    Plan shape: one (key, bucket) count with map-side combine, a per-key
    rollup broadcast-scale join, ONE per-key window exchange providing all
    lead columns at once, one per-key agg computing den and every lag's
    numerator together, then the lag fan EXPLODES the collapsed per-key row
    (never a UNION of per-lag selects over the shared subtree — the
    minhash-bands re-execution rule).

    Contract: like cusum_alarms, the series is the key's ACTIVE buckets in
    order; lags count positions in that sequence, not calendar gaps.
    """
    binned = df.select(key, F.date_trunc(bucket, F.col(ts_col)).alias("__b"))
    # shared by the per-key rollup and the window stage: scan input once
    counts = (
        binned.groupBy(key, "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    per_key = counts.groupBy(key).agg(
        F.sum("__n").alias("__T"), F.count(F.lit(1)).alias("__nb")
    )
    w = Window.partitionBy(key).orderBy("__b")
    sided = (
        counts.join(per_key, key)
        .withColumn(
            "__d",
            F.least(
                F.lit(1000000).cast("long"),
                F.greatest(
                    F.lit(-1000000).cast("long"),
                    F.expr(
                        "(__n * __nb - __T) DIV __T * 1000"
                        " + (__n * __nb - __T) % __T * 1000 DIV __T"
                    ).cast("long"),
                ),
            ),
        )
        .select(
            key, "__d", "__nb",
            *[
                F.lead("__d", int(k)).over(w).alias(f"__l{k}")
                for k in lags
            ],
        )
    )
    rolled = sided.groupBy(key).agg(
        F.sum(F.col("__d") * F.col("__d")).alias("__den"),
        F.max("__nb").alias("n_buckets"),
        *[
            F.sum(F.col("__d") * F.col(f"__l{k}")).alias(f"__num{k}")
            for k in lags
        ],
        *[F.count(F.col(f"__l{k}")).alias(f"__np{k}") for k in lags],
    )
    fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(k)).alias("lag"),
                    F.col(f"__num{k}").alias("num"),
                    F.col(f"__np{k}").alias("n_pairs"),
                )
                for k in lags
            ]
        )
    ).alias("__x")
    return (
        rolled.select(key, "n_buckets", "__den", fan)
        .select(
            key,
            F.col("__x.lag").alias("lag"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("__x.n_pairs").cast("long").alias("n_pairs"),
            F.when(F.col("__den") == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("__x.num * 1000 DIV __den").cast("long"))
            .alias("acf_x1e3"),
        )
    )


def mk_trend(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Mann-Kendall trend test statistic (Mann 1945, Kendall 1975) per key
    over bucketed counts — the MONOTONIC-trend complement to cusum_alarms
    (abrupt shift) and acf_buckets (stationarity): S = Σ_{i<j}
    sign(n_j − n_i) over all bucket pairs in time order, and Kendall's
    tau = S / (B(B−1)/2). Pure integers end to end: sign is a 3-way CASE
    (no float signum), tau_x1e6 = S·1e6 DIV n_pairs with the truncation
    both engines share.

    Scale shape: the input collapses to the (key, bucket) count table
    (eager localCheckpoint — it feeds both sides of the pair join), and
    the O(B²) pair fan runs ONLY on that collapsed table: B is a calendar
    bound (a decade of days is 3653 buckets → ~6.7M pairs per key), never
    the event count. For longer series, coarsen `bucket` — the statistic
    is rank-based and robust to aggregation. S ≤ B²/2 keeps S·1e6 far
    under 2^63 for any calendar-bounded B.

    Returns (key, n_buckets, n_pairs, s_stat, tau_x1e6); keys with a
    single active bucket are absent (no pairs — tau undefined).
    """
    binned = df.select(key, F.date_trunc(bucket, F.col(ts_col)).alias("__b"))
    counts = (
        binned.groupBy(key, "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    a = counts.select(key, F.col("__b").alias("__b1"), F.col("__n").alias("__n1"))
    b = counts.select(key, F.col("__b").alias("__b2"), F.col("__n").alias("__n2"))
    sgn = (
        F.when(F.col("__n2") > F.col("__n1"), F.lit(1))
        .when(F.col("__n2") < F.col("__n1"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    # exact bucket count from the collapsed checkpointed table (never a
    # float sqrt inverse of the pair count — cross-engine ULP trap)
    per_key = counts.groupBy(key).agg(F.count(F.lit(1)).alias("n_buckets"))
    return (
        a.join(b, key)
        .filter(F.col("__b2") > F.col("__b1"))
        .groupBy(key)
        .agg(
            F.sum(sgn).alias("s_stat"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .join(F.broadcast(per_key), key)
        .select(
            key,
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "s_stat",
            F.expr("s_stat * 1000000 DIV n_pairs").cast("long").alias("tau_x1e6"),
        )
    )


def decayed_activity(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    asof: str = "2024-01-31",
    halflife_days: int = 7,
) -> DataFrame:
    """Recency-weighted activity score per key — the recency×frequency
    feature (churn screens, contributor-quality priors, "is this source
    still alive") with EXACT integer decay: each event contributes
    1e6 >> (age_days DIV halflife) — halving per elapsed half-life via a
    bit shift instead of exp(−λt), so both engines replay the score
    bit-for-bit with zero float discipline. Shifts clamp at 40 (weight 0
    beyond ~40 half-lives — already sub-ppm).

    ``asof`` is an explicit date string: scores are reproducible
    snapshots, never wall-clock dependent.

    Scale shape: the weight is a map-side expression; ONE combinable
    groupBy emits score, event count, and last-seen age. No windows, no
    joins.

    Returns (key, n_events, last_age_days, score_x1e6).
    """
    import datetime as _dt

    _dt.date.fromisoformat(asof)  # asof is interpolated into SQL: validate
    age = F.datediff(F.lit(asof).cast("date"), F.col(ts_col).cast("date"))
    return (
        df.select(
            F.col(key).alias("key"),
            age.cast("long").alias("__age"),
            F.expr(
                f"1000000 DIV shiftleft(CAST(1 AS BIGINT), CAST(least(40, "
                f"greatest(0, CAST(datediff(DATE'{asof}', CAST({ts_col} AS DATE))"
                f" AS LONG) DIV {int(halflife_days)})) AS INT))"
            ).cast("long").alias("__w"),
        )
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("__age").cast("long").alias("last_age_days"),
            F.sum("__w").cast("long").alias("score_x1e6"),
        )
    )


def rolling_counts(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    trail_buckets: int = 7,
) -> DataFrame:
    """Trailing calendar-window features per key — the moving-sum/
    moving-active-days feature block every forecasting or anomaly layer
    consumes (7-day rolling volume, active-day density). CALENDAR
    semantics, not row semantics: the frame is a RANGE window over the
    bucket epoch, so gaps in activity genuinely shrink the trailing sum —
    the distinction the ROWS-frame operators here (cusum/acf prefix sums)
    deliberately do not make.

    Exact integers throughout (counts and epoch arithmetic only). Plan
    shape: one (key, bucket) combinable count, then ONE per-key RANGE
    window over the collapsed table providing both trailing aggregates;
    a bucket's frame spans [epoch − (trail−1)·width, epoch].

    Returns (key, bucket_ts, n_events, trail_sum, trail_active).
    """
    width = 86400 if bucket == "day" else 3600
    counts = (
        df.select(key, F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"))
        .groupBy(key, "bucket_ts")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("__epoch", F.unix_timestamp("bucket_ts"))
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__epoch")
        .rangeBetween(-(int(trail_buckets) - 1) * width, 0)
    )
    return counts.select(
        key,
        "bucket_ts",
        F.col("n_events").cast("long").alias("n_events"),
        F.sum("n_events").over(w).cast("long").alias("trail_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("trail_active"),
    )


def cross_correlation(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Lag-0 cross-correlation between every pair of key series — the
    co-movement readout (which metrics burst TOGETHER) completing the
    family: cusum (shift), acf (self-correlation), mk (trend). Deviations
    are acf_buckets' clamped staged milli-mean integers; the score is the
    SIGNED r² via the Cauchy-Schwarz-bounded staged quotient

        r2_x1e6 = sign(num) · (|num|·1000 DIV den_a) · (|num|·1000 DIV den_b)

    — each factor is ≤ 1000·√(den_b/den_a) (and vice versa), so the
    product is ≤ 1e6 by C-S while every intermediate stays far under 2^63
    for any calendar-bounded B: exact, n-independent, replayed verbatim by
    the oracle (truncation slop is part of the defined semantics).

    Pairs join on the bucket axis: deviations co-group by bucket, so the
    pair fan is |keys|² per bucket — a DIMENSION bound (callers pre-filter
    keys when |keys| is large; series pairs beyond ~10³ keys should go
    through a sketch, not exact all-pairs).

    Returns (key_a, key_b, n_joint, num, r2_x1e6) for key_a < key_b;
    n_joint = buckets where BOTH series are active (inner join —
    the statistic is over co-active buckets; a constant/absent side
    reads r2 = 0 via the den = 0 guard).
    """
    binned = df.select(key, F.date_trunc(bucket, F.col(ts_col)).alias("__b"))
    counts = (
        binned.groupBy(key, "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    per_key = counts.groupBy(key).agg(
        F.sum("__n").alias("__T"), F.count(F.lit(1)).alias("__nb")
    )
    dev = (
        counts.join(per_key, key)
        .select(
            F.col(key).alias("k"),
            "__b",
            F.least(
                F.lit(1000000).cast("long"),
                F.greatest(
                    F.lit(-1000000).cast("long"),
                    F.expr(
                        "(__n * __nb - __T) DIV __T * 1000"
                        " + (__n * __nb - __T) % __T * 1000 DIV __T"
                    ).cast("long"),
                ),
            ).alias("d"),
        )
        .localCheckpoint(eager=True)
    )
    a = dev.select(F.col("k").alias("key_a"), "__b", F.col("d").alias("da"))
    b = dev.select(F.col("k").alias("key_b"), "__b", F.col("d").alias("db"))
    paired = a.join(b, "__b").filter(F.col("key_a") < F.col("key_b"))
    rolled = paired.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n_joint"),
        F.sum(F.col("da") * F.col("db")).alias("num"),
        F.sum(F.col("da") * F.col("da")).alias("__da2"),
        F.sum(F.col("db") * F.col("db")).alias("__db2"),
    )
    return rolled.select(
        "key_a",
        "key_b",
        F.col("n_joint").cast("long").alias("n_joint"),
        F.col("num").cast("long").alias("num"),
        F.when((F.col("__da2") == 0) | (F.col("__db2") == 0), F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "CASE WHEN num < 0 THEN -1 ELSE 1 END"
                " * (abs(num) * 1000 DIV __da2)"
                " * (abs(num) * 1000 DIV __db2)"
            ).cast("long")
        )
        .alias("r2_x1e6"),
    )


def survival_table(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Survival-analysis ingredient table (the Kaplan-Meier life table's
    integer core): per bucket, how many users are AT RISK (first activity
    ≤ bucket ≤ last activity) and how many END that bucket (their last
    observed activity) — retention's complement to cohort_retention's
    matrix, and the right-censoring caveat is explicit: the final bucket's
    "endings" are censored observations, not churn (downstream KM
    estimators drop or flag them; the column `censored` carries the
    count).

    hazard_x1e6 = n_ending·1e6 DIV n_at_risk — exact; the KM survivor
    curve is a product downstream consumers fold over these rows (a
    product of exact quotients is no longer integer; the INGREDIENTS
    are the stable cross-engine contract, as with degree-mixing moments).

    Scale shape: one per-user (first, last) agg; the at-risk count uses
    the ±1 DELTA trick — +1 at first bucket, −1 after last — so it is a
    prefix sum over the ≤ |buckets|-row delta table, never a per-day
    explode of user lifespans. One user-keyed agg + one tiny ordered
    window (er_threshold_curve's collapsed-window rule).

    Rows exist only at buckets where a lifespan starts or ends — exactly
    the KM convention (the estimator only changes at event times; a
    mid-lifespan bucket with no events carries no information).

    Returns (bucket_ts, n_starting, n_ending, n_at_risk, censored,
    hazard_x1e6).
    """
    # span feeds THREE consumers (starts, ends, censoring boundary) —
    # eager localCheckpoint (the tf/df shared-subtree rule) so the input
    # is scanned once; the checkpointed table is one row per user
    span = (
        df.select(
            F.col(user_col).alias("__u"),
            F.date_trunc(bucket, F.col(ts_col)).alias("__b"),
        )
        .groupBy("__u")
        .agg(F.min("__b").alias("__first"), F.max("__b").alias("__last"))
        .localCheckpoint(eager=True)
    )
    last_bucket = span.agg(F.max("__last").alias("__maxb"))
    starts = span.groupBy(F.col("__first").alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("n_starting")
    )
    ends = span.groupBy(F.col("__last").alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("n_ending")
    )
    merged = (
        starts.join(ends, "bucket_ts", "full_outer")
        .na.fill({"n_starting": 0, "n_ending": 0})
    )
    w = Window.orderBy("bucket_ts").rowsBetween(Window.unboundedPreceding, 0)
    return (
        merged.withColumn("__cum_start", F.sum("n_starting").over(w))
        .withColumn("__cum_end", F.sum("n_ending").over(w))
        .withColumn(
            "n_at_risk",
            (F.col("__cum_start") - F.col("__cum_end") + F.col("n_ending"))
            .cast("long"),
        )
        .crossJoin(F.broadcast(last_bucket))
        .select(
            "bucket_ts",
            F.col("n_starting").cast("long").alias("n_starting"),
            F.col("n_ending").cast("long").alias("n_ending"),
            "n_at_risk",
            F.when(F.col("bucket_ts") == F.col("__maxb"), F.col("n_ending"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("censored"),
            F.expr("n_ending * 1000000 DIV n_at_risk").cast("long")
            .alias("hazard_x1e6"),
        )
    )


def robust_outlier_report(
    df: DataFrame,
    key: str = "event_type",
    value_col: str = "value",
    scale: int = 100,
    k_mad: int = 3,
) -> DataFrame:
    """Median/MAD outlier screen per key — the ROBUST complement to
    burst/cusum (which watch counts): a value column's heavy tail is
    measured against the median absolute deviation, immune to the very
    outliers it hunts (mean/stddev screens are not).

    Exact-integer discipline via DOUBLED medians: values quantize to
    v = floor(x·scale + 0.5); med2 = 2·median(v) is ALWAYS an exact
    integer (odd count: 2a; even: a+b — both engines interpolate the
    midpoint exactly, and 2·midpoint is integral, so the double is
    bit-safe for |v| < 2^51); deviations d = |2v − med2| are exact ints;
    mad2 = median(d) doubled again the same way. The outlier test
    |2v − med2| · 2 > k · mad2 is pure integer comparison.

    Scale note: exact percentile sorts each key's values — right for
    bounded per-key cardinality (event types, sources); at unbounded
    scale swap percentile→percentile_approx and drop the oracle to
    rows-only (documented, same convention as quantiles_by_type).

    Returns (key, n, med2, mad2, n_outliers, outlier_x1e6).
    """
    q = df.select(
        key,
        F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5))
        .cast("long")
        .alias("__v"),
    ).localCheckpoint(eager=True)
    med = q.groupBy(key).agg(
        F.expr("CAST(percentile(__v, 0.5) * 2 AS BIGINT)").alias("med2")
    )
    dev = q.join(F.broadcast(med), key).select(
        key, "__v", "med2", F.abs(F.col("__v") * 2 - F.col("med2")).alias("__d")
    )
    mad = dev.groupBy(key).agg(
        F.expr("CAST(percentile(__d, 0.5) * 2 AS BIGINT)").alias("mad2")
    )
    return (
        dev.join(F.broadcast(mad), key)
        .withColumn(
            "__out",
            (F.col("__d") * 2 > F.lit(int(k_mad)).cast("long") * F.col("mad2"))
            .cast("long"),
        )
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med2").alias("med2"),
            F.max("mad2").alias("mad2"),
            F.sum("__out").alias("n_outliers"),
        )
        .select(
            key,
            F.col("n").cast("long").alias("n"),
            "med2",
            "mad2",
            F.col("n_outliers").cast("long").alias("n_outliers"),
            F.expr("n_outliers * 1000000 DIV n").cast("long")
            .alias("outlier_x1e6"),
        )
    )


def seasonal_profile(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Hour-of-day × day-of-week activity heat table — the seasonal
    baseline every anomaly layer normalizes against (a Monday-9am spike
    is noise; a Sunday-3am one is a signal) and the first look at any
    event stream's rhythm.

    Engine-neutral calendar arithmetic: BOTH fields derive from the epoch
    second — dow = (epoch_days + 4) % 7 (0 = Sunday; 1970-01-01 was a
    Thursday) and hour = epoch_seconds % 86400 DIV 3600 (UTC) — never the
    engines' dayofweek()/dow() builtins, whose numbering conventions
    disagree (Spark 1=Sunday, DuckDB 0=Sunday). share_x1e6 is the exact
    cell share of total events.

    One map-side derivation + ONE ≤168-key combinable groupBy; the total
    re-enters by broadcast.

    Returns (dow, hour, n, share_x1e6).
    """
    ep = F.unix_timestamp(F.col(ts_col))
    cells = df.select(
        ((F.floor(ep / 86400) + 4) % 7).cast("int").alias("dow"),
        F.expr(
            f"CAST(CAST(unix_timestamp({ts_col}) AS BIGINT) % 86400"
            " DIV 3600 AS INT)"
        ).alias("hour"),
    ).groupBy("dow", "hour").agg(F.count(F.lit(1)).alias("n"))
    total = cells.agg(F.sum("n").alias("__t"))
    return cells.crossJoin(F.broadcast(total)).select(
        "dow", "hour",
        F.col("n").cast("long").alias("n"),
        F.expr("n * 1000000 DIV __t").cast("long").alias("share_x1e6"),
    )


GAP_BANDS = (
    ("lt_1m", 60),
    ("lt_10m", 600),
    ("lt_1h", 3600),
    ("lt_6h", 21600),
    ("lt_1d", 86400),
)


def gap_histogram(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    id_col: str | None = None,
) -> DataFrame:
    """Inter-arrival-gap banded histogram per key — the burstiness /
    liveness fingerprint (a key whose gaps pile into the shortest band is
    machine-generated; one drifting into the longest is dying), and the
    empirical input to choosing sessionize's gap threshold.

    Bands are a fixed CASE ladder (GAP_BANDS + 'ge_1d') — exact integer
    second comparisons both engines replay; no logs, no float binning.
    Ordering ties pin on ``id_col`` when given (keys with equal-ts rows
    need it for a deterministic gap sequence; None orders by ts alone).

    ONE (key, ts) window for the lag + ONE ≤6·|keys| combinable rollup;
    per-key shares are exact quotients of the key's gap count.

    Returns (key, band, n, share_x1e6).
    """
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    gap = F.unix_timestamp(F.col(ts_col)) - F.lag(
        F.unix_timestamp(F.col(ts_col))
    ).over(w)
    band = F.lit("ge_1d")
    for name, ub in reversed(GAP_BANDS):
        band = F.when(gap < ub, F.lit(name)).otherwise(band)
    gaps = df.select(key, band.alias("band"), gap.alias("__g")).filter(
        F.col("__g").isNotNull()
    )
    # counts feeds the final join AND the per-key total — checkpoint the
    # ≤6·|keys| collapsed table so the window pass runs once
    counts = (
        gaps.groupBy(key, "band")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    per_key = counts.groupBy(key).agg(F.sum("n").alias("__t"))
    return counts.join(F.broadcast(per_key), key).select(
        key, "band",
        F.col("n").cast("long").alias("n"),
        F.expr("n * 1000000 DIV __t").cast("long").alias("share_x1e6"),
    )


def ks_two_sample(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "v",
    n_parts: int = 32,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic over an INTEGER value
    column — the ordered-value drift monitor beside `distribution_drift`'s
    categorical TVD: TVD sees a relabeled category, KS sees a SHIFTED or
    re-scaled numeric distribution that leaves every category's mass alone.
    Deployed as the train/serve skew check on score or latency columns.

    D = max_v |F_a(v) - F_b(v)| computed entirely in integers: with
    cumulative counts cum_a/cum_b and totals n_a/n_b, the per-value
    deviation is |cum_a*n_b - cum_b*n_a| and D's numerator is its maximum
    (denominator n_a*n_b), so both engines agree bit-for-bit — callers
    pre-scale float columns per row (floor(x*1e6 + 0.5)), never post-divide.
    BIGINT headroom: d_num <= n_a*n_b and ks_x1e6 multiplies by 1e6, so the
    integer path is exact up to n_a*n_b ~ 9.2e12 (e.g. 3M x 3M rows);
    beyond that cast the two products to DECIMAL(38,0) — the shape is
    unchanged.

    Scale shape: one (value)-keyed map-side-combinable count collapse, then
    the two-phase distributed prefix sum over the COLLAPSED value table
    (range partition -> per-partition local cumsum -> <= n_parts total rows
    cross the driver as offsets, the same pattern as `pack_sequences`) —
    never a global single-partition window. The final argmax is one
    struct-max aggregate; ties break to the smallest value.

    Returns one row (n_a, n_b, d_num, ks_x1e6, at_value).
    """
    tagged = a.select(
        F.col(value_col).cast("long").alias("v"),
        F.lit(1).alias("_ia"),
        F.lit(0).alias("_ib"),
    ).unionByName(
        b.select(
            F.col(value_col).cast("long").alias("v"),
            F.lit(0).alias("_ia"),
            F.lit(1).alias("_ib"),
        )
    )
    cnt = tagged.groupBy("v").agg(
        F.sum("_ia").alias("ca"), F.sum("_ib").alias("cb")
    )
    return ks_from_counts(cnt, n_parts=n_parts)


def ks_from_counts(cnt: DataFrame, n_parts: int = 32) -> DataFrame:
    """KS statistic from a pre-collapsed (v, ca, cb) count table — the
    core `ks_two_sample` delegates to, exposed so MERGEABLE count
    fragments (the streaming drift monitor's accumulated state, a
    reference histogram) can be compared without re-expanding rows. Same
    two-phase prefix sum, same exact-integer contract, same one-row
    (n_a, n_b, d_num, ks_x1e6, at_value) output."""
    parted = cnt.repartitionByRange(n_parts, "v").withColumn(
        "_part", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_part")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = (
        parted.withColumn("_la", F.sum("ca").over(local_w))
        .withColumn("_lb", F.sum("cb").over(local_w))
        .localCheckpoint(eager=True)  # offsets agg + main path share it
    )
    totals = sorted(
        (r["_part"], r["ta"] or 0, r["tb"] or 0)
        for r in local.groupBy("_part")
        .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
        .collect()
    )
    offs, acc_a, acc_b = [], 0, 0
    for pid, ta, tb in totals:
        offs.append((int(pid), acc_a, acc_b))
        acc_a += ta
        acc_b += tb
    n_a, n_b = acc_a, acc_b
    off_df = local.sparkSession.createDataFrame(
        offs, "_part int, _oa long, _ob long"
    )
    d = local.join(F.broadcast(off_df), "_part").select(
        "v",
        F.abs(
            (F.col("_oa") + F.col("_la")) * F.lit(n_b)
            - (F.col("_ob") + F.col("_lb")) * F.lit(n_a)
        ).alias("d_num"),
    )
    best = d.agg(
        F.max(F.struct(F.col("d_num"), (-F.col("v")).alias("_negv"))).alias("m")
    )
    return best.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.col("m.d_num").cast("long").alias("d_num"),
        F.expr(f"CAST(m.d_num * CAST(1000000 AS BIGINT) DIV "
               f"(CAST({n_a} AS BIGINT) * CAST({n_b} AS BIGINT)) AS BIGINT)")
        .alias("ks_x1e6"),
        (-F.col("m._negv")).cast("long").alias("at_value"),
    )


def wasserstein_two_sample(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "v",
    n_parts: int = 32,
) -> DataFrame:
    """Exact two-sample Wasserstein-1 (earth-mover) distance over an
    INTEGER value column — the INTEGRAL drift lens completing the trio:
    `distribution_drift` (categorical TVD), `ks_two_sample` (max CDF
    gap), and this (area between CDFs). KS flags ANY crossing, W1 prices
    how much mass moved how far — a +25 shift costs exactly 25 even when
    the KS statistic saturates at 1.

    W1 = Σ_i |F_a(v_i) − F_b(v_i)|·(v_{i+1} − v_i) over sorted distinct
    values, computed as Σ |cum_a·n_b − cum_b·n_a|·gap with denominator
    n_a·n_b — all BIGINT. Headroom: w1_num <= n_a·n_b·range(v); callers
    keep the value grid coarse (e.g. floor to units) or lift the product
    to DECIMAL(38,0) past ~9e18.

    Same two-phase distributed prefix sum as `ks_two_sample` over the
    COLLAPSED value table; the cross-partition "next value" needed for
    the gap is stitched from the SAME <= n_parts driver rows that carry
    the offsets (each partition's min value is the previous partition's
    boundary successor) — no extra job, no global window.

    Returns one row (n_a, n_b, w1_num, w1_x1e6).
    """
    tagged = a.select(
        F.col(value_col).cast("long").alias("v"),
        F.lit(1).alias("_ia"),
        F.lit(0).alias("_ib"),
    ).unionByName(
        b.select(
            F.col(value_col).cast("long").alias("v"),
            F.lit(0).alias("_ia"),
            F.lit(1).alias("_ib"),
        )
    )
    cnt = tagged.groupBy("v").agg(
        F.sum("_ia").alias("ca"), F.sum("_ib").alias("cb")
    )
    parted = cnt.repartitionByRange(n_parts, "v").withColumn(
        "_part", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_part")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = (
        parted.withColumn("_la", F.sum("ca").over(local_w))
        .withColumn("_lb", F.sum("cb").over(local_w))
        .localCheckpoint(eager=True)
    )
    per_part = sorted(
        (r["_part"], r["ta"] or 0, r["tb"] or 0, r["mv"])
        for r in local.groupBy("_part")
        .agg(
            F.sum("ca").alias("ta"),
            F.sum("cb").alias("tb"),
            F.min("v").alias("mv"),
        )
        .collect()
    )
    offs, acc_a, acc_b = [], 0, 0
    for pid, ta, tb, _ in per_part:
        offs.append([int(pid), acc_a, acc_b, None])
        acc_a += ta
        acc_b += tb
    n_a, n_b = acc_a, acc_b
    # boundary successor: the next non-empty partition's min value
    nxt = None
    for i in range(len(per_part) - 1, -1, -1):
        offs[i][3] = nxt
        if per_part[i][3] is not None:
            nxt = per_part[i][3]
    off_df = local.sparkSession.createDataFrame(
        [(p, oa, ob, bv) for p, oa, ob, bv in offs],
        "_part int, _oa long, _ob long, _bnext long",
    )
    lead_w = Window.partitionBy("_part").orderBy("v")
    gapd = (
        local.join(F.broadcast(off_df), "_part")
        .withColumn(
            "_nv", F.coalesce(F.lead("v").over(lead_w), F.col("_bnext"))
        )
        .select(
            "v",
            F.abs(
                (F.col("_oa") + F.col("_la")) * F.lit(n_b)
                - (F.col("_ob") + F.col("_lb")) * F.lit(n_a)
            ).alias("_d"),
            (F.coalesce(F.col("_nv"), F.col("v")) - F.col("v")).alias("_gap"),
        )
    )
    rolled = gapd.agg(F.sum(F.col("_d") * F.col("_gap")).alias("w1_num"))
    return rolled.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.coalesce(F.col("w1_num"), F.lit(0)).cast("long").alias("w1_num"),
        # staged quotient (CLAUDE.md toolkit): headroom is w1_num < 2^63
        # and (w1_num % D)·1e6 < 2^63, i.e. n_a·n_b up to ~9e12 — a plain
        # w1_num·1e6 would already overflow at the 10x soak scale
        F.expr(
            f"CAST(coalesce(w1_num, 0) DIV {max(n_a, 1)} DIV {max(n_b, 1)} "
            f"* CAST(1000000 AS BIGINT) "
            f"+ coalesce(w1_num, 0) % "
            f"(CAST({max(n_a, 1)} AS BIGINT) * CAST({max(n_b, 1)} AS BIGINT)) "
            f"* CAST(1000000 AS BIGINT) DIV "
            f"(CAST({max(n_a, 1)} AS BIGINT) * CAST({max(n_b, 1)} AS BIGINT)) "
            f"AS BIGINT)"
        ).alias("w1_x1e6"),
    )


def dispersion_index(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Fisher dispersion index (variance-to-mean ratio of per-bucket
    counts) per key — the overdispersion diagnostic that calibrates the
    whole burst/CUSUM/ACF family: a Poisson-like stream has D ~ 1, bursty
    or clumped arrivals push D >> 1, and an anomaly detector tuned on a
    D=1 assumption over a D=10 stream fires constantly. Observed buckets
    only (a key's silent days are not rows; callers wanting calendar
    zeros resample first — `resample_timeseries`).

    Exact integers: with N buckets, S = Σx, Q = Σx², the unbiased
    var/mean ratio (N·Q − S²)/((N−1)·S) is emitted as
    dispersion_x1e6 = (N·Q − S²)·1e6 DIV ((N−1)·S); N <= 1 or S = 0
    returns 0. Headroom: N·Q·1e6 — fine to ~9e12 count-mass per key,
    then lift to DECIMAL(38,0).

    One (key, bucket) map-side-combinable count, one per-key rollup.
    Returns (key, n_buckets, total, sum_sq, dispersion_x1e6).
    """
    counts = df.groupBy(
        F.col(key), F.date_trunc(bucket, F.col(ts_col)).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_n"))
    return counts.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("_n").cast("long").alias("total"),
        F.sum(F.col("_n") * F.col("_n")).cast("long").alias("sum_sq"),
        F.expr(
            "CAST(CASE WHEN count(1) <= 1 OR sum(_n) = 0 THEN 0 "
            "ELSE (count(1) * sum(_n * _n) - sum(_n) * sum(_n)) * 1000000 "
            "DIV ((count(1) - 1) * sum(_n)) END AS BIGINT)"
        ).alias("dispersion_x1e6"),
    )


def seasonal_anomaly_report(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    k_mad: int = 3,
) -> DataFrame:
    """Seasonally-adjusted anomaly screen: per (key, day-of-week, hour)
    CELL, the robust median/MAD test of `robust_outlier_report` applied
    to the cell's observed hourly COUNTS across days — the composition of
    `seasonal_profile` (what is normal for Monday 9am) and the doubled-
    median discipline, catching the Sunday-3am spike a raw median over
    all hours would wash out. Observed hours only (zero-count hours are
    not rows; resample first for calendar-complete series).

    Same engine-neutral calendar arithmetic as seasonal_profile (epoch
    days + 4 mod 7, UTC hours — never the engines' disagreeing dow()
    builtins); same exact-integer doubled medians as
    robust_outlier_report (exact per-cell percentile is right because a
    cell holds at most #days observations).

    One (key, day, hour) combinable count, two bounded-cardinality
    median aggregates, one ≤ |keys|·168-row rollup.

    Returns (key, dow, hour, n_obs, med2, mad2, n_anom).
    """
    ep = F.unix_timestamp(F.col(ts_col))
    obs = (
        df.select(
            F.col(key),
            F.floor(ep / 86400).cast("long").alias("_day"),
            F.expr(
                f"CAST(CAST(unix_timestamp({ts_col}) AS BIGINT) % 86400"
                " DIV 3600 AS INT)"
            ).alias("hour"),
        )
        .groupBy(key, "_day", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("dow", ((F.col("_day") + 4) % 7).cast("int"))
        .localCheckpoint(eager=True)  # median + dev + rollup share it
    )
    med = obs.groupBy(key, "dow", "hour").agg(
        F.expr("CAST(percentile(n, 0.5) * 2 AS BIGINT)").alias("med2")
    )
    dev = obs.join(med, [key, "dow", "hour"]).select(
        key, "dow", "hour", "n", "med2",
        F.abs(F.col("n") * 2 - F.col("med2")).alias("_d"),
    )
    mad = dev.groupBy(key, "dow", "hour").agg(
        F.expr("CAST(percentile(_d, 0.5) * 2 AS BIGINT)").alias("mad2")
    )
    return (
        dev.join(mad, [key, "dow", "hour"])
        .groupBy(key, "dow", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.max("med2").alias("med2"),
            F.max("mad2").alias("mad2"),
            F.sum(
                F.when(
                    F.col("_d") * 2 > F.lit(int(k_mad)).cast("long") * F.col("mad2"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_anom"),
        )
    )


def theilsen_trend(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    scale: int = 1000000,
) -> DataFrame:
    """Theil-Sen robust trend slope per key (Theil 1950, Sen 1968): the
    median over all bucket pairs of (count_j − count_i)/(t_j − t_i) —
    the MAGNITUDE companion to `mk_trend` (which only signs the trend),
    with the same 29%-contamination breakdown point that makes it the
    right slope for bursty count series (OLS chases every spike).

    Exact cross-engine discipline: each pair's slope is the scaled
    integer quotient dy·scale DIV dx (both engines truncate DIV
    identically — CLAUDE.md sign caveat: truncation toward zero on
    either sign), and the median over slopes uses the DOUBLED-median
    trick (med2 = 2·median is always an exact integer for integer
    inputs). Slope units: counts per bucket, x`scale`.

    Shape: the pair fan runs on the COLLAPSED (key, bucket) count table
    — C(n_buckets, 2) rows per key, bounded by the calendar, never by
    corpus size; one combinable count + one self-join + one median agg.

    Returns (key, n_buckets, n_pairs, slope2_x1e6).
    """
    bucket_s = {"day": 86400, "hour": 3600, "minute": 60}[bucket]
    counts = (
        df.groupBy(
            F.col(key), F.date_trunc(bucket, F.col(ts_col)).alias("_b")
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            key,
            # bucket index, not epoch seconds: slopes come out in
            # counts-per-BUCKET x scale, the unit a human reads
            F.expr(
                f"CAST(unix_timestamp(_b) AS BIGINT) DIV {bucket_s}"
            ).alias("_t"),
            "_n",
        )
        .localCheckpoint(eager=True)  # both join sides + stats share it
    )
    a = counts.select(
        F.col(key), F.col("_t").alias("ta"), F.col("_n").alias("na")
    )
    b = counts.select(
        F.col(key), F.col("_t").alias("tb"), F.col("_n").alias("nb")
    )
    pairs = (
        a.join(b, key)
        .filter(F.col("ta") < F.col("tb"))
        .select(
            key,
            F.expr(
                f"(nb - na) * CAST({scale} AS BIGINT) DIV (tb - ta)"
            ).alias("_slope"),
        )
    )
    stats = counts.groupBy(key).agg(F.count(F.lit(1)).alias("n_buckets"))
    out = pairs.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("CAST(percentile(_slope, 0.5) * 2 AS BIGINT)").alias(
            "slope2_x1e6"
        ),
    )
    return stats.join(out, key, "left").select(
        key,
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce("slope2_x1e6", F.lit(0)).cast("long").alias("slope2_x1e6"),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str = "v",
    ps_x100=(50, 90, 99),
    n_parts: int = 32,
) -> DataFrame:
    """EXACT global quantiles of an integer column without a global sort
    and without approximation — the scale answer to percentile():
    percentile() sorts (single-partition at the global level),
    percentile_approx() gives error bounds; rank selection over the
    COLLAPSED per-value count table gives the exact lower-quantile order
    statistic with one combinable count + the two-phase prefix sum
    (`ks_from_counts` machinery) + one map-only fan over the requested
    quantiles. The q-th quantile is the k = ceil(q·n)-th smallest value
    (type-1 / lower quantile — both engines replay this definition
    exactly; interpolating definitions are floats by nature).

    Returns (p_x100, k_rank, value) — one row per requested quantile.
    """
    c = df.select(F.col(value_col).cast("long").alias("v"))
    cnt = c.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    parted = cnt.repartitionByRange(n_parts, "v").withColumn(
        "_part", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_part")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted.withColumn("_lc", F.sum("n").over(local_w)).localCheckpoint(
        eager=True
    )
    totals = sorted(
        (r["_part"], r["t"] or 0)
        for r in local.groupBy("_part").agg(F.sum("n").alias("t")).collect()
    )
    offs, acc = [], 0
    for pid, t in totals:
        offs.append((int(pid), acc))
        acc += t
    n_total = acc
    off_df = local.sparkSession.createDataFrame(offs, "_part int, _off long")
    cum = local.join(F.broadcast(off_df), "_part").select(
        "v", (F.col("_off") + F.col("_lc")).alias("cum")
    )
    ks = [(int(p), max((int(p) * n_total + 99) // 100, 1)) for p in ps_x100]
    k_df = local.sparkSession.createDataFrame(ks, "p_x100 long, k_rank long")
    return (
        cum.crossJoin(F.broadcast(k_df))
        .filter(F.col("cum") >= F.col("k_rank"))
        .groupBy("p_x100", "k_rank")
        .agg(F.min("v").alias("value"))
    )


def bowley_skew(
    df: DataFrame,
    key: str = "event_type",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Bowley quartile skewness per key (Bowley 1901):
    (Q3 + Q1 − 2·Q2)/(Q3 − Q1) — the ROBUST shape statistic (moment
    skewness needs a cube-normalized third moment: float-irrational and
    outlier-hostage; Bowley is pure order statistics, bounded in [−1, 1]).
    The tail-asymmetry readout beside the median/MAD outlier screen.

    Exact-integer discipline via QUADRUPLED quartiles (the doubled-median
    trick at p = .25 granularity): linear interpolation at the quartiles
    of integer data lands on quarter-fractions, so q·4 is always an exact
    integer in BOTH engines (Spark percentile and DuckDB quantile_cont
    interpolate identically); the final ratio is one integer quotient
    ×1e6. Per-key exact percentile is right for bounded key cardinality
    (same contract as robust_outlier_report).

    Returns (key, n, q1_4, q2_4, q3_4, bowley_x1e6).
    """
    q = df.select(
        key,
        F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5))
        .cast("long")
        .alias("__v"),
    )
    per = q.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(percentile(__v, 0.25) * 4 AS BIGINT)").alias("q1_4"),
        F.expr("CAST(percentile(__v, 0.5) * 4 AS BIGINT)").alias("q2_4"),
        F.expr("CAST(percentile(__v, 0.75) * 4 AS BIGINT)").alias("q3_4"),
    )
    return per.select(
        key,
        "n",
        "q1_4",
        "q2_4",
        "q3_4",
        F.expr(
            "CAST(CASE WHEN q3_4 = q1_4 THEN 0 "
            "ELSE (CASE WHEN q3_4 + q1_4 - 2 * q2_4 < 0 THEN -1 ELSE 1 END) "
            "* (abs(q3_4 + q1_4 - 2 * q2_4) * 1000000 DIV (q3_4 - q1_4)) "
            "END AS BIGINT)"
        ).alias("bowley_x1e6"),
    )


def grouped_exact_quantiles(
    df: DataFrame,
    key: str,
    value_col: str = "v",
    ps_x100=(50, 90, 99),
) -> DataFrame:
    """EXACT per-key quantiles that survive scale — the production
    answer to quantiles_by_type's documented caveat (exact percentile()
    sorts each key's raw VALUES; percentile_approx trades error bars):
    rank selection over each key's COLLAPSED distinct-value counts. The
    cumulative window partitions BY KEY over the collapsed table, so a
    key's partition holds its distinct-value count, not its row count —
    hot keys with heavy ties (status codes, prices, latencies bucketed
    by ms) collapse massively; a key whose values are all-distinct
    degrades to its row count and wants the global two-phase machinery
    (`exact_quantiles`) per key-range instead, documented trade.

    Type-1 lower quantile (k = ceil(q·n)-th smallest), engine-exact by
    definition. One combinable (key, v) count, ONE key-partitioned
    window shared by all quantiles, a map-only fan over requested ps.

    Returns (key, p_x100, k_rank, value).
    """
    cnt = df.select(
        F.col(key), F.col(value_col).cast("long").alias("v")
    ).groupBy(key, "v").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(key).orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cnt.withColumn("cum", F.sum("n").over(w)).localCheckpoint(
        eager=True
    )  # totals + quantile fan share the windowed table
    tot = cum.groupBy(key).agg(F.max("cum").alias("nt"))
    ks = F.array(*[F.lit(int(p)) for p in ps_x100])
    k_fan = tot.select(
        key, F.explode(ks).alias("p_x100"), "nt"
    ).select(
        key,
        "p_x100",
        F.greatest(
            F.expr("(p_x100 * nt + 99) DIV 100"), F.lit(1)
        ).alias("k_rank"),
    )
    return (
        cum.join(k_fan, key)
        .filter(F.col("cum") >= F.col("k_rank"))
        .groupBy(key, "p_x100", "k_rank")
        .agg(F.min("v").alias("value"))
        .select(
            key,
            F.col("p_x100").cast("long").alias("p_x100"),
            F.col("k_rank").cast("long").alias("k_rank"),
            "value",
        )
    )


def winsorized_mean(
    df: DataFrame,
    key: str = "event_type",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Quartile-winsorized mean per key: clamp values at Q1 and Q3, then
    average — the robust LOCATION estimate completing the family
    (median/MAD = robust spread + outliers, Bowley = robust shape, this
    = robust center that, unlike the median, still moves with the bulk
    of the data). The metric a latency SLO should quote when p99 garbage
    would drag a plain mean.

    Clamping is pinned to the QUARTILES, not an arbitrary p: quartile
    positions (n−1)·0.25 are exact in double (0.25 is a binary power)
    so interpolation lands on exact quarter-fractions and q·4 is an
    exact integer in BOTH engines (bowley_skew trick). A p like 0.1 is
    NOT binary-exact — its interpolated tenth-fractions truncate
    differently across engines by ULPs. The mean is the staged integer
    quotient sum4·1e6 DIV (4n) — bit-exact cross-engine. Per-key exact
    percentile is right for bounded key cardinality
    (robust_outlier_report contract).

    Returns (key, n, lo4, hi4, sum4, wmean_x1e6) — wmean in scaled-value
    units ×1e6.
    """
    q = df.select(
        key,
        F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5))
        .cast("long")
        .alias("__v"),
    ).localCheckpoint(eager=True)  # bounds + clamp pass share it
    bounds = q.groupBy(key).agg(
        F.expr("CAST(percentile(__v, 0.25) * 4 AS BIGINT)").alias("lo4"),
        F.expr("CAST(percentile(__v, 0.75) * 4 AS BIGINT)").alias("hi4"),
    )
    clamped = q.join(F.broadcast(bounds), key).select(
        key,
        "lo4",
        "hi4",
        F.least(F.greatest(F.col("__v") * 4, F.col("lo4")), F.col("hi4")).alias(
            "__c4"
        ),
    )
    return clamped.groupBy(key, "lo4", "hi4").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__c4").cast("long").alias("sum4"),
        F.expr(
            "CAST(sum(__c4) DIV (4 * count(1)) * CAST(1000000 AS BIGINT) "
            "+ sum(__c4) % (4 * count(1)) * CAST(1000000 AS BIGINT) "
            "DIV (4 * count(1)) AS BIGINT)"
        ).alias("wmean_x1e6"),
    ).select(key, "n", "lo4", "hi4", "sum4", "wmean_x1e6")


def spearman_corr(
    df: DataFrame,
    key: str = "event_type",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Spearman rank correlation per key — the monotone-association
    readout beside `cross_correlation`'s linear r² (Pearson on bucket
    deviations) and `theilsen_trend`'s slope: rank first, correlate
    second, so one wild outlier or any monotone rescaling of either
    variable leaves the score untouched. The screen a feature-audit
    runs over (feature, label) pairs before trusting a linear fit.

    Exact-integer quantized spec (replayed bit-for-bit by the oracle):
    x and y must already be BIGINTs (callers pre-scale floats to a
    grid). Ties get DOUBLED midranks — for a tie block the doubled
    midrank is min_rank + max_rank, computed as rank() plus a
    RANGE-unbounded-preceding count over the SAME (key, value) sort, so
    no extra (key, value) exchange is ever introduced. Σ(2·midrank) is
    n(n+1) regardless of ties, so the exact deviation is
    dmr − (n+1); deviations are snapped to a ±1e6 grid
    (dev·1e6 DIV n, truncation identical cross-engine per the sign
    caveat) making every moment n-bounded: Σg² ≤ n·1e12 — safe in
    BIGINT to ~9e6 rows per key; beyond that pre-bucket values or lift
    the moments to DECIMAL(38). The signed r² is the DENOMINATOR-staged
    toolkit quotient sign(num)·(|num| DIV max(Sxx DIV 1e3, 1))·(|num|
    DIV max(Syy DIV 1e3, 1)) — pre-dividing each moment by 1e3 instead
    of multiplying |num| keeps every intermediate within the moment
    bound itself (the |num|·1e3 form overflowed at n ≳ 27k per key on
    near-perfectly-correlated data: |num| → n·1e12/3); still
    Cauchy-Schwarz-bounded within ±1e6 up to the 1e-3 denominator
    quantization, replayed identically by the oracle.

    Plan shape: both rank windows partition by `key` (two in-partition
    sorts, ONE exchange Catalyst shares); the final moment rollup reuses
    the same key partitioning. No driver collect, no self-join.

    Returns (key, n, num, spearman_r2_x1e6) — r² carries the sign of
    the correlation (−1e6 = perfectly discordant, 1e6 = perfectly
    concordant, 0 = no monotone association or a constant side).
    """
    rows = df.select(key, F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))

    def dmr(col: str) -> F.Column:
        ws = Window.partitionBy(key).orderBy(col)
        cum = (
            Window.partitionBy(key)
            .orderBy(col)
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.rank().over(ws) + F.count(F.lit(1)).over(cum)

    wk = Window.partitionBy(key)
    ranked = rows.select(
        key,
        dmr("__x").alias("__dx"),
        dmr("__y").alias("__dy"),
        F.count(F.lit(1)).over(wk).alias("__n"),
    ).select(
        key,
        "__n",
        F.expr("(__dx - (__n + 1)) * CAST(1000000 AS BIGINT) DIV __n").alias("__gx"),
        F.expr("(__dy - (__n + 1)) * CAST(1000000 AS BIGINT) DIV __n").alias("__gy"),
    )
    return (
        ranked.groupBy(key)
        .agg(
            F.max("__n").cast("long").alias("n"),
            F.sum(F.col("__gx") * F.col("__gy")).cast("long").alias("num"),
            F.sum(F.col("__gx") * F.col("__gx")).cast("long").alias("__sxx"),
            F.sum(F.col("__gy") * F.col("__gy")).cast("long").alias("__syy"),
        )
        .select(
            key,
            "n",
            "num",
            F.expr(
                "CAST(CASE WHEN __sxx = 0 OR __syy = 0 THEN 0 ELSE "
                "(CASE WHEN num < 0 THEN -1 ELSE 1 END) "
                "* (abs(num) DIV greatest(__sxx DIV 1000, 1)) "
                "* (abs(num) DIV greatest(__syy DIV 1000, 1)) END AS BIGINT)"
            ).alias("spearman_r2_x1e6"),
        )
    )


def ols_slope(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Exact-integer OLS slope of per-bucket counts per key — the
    least-squares companion to `theilsen_trend` (median-of-slopes) and
    `mk_trend` (sign test) on the same collapsed bucket-count table: the
    number a capacity forecast extrapolates with, where Theil-Sen gives
    the outlier-robust check. Reporting BOTH and comparing is the
    standard trend-audit recipe (a large OLS/Theil-Sen gap flags
    leverage points).

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x = epoch-bucket
    index and y = bucket count: all moments are BIGINT-exact off the
    tiny collapsed table (buckets-per-key rows, not events), and
    slope_x1e6 is the signed staged quotient — truncation toward zero
    identical in both engines (CLAUDE.md sign caveat: replay plain DIV,
    never "fix" it). Bounds: n·Σxy needs buckets·(epoch_index·count)² ≪
    2^63 — epoch-DAY indices (~2e4) keep it safe for ~1e9 buckets;
    finer buckets should rebase the index before the moments.

    Shape: one combinable (key, bucket) count collapses the input;
    every moment is ONE rollup over that table sharing its key
    exchange. Single-bucket keys read slope 0 (den = 0 guard).

    Returns (key, n_buckets, num, den, slope_x1e6).
    """
    trunc = F.date_trunc(bucket, F.col(ts_col))
    cnt = (
        df.select(key, trunc.alias("__b"))
        .groupBy(key, "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__y"))
        .select(
            key,
            F.floor(F.unix_timestamp("__b") / F.lit(86400)).cast("long").alias("__x")
            if bucket == "day"
            else F.unix_timestamp("__b").cast("long").alias("__x"),
            "__y",
        )
    )
    return (
        cnt.groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("__x").cast("long").alias("__sx"),
            F.sum("__y").cast("long").alias("__sy"),
            F.sum(F.col("__x") * F.col("__y")).cast("long").alias("__sxy"),
            F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__sxx"),
        )
        .select(
            key,
            "n_buckets",
            (F.col("n_buckets") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
            .cast("long")
            .alias("num"),
            (F.col("n_buckets") * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
            .cast("long")
            .alias("den"),
        )
        .select(
            key,
            "n_buckets",
            "num",
            "den",
            F.expr(
                "CAST(CASE WHEN den = 0 THEN 0 ELSE "
                "num DIV den * CAST(1000000 AS BIGINT) "
                "+ num % den * CAST(1000000 AS BIGINT) DIV den END AS BIGINT)"
            ).alias("slope_x1e6"),
        )
    )


def rfm_segments(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
    n_bands: int = 5,
) -> DataFrame:
    """Classic RFM (recency / frequency / monetary) segmentation — the
    retention readout beside `cohort_retention` and `survival_table`:
    every user scored 1..n_bands on each axis by exact rank position,
    then stamped with the 3-digit segment code marketing/curation rules
    key on (555 = best on all three).

    Engine-exact banding: no ntile (its remainder-spreading is
    convention-dependent) — score = (n_bands·(rank−1)) DIV n + 1 over a
    row_number with the key as the pinned tie-break, ordered worst →
    best per axis (oldest last-touch, lowest frequency, lowest spend
    first), so the best users always take the top band. Monetary is
    integer cents (scale=100) summed per user BEFORE banding; recency
    is days before the corpus max timestamp (integer DIV 86400).

    Shape: one combinable per-key aggregate collapses events to one row
    per key; the three ranking windows then run over the COLLAPSED
    table (|keys| rows, not |events|) — the single-partition global
    window is deliberate and bounded by user count, the same contract
    as every "rank all customers" readout; at larger |keys| swap the
    banding to thresholds from the exact distributed quantile selection
    (global_quantiles) without changing scores.

    Returns (key, recency_days, frequency, monetary_cents, r_score,
    f_score, m_score, rfm_code).
    """
    per = df.groupBy(F.col(key).alias("__k")).agg(
        F.max(F.unix_timestamp(ts_col).cast("long")).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(
            F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5))
            .cast("long")
        ).cast("long").alias("monetary_cents"),
    )
    gmax = per.agg(F.max("__last").alias("__gmax"))
    per = per.join(F.broadcast(gmax)).select(
        "__k",
        F.expr("(__gmax - __last) DIV 86400").alias("recency_days"),
        "frequency",
        "monetary_cents",
        "__last",
    )
    ranked = per.select(
        "__k",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__n"),
        # oldest (largest recency_days) first -> lowest band
        F.row_number()
        .over(
            Window.partitionBy().orderBy(
                F.col("recency_days").desc(), F.col("__k")
            )
        )
        .alias("__rr"),
        F.row_number()
        .over(
            Window.partitionBy().orderBy(F.col("frequency").asc(), F.col("__k"))
        )
        .alias("__fr"),
        F.row_number()
        .over(
            Window.partitionBy().orderBy(
                F.col("monetary_cents").asc(), F.col("__k")
            )
        )
        .alias("__mr"),
    )
    scored = ranked.select(
        "__k",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.expr(
            f"CAST({n_bands} AS BIGINT) * (__rr - 1) DIV __n + 1"
        ).alias("r_score"),
        F.expr(
            f"CAST({n_bands} AS BIGINT) * (__fr - 1) DIV __n + 1"
        ).alias("f_score"),
        F.expr(
            f"CAST({n_bands} AS BIGINT) * (__mr - 1) DIV __n + 1"
        ).alias("m_score"),
    )
    return scored.select(
        F.col("__k").alias(key),
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("long")
        .alias("rfm_code"),
    )


def touch_attribution(
    df: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conversion: str = "purchase",
    touch_types: tuple = ("click", "view"),
    window_seconds: int = 7 * 86400,
) -> DataFrame:
    """Multi-touch attribution: every conversion distributes exactly
    1e6 credit units over its preceding touch events inside the lookback
    window — the marketing readout (which channel "caused" purchases)
    and, on transcripts, the tool-credit readout (which tool calls
    preceded task completion). Linear credit with an EXACT-sum pin:
    each of the k touches gets 1e6 DIV k and the LAST touch (closest to
    the conversion, ties by id) absorbs the remainder 1e6 % k, so
    credit sums to exactly 1e6·|attributed conversions| — the invariant
    an attribution report must satisfy and floats never do. First- and
    last-touch columns come free from the same pair table (rank 1 from
    each end).

    Shape: one equi-join on the key with the window predicate as a
    post-filter (the funnel contract: conversions prune hard; for keys
    with very long histories ride a time-binned band join instead), two
    ranks + the credit arithmetic inside ONE (key, conversion) window
    partition family, one combinable rollup per touch type. Conversions
    with zero in-window touches are counted separately (n_unattributed).

    Returns one row per touch type: (touch_type, n_touches,
    n_conversions_touched, credit_x1e6, first_touch, last_touch) plus
    one '__unattributed__' row carrying n_conversions with no touches.
    """
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    base = df.select(
        F.col(key).alias("__k"),
        F.col(type_col).alias("__t"),
        sec.alias("__s"),
        F.col(id_col).cast("long").alias("__id"),
    )
    conv = base.filter(F.col("__t") == conversion).select(
        "__k",
        F.col("__s").alias("__cs"),
        F.col("__id").alias("__cid"),
    )
    touch = base.filter(F.col("__t").isin(*touch_types)).select(
        "__k",
        F.col("__t").alias("touch_type"),
        F.col("__s").alias("__ts"),
        F.col("__id").alias("__tid"),
    )
    pairs = conv.join(touch, "__k").filter(
        (F.col("__ts") <= F.col("__cs"))
        & (F.col("__cs") - F.col("__ts") <= window_seconds)
        & (F.col("__tid") != F.col("__cid"))
    )
    wconv = Window.partitionBy("__k", "__cid")
    wlast = wconv.orderBy(F.col("__ts").desc(), F.col("__tid").desc())
    wfirst = wconv.orderBy(F.col("__ts").asc(), F.col("__tid").asc())
    credited = pairs.select(
        "__k",
        "__cid",
        "touch_type",
        F.count(F.lit(1)).over(wconv).alias("__kcnt"),
        F.row_number().over(wlast).alias("__rl"),
        F.row_number().over(wfirst).alias("__rf"),
    ).select(
        "touch_type",
        "__cid",
        F.expr(
            "CAST(1000000 AS BIGINT) DIV __kcnt"
            " + CASE WHEN __rl = 1 THEN CAST(1000000 AS BIGINT) % __kcnt"
            "        ELSE 0 END"
        ).alias("__credit"),
        (F.col("__rf") == 1).cast("long").alias("__is_first"),
        (F.col("__rl") == 1).cast("long").alias("__is_last"),
    )
    per_type = credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.countDistinct("__cid").cast("long").alias("n_conversions_touched"),
        F.sum("__credit").cast("long").alias("credit_x1e6"),
        F.sum("__is_first").cast("long").alias("first_touch"),
        F.sum("__is_last").cast("long").alias("last_touch"),
    )
    unattributed = (
        conv.join(
            credited.select(F.col("__cid").alias("__cid2")).distinct(),
            conv["__cid"] == F.col("__cid2"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_conversions_touched"))
        .select(
            F.lit("__unattributed__").alias("touch_type"),
            F.lit(0).cast("long").alias("n_touches"),
            "n_conversions_touched",
            F.lit(0).cast("long").alias("credit_x1e6"),
            F.lit(0).cast("long").alias("first_touch"),
            F.lit(0).cast("long").alias("last_touch"),
        )
    )
    return per_type.unionByName(unattributed)


def peak_concurrency(
    df: DataFrame,
    key: str = "event_type",
    start_col: str = "s",
    end_col: str = "e",
    id_col: str = "id",
) -> DataFrame:
    """Peak number of simultaneously-open intervals per key and the
    earliest instant it is reached — the utilization/capacity readout
    (max concurrent sessions, peak open tool calls, Little's-law
    sanity input). Intervals are half-open [s, e): an interval ending
    exactly when another starts does NOT overlap it.

    Sweep line as columnar algebra: each interval becomes a +1 event at
    s and a −1 at e; one (key) window ordered by (instant, delta, id)
    — ends sort BEFORE starts at the same instant (half-open) via
    delta ASC (−1 < +1) — and the running sum's maximum is the peak.
    The earliest peak instant is pinned by taking min(instant) among
    rows hitting the max. Ties inside an instant can only UNDERSTATE
    never overstate intermediate sums, and the true concurrency is
    attained at the last +1 of each instant, which the running sum
    does visit — so the max is exact.

    One exchange on the key, one in-partition sort, one rollup: the
    same tagged-stream pattern as weighted_interval_schedule's
    compatibility index. Returns (key, n_intervals, peak, peak_at).
    """
    base = df.select(
        F.col(key).alias("__k"),
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
        F.col(id_col).cast("long").alias("__id"),
    )
    tagged = base.select(
        "__k", F.col("__s").alias("__at"), F.lit(1).alias("__d"), "__id"
    ).unionByName(
        base.select(
            "__k", F.col("__e").alias("__at"), F.lit(-1).alias("__d"), "__id"
        )
    )
    wrun = (
        Window.partitionBy("__k")
        .orderBy("__at", "__d", "__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = tagged.withColumn("__c", F.sum("__d").over(wrun)).withColumn(
        "__mx", F.max("__c").over(Window.partitionBy("__k"))
    )
    return (
        run.groupBy("__k")
        .agg(
            F.sum(F.when(F.col("__d") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_intervals"),
            F.max("__c").cast("long").alias("peak"),
            F.min(F.when(F.col("__c") == F.col("__mx"), F.col("__at")))
            .cast("long")
            .alias("peak_at"),
        )
        .select(F.col("__k").alias(key), "n_intervals", "peak", "peak_at")
    )


def growth_accounting(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    period: str = "month",
) -> DataFrame:
    """Growth accounting (the MAU bridge): every active (key, period)
    is classified NEW (first period ever), RETAINED (also active the
    immediately preceding period) or RESURRECTED (active before, but
    not last period); CHURNED counts keys active last period but not
    this one. The identity active_t = new + retained + resurrected and
    active_t − active_{t−1} = new + resurrected − churned both hold
    exactly — the bridge a growth report must reconcile.

    Engine-neutral periods: month = epoch-day DIV 30, week = DIV 7,
    day = DIV 1 (calendar-month builtins disagree across engines; the
    fixed-width grid is the hash-gateable spec, documented as such).

    Shape: one distinct (key, period) collapse; classification is one
    lag window per key over its ACTIVE periods only (gaps carry the
    resurrected signal via period − lag > 1); churn re-aggregates the
    same lagged table shifted one period forward. No self-join.

    Returns (period, n_active, n_new, n_retained, n_resurrected,
    n_churned) — churned counted INTO the first period after the
    activity (so a user active in the data's last period is not
    churned yet).
    """
    pd_expr = {"month": 30, "week": 7, "day": 1}[period]
    act = (
        df.select(
            F.col(key).alias("__k"),
            F.expr(
                f"CAST(unix_timestamp({ts_col}) AS BIGINT) DIV 86400"
                f" DIV {pd_expr}"
            ).alias("__p"),
        )
        .distinct()
    )
    w = Window.partitionBy("__k").orderBy("__p")
    lagged = act.withColumn("__prev", F.lag("__p").over(w)).localCheckpoint(
        eager=True
    )  # feeds the class rollup AND the churn shift
    classed = lagged.groupBy("__p").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum(F.col("__prev").isNull().cast("long"))
        .cast("long")
        .alias("n_new"),
        F.sum((F.col("__p") - F.col("__prev") == 1).cast("long"))
        .cast("long")
        .alias("n_retained"),
        F.sum((F.col("__p") - F.col("__prev") > 1).cast("long"))
        .cast("long")
        .alias("n_resurrected"),
    )
    # churn: a key active in p with no activity in p+1 churns INTO p+1;
    # equivalently, count (prev -> p) transitions with gap > 1 plus
    # last-activity rows, attributed to prev+1. Use the NEXT pointer.
    wn = Window.partitionBy("__k").orderBy("__p")
    nxt = lagged.withColumn("__next", F.lead("__p").over(wn))
    gmax = lagged.agg(F.max("__p").alias("__gmax"))
    churned = (
        nxt.filter(
            F.col("__next").isNull() | (F.col("__next") - F.col("__p") > 1)
        )
        .select((F.col("__p") + 1).alias("__p"))
        .join(F.broadcast(gmax))
        .filter(F.col("__p") <= F.col("__gmax"))  # last-period actives
        # have not had a chance to churn yet
        .groupBy("__p")
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        classed.join(churned, "__p", "full_outer")
        .select(
            F.col("__p").alias("period"),
            F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias(
                "n_retained"
            ),
            F.coalesce("n_resurrected", F.lit(0)).cast("long").alias(
                "n_resurrected"
            ),
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
    )


def record_counts(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "v",
    id_col: str = "id",
) -> DataFrame:
    """Record (running-maximum) statistics per key — the nonparametric
    trend screen from record theory: for exchangeable data the
    expected number of strict records in n observations is the
    harmonic number H(n) ≈ ln n, so a key whose record count far
    exceeds ln n is trending up WITHOUT any distributional assumption
    — the zero-parameter cousin of mk_trend, useful as a cheap first
    pass. Also emits the last record's position (late records = the
    trend is recent).

    A record is v STRICTLY greater than every earlier value (first
    observation counts); order is (ts, id) pinned. One key window
    (running max over the preceding frame), one rollup — no join.

    Returns (key, n, n_records, last_record_pos) with positions
    1-based.
    """
    w = Window.partitionBy("__k").orderBy("__t", "__id")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    rows = df.select(
        F.col(key).alias("__k"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("__t"),
        F.col(val_col).cast("long").alias("__v"),
        F.col(id_col).cast("long").alias("__id"),
    ).select(
        "__k",
        F.row_number().over(w).cast("long").alias("__pos"),
        (
            F.col("__v") > F.coalesce(F.max("__v").over(wprev), F.lit(-(2**62)))
        ).cast("long").alias("__rec"),
    )
    return rows.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__rec").cast("long").alias("n_records"),
        F.max(F.when(F.col("__rec") == 1, F.col("__pos")))
        .cast("long")
        .alias("last_record_pos"),
    ).select(F.col("__k").alias(key), "n", "n_records", "last_record_pos")


def changepoint_scan(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Single most-likely mean changepoint per key — the CUSUM
    maximum-deviation scan (Page 1954 / binary segmentation depth 1: the
    split a monitoring pipeline alerts on, and the recursion step of full
    binary segmentation run per detected segment): over the key's
    time-ordered integer-cent values, the statistic at split i is
    g_i = |n·S_i − i·S_n| (the cross-multiplied form of
    |S_i − (i/n)·S_n|, so it is BIGINT-exact — no per-key mean float
    ever exists), maximized over 1 <= i < n with the EARLIEST i pinned
    on ties.

    Shape: values are scaled to integer cents per row BEFORE any sum
    (double summation order differs between engines; per-row floor does
    not), then ONE (key, ts, id) window pass computes i, S_i, n, S_n —
    prefix and total from the same exchange — and the per-key argmax is
    a second window over the SAME key partitioning (no new exchange).
    Nothing leaves the key's partition; the output is |keys| rows.

    Overflow bound: |n·S_i| <= n·Σ|cents| — safe while a key's row count
    times its absolute cent mass stays under 2^63 (~9.2e18; a key with
    1e6 rows of ~$100 values sits at 1e13).

    Returns (key, n, split_i, split_id, gmax): the 1-based prefix length
    of the left segment, the id of its last row, and the raw statistic
    in cent·row units. gmax near 0 reads "no level shift"; calibrate the
    null by comparing keys.
    """
    cents = F.floor(
        F.col(value_col).cast("double") * scale + F.lit(0.5)
    ).cast("long")
    w_ord = Window.partitionBy("key").orderBy("__ts", "__id")
    w_all = Window.partitionBy("key")
    pref = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("__id"),
        F.col(ts_col).alias("__ts"),
        cents.alias("__v"),
    ).select(
        "key",
        "__id",
        F.row_number().over(w_ord).cast("long").alias("__i"),
        F.sum("__v").over(w_ord).cast("long").alias("__si"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        F.sum("__v").over(w_all).cast("long").alias("__sn"),
    )
    stat = pref.filter(F.col("__i") < F.col("n")).select(
        "key",
        "n",
        F.col("__i").alias("split_i"),
        F.col("__id").alias("split_id"),
        F.abs(
            F.col("n") * F.col("__si") - F.col("__i") * F.col("__sn")
        ).cast("long").alias("gmax"),
    )
    w_pick = Window.partitionBy("key").orderBy(
        F.col("gmax").desc(), F.col("split_i").asc()
    )
    return (
        stat.withColumn("__rn", F.row_number().over(w_pick))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def fano_burstiness(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Index of dispersion (Fano factor) of per-bucket event counts per
    key — the burstiness readout a rate-limiter or capacity planner
    quotes: a Poisson arrival process reads IoD ≈ 1, clumped/bursty
    traffic reads > 1, a metronome reads < 1. Complements
    `gap_histogram` (inter-arrival shape) and the Kleinberg burst
    decoder (when the bursts are) with a single per-key dispersion
    number.

    Empty buckets COUNT: the denominator is the full observed span
    B = max_bucket − min_bucket + 1 (engine-neutral epoch DIV
    bucket_seconds integers), because a key that fires 1000 events in
    one hour of a month-long span is the textbook burst — dropping the
    empty hours would hide it.

    Exactness: with T = Σ counts and Q = Σ counts², population
    var/mean = (B·Q − T²)/(B·T) — a plain non-negative rational
    (Cauchy-Schwarz gives B·Q >= T²) of BIGINT moments, emitted as the
    staged 1e6 quotient. Overflow bound: B·Q <= B·T² — lift to
    DECIMAL(38) past ~3e9 event-seconds per key.

    Shape: ONE (key, bucket) collapse (map-side combined) + one per-key
    rollup; output is |keys| rows.

    Returns (key, n_buckets_span, n_active_buckets, n_events, sum_sq,
    iod_x1e6)."""
    b = F.expr(
        f"CAST(unix_timestamp({ts_col}) AS BIGINT) DIV {bucket_seconds}"
    )
    counts = (
        df.select(F.col(key_col).alias("key"), b.alias("__b"))
        .groupBy("key", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    return (
        counts.groupBy("key")
        .agg(
            (F.max("__b") - F.min("__b") + 1)
            .cast("long")
            .alias("n_buckets_span"),
            F.count(F.lit(1)).cast("long").alias("n_active_buckets"),
            F.sum("__c").cast("long").alias("n_events"),
            F.sum(F.col("__c") * F.col("__c")).cast("long").alias("sum_sq"),
        )
        .select(
            "key",
            "n_buckets_span",
            "n_active_buckets",
            "n_events",
            "sum_sq",
            F.expr(
                "CAST((n_buckets_span * sum_sq - n_events * n_events)"
                " DIV (n_buckets_span * n_events) * CAST(1000000 AS BIGINT)"
                " + (n_buckets_span * sum_sq - n_events * n_events)"
                "   % (n_buckets_span * n_events) * CAST(1000000 AS BIGINT)"
                "   DIV (n_buckets_span * n_events) AS BIGINT)"
            ).alias("iod_x1e6"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    key_col: str,
    time_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan-Meier survival estimator per key (Kaplan & Meier 1958),
    censoring-aware — the time-to-event readout a product/retention
    pipeline runs (time to churn, time to first purchase, session
    survival) where naive averaging of durations is biased by users still
    under observation. One row per (key, distinct event-or-censor time):
    risk set, events, censorings, and the curve.

    Exact-integer contract: S(t) = prod over event times t' <= t of
    (1 - d/n) is emitted in 16*log2 units — log2_surv_x16 =
    -SUM msb16((n * 2^20) DIV (n - d)) - 320 terms — via the same msb16
    staged-quotient device as PMI/DSIR (operators/sampling._msb16_sql),
    so no float multiplication chain exists in either engine. Once a
    risk set is exhausted (n == d, the curve hits exact zero), later
    rows emit NULL (log of zero), propagated by an explicit
    cumulative-death flag because window SUM skips NULLs.

    Shape: one (key, time) collapse, then TWO windows on the SAME key
    partitioning (desc-time cumulative for the risk set, asc-time
    cumulative for the log-survival walk) — a single exchange end to
    end, the changepoint_scan family; output is |distinct times| rows.

    The Nelson-Aalen cumulative hazard rides along for free:
    cumhaz_x1e6 = SUM over event times of d*1e6 DIV n — a per-term staged
    quotient (each term exact in 1e-6 units, same walk window), the
    standard companion estimate H(t) ~ -ln S(t).

    Returns (key, t, n_risk, d, c, log2_surv_x16, cumhaz_x1e6).
    """
    from .sampling import _msb16_sql

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(time_col).cast("long").alias("t"),
        F.col(observed_col).cast("long").alias("__obs"),
    )
    # repartition on key ALONE: hashpartitioning(key) satisfies the
    # (key, t) aggregation's clustered distribution AND both downstream
    # key windows — one exchange end to end (plan-pinned)
    dd = base.repartition("key").groupBy("key", "t").agg(
        F.sum("__obs").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("__obs")).cast("long").alias("c"),
    )
    w_desc = (
        Window.partitionBy("key")
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_asc = (
        Window.partitionBy("key")
        .orderBy(F.asc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = dd.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(w_desc).cast("long")
    )
    step = F.expr(
        "CASE WHEN d = 0 THEN CAST(0 AS BIGINT) "
        "WHEN n_risk > d THEN -(CAST("
        + _msb16_sql("n_risk * 1048576 DIV (n_risk - d)")
        + " AS BIGINT) - 320) ELSE CAST(0 AS BIGINT) END"
    )
    walked = (
        risk.withColumn("__step", step)
        .withColumn("__dead", F.max((F.col("d") >= F.col("n_risk")) & (F.col("d") > 0)).over(w_asc))
        .withColumn("__cum", F.sum("__step").over(w_asc))
        .withColumn(
            "__haz",
            F.sum(F.expr("d * 1000000 DIV n_risk")).over(w_asc),
        )
    )
    return walked.select(
        "key",
        "t",
        "n_risk",
        "d",
        "c",
        F.when(F.col("__dead"), F.lit(None).cast("long"))
        .otherwise(F.col("__cum").cast("long"))
        .alias("log2_surv_x16"),
        F.col("__haz").cast("long").alias("cumhaz_x1e6"),
    )


def logrank_test(
    df: DataFrame,
    key_col: str,
    time_col: str,
    observed_col: str,
    group_col: str,
) -> DataFrame:
    """Two-group log-rank test per key (Mantel 1966) — does group 1
    survive differently from group 0? The inference companion to
    `kaplan_meier`: at every pooled event time the observed group-1
    events are compared with the hypergeometric expectation
    E1 = d*n1/n, variance V = d*n1*n2*(n-d)/(n^2*(n-1)), and the
    statistic (O1-E1)^2/V is chi-square(1) under H0.

    Exact-integer contract: E1 and V accumulate as per-term staged
    quotients in 1e-6 units (intermediates bounded ~n*1e3 and n^2*1e3 —
    BIGINT-safe to n ~ 1e6 subjects per key; lift to DECIMAL(38) past
    that); the chi-square statistic is emitted in 16*log2 units via the
    msb16 identity log2(a^2/(1e6*v)) = 2*msb16(a) - msb16(v) - 318,
    sidestepping the (O1-E1)^2 overflow entirely (318 = msb16(1e6)).
    Compare z2_log2_x16 against 16*log2(3.84) ~ 31 for the 5% line.

    Shape: one (key, t) conditional collapse + desc-t risk-set windows on
    ONE key partitioning + one key rollup — the kaplan_meier exchange
    plan with a second group column, |keys| output rows.

    Returns (key, o1, e1_x1e6, v_x1e6, diff_x1e6, z2_log2_x16).
    """
    from .sampling import _msb16_sql

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(time_col).cast("long").alias("t"),
        F.col(observed_col).cast("long").alias("__obs"),
        F.col(group_col).cast("long").alias("__g"),
    )
    dd = base.repartition("key").groupBy("key", "t").agg(
        F.sum(F.when(F.col("__g") == 0, F.col("__obs")).otherwise(0))
        .cast("long")
        .alias("d0"),
        F.sum(F.when(F.col("__g") == 0, 1 - F.col("__obs")).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("__g") == 1, F.col("__obs")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("__g") == 1, 1 - F.col("__obs")).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    w_desc = (
        Window.partitionBy("key")
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = dd.withColumn(
        "n0", F.sum(F.col("d0") + F.col("c0")).over(w_desc).cast("long")
    ).withColumn(
        "n1", F.sum(F.col("d1") + F.col("c1")).over(w_desc).cast("long")
    )
    terms = risk.select(
        "key",
        "d0",
        "d1",
        "n0",
        "n1",
    ).withColumn(
        "e1_term",
        F.expr(
            "CASE WHEN d0 + d1 > 0 THEN (d0 + d1) * n1 * 1000000 DIV (n0 + n1)"
            " ELSE CAST(0 AS BIGINT) END"
        ),
    ).withColumn(
        "v_term",
        F.expr(
            "CASE WHEN d0 + d1 > 0 AND n0 + n1 > 1 THEN"
            " (((d0 + d1) * n1 * 1000 DIV (n0 + n1)) * n0 * 1000"
            "  DIV (n0 + n1)) * (n0 + n1 - d0 - d1) DIV (n0 + n1 - 1)"
            " ELSE CAST(0 AS BIGINT) END"
        ),
    )
    agg = terms.groupBy("key").agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_term").cast("long").alias("e1_x1e6"),
        F.sum("v_term").cast("long").alias("v_x1e6"),
    )
    a = "abs(o1 * 1000000 - e1_x1e6)"
    z2 = (
        f"2 * {_msb16_sql(a)}"
        f" - {_msb16_sql('greatest(v_x1e6, CAST(1 AS BIGINT))')} - 318"
    )
    return agg.select(
        "key",
        "o1",
        "e1_x1e6",
        "v_x1e6",
        F.expr("CAST(o1 * 1000000 - e1_x1e6 AS BIGINT)").alias("diff_x1e6"),
        F.expr(f"CAST({z2} AS BIGINT)").alias("z2_log2_x16"),
    )


def control_chart_flags(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Shewhart control chart with Western Electric rules per key — the
    monitoring screen beside changepoint_scan (that one locates a past
    level shift; this one flags points AS THEY ARRIVE against a frozen
    baseline). Baseline = each key's FIRST HALF in order; every point is
    then judged against the baseline mean/variance:

      rule1: |x - mu| > 3*sigma     (WE rule 1, the classic 3-sigma line)
      rule2: 9 consecutive points (ending here) strictly on one side of
             mu (WE rule 4 run rule — catches small sustained shifts
             3-sigma misses)

    Exact-integer contract: with baseline count n, sum S, sum-of-squares
    Q, the tests cross-multiply to BIGINT comparisons —
    rule1: (n*x - S)^2 > 9*(n*Q - S^2); side(x) = sign(n*x - S); no mean,
    no sigma, no sqrt ever formed. The comparison squares n*x, so it runs
    in 128-bit integers (Spark DECIMAL(38,0) == DuckDB HUGEINT, both
    exact) — safe to n*max|x| ~ 1e18; a 20x soak caught the BIGINT
    version overflowing at n*max|x| ~ 2e9.

    Shape: one (key, order) rank window to split the baseline, one
    baseline agg joined back broadcast, one 8-preceding run window on the
    SAME key partitioning for rule2 — two key exchanges total. Points in
    the baseline half are also emitted (flags evaluate there too; a
    monitoring pipeline usually filters to the live half).

    Returns (key, o, x, side, rule1, rule2).
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("o"),
        F.col(value_col).cast("long").alias("x"),
    )
    w = Window.partitionBy("key").orderBy("o")
    ranked = base.withColumn("__rn", F.row_number().over(w).cast("long"))
    cnt = base.groupBy("key").agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    ranked = ranked.join(F.broadcast(cnt), "key")
    stats = (
        ranked.filter(F.col("__rn") <= F.expr("__cnt DIV 2"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
        )
    )
    j = ranked.join(F.broadcast(stats), "key")
    # 128-bit intermediates: the 3-sigma comparison squares n*x, so BIGINT
    # overflows once n*max|x| ~ 1e9 (caught by soak_monitoring at 20x).
    # DECIMAL(38,0) here == HUGEINT in the oracle — both exact integers.
    dev = F.expr("CAST(n AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) - s")
    flagged = (
        j.withColumn("__dev", dev)
        .withColumn(
            "side",
            F.when(F.col("__dev") > 0, F.lit(1))
            .when(F.col("__dev") < 0, F.lit(-1))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "rule1",
            F.expr(
                "__dev * __dev > 9 * (CAST(n AS DECIMAL(38,0))"
                " * CAST(q AS DECIMAL(38,0))"
                " - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))"
            ),
        )
    )
    w9 = (
        Window.partitionBy("key")
        .orderBy("o")
        .rowsBetween(-8, Window.currentRow)
    )
    out = flagged.withColumn(
        "rule2",
        (F.count(F.lit(1)).over(w9) >= 9)
        & (F.min("side").over(w9) == F.max("side").over(w9))
        & (F.col("side") != 0),
    )
    return out.select("key", "o", "x", "side", "rule1", "rule2")


def haar_energy(
    df: DataFrame,
    key_col: str,
    idx_col: str,
    value_col: str,
    levels: int = 6,
) -> DataFrame:
    """Unnormalized Haar wavelet decomposition per key — the multiscale
    energy profile a time-series pipeline uses for compression choices
    and scale-localized anomaly screening (which RESOLUTION carries the
    signal: spiky traffic loads detail energy at fine levels, daily
    seasonality at the level matching its period). Complements the
    burstiness (fano) and periodicity (autocorrelation) readouts with a
    per-scale breakdown.

    Unnormalized transform (documented: detail = left-half sum minus
    right-half sum per block — integer-exact, no sqrt(2) factors):
    at level l (1 = finest pair level), block b covers indices
    [b*2^l, (b+1)*2^l) and d(l, b) = sum(first half) - sum(second half).
    Per-level energy = sum of d^2. Overflow: |d| <= block mass, energy
    <= (sum|v|)^2 — BIGINT-safe while total key mass < 3e9.

    Shape: NO level loop — one explode fans each point into its `levels`
    (level, block, side) memberships, one (key, level, block) signed
    collapse, one (key, level) rollup. Cost is levels * points, shuffles
    on (key, level, block) once — the minhash-band fan-out rule applied
    to a wavelet pyramid.

    Returns (key, level, n_blocks, nonzero_blocks, energy).
    """
    fan = F.explode(
        F.expr(
            f"transform(sequence(1, {levels}), l -> struct("
            " l AS l,"
            " idx DIV shiftleft(CAST(1 AS BIGINT), l) AS b,"
            " CASE WHEN (idx DIV shiftleft(CAST(1 AS BIGINT), l - 1)) % 2 = 0"
            " THEN 1 ELSE -1 END AS s))"
        )
    )
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(idx_col).cast("long").alias("idx"),
        F.col(value_col).cast("long").alias("v"),
    )
    det = (
        base.select("key", "v", fan.alias("m"))
        .select(
            "key",
            F.col("m.l").alias("level"),
            F.col("m.b").alias("block"),
            (F.col("v") * F.col("m.s")).alias("sv"),
        )
        .groupBy("key", "level", "block")
        .agg(F.sum("sv").cast("long").alias("d"))
    )
    return (
        det.groupBy("key", "level")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.when(F.col("d") != 0, 1).otherwise(0))
            .cast("long")
            .alias("nonzero_blocks"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("energy"),
        )
    )


def hill_tail_index(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 50,
) -> DataFrame:
    """Hill tail-index estimator per key (Hill 1975) — the heavy-tail
    monitor that says whether a positive metric (spend, degree, tokens,
    latency) has a power-law tail and how fat: over the top k order
    statistics, H = mean log(x_i / x_(k+1)); the Pareto exponent is
    alpha = 1/H. The quantitative companion to zipf_msb_slope (that one
    fits the whole rank curve; this one measures just the tail, which is
    what breaks percentile SLOs and skew assumptions).

    Exact-integer contract: log terms via the msb16 device —
    term_i = msb16(x_i * 2^20 DIV x_(k+1)) - 320 (16*log2 units), H
    emitted as the staged milli quotient hill_log2_x16e3 = sum DIV k;
    alpha_x1e3 = 23083000 DIV hill_log2_x16e3 (23083 ~ 16000*log2 e,
    the documented BLEU-style quantization of the ln->log2 change of
    base). Keys with fewer than k+1 positive values emit nothing (the
    estimator is undefined); x_(k+1) = 0 cannot happen (positives only).
    Saturation: when the top k+1 values sit within one 1/16 octave
    (bounded/near-constant tails), every term quantizes to 0 and alpha
    reads the 23083000 cap — the 'no measurable tail' verdict (the
    sf0.01 balances population does exactly this).

    Shape: one key window top-(k+1) + one rollup — single exchange; k is
    a constant, so the window never materializes a full sort at scale
    (rank pushdown to TakeOrdered per key group).

    Returns (key, k, x_k1, hill_log2_x16e3, alpha_x1e3).
    """
    from .sampling import _msb16_sql

    # rank ties broken arbitrarily is SAFE: equal values contribute equal
    # terms, so the top-k value MULTISET (and x_(k+1)) is tie-invariant
    w = Window.partitionBy("key").orderBy(F.desc("v"))
    wall = Window.partitionBy("key")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("long").alias("v"),
    ).filter(F.col("v") > 0)
    topk = (
        base.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k + 1)
        .withColumn("x_k1", F.min("v").over(wall).cast("long"))
        .withColumn("__nk", F.count(F.lit(1)).over(wall).cast("long"))
        .filter(F.col("__nk") == k + 1)
    )
    term = f"({_msb16_sql('v * 1048576 DIV x_k1')} - 320)"
    agg = (
        topk.filter(F.col("rn") <= k)
        .groupBy("key")
        .agg(
            F.max("x_k1").alias("x_k1"),
            F.sum(F.expr(term)).cast("long").alias("__s"),
        )
    )
    h = "(__s DIV {k} * 1000 + __s % {k} * 1000 DIV {k})".format(k=k)
    return agg.select(
        "key",
        F.lit(k).cast("long").alias("k"),
        "x_k1",
        F.expr(f"CAST({h} AS BIGINT)").alias("hill_log2_x16e3"),
        F.expr(
            f"CAST(23083000 DIV greatest({h}, CAST(1 AS BIGINT)) AS BIGINT)"
        ).alias("alpha_x1e3"),
    )


def ses_forecast(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    window: int = 16,
) -> DataFrame:
    """Simple exponential smoothing (α = 1/2) as an EXACT integer
    operator: the smoothed level is the bit-shift-weighted mean of the
    last `window` observations, s_t = Σ_{i=0..w−1} x_{t−i}·2^(w−1−i)
    DIV Σ 2^(w−1−i) (missing lags drop out of BOTH sums, so early rows
    are exact over their shorter history). Truncating the geometric tail
    at `window` changes weights by < 2^−window — the quantization is the
    pinned contract, replayed bit-for-bit by the oracle's identical lag
    fan. The first forecast family in the engine (EWMA variants here are
    decay-scores, not forecasts); next_err = x_{t+1} − s_t is the
    one-step-ahead residual a monitoring pipeline thresholds.

    Plan shape: ONE (key ORDER BY order) window evaluates all `window`
    lags and the lead — a single shuffle regardless of window size.
    Emits (key, o, x, ses, next_err — NULL on each key's last row).
    """
    w = Window.partitionBy("key").orderBy("o")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("o"),
        F.col(value_col).cast("long").alias("x"),
    )
    num = None
    den = None
    for i in range(window):
        lag_i = F.col("x") if i == 0 else F.lag("x", i).over(w)
        wt = 1 << (window - 1 - i)
        term = F.when(lag_i.isNotNull(), lag_i * wt).otherwise(0)
        pres = F.when(lag_i.isNotNull(), F.lit(wt)).otherwise(0)
        num = term if num is None else num + term
        den = pres if den is None else den + pres
    # integer truncating divide via expr to match DuckDB // exactly
    out = base.withColumn("__num", num.cast("long")).withColumn(
        "__den", den.cast("long")
    ).withColumn("ses", F.expr("__num DIV __den")).withColumn(
        "next_err", F.lead("x").over(w) - F.col("ses")
    )
    return out.select("key", "o", "x", "ses", "next_err")


def page_hinkley(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    train_n: int = 8,
    delta: int = 0,
    lam: int = 50,
) -> DataFrame:
    """Page-Hinkley mean-shift detector per key with a FIXED reference
    mean learned from each key's first `train_n` observations — the
    sequential change alarm beside cusum_level_shift (CUSUM scans a
    single best split; PH accumulates deviation against a trained
    baseline and alarms on PH_t − min PH > λ, the streaming-drift
    formulation). Everything is scaled by the training count so the
    reference mean never becomes a float: inc_t = x_t·n_tr − s_tr −
    δ·n_tr, PH = prefix sum, gap = PH − running min, alarm when gap >
    λ·n_tr — exact BIGINTs end to end.

    Plan shape: one (key ORDER BY order) rank window, a key-sized
    training aggregate joined back on the SAME key (partitioning
    reused), then prefix-sum/min windows on that key again — one
    shuffle total. Emits post-training rows: (key, o, x, gap_scaled,
    alarm).
    """
    w = Window.partitionBy("key").orderBy("o")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("o"),
        F.col(value_col).cast("long").alias("x"),
    ).withColumn("rn", F.row_number().over(w))
    tr = (
        base.filter(F.col("rn") <= train_n)
        .groupBy("key")
        .agg(F.sum("x").alias("s_tr"), F.count(F.lit(1)).alias("n_tr"))
    )
    post = base.filter(F.col("rn") > train_n).join(tr, "key")
    inc = F.expr(f"x * n_tr - s_tr - {delta} * n_tr")
    wcum = Window.partitionBy("key").orderBy("o").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ph = post.withColumn("__inc", inc).withColumn(
        "ph", F.sum("__inc").over(wcum)
    ).withColumn("mn", F.min("ph").over(wcum))
    return ph.select(
        "key",
        "o",
        "x",
        (F.col("ph") - F.col("mn")).cast("long").alias("gap_scaled"),
        F.expr(f"CAST(CASE WHEN ph - mn > {lam} * n_tr THEN 1 ELSE 0 END"
               " AS BIGINT)").alias("alarm"),
    )


def forecast_mase(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    window: int = 16,
) -> DataFrame:
    """MASE evaluation of the SES forecaster per key: mean absolute
    error of ses_forecast's one-step residuals scaled by the naive
    random-walk baseline's (x_{t+1} − x_t) — the standard
    scale-free forecast-accuracy readout (Hyndman & Koehler 2006),
    emitted as the exact integer ratio of the two absolute-error SUMS
    (the 1/n factors cancel): mase_x1e6 = Σ|e_model|·1e6 DIV
    Σ|e_naive|. MASE < 1e6 means the smoother beats carrying the last
    value forward. Rows where either forecast has no next observation
    drop from both sums (identical alignment).

    One extra lag on the same (key ORDER BY order) window ses_forecast
    already pays for — still one shuffle. Emits per key:
    (key, n_evals, mae_model_sum, mae_naive_sum, mase_x1e6 — NULL when
    the naive error sum is 0, i.e. a constant series).
    """
    w = Window.partitionBy("key").orderBy("o")
    ses = ses_forecast(df, key_col, order_col, value_col, window=window)
    ev = ses.withColumn("nxt", F.lead("x").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    return ev.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_evals"),
        F.sum(F.abs(F.col("next_err"))).alias("mae_model_sum"),
        F.sum(F.abs(F.col("nxt") - F.col("x"))).alias("mae_naive_sum"),
    ).select(
        "key",
        F.col("n_evals").cast("long").alias("n_evals"),
        F.col("mae_model_sum").cast("long").alias("mae_model_sum"),
        F.col("mae_naive_sum").cast("long").alias("mae_naive_sum"),
        F.expr(
            "CASE WHEN mae_naive_sum > 0 THEN"
            " mae_model_sum * 1000000 DIV mae_naive_sum END"
        ).cast("long").alias("mase_x1e6"),
    )


def durbin_watson(
    df: DataFrame, key_col: str, order_col: str, resid_col: str
) -> DataFrame:
    """Durbin-Watson autocorrelation statistic per key over integer
    residuals — the are-my-forecast-errors-independent check after
    ses_forecast/forecast_mase (DW ≈ 2 means uncorrelated, → 0 means
    positive autocorrelation = the smoother is systematically lagging):
    dw_x1e6 = Σ(e_t − e_{t−1})²·1e6 DIV Σe_t², both sums exact BIGINTs
    (128-bit squares per the control-chart rule). Keys with zero
    residual energy emit NULL.

    One (key ORDER BY order) lag window + one key collapse — single
    shuffle. Emits per key: (key, n_resid, dw_x1e6).
    """
    w = Window.partitionBy("key").orderBy("o")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("o"),
        F.col(resid_col).cast("long").alias("e"),
    ).filter(F.col("e").isNotNull())
    lagged = base.withColumn("pe", F.lag("e").over(w))
    return lagged.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_resid"),
        F.expr("sum(CAST(e AS DECIMAL(38,0)) * e)").alias("see"),
        F.expr(
            "sum(CASE WHEN pe IS NOT NULL THEN"
            " CAST(e - pe AS DECIMAL(38,0)) * (e - pe)"
            " ELSE CAST(0 AS DECIMAL(38,0)) END)"
        ).alias("sdd"),
    ).select(
        "key",
        F.col("n_resid").cast("long").alias("n_resid"),
        F.expr(
            "CASE WHEN see <= 0 THEN CAST(NULL AS BIGINT)"
            " ELSE CAST(sdd * 1000000 DIV see AS BIGINT) END"
        ).alias("dw_x1e6"),
    )
