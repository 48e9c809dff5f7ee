"""Deterministic, partition-independent sampling.

The reference caps the frontier with `random.seed(23); random.sample(...)`
(reference: src/framework.py:460-463) — order-dependent and single-process.
Spark's `df.sample()` is neither row-exact nor partition-stable, so the
engine uses xxhash64(key, seed) ordering: reproducible on any cluster
layout, any partitioning (SURVEY.md §4 determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def deterministic_sample(df: DataFrame, k: int, seed: int = 23, key: str = "node") -> DataFrame:
    """Take exactly min(k, n) rows, chosen by hash order of the key."""
    return df.orderBy(F.xxhash64(F.col(key), F.lit(seed)), F.col(key)).limit(k)


def deterministic_pick_per_group(
    df: DataFrame, group_cols: list[str], seed: int = 23
) -> DataFrame:
    """O5 — one deterministic row per group (replaces pandas .sample() in the
    random-walk path, framework.py:490-514)."""
    others = [c for c in df.columns if c not in group_cols]
    w = Window.partitionBy(*group_cols).orderBy(
        F.xxhash64(*[F.col(c) for c in others], F.lit(seed))
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    n: int,
    salt_key: str | None = None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-n rows per group under a TOTAL order, skew-proof for few groups.

    A plain `row_number() over (partition by group)` sends every row of a
    group through ONE reducer — with k-means-sized group counts (k=4..1024)
    over a 100 TB corpus that serializes the whole job into k tasks. When
    `salt_key` is given, a first window over (group, salt) — salt =
    pmod(xxhash64(salt_key), salt_buckets), so k·salt_buckets parallel
    partitions — prunes each group to ≤ n·salt_buckets survivors before the
    final per-group window, which therefore only ever sees bounded input.

    Provably identical to the unsalted window when `order_cols` is a total
    order (pass a unique id as the last key): every global top-n row ranks
    ≤ n within its salt subgroup too (ranks only shrink on subsets), so
    phase 1 never drops a winner; phase 2 then applies the exact global
    semantics. The salt choice cannot affect the result — only the plan.
    """
    out_cols = df.columns
    final_w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    if salt_key is not None:
        pre_w = Window.partitionBy(
            *group_cols, F.pmod(F.xxhash64(F.col(salt_key)), F.lit(salt_buckets))
        ).orderBy(*order_cols)
        df = (
            df.withColumn("__prn", F.row_number().over(pre_w))
            .filter(F.col("__prn") <= n)
            .drop("__prn")
        )
    return (
        df.withColumn("rk", F.row_number().over(final_w))
        .filter(F.col("rk") <= n)
        .select(*out_cols, "rk")
    )


def cluster_quota_sample(
    assigned: DataFrame,
    quality: DataFrame,
    quota: int,
    id_col: str = "vec_id",
    quality_col: str = "quality",
    salt_buckets: int = 32,
) -> DataFrame:
    """Cluster-balanced curation sample: the `quota` best rows of each
    semantic cluster, by (quality desc, id asc).

    The curation shape behind "diverse pretraining mix" pipelines: a global
    top-N keeps only the dominant topic; a per-cluster quota keeps the best
    of EVERY topic bucket. `assigned` is (id, cluster) — typically
    clustering.kmeans output; `quality` is (id, quality_col). Built on the
    salted two-phase top-n above, so a tiny k never serializes the corpus.
    """
    joined = assigned.join(quality, id_col)
    return top_n_per_group(
        joined,
        ["cluster"],
        [F.col(quality_col).desc(), F.col(id_col).asc()],
        quota,
        salt_key=id_col,
        salt_buckets=salt_buckets,
    )


def hash_rate_sample(
    df: DataFrame, rate_x1e6, key: str, seed: int = 23
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample: keep a row iff
    md5_32(seed:key) mod 1e6 < rate_x1e6.

    Unlike `df.sample()`, membership is a pure function of the key — stable
    under repartitioning, cluster layout, and re-runs, and the SAME rows
    survive when two pipelines sample the same table independently (the
    property train/eval splits and resumable curation jobs need). Map-only:
    a filter, no shuffle. `rate_x1e6` is an integer in [0, 1e6] or a Column
    of one (per-row rates)."""
    rate = rate_x1e6 if hasattr(rate_x1e6, "cast") else F.lit(int(rate_x1e6))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return df.filter(F.pmod(h, F.lit(1000000)) < rate)


def domain_mix_sample(
    df: DataFrame,
    domain_col: str,
    rates_x1e6: dict,
    key: str,
    default_rate_x1e6: int = 0,
    seed: int = 23,
) -> DataFrame:
    """Reweight a corpus toward a target domain mix: keep each row with its
    domain's rate (integer millionths), deterministically by row key.

    The "data mixing" step of a pretraining pipeline (downsample the crawl,
    keep all of the curated sources) as ONE map-only filter: the rate table
    enters the plan as a literal CASE chain (domain counts are small by
    definition), so the 100 TB side is never shuffled and Parquet still sees
    the domain filter for pruning. Domains absent from `rates_x1e6` get
    `default_rate_x1e6` (0 = drop, the conservative curation default)."""
    rate = F.lit(int(default_rate_x1e6))
    for dom, r in sorted(rates_x1e6.items()):
        rate = F.when(F.col(domain_col) == F.lit(dom), F.lit(int(r))).otherwise(rate)
    return hash_rate_sample(df, rate, key, seed)


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (the priority-
    sampling idea of Duffield, Lund & Thorup 2007, with the uniform draw
    replaced by the portable md5 hash): each row gets priority
    q = (md5_32(seed:key) * 1e6) DIV weight — an EXACT integer quotient
    (CLAUDE.md round-3 rule: no float, no grid snapping), so heavier
    rows draw stochastically smaller priorities — and the sample is the
    k smallest (priority, key) pairs. Hash-stable: the same keys win
    under any partitioning and any engine, and membership is auditable
    row-by-row (rand()-based sampling is neither).

    One map pass + one TakeOrderedAndProject(k); no full shuffle. Rows
    with weight <= 0 carry no sampling mass and are excluded.

    Returns the k sampled rows with `priority` attached.
    """
    from .sketches import _hash32

    h = _hash32(F.concat_ws(":", F.lit(str(seed)), F.col(key).cast("string")))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__h", h)
        .withColumn(
            "priority",
            F.expr(f"(__h * 1000000) DIV CAST({weight_col} AS BIGINT)"),
        )
        .drop("__h")
        .orderBy("priority", key)
        .limit(k)
    )


def priority_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    key: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Per-group deterministic weighted sampling without replacement: the
    k smallest integer-quotient priorities WITHIN each group — the
    domain-balanced corpus quota (k docs per source, weighted by length/
    quality) in one pass. Same hash-stable priority as priority_sample;
    the reduction is a per-group window top-k (one shuffle on the group
    key) instead of a global TakeOrdered. Group skew is the usual window
    hot-partition: rank, don't sort-collect.

    Returns the sampled rows with (priority, rnk) attached.
    """
    from pyspark.sql.window import Window

    from .sketches import _hash32

    h = _hash32(F.concat_ws(":", F.lit(str(seed)), F.col(key).cast("string")))
    w = Window.partitionBy(group_col).orderBy("priority", key)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__h", h)
        .withColumn(
            "priority",
            F.expr(f"(__h * 1000000) DIV CAST({weight_col} AS BIGINT)"),
        )
        .drop("__h")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def budget_sample_per_source(
    df: DataFrame,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_parts: int = 32,
) -> DataFrame:
    """Token-budget-constrained corpus sampling: per source, keep documents
    in deterministic hash order until the source's cumulative token count
    reaches `budget` — the mixture-building primitive ("100B tokens of web,
    10B of code") a pretraining pipeline runs after curation. A document is
    kept iff the cumulative count BEFORE it is < budget (pinned rule: the
    straddling document is included, nothing is truncated).

    The per-source prefix sum is TWO-PHASE like pack_sequences, but with
    NO driver collect: range-partition on (source, md5(id)), local window
    cumsum per (source, partition id); per-(source, partition) totals —
    n_sources x n_parts rows, dimension-table-small — get exclusive
    offsets from a window over that tiny table and broadcast-join back.
    A 10^12-token source never sorts in one partition.

    Returns (id_col, source_col, token_col, cum_before) for kept rows;
    md5-hex ordering replays identically in any engine.
    """
    ok = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("src"),
        F.col(token_col).cast("long").alias("n_tokens"),
        ok.alias("_ok"),
    )
    parted = base.repartitionByRange(n_parts, "src", "_ok").withColumn(
        "_part", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("src", "_part")
        .orderBy("_ok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted.withColumn(
        "_cum_local", F.sum("n_tokens").over(local_w)
    ).localCheckpoint(eager=True)  # totals + main path share one pass

    off_w = (
        Window.partitionBy("src")
        .orderBy("_part")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("src", "_part")
        .agg(F.sum("n_tokens").alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(off_w), F.lit(0)))
        .select("src", "_part", "_off")
    )
    return (
        local.join(F.broadcast(offsets), ["src", "_part"])
        .withColumn(
            "cum_before", F.col("_off") + F.col("_cum_local") - F.col("n_tokens")
        )
        .filter(F.col("cum_before") < budget)
        .select(
            F.col("id").alias(id_col),
            F.col("src").alias(source_col),
            F.col("n_tokens").alias(token_col),
            "cum_before",
        )
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket_width: int = 64,
) -> DataFrame:
    """Pareto frontier (skyline) on two maximize-dimensions — the
    multi-criteria curation selector: keep documents no other document
    beats on BOTH axes (e.g. length vs uniqueness, quality vs recency).
    A row is dominated iff some row has x'≥x, y'≥y with at least one
    strict; ties on both axes all stay on the frontier.

    Scale shape (grid pruning, the distributed-skyline standard): (1) a
    map-side combinable agg collapses x-buckets (x DIV bucket_width) to
    per-bucket max-y — bucket-count rows; (2) the strictly-higher-bucket
    running max (thr) is computed on that TINY table and broadcast back;
    (3) the only full scan keeps rows with y > thr[bucket] — every true
    skyline row survives (a higher bucket means strictly greater x, so
    y' ≥ y there would dominate), and survivors are bounded by the
    per-bucket frontier; (4) the exact pass collapses survivors to one
    row per distinct x (max y + tie count), runs the strictly-greater-x
    running max on that frontier-sized table (single-partition window on
    a COLLAPSED table — vetted: |distinct x| of survivors, not corpus
    rows), and joins winners back to recover all (x, ymax) ties.

    Returns the skyline rows of ``df`` (all original columns).
    """
    b = int(bucket_width)
    withb = df.withColumn("__b", F.expr(f"CAST({x_col} DIV {b} AS BIGINT)"))
    bmax = withb.groupBy("__b").agg(F.max(y_col).alias("__bymax"))
    wdesc = Window.orderBy(F.desc("__b")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    thr = bmax.withColumn("__thr", F.max("__bymax").over(wdesc)).select(
        "__b", "__thr"
    )
    # survivors are frontier-bounded (small) and consumed twice (winner
    # derivation + final join) — eager checkpoint so the corpus is
    # scanned exactly twice total, not re-pruned per consumer
    surv = (
        withb.join(F.broadcast(thr), "__b")
        .filter(F.col("__thr").isNull() | (F.col(y_col) > F.col("__thr")))
        .localCheckpoint(eager=True)
    )
    perx = surv.groupBy(F.col(x_col).alias("__x")).agg(
        F.max(y_col).alias("__ymax")
    )
    wx = Window.orderBy(F.desc("__x")).rowsBetween(Window.unboundedPreceding, -1)
    # a distinct-x point survives iff its ymax strictly beats every
    # strictly-greater-x frontier value (>= there would dominate it)
    winners = (
        perx.withColumn("__gt", F.max("__ymax").over(wx))
        .filter(F.col("__gt").isNull() | (F.col("__ymax") > F.col("__gt")))
        .select("__x", "__ymax")
    )
    return (
        surv.join(
            F.broadcast(winners),
            (F.col(x_col) == F.col("__x")) & (F.col(y_col) == F.col("__ymax")),
        )
        .drop("__b", "__thr", "__x", "__ymax")
    )


def group_kfold(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    seed: int = 23,
) -> DataFrame:
    """Group-aware K-fold assignment: every row of a group (conversation,
    user, document cluster) lands in the SAME fold — the split discipline
    that prevents near-duplicate leakage across train/validation (the
    within-group twin of cross_corpus_contamination's between-corpus
    check). fold = md5_32(seed:group) mod k: a pure function of the group
    key, so membership is stable under repartitioning, re-runs, and
    independent recomputation by two pipelines (hash_rate_sample's
    property, extended to folds).

    Map-only: one expression, no shuffle, no state. Returns the input plus
    a `fold` int column.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(str(seed)), F.col(group_col).cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn("fold", F.pmod(h, F.lit(int(k))).cast("int"))


def kfold_report(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    seed: int = 23,
) -> DataFrame:
    """Fold-balance + leakage readout over group_kfold: per fold, row and
    group counts, the share of rows, and n_leaky — groups observed in more
    than one fold, which is ZERO by construction (the assignment is a
    function of the group key; the column exists so the invariant is
    continuously asserted where a hand-rolled split would silently rot).

    One (fold, group) combinable collapse; everything after is k-row
    arithmetic.
    """
    folded = group_kfold(df, group_col, k=k, seed=seed)
    per_group = folded.groupBy("fold", group_col).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    span = per_group.groupBy(group_col).agg(
        F.countDistinct("fold").alias("__nf")
    )
    total = per_group.agg(F.sum("n_rows").alias("__t"))
    return (
        per_group.join(span, group_col)
        .groupBy("fold")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("__nf") > 1, 1).otherwise(0)).alias("n_leaky"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "fold",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("n_leaky").cast("long").alias("n_leaky"),
            F.expr("n_rows * 1000000 DIV __t").cast("long").alias("share_x1e6"),
        )
    )


def morton_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
) -> DataFrame:
    """Z-order (Morton) interleaved sort key over two integer columns —
    the data-LAYOUT operator behind multi-dimensional pruning: a table
    written sorted by `zkey` keeps rows close in BOTH dimensions inside
    the same parquet row groups, so min/max statistics prune scans
    filtered on either column (the effect Delta/Iceberg OPTIMIZE ZORDER
    buys; here it is an explicit, engine-replayable expression).

    Exact integer bit arithmetic: each input is clamped to [0, 2^bits)
    and its bit i lands at output bit 2i (x) / 2i+1 (y) via shifts and
    masks — a deterministic pure function both engines replay (DuckDB has
    the same <<, &, | semantics on BIGINT). bits ≤ 31 keeps the key in
    int64.

    Map-only: one expression, no shuffle. Callers typically follow with
    repartitionByRange(zkey).sortWithinPartitions(zkey).write — the
    layout job; this operator owns the key semantics.

    Returns the input plus `zkey` (long).
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    top = (1 << bits) - 1
    cx = f"least(CAST({top} AS BIGINT), greatest(CAST(0 AS BIGINT), CAST({x_col} AS BIGINT)))"
    cy = f"least(CAST({top} AS BIGINT), greatest(CAST(0 AS BIGINT), CAST({y_col} AS BIGINT)))"
    parts = []
    for i in range(bits):
        parts.append(f"(({cx} >> {i}) & 1) << {2 * i}")
        parts.append(f"(({cy} >> {i}) & 1) << {2 * i + 1}")
    return df.withColumn("zkey", F.expr(" | ".join(parts)).cast("long"))


# Poisson(1) inverse-CDF thresholds on the 1e6 integer grid:
# cum P(X<=k) for k=0..6, rounded to the grid; w = #thresholds <= u,
# capping w at 7 (the truncated tail holds ~83ppm of mass).
_POISSON1_CUM_X1E6 = (367879, 735759, 919699, 981012, 996340, 999406, 999917)


def bootstrap_mean_ci(
    df: DataFrame,
    key: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    b: int = 40,
    seed: int = 7,
    scale: int = 100,
) -> DataFrame:
    """Deterministic Poisson-bootstrap 95% CI for the per-key mean —
    the uncertainty readout the robust family lacks (winsorized_mean
    says WHERE the center is; this says how sure we are). Every metrics
    dashboard quoting a mean off a sampled corpus needs the interval.

    Poisson bootstrap (each of B resamples draws every row with
    multiplicity w ~ Poisson(1)) instead of classic n-out-of-n: w is a
    pure per-(row, b) function, so the whole thing is ONE map-only fan
    (explode of B) + ONE combinable (key, b) aggregate — no global
    resample materialization, no driver randomness, and it composes
    with streaming/sharded inputs where n isn't known up front (Hanley
    & MacGibbon 2006; Google's Poisson bootstrap at scale, Chamandy
    2012). Determinism: w = inverse-CDF of Poisson(1) over the 1e6
    integer grid at u = md5_32(seed:b:id) mod 1e6 — the portable-hash
    discipline of `hash_rate_sample`, replayed bit-exact by the oracle
    (w capped at 7; the truncated tail is ~83ppm of mass and part of
    the quantized spec).

    Resample means are EXACT staged integer quotients of the
    (×scale)-grid values; the CI picks order statistics
    lo = floor(.025·B)+1, hi = B − floor(.025·B) (1-based, ties broken
    by resample id) over the ≤ B·|keys| tiny mean table. Both ranks are
    clamped to the per-key SURVIVING resample count (zero-effective-mass
    resamples are dropped), so tiny groups get the extreme surviving
    mean rather than a NULL bound; lo == hi when fewer than lo_rank
    resamples survive.

    Returns (key, n_rows, mean_x1e6, lo_x1e6, hi_x1e6) — all means in
    scaled-value units ×1e6.
    """
    rows = df.select(
        key,
        F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5))
        .cast("long")
        .alias("__v"),
        F.col(id_col).cast("string").alias("__id"),
    )
    fan = rows.withColumn(
        "__b", F.explode(F.sequence(F.lit(0), F.lit(b - 1)))
    )
    u = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(str(seed)),
                        F.col("__b").cast("string"),
                        F.col("__id"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(1000000),
    )
    w = sum(
        F.when(u >= F.lit(t), 1).otherwise(0) for t in _POISSON1_CUM_X1E6
    )
    per_b = (
        fan.select(key, "__b", F.col("__v"), w.alias("__w"))
        .groupBy(key, "__b")
        .agg(
            F.sum("__w").cast("long").alias("n_eff"),
            F.sum(F.col("__w") * F.col("__v")).cast("long").alias("s"),
        )
        .filter(F.col("n_eff") > 0)
        .select(
            key,
            "__b",
            F.expr(
                "CAST(s DIV n_eff * CAST(1000000 AS BIGINT) "
                "+ s % n_eff * CAST(1000000 AS BIGINT) DIV n_eff AS BIGINT)"
            ).alias("m"),
        )
    )
    lo_rank = int(0.025 * b) + 1
    hi_rank = b - int(0.025 * b)
    # Zero-effective-mass resamples are dropped (n_eff > 0), so tiny
    # groups can have fewer than hi_rank surviving resample means.
    # Clamp both order-statistic ranks to the surviving count: a key
    # with s < lo_rank survivors reads lo = hi = its extreme surviving
    # mean instead of an unguarded NULL CI.
    ordered = per_b.withColumn(
        "__r",
        F.row_number().over(
            Window.partitionBy(key).orderBy("m", "__b")
        ),
    ).withColumn(
        "__cnt", F.count(F.lit(1)).over(Window.partitionBy(key))
    )
    lo_eff = F.least(F.lit(lo_rank), F.col("__cnt"))
    hi_eff = F.least(F.lit(hi_rank), F.col("__cnt"))
    ci = ordered.groupBy(key).agg(
        F.max(F.when(F.col("__r") == lo_eff, F.col("m"))).alias("lo_x1e6"),
        F.max(F.when(F.col("__r") == hi_eff, F.col("m"))).alias("hi_x1e6"),
    )
    full = rows.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr(
            "CAST(sum(__v) DIV count(1) * CAST(1000000 AS BIGINT) "
            "+ sum(__v) % count(1) * CAST(1000000 AS BIGINT) "
            "DIV count(1) AS BIGINT)"
        ).alias("mean_x1e6"),
    )
    return full.join(ci, key).select(
        key, "n_rows", "mean_x1e6", "lo_x1e6", "hi_x1e6"
    )


def rebalance_classes(
    df: DataFrame,
    class_col: str = "label",
    id_col: str = "id",
    target: int | None = None,
    seed: str = "rb:",
) -> DataFrame:
    """Deterministic class rebalancing by fractional oversampling —
    the imbalanced-training-set fix that keeps every original row and
    replicates each minority-class row the EXPECTED number of times
    with no RNG state: row weight w = target·1e6 DIV n_class, each row
    gets floor(w/1e6) copies plus one more iff md5(seed‖id) % 1e6 <
    w % 1e6 — so class sizes land within one row per million of the
    target in expectation, and the same input always produces the same
    replicas (resumable shuffles, diffable datasets). target defaults
    to the LARGEST class (pure oversampling).

    Shape: one combinable class-count collapse broadcast back, then a
    map-only sequence-explode — replication never shuffles; at 100 TB
    this is the pattern (the alternative, sampling with replacement via
    RNG, is neither deterministic nor resumable). Emits `replica_idx`
    (0 = the original row) so downstream dedup/shuffling can tell
    copies apart.

    Returns the input columns plus replica_idx.
    """
    counts = df.groupBy(F.col(class_col)).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    if target is None:
        tgt = counts.agg(F.max("__n").alias("__t"))
        counts = counts.join(F.broadcast(tgt))
    else:
        counts = counts.withColumn("__t", F.lit(int(target)).cast("long"))
    w = counts.select(
        class_col,
        F.expr(
            "__t * CAST(1000000 AS BIGINT) DIV __n"
        ).alias("__w"),
    )
    frac_draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    n_copies = F.expr("__w DIV 1000000") + (
        frac_draw < F.expr("__w % 1000000")
    ).cast("long")
    return (
        df.join(F.broadcast(w), class_col)
        .withColumn("__c", n_copies)
        .withColumn(
            "replica_idx",
            # empty array when __c = 0 (target below class size =
            # deterministic undersampling) — explode drops the row
            F.explode(
                F.when(
                    F.col("__c") > 0,
                    F.sequence(F.lit(0), (F.col("__c") - 1).cast("int")),
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("__w", "__c")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling") — exact-integer variant
# ---------------------------------------------------------------------------


def _msb16_sql(e: str) -> str:
    """Piecewise-linear log2 with 4 fractional bits, exact-integer and
    cross-engine: msb16(q) = 16*floor(log2 q) + (q*16 >> floor(log2 q)) - 16
    for q >= 1 (inputs are clamped to >= 1, and to <= 2^52 so the *16 can
    never overflow BIGINT). Monotone in q; the same `length(bin(v))-1` msb
    device as zipf_msb_slope, refined with a linear within-octave term.
    DuckDB replays it verbatim (bin(), <<, DIV all BIGINT-exact)."""
    g = f"least(greatest({e}, CAST(1 AS BIGINT)), CAST(4503599627370496 AS BIGINT))"
    lg = f"(length(bin({g})) - 1)"
    return (
        f"(16 * {lg} + ({g}) * 16 DIV shiftleft(CAST(1 AS BIGINT), {lg}) - 16)"
    )


def _dsir_tokens(df: DataFrame, text_col: str, id_col: str, target: "F.Column"):
    toks = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
        ),
        lambda t: t != F.lit(""),
    )
    return df.select(
        F.col(id_col).alias("__id"),
        target.alias("__is_t"),
        F.explode(toks).alias("__tok"),
    )


def dsir_bucket_scores(
    df: DataFrame,
    target: "F.Column",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Hashed-n-gram (unigram) importance scores: the DSIR recipe estimates
    p_target / p_raw over a fixed hashed feature space and weighs every raw
    document by its log-likelihood ratio under the two bag-of-buckets models
    (Xie et al. 2023 §3; the reference pipeline has no data-selection stage —
    this is LLM-pipeline surface beyond /root/reference).

    Exact-integer cross-engine contract: bucket = md5_32(token) mod B (the
    portable hash the gate replays), add-1 smoothed ratio scaled by 2^20,
    and log2 quantized with the 4-fractional-bit msb16 device — no float
    log anywhere, so the DuckDB oracle is bit-equal.

    Shape: one explode+groupBy collapses the corpus to <= B bucket rows
    (map-side combine, bounded output); totals are a 1-row broadcast.
    Per-bucket BIGINT bound: counts < 2^43 (at B=256 that is ~2 PB of
    tokens per bucket) before (c+1)*2^20 could overflow.

    Returns (bucket, ct, cr, s16): target count, raw count, quantized LLR.
    """
    toks = _dsir_tokens(df, text_col, id_col, target)
    bkt = (
        toks.select(
            F.pmod(
                F.conv(F.substring(F.md5(F.col("__tok")), 1, 8), 16, 10).cast(
                    "long"
                ),
                F.lit(n_buckets),
            ).alias("bucket"),
            F.col("__is_t"),
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__is_t"), 1).otherwise(0))
            .cast("long")
            .alias("ct"),
            F.sum(F.when(F.col("__is_t"), 0).otherwise(1))
            .cast("long")
            .alias("cr"),
        )
    )
    tot = bkt.agg(
        F.sum("ct").cast("long").alias("__t"), F.sum("cr").cast("long").alias("__r")
    )
    b = int(n_buckets)
    qn = f"((ct + 1) * CAST(1048576 AS BIGINT) DIV (cr + 1))"
    qd = f"((__t + {b}) * CAST(1048576 AS BIGINT) DIV (__r + {b}))"
    return (
        bkt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "ct",
            "cr",
            F.expr(f"CAST({_msb16_sql(qn)} - {_msb16_sql(qd)} AS BIGINT)").alias(
                "s16"
            ),
        )
    )


def dsir_select(
    df: DataFrame,
    target: "F.Column",
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Importance-resample the RAW (non-target) corpus toward the target
    distribution: every raw document is scored w = sum over its tokens of
    the bucket LLR s16, and the top-k by (w desc, id asc) survive — the
    deterministic top-k variant of DSIR's Gumbel resampling.

    Shape at 100 TB: the corpus tokens collapse ONCE to (doc, bucket,
    count) cells — one map-side-combined shuffle shared by BOTH the
    bucket-score derivation (a <= B-row aggregate over the cells) and the
    per-doc scoring (broadcast-join + doc-keyed aggregate over the same
    cells); the round-5 restructure removed the second full token
    explode+shuffle the scoring pass used to pay. The score table is
    bit-identical to dsir_bucket_scores (same per-bucket counts by
    associativity of the sum), and the top-k is a TakeOrderedAndProject,
    never a global sort.

    Returns (doc_id, n_toks, w_s16, rnk), rnk 1..k."""
    toks = _dsir_tokens(df, text_col, id_col, target)
    cells = (
        toks.select(
            "__id",
            "__is_t",
            F.pmod(
                F.conv(F.substring(F.md5(F.col("__tok")), 1, 8), 16, 10).cast(
                    "long"
                ),
                F.lit(n_buckets),
            ).alias("bucket"),
        )
        .groupBy("__id", "__is_t", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .localCheckpoint(eager=True)
    )
    bkt = cells.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_t"), F.col("__c")).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum(F.when(F.col("__is_t"), 0).otherwise(F.col("__c")))
        .cast("long")
        .alias("cr"),
    )
    tot = bkt.agg(
        F.sum("ct").cast("long").alias("__t"),
        F.sum("cr").cast("long").alias("__r"),
    )
    b = int(n_buckets)
    qn = "((ct + 1) * CAST(1048576 AS BIGINT) DIV (cr + 1))"
    qd = f"((__t + {b}) * CAST(1048576 AS BIGINT) DIV (__r + {b}))"
    scores = (
        bkt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.expr(
                f"CAST({_msb16_sql(qn)} - {_msb16_sql(qd)} AS BIGINT)"
            ).alias("s16"),
        )
        .localCheckpoint(eager=True)
    )
    weighted = (
        cells.filter(~F.col("__is_t"))
        .join(F.broadcast(scores), "bucket")
        .groupBy("__id")
        .agg(
            F.sum("__c").cast("long").alias("n_toks"),
            F.sum(F.expr("__c * s16")).cast("long").alias("w_s16"),
        )
    )
    topk = weighted.orderBy(F.col("w_s16").desc(), F.col("__id").asc()).limit(k)
    # rank AFTER the TakeOrderedAndProject: the single-partition window only
    # ever sees k rows, never the corpus
    w = Window.partitionBy().orderBy(F.col("w_s16").desc(), F.col("__id").asc())
    return topk.select(
        F.col("__id").alias("doc_id"),
        "n_toks",
        "w_s16",
        F.row_number().over(w).cast("long").alias("rnk"),
    )


def greedy_max_coverage(
    df: DataFrame,
    k: int,
    item_col: str = "item",
    element_col: str = "element",
) -> DataFrame:
    """Greedy maximum-coverage selection (Nemhauser-Wolsey-Fisher 1978:
    the (1 - 1/e)-optimal greedy for submodular coverage) — the
    diversity-selection pass a training-data pipeline runs to pick k
    documents covering the most distinct n-grams/topics/entities, where
    top-k-by-size would pick k near-duplicates. Each round takes the
    item with the largest MARGINAL coverage (new elements only), ties
    pinned to the smallest item.

    Scale shape: the covered set lives DISTRIBUTED (an element DataFrame
    union-grown per round and eagerly checkpointed — never a driver
    structure), so rounds cost one element-keyed left_anti join + one
    item count + a 1-row argmax collect (the BPE/k-center/influence
    driver-round family); k rounds total. The oracle replays the
    identical rounds as a recursive CTE carrying the picked list
    (gate-scale replay; the Spark side never holds elements centrally).

    Returns (rnk, item, marginal) in pick order; stops early when
    nothing new can be covered.
    """
    spark = df.sparkSession
    base = df.select(
        F.col(item_col).alias("it"), F.col(element_col).alias("el")
    ).dropDuplicates().localCheckpoint(eager=True)
    covered = base.select("el").filter(F.lit(False)).localCheckpoint(
        eager=True
    )
    picked: list = []
    out: list = []
    for r in range(1, k + 1):
        cand = base
        if picked:
            cand = cand.filter(~F.col("it").isin(picked))
        marg = (
            cand.join(covered, "el", "left_anti")
            .groupBy("it")
            .agg(F.count(F.lit(1)).cast("long").alias("m"))
        )
        row = marg.orderBy(F.desc("m"), F.asc("it")).limit(1).collect()
        if not row or row[0]["m"] == 0:
            break
        it = row[0]["it"]
        out.append((r, it, row[0]["m"]))
        picked.append(it)
        covered = (
            covered.unionByName(base.filter(F.col("it") == it).select("el"))
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
    if not out:
        return spark.createDataFrame([], "rnk long, item long, marginal long")
    return spark.createDataFrame(out, ["rnk", "item", "marginal"])


def mmr_rerank(
    items: DataFrame,
    sims: DataFrame,
    k: int,
    lam_num: int = 7,
    lam_den: int = 10,
    item_col: str = "item",
    rel_col: str = "rel_x1e6",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily pick the item maximizing λ·relevance − (1−λ)·max-similarity
    to anything already picked — the diversify-the-top-page pass between
    retrieval and display/training-sample selection (greedy_max_coverage's
    sibling: that one diversifies by coverage, this one by pairwise
    similarity). λ is a rational lam_num/lam_den and both rel and sim are
    1e6-scaled integers, so every round's argmax key is the exact integer
    lam_num·rel − (lam_den−lam_num)·maxsim — no float anywhere; ties pin
    to the smallest item; the first pick is pure relevance (empty-set
    max-sim = 0).

    Inputs: `items` (item_col, rel_col) — the retrieved page; `sims`
    (a, b, sim_x1e6) — pairwise similarities, DIRECTED rows (emit both
    orientations for a symmetric measure). Re-ranking operates on one
    retrieved page (k·|page| work), so the DataFrames here are small by
    construction; the driver loop is k rounds of one join + 1-row argmax
    collect (the greedy_max_coverage round family). Emits
    (rnk, item, mmr_x1e6) with mmr scaled back by lam_den.
    """
    spark = items.sparkSession
    base = items.select(
        F.col(item_col).alias("it"), F.col(rel_col).cast("long").alias("rel")
    ).localCheckpoint(eager=True)
    pair = sims.select(
        F.col("a").alias("it"), F.col("b").alias("other"),
        F.col("sim_x1e6").cast("long").alias("sim"),
    ).localCheckpoint(eager=True)
    comp = lam_den - lam_num
    picked: list = []
    out: list = []
    for r in range(1, k + 1):
        cand = base
        if picked:
            cand = cand.filter(~F.col("it").isin(picked))
        if picked:
            ms = (
                pair.filter(F.col("other").isin(picked))
                .groupBy("it")
                .agg(F.max("sim").alias("maxsim"))
            )
            scored = cand.join(ms, "it", "left").select(
                "it",
                (
                    F.lit(lam_num) * F.col("rel")
                    - F.lit(comp) * F.coalesce("maxsim", F.lit(0))
                ).alias("score"),
            )
        else:
            scored = cand.select(
                "it", (F.lit(lam_num) * F.col("rel")).alias("score")
            )
        row = scored.orderBy(F.desc("score"), F.asc("it")).limit(1).collect()
        if not row:
            break
        out.append((r, row[0]["it"], int(row[0]["score"]) // lam_den
                    if row[0]["score"] >= 0
                    else -((-int(row[0]["score"])) // lam_den)))
        picked.append(row[0]["it"])
    if not out:
        return spark.createDataFrame([], "rnk long, item long, mmr_x1e6 long")
    return spark.createDataFrame(out, ["rnk", "item", "mmr_x1e6"])


def budget_waterfill(
    sources: DataFrame,
    budget: int,
    source_col: str = "source",
    weight_col: str = "w",
    cap_col: str = "cap",
) -> DataFrame:
    """Water-filling token-budget allocation across sources: give each
    source budget proportional to its weight, but never more than its
    capacity — the data-mixing decision every pretraining recipe makes
    ("upsample high-quality sources until they run out, spread the rest").
    CLOSED FORM, no driver loop: sort sources by cap/weight (the order
    they saturate in — quantized ratio = cap·1e6 DIV w, ties by source
    key, a pinned contract); with prefix cap sums C and prefix weight
    sums W, source i saturates iff cap_i·(TW − W_{i−1}) <= (B − C_{i−1})
    ·w_i, else it gets the proportional share (B − C_{i−1})·w_i DIV
    (TW − W_{i−1}) of what remains. Truncating DIVs leave a documented
    deficit < n_sources tokens (emitted as the leftover column on every
    row). Overflow: B·w must stay under 2^63 → budget·max-weight < 9e18.

    The source table is dimension-sized, so the sort window is k rows —
    never corpus-scale. Emits per source: (source, w, cap, alloc,
    capped, leftover).
    """
    base = sources.select(
        F.col(source_col).cast("string").alias("src"),
        F.col(weight_col).cast("long").alias("w"),
        F.col(cap_col).cast("long").alias("cap"),
    ).withColumn("ratio", F.expr("cap * 1000000 DIV greatest(w, 1)"))
    wo = Window.orderBy("ratio", "src")
    pre = (
        base.withColumn(
            "c_prev",
            F.coalesce(
                F.sum("cap").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "w_prev",
            F.coalesce(
                F.sum("w").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
    )
    tot = base.agg(F.sum("w").alias("tw"))
    flagged = pre.crossJoin(F.broadcast(tot)).withColumn(
        "capped",
        F.expr(
            f"CASE WHEN cap * (tw - w_prev) <= ({budget} - c_prev) * w"
            " THEN 1 ELSE 0 END"
        ),
    ).localCheckpoint(eager=True)
    # fixed water level: every uncapped source shares the SAME lambda =
    # (B - Σ capped caps)/(TW - Σ capped weights) — a per-row remaining-
    # budget formula would wrongly subtract earlier UNCAPPED sources' caps
    sat = flagged.agg(
        F.coalesce(F.sum(F.expr("CASE WHEN capped = 1 THEN cap END")), F.lit(0))
        .alias("sc"),
        F.coalesce(F.sum(F.expr("CASE WHEN capped = 1 THEN w END")), F.lit(0))
        .alias("sw"),
    )
    alloc = flagged.crossJoin(F.broadcast(sat)).withColumn(
        "alloc",
        F.expr(
            "CASE WHEN capped = 1 THEN cap"
            " WHEN tw - sw <= 0 THEN CAST(0 AS BIGINT)"
            f" ELSE greatest({budget} - sc, 0) * w DIV (tw - sw) END"
        ),
    ).localCheckpoint(eager=True)
    left = alloc.agg(
        (F.lit(budget) - F.sum("alloc")).alias("leftover")
    )
    return alloc.crossJoin(F.broadcast(left)).select(
        F.col("src").alias("source"),
        F.col("w").cast("long").alias("w"),
        F.col("cap").cast("long").alias("cap"),
        F.col("alloc").cast("long").alias("alloc"),
        F.col("capped").cast("long").alias("capped"),
        F.col("leftover").cast("long").alias("leftover"),
    )
