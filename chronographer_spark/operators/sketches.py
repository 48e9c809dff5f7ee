"""Approximate sketches (HyperLogLog, Count-Min) built from relational ops.

The reference uses only exact counts (SURVEY.md §2.4: "no approximate
aggregates"); at 100TB a distinct-count over a high-cardinality column
(unique actors, unique mention surface forms) wants a sketch. Spark's
built-in `approx_count_distinct` is a fine production answer but its HLL++
registers are JVM-internal; this module builds the classic HLL from plain
DataFrame ops with an md5-derived hash, so:

- the DuckDB oracle replays the estimate BIT-FOR-BIT (same hash, same
  registers, same float arithmetic — the register sum is a sum of powers of
  two spanning < 53 bits, hence exact in IEEE double and order-independent),
- register tables are themselves DataFrames: mergeable across partitions,
  unions, or days by `groupBy(bucket).agg(max(rho))` — the sketch property
  that makes it a scale primitive.

Accuracy is the textbook ~1.04/sqrt(m); no small/large-range bias
corrections are applied (pinned identically in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# alpha constant for m=64 registers (Flajolet et al. 2007, Fig. 3)
ALPHA_64 = 0.709
M = 64  # registers; 6 index bits + 26 rho bits from the 32-bit md5 slice


def _hash32(col):
    """Engine-portable 32-bit hash: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """(bucket, rho) register table — max trailing-zero-rank per bucket.

    rho = 1 + trailing zeros of the 26 remaining hash bits (27 when they are
    all zero). One groupBy with map-side max partial aggregation; ≤ M rows
    out regardless of input size.
    """
    h = _hash32(F.col(col))
    rem = F.shiftrightunsigned(h, 6)
    rho = F.when(rem == 0, F.lit(27)).otherwise(
        F.bit_count((rem.bitwiseAND(-rem)) - 1) + 1
    )
    return (
        df.select(
            h.bitwiseAND(F.lit(M - 1)).alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row (estimate BIGINT) from a register table: alpha·m²/Σ2^(-M_j),
    empty registers contributing 2^0 = 1 each."""
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("present_sum"),
        F.count(F.lit(1)).alias("present_n"),
    )
    total = F.col("present_sum") + (F.lit(M) - F.col("present_n")) * F.lit(1.0)
    return agg.select(
        F.floor(F.lit(ALPHA_64) * F.lit(M) * F.lit(M) / total + F.lit(0.5))
        .cast("long")
        .alias("estimate")
    )


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """Convenience: one-row approximate distinct count of `col`."""
    return hll_estimate(hll_registers(df, col))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge sketches (e.g. per-day register tables) — union + max."""
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("bucket").agg(F.max("rho").alias("rho"))


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimation /
# heavy hitters in depth × width integers, regardless of input size.
#
# Same portability discipline as the HLL above: every hash is the first 8 hex
# chars of md5("<row>:<item>"), every count is a BIGINT, the estimate is an
# integer min — the DuckDB oracle replays estimates (including the sketch's
# characteristic collision OVERestimates) bit-for-bit, no float anywhere.
#
# Scale shape:
# - build: one fan-out of `depth` (explode of a literal array — NOT a UNION of
#   depth selects, which would re-execute the input subtree per row; CLAUDE.md
#   round-2 fact) then ONE groupBy(d, bucket) with map-side partial
#   aggregation, so the exchange carries ≤ depth·width rows per map partition
#   no matter how many items went in.
# - the sketch table is ≤ depth·width rows: lookups broadcast it, merges of
#   per-day/per-shard sketches are a groupBy-sum over tiny tables.
# - heavy hitters: estimates need a CANDIDATE set; `distinct()` is the
#   exact/verifiable default used by the gate. At 100 TB, feed `candidates`
#   from a cheap pre-pass instead (per-partition local top-k, or a sampled
#   distinct) — the CMS guarantee (no underestimates) means a candidate
#   superset never loses a true heavy hitter, it only costs extra lookups.
# ---------------------------------------------------------------------------


def _cms_bucket(item_col, d_col, width: int):
    """Row-d bucket for an item: md5-32("d:item") mod width (non-negative in
    both engines: the 32-bit slice is unsigned)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", d_col.cast("string"), item_col.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_table(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(d, bucket, cnt) sketch table over the values of `col`.

    `depth` independent hash rows of `width` counters each; estimate error is
    ≤ 2N/width with probability 1 − (1/2)^depth over the md5 hash family."""
    fanned = df.select(
        F.col(col).alias("__item"),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    )
    return (
        fanned.select("d", _cms_bucket(F.col("__item"), F.col("d"), width).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    candidates: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Attach `est` = min over hash rows of the counter each candidate maps
    to. The sketch (≤ depth·width rows) is broadcast; missing buckets count
    as 0 (cannot happen for items that were fed to `cms_table`, but keeps
    lookups of unseen items correct)."""
    from pyspark.sql.functions import broadcast

    probes = candidates.select(
        F.col(col),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    ).withColumn("bucket", _cms_bucket(F.col(col), F.col("d"), width))
    return (
        probes.join(broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): union + sum."""
    merged = sketches[0]
    for t in sketches[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: int,
    depth: int = 4,
    width: int = 256,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Items whose CMS-estimated frequency is ≥ threshold, with the estimate.

    No false negatives (CMS never underestimates); collisions can promote
    near-threshold items — the classic one-sided guarantee. `candidates`
    defaults to `df[col].distinct()` (see module scale note)."""
    sketch = cms_table(df, col, depth, width)
    cand = candidates if candidates is not None else df.select(col).distinct()
    return cms_lookup(sketch, cand, col, depth, width).where(
        F.col("est") >= F.lit(int(threshold))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — set membership in m bits, one-sided error.
#
# The scale shape behind train/test decontamination at 100 TB: the eval-set
# n-grams become a bit-position table of ≤ m rows, which BROADCASTS to every
# executor; the (huge) training corpus is then filtered map-side — no shuffle
# of the training side at all, versus dedup.cross_corpus_contamination's
# shingle equi-join which shuffles both corpora. False positives only (no
# member ever misses), so a Bloom pre-pass before the exact join is sound:
# it can only pass through extra candidates, never drop a real hit.
#
# Portability: bit positions are md5("j:item") mod m (same discipline as the
# CMS above), the filter is a DataFrame of distinct set positions — DuckDB
# replays membership answers INCLUDING the characteristic false positives
# bit-for-bit, and merging per-shard filters is a union-distinct.
# ---------------------------------------------------------------------------


def _bloom_bit(item_col, j_col, m_bits: int):
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", j_col.cast("string"), item_col.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 8192, k_hashes: int = 3
) -> DataFrame:
    """Build the filter: the DISTINCT bit positions set by the values of
    `col` — a (bit BIGINT) table of ≤ m_bits rows.

    One explode of `k_hashes` literals (not a UNION of k selects — the
    round-2 re-execution trap) then one distinct whose map-side partial
    dedup bounds the exchange at m_bits rows per partition."""
    fanned = df.select(
        F.col(col).alias("__item"),
        F.explode(F.array(*[F.lit(j) for j in range(k_hashes)])).alias("j"),
    )
    return fanned.select(
        _bloom_bit(F.col("__item"), F.col("j"), m_bits).alias("bit")
    ).distinct()


def bloom_maybe_contains(
    bloom: DataFrame,
    candidates: DataFrame,
    col: str,
    m_bits: int = 8192,
    k_hashes: int = 3,
) -> DataFrame:
    """Attach `maybe` = 1 iff ALL k probe bits of the candidate are set.

    `maybe = 0` is definitive absence; `maybe = 1` is membership up to the
    false-positive rate (~(1 - e^(-kn/m))^k). The filter broadcasts."""
    from pyspark.sql.functions import broadcast

    probes = candidates.select(
        F.col(col),
        F.explode(F.array(*[F.lit(j) for j in range(k_hashes)])).alias("j"),
    ).withColumn("bit", _bloom_bit(F.col(col), F.col("j"), m_bits))
    hit = F.when(F.col("bit_set").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    return (
        probes.join(
            broadcast(bloom.select(F.col("bit").alias("bit_set"))),
            probes["bit"] == F.col("bit_set"),
            "left",
        )
        .select(F.col(col), hit.alias("hit"))
        .groupBy(col)
        .agg(F.min("hit").alias("maybe"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge filters built with the same (m_bits, k_hashes): union-distinct."""
    merged = blooms[0]
    for t in blooms[1:]:
        merged = merged.unionByName(t)
    return merged.distinct()


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantile sketch — the mergeable companion to the exact
# quantiles query (entry_queries quantiles_by_type documents the exact-vs-
# approx split). A histogram of n_bins integer counters summarizes any
# number of rows; per-shard/per-day histograms MERGE by bin-wise sum, and a
# quantile estimate reads ≤ n_bins rows with error bounded by one bin width.
# Spark's own percentile_approx is the production default; this table form
# exists for the same reasons as the HLL/CMS above: registers you can store,
# merge across pipelines, and replay bit-for-bit in the DuckDB oracle.
# ---------------------------------------------------------------------------


def hist_table(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int = 64
) -> DataFrame:
    """(bin, cnt) histogram over [lo, hi); values outside clamp to the edge
    bins. One groupBy with map-side partials — ≤ n_bins rows out."""
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(w)).cast("long")
    b = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw))
    return df.select(b.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Merge histograms built with the same (lo, hi, n_bins): union + sum."""
    merged = hists[0]
    for t in hists[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame, qs_x1e6: list, lo: float, hi: float, n_bins: int = 64
) -> DataFrame:
    """(q_x1e6, est_x1e6) per requested quantile, linearly interpolated
    inside the covering bin.

    rank r = ceil(q·N) (min 1); the covering bin is the first with
    cumulative count ≥ r; est = lo + w·(bin + (r − cum_before)/cnt_bin).
    The cumulative window runs over ≤ n_bins rows — a deliberate tiny
    single-partition window, same rationale as the vetted bench sites."""
    from pyspark.sql.window import Window

    w = (hi - lo) / n_bins
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bin").rowsBetween(
            Window.unboundedPreceding, 0))
    ).withColumn("cum_before", F.col("cum") - F.col("cnt"))
    total = hist.agg(F.sum("cnt")).first()[0]
    qs = F.explode(
        F.array(*[F.lit(int(q)) for q in qs_x1e6])
    ).alias("q_x1e6")
    targets = cum.crossJoin(
        hist.sparkSession.range(1).select(qs)
    ).withColumn(
        "r",
        F.greatest(
            F.lit(1), F.ceil(F.col("q_x1e6") / 1000000.0 * F.lit(int(total)))
        ),
    )
    covering = (
        targets.filter(F.col("cum") >= F.col("r"))
        .groupBy("q_x1e6", "r")
        .agg(F.min_by(F.struct("bin", "cnt", "cum_before"), "bin").alias("s"))
    )
    est = (
        F.lit(float(lo))
        + F.lit(w)
        * (
            F.col("s.bin")
            + (F.col("r") - F.col("s.cum_before")) / F.col("s.cnt")
        )
    )
    return covering.select(
        "q_x1e6",
        F.floor(est * 1000000 + F.lit(0.5)).cast("long").alias("est_x1e6"),
    )


# ---------------------------------------------------------------------------
# Corpus-level MinHash overlap — the sketch family applied per SOURCE rather
# than per document: one n_hashes-component signature summarizes each
# source's vocabulary, and component agreement between two signatures
# estimates the Jaccard overlap of their vocabularies. The report a corpus
# curator reads to spot near-duplicate crawls or drift between snapshots,
# at a cost independent of corpus size per pair (signatures are
# n_sources x n_hashes rows).
# ---------------------------------------------------------------------------


def corpus_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n_hashes: int = 16,
) -> DataFrame:
    """(source_a, source_b, n_match, jaccard_est_x1e6) per unordered source
    pair, from per-source MinHash vocabulary signatures.

    Scale shape: tokens fan out to n_hashes salted rows via a SINGLE
    explode of structs (the minhash-bands lesson — never a UNION of
    per-salt selects re-executing the subtree), and the (group, salt)
    aggregation is an algebraic MIN: map-side partials collapse every
    partition to <= n_groups x n_hashes rows before the shuffle, so the
    low-cardinality group key is NOT a skew hazard. The pair join runs on
    the tiny signature table. Duplicate tokens need no pre-distinct — MIN
    over duplicates equals MIN over distinct, saving a shuffle.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit(""))
    salted = (
        df.select(F.col(group_col).alias("grp"), F.explode(toks).alias("w"))
        .select(
            "grp",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("salt"),
                            F.md5(F.concat(F.lit(f"s{i}|"), F.col("w"))).alias("h"),
                        )
                        for i in range(n_hashes)
                    ]
                )
            ).alias("x"),
        )
        .select("grp", "x.salt", "x.h")
    )
    sig = salted.groupBy("grp", "salt").agg(F.min("h").alias("h"))
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.salt") == F.col("b.salt")) & (F.col("a.grp") < F.col("b.grp")),
        )
        .groupBy(
            F.col("a.grp").alias("source_a"), F.col("b.grp").alias("source_b")
        )
        .agg(
            F.sum(
                F.when(F.col("a.h") == F.col("b.h"), 1).otherwise(0)
            ).alias("n_match")
        )
        .withColumn(
            "jaccard_est_x1e6",
            F.floor(
                F.lit(1000000.0) * F.col("n_match") / n_hashes + F.lit(0.5)
            ).cast("long"),
        )
        .withColumn("n_match", F.col("n_match").cast("long"))
    )


def hll_registers_by(df: DataFrame, group_col: str, col: str) -> DataFrame:
    """Per-group register tables: (grp, bucket, rho) — the grouped form of
    hll_registers, ≤ M rows per group. Same map-side max partials; the
    group key rides the same shuffle, so per-day/per-type distinct sketches
    cost one aggregation regardless of group skew (M bounds each group's
    reduce-side state)."""
    h = _hash32(F.col(col))
    rem = F.shiftrightunsigned(h, 6)
    rho = F.when(rem == 0, F.lit(27)).otherwise(
        F.bit_count((rem.bitwiseAND(-rem)) - 1) + 1
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            h.bitwiseAND(F.lit(M - 1)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_by(registers: DataFrame) -> DataFrame:
    """(grp, estimate) per group from a (grp, bucket, rho) register table —
    the alpha·m²/Σ2^(-M_j) estimator per group, WITH the small-range
    linear-counting correction (Flajolet et al. 2007 §4: when the raw
    estimate ≤ 2.5·m and V empty registers remain, use m·ln(m/V)). Groups
    routinely have cardinality ≪ m — unlike the whole-table hll_estimate,
    which stays raw-only as its gate pins — so the correction is the
    difference between a usable and a badly biased per-group count.
    Mergeable across tables with groupBy(grp, bucket).max(rho) first."""
    agg = registers.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("present_sum"),
        F.count(F.lit(1)).alias("present_n"),
    )
    v = F.lit(M) - F.col("present_n")
    total = F.col("present_sum") + v * F.lit(1.0)
    raw = F.lit(ALPHA_64) * F.lit(M) * F.lit(M) / total
    est = F.when(
        (raw <= F.lit(2.5 * M)) & (v > 0),
        F.floor(F.lit(float(M)) * F.log(F.lit(float(M)) / v) + F.lit(0.5)),
    ).otherwise(F.floor(raw + F.lit(0.5)))
    return agg.select("grp", est.cast("long").alias("estimate"))


def cms_join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Equi-join output-cardinality estimate from two CMS sketches: the
    inner-product estimator (Cormode & Muthukrishnan 2005 §4.2 — the
    AMS/F2 idea carried over to CMS): for each hash row d,
    Σ_bucket cntA[d][b]·cntB[d][b] OVERestimates |A ⋈ B| (collisions only
    add), so the min over rows is the estimate and it NEVER
    underestimates. The planner-side primitive for sizing a shuffle
    before paying for it — decide broadcast vs sort-merge vs salting
    from two ≤ depth·width-row sketch tables instead of running the
    join. Error ≤ ||A||₁·||B||₁·2/width per row with the usual CMS
    probability; exact integer arithmetic end to end.

    Build is one pass per side (map-side-combined groupBy on (d,
    bucket)); the product join is sketch-sized (≤ depth·width rows).
    Returns one row: (est_join_rows,).
    """
    sa = cms_table(a, col, depth, width).withColumnRenamed("cnt", "ca")
    sb = cms_table(b, col, depth, width).withColumnRenamed("cnt", "cb")
    per_row = (
        sa.join(sb, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    return per_row.agg(F.min("ip").cast("long").alias("est_join_rows"))


# ---------------------------------------------------------------------------
# KMV (bottom-k) distinct sketch
# ---------------------------------------------------------------------------


def kmv_bottomk(df: DataFrame, group_col: str, col: str, k: int = 64) -> DataFrame:
    """Per-group bottom-k table of DISTINCT 32-bit hashes — the KMV /
    theta-sketch state (Bar-Yossef et al. 2002). Order statistics of
    uniform hashes carry the cardinality: if the k-th smallest of
    distinct hashes over [0, 2^32) is h_k, the distinct count is about
    (k−1)·2^32/h_k. Unlike HLL's registers (max-of-rho), the KMV state
    is a plain sorted id set, so the SAME table also powers bottom-k
    Jaccard between groups; this module keeps both sketch families
    because they merge differently (HLL: max per bucket; KMV: union →
    re-take bottom k — see `kmv_merge`).

    Shape: a (group, hash) combinable distinct collapses the input, then
    ONE rank window on the collapsed table keeps ≤ k rows per group.
    Hash collisions only ever DROP a distinct value, identically in the
    oracle (md5-portable).

    Returns (group, h) with ≤ k rows per group.
    """
    hashed = (
        df.select(F.col(group_col).alias("g"), _hash32(F.col(col)).alias("h"))
        .dropDuplicates()
    )
    w = Window.partitionBy("g").orderBy("h")
    return (
        hashed.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select(F.col("g").alias(group_col), "h")
    )


def kmv_merge(
    k: int, *sketches: DataFrame, group_col: str | None = None
) -> DataFrame:
    """Union bottom-k tables and re-take the bottom k per group — the
    KMV merge law (bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)),
    exact, not approximate). Distributed shape: tiny inputs (≤ k rows
    per group each), one union + one rank window.

    group_col defaults to the single non-'h' column; inference refuses
    wider inputs (extra columns would make the guess silently wrong) —
    pass group_col explicitly for those."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    cols = merged.columns
    if group_col is None:
        if len(cols) != 2 or "h" not in cols:
            raise ValueError(
                "kmv_merge cannot infer group_col from columns "
                f"{cols}; pass group_col explicitly"
            )
        group_col = [c for c in cols if c != "h"][0]
    elif group_col not in cols:
        raise ValueError(f"group_col {group_col!r} not in {cols}")
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        merged.dropDuplicates()
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select(group_col, "h")
    )


def kmv_estimate(bottomk: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """(group, n_kept, kth_min, kmv_est) from a bottom-k table: when the
    group holds fewer than k distinct hashes the sketch IS the exact
    distinct count; otherwise est = (k−1)·2^32 DIV h_k — an exact
    integer quotient both engines replay (no floats anywhere in the
    estimator, unlike HLL's harmonic mean)."""
    return (
        bottomk.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("h").cast("long").alias("kth_min"),
        )
        .select(
            group_col,
            "n_kept",
            "kth_min",
            F.expr(
                f"CAST(CASE WHEN n_kept < {k} THEN n_kept "
                f"ELSE ({k} - 1) * CAST(4294967296 AS BIGINT) DIV kth_min "
                "END AS BIGINT)"
            ).alias("kmv_est"),
        )
    )


def kmv_jaccard(
    bottomk: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Pairwise Jaccard similarity between groups ESTIMATED FROM THEIR
    KMV SKETCHES alone — the second dividend of the bottom-k state
    (kmv_bottomk's docstring): bottomk(A ∪ B) is computable from
    bottomk(A) ∪ bottomk(B), and any of its members that belongs to A
    also belongs to bottomk(A) (fewer than k union hashes precede it, a
    fortiori fewer of A's), so intersection membership is decidable
    inside the sketches. J ≈ |{h ∈ bottomk(A∪B): h ∈ both}| / |bottomk(A∪B)|
    — the classic bottom-k Jaccard estimator (Cohen & Kaplan 2007), and
    the set-similarity companion to MinHash that needs ONE sketch per
    group instead of one per (group, hash-function).

    Shape: the group list is tiny by contract (sketches exist per
    group); pairs fan ≤ |G|²/2 each carrying ≤ 2k sketch rows — an
    all-pairs-of-sketches join, never an all-pairs-of-members join.
    Exact integers end to end: jacc_x1e6 = matches·1e6 DIV denom.

    Returns (group_a, group_b, denom, n_match, jacc_x1e6), group_a <
    group_b.
    """
    groups = bottomk.select(F.col(group_col).alias("ga")).distinct()
    pairs = groups.join(
        groups.select(F.col("ga").alias("gb")),
        F.col("ga") < F.col("gb"),
    )
    a = bottomk.select(F.col(group_col).alias("ga"), "h")
    b = bottomk.select(F.col(group_col).alias("gb"), "h")
    ua = pairs.join(a, "ga").select("ga", "gb", "h", F.lit(1).alias("in_a"))
    ub = pairs.join(b, "gb").select(
        "ga", "gb", "h", F.lit(0).alias("in_a")
    )
    merged = (
        ua.unionByName(ub)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("has_a"), F.min("in_a").alias("__lo"))
        .select(
            "ga", "gb", "h", "has_a",
            (1 - F.col("__lo")).alias("has_b"),
        )
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    topk = merged.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= k
    )
    return (
        topk.groupBy("ga", "gb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("denom"),
            F.sum(F.col("has_a") * F.col("has_b")).cast("long").alias("n_match"),
        )
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "denom",
            "n_match",
            F.expr(
                "n_match * CAST(1000000 AS BIGINT) DIV denom"
            ).alias("jacc_x1e6"),
        )
    )


def ams_f2(
    df: DataFrame,
    col: str,
    k: int = 16,
    seed: str = "ams:",
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996 —
    the STREAMS result): k independent estimators Z_j = sum over rows of
    s_j(x), where s_j(x) = +-1 is the md5 sign of (seed, j, value); each
    Z_j^2 is an unbiased estimate of F2 = sum f_x^2 (repeat-rate /
    self-join size — what a join planner wants where HLL answers
    distinct-count), and the emitted estimate is the textbook
    median-of-means: groups of 4 estimators averaged (sum DIV count),
    pinned lower median across the k/4 group means. Exact integers
    throughout: |Z_j| <= n so Z^2 <= n^2 — BIGINT-safe to n ~ 3e9 rows.

    Mergeability is the point at 100 TB: Z vectors ADD across shards/
    days (one k-row table each, bin-wise sum), so the sketch composes
    exactly like the HLL/CMS/KMV registers beside it. Shape: ONE k-fan
    explode + one k-row groupBy (map-side combinable), then a k-row sort
    for the median — sketch-sized, never data-sized.

    Returns one row (k, f2_est) plus the exact F2 for the readout is the
    caller's join (the gate query emits both).
    """
    from pyspark.sql.window import Window

    signs = F.expr(
        "transform(sequence(0, {km1}), j -> CASE WHEN"
        " CAST(conv(substring(md5(concat('{seed}', CAST(j AS STRING), ':',"
        " CAST(__v AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2 = 0"
        " THEN 1 ELSE -1 END)".format(km1=k - 1, seed=seed)
    )
    z = (
        df.select(F.col(col).cast("string").alias("__v"))
        .select(F.posexplode(signs).alias("j", "s"))
        .groupBy("j")
        .agg(F.sum("s").cast("long").alias("z"))
    )
    n_groups = max(k // 4, 1)
    gmeans = (
        z.select(
            F.expr("j DIV 4").alias("g"),
            (F.col("z") * F.col("z")).cast("long").alias("z2"),
        )
        .groupBy("g")
        .agg(F.expr("sum(z2) DIV count(1)").cast("long").alias("gm"))
    )
    w = Window.orderBy(F.asc("gm"), F.asc("g"))
    return (
        gmeans.withColumn("__rn", F.row_number().over(w).cast("long"))
        .filter(F.col("__rn") == F.lit((n_groups + 1) // 2))
        .select(
            F.lit(k).cast("long").alias("k"),
            F.col("gm").alias("f2_est"),
        )
    )


def sample_quantile_report(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 100,
    ps: tuple = (50, 90, 99),
) -> DataFrame:
    """Sample-based quantile estimation with an exactness audit: a
    deterministic bottom-k-by-md5 uniform sample (the KMV device reused
    as a row sampler — mergeable, one scan, k rows cross the driver
    boundary nowhere) estimates each requested percentile, and the
    report joins the EXACT distributed quantile (collapsed-value rank
    selection, no global sort) plus the estimate's true rank error —
    the calibration-row pattern (cf. bloom_fp_calibration, ann_recall):
    an approximation is only shippable next to its measured error.

    Quantile convention, both paths: smallest v with cum-count >=
    ceil(p·n/100) (exact integer ceil-div). Emits one row per
    percentile: (p, est, exact, abs_err, rank_err_x1e6) where
    rank_err_x1e6 = |rank(est) − p·n DIV 100|·1e6 DIV n.
    """
    base = df.select(
        F.col(value_col).cast("long").alias("v"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    ).localCheckpoint(eager=True)
    n_total = base.count()
    samp = base.orderBy("h").limit(k).select("v")
    n_s = min(k, n_total)
    cells = base.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.withColumn("cum", F.sum("c").over(wv)).localCheckpoint(
        eager=True
    )
    scells = samp.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    scum = scells.withColumn("cum", F.sum("c").over(wv))
    spark = df.sparkSession
    pdf = spark.createDataFrame([(int(p),) for p in ps], "p long")
    # exact: per p, min v with cum >= ceil(p*n/100); same for the sample
    ex = (
        cum.crossJoin(F.broadcast(pdf))
        .filter(F.expr(f"cum >= (p * {n_total} + 99) DIV 100"))
        .groupBy("p")
        .agg(F.min("v").alias("exact"))
    )
    es = (
        scum.crossJoin(F.broadcast(pdf))
        .filter(F.expr(f"cum >= (p * {n_s} + 99) DIV 100"))
        .groupBy("p")
        .agg(F.min("v").alias("est"))
    )
    ranked = es.join(
        cum.select("v", F.col("cum").alias("rank_of_est")),
        es["est"] == F.col("v"),
        "left",
    ).select("p", "est", F.col("rank_of_est"))
    return (
        ex.join(ranked, "p")
        .select(
            F.col("p").cast("long").alias("p"),
            F.col("est").cast("long").alias("est"),
            F.col("exact").cast("long").alias("exact"),
            F.abs(F.col("est") - F.col("exact")).cast("long").alias("abs_err"),
            F.expr(
                f"abs(rank_of_est - p * {n_total} DIV 100) * 1000000"
                f" DIV {max(n_total, 1)}"
            ).cast("long").alias("rank_err_x1e6"),
        )
    )
