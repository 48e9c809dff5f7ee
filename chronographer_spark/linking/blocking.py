"""Multi-key blocked entity-resolution scoring.

The classic record-linkage skeleton (Fellegi & Sunter 1969, with fixed
integer agreement weights instead of EM-estimated log-odds — weights stay
exact integers so scores replay across engines): candidate pairs come
only from BLOCKS (records sharing a blocking key), never the full cross
product, then each candidate is scored by summing weights over agreeing
fields. Blocking is the entire scale story of ER — a 10^9 × 10^9 match is
feasible exactly when the largest block is bounded — and complements the
repo's other linking paths (ED-1 fuzzy join = typo-tolerant surface
match, connected components = transitive merge): this is the multi-
evidence scorer that feeds CC its edges.

Reference tie-in: the reference links mentions by Spotlight lookup only
(src/build_ng/dbpedia_spotlight.py); cross-source record matching is
added capability, same family as kb_alignment_mutual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_match_scores(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    blocks: list[list[str]],
    agreements: list[tuple[str, int]],
    min_score: int = 0,
) -> DataFrame:
    """Score candidate pairs of `a` x `b` (same column names both sides).

    - ``blocks``: list of blocking keys (each a list of column names);
      candidates = union over blocks of the per-block equi-join, pair-
      deduplicated. Each block is ONE hash join shuffled on its key; the
      union dedup is one pair-keyed shuffle. Skewed blocks ride AQE,
      and an oversized block should be split by adding a column to its
      key (the standard blocking fix) — nothing here is all-pairs.
    - ``agreements``: (column, integer weight) — weight added when the
      pair agrees exactly on the column (nulls never agree). Features
      ride the block joins, so scoring is map-side; the same pair found
      by two blocks dedups to one row (field agreement is a function of
      the pair, so duplicates are identical rows).

    Returns (a_id, b_id, score) for pairs with score >= ``min_score``.
    """
    cols = {id_col} | {c for blk in blocks for c in blk} | {c for c, _ in agreements}
    pa = a.select([F.col(c).alias(f"a_{c}") for c in sorted(cols)])
    pb = b.select([F.col(c).alias(f"b_{c}") for c in sorted(cols)])
    cands = None
    for blk in blocks:
        cond = [pa[f"a_{c}"] == pb[f"b_{c}"] for c in blk]
        j = pa.join(pb, cond)
        cands = j if cands is None else cands.unionByName(j)
    cands = cands.dropDuplicates([f"a_{id_col}", f"b_{id_col}"])
    score = sum(
        (
            F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), F.lit(w)).otherwise(F.lit(0))
            for c, w in agreements
        ),
        F.lit(0),
    )
    return (
        cands.withColumn("score", score.cast("long"))
        .filter(F.col("score") >= min_score)
        .select(
            F.col(f"a_{id_col}").alias("a_id"),
            F.col(f"b_{id_col}").alias("b_id"),
            "score",
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_cols: list,
    id_col: str,
    window: int = 3,
    n_parts: int = 32,
) -> DataFrame:
    """Sorted-neighborhood ER blocking (Hernández & Stolfo 1995
    merge/purge): records within ``window`` positions of each other in
    the GLOBAL sort order of the blocking key become candidate pairs —
    the complement of equality blocking (blocked_match_scores), catching
    near-misses that share a sort prefix but no exact block value.

    Scale shape: the global rank is computed WITHOUT a single-partition
    window — range-partition on (key, id), per-partition row_number, and
    per-partition counts (≤ n_parts rows over the driver, the IVF-
    centroid O(1) exception) turned into broadcast offsets, mirroring
    pack_sequences' two-phase prefix sum. Pair generation is ONE
    bucket-equi-join: ranks bucket by rank DIV window, the smaller side
    fans each row to its own and the next bucket (a pair at distance
    ≤ window can only straddle adjacent buckets), so the join fan-out is
    bounded by 2·window per row — never a rank-range theta join.

    Ordering contract: (key_cols..., id_col) must be unique per row
    (id_col uniqueness suffices), making the rank — and the emitted
    pair set — fully deterministic and oracle-replayable.

    Returns (id_a, id_b, dist) with dist = rank_b − rank_a ∈ [1, window].
    """
    from pyspark.sql.window import Window

    ks = [F.col(c) for c in key_cols]
    base = df.select(*ks, F.col(id_col).alias("__id"))
    parted = base.repartitionByRange(n_parts, *key_cols, "__id").withColumn(
        "_part", F.spark_partition_id()
    )
    lw = Window.partitionBy("_part").orderBy(*key_cols, "__id")
    local = parted.withColumn("_rn", F.row_number().over(lw)).localCheckpoint(
        eager=True
    )
    counts = sorted(
        (r["_part"], r["c"])
        for r in local.groupBy("_part").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((int(pid), int(acc)))
        acc += c
    off_df = local.sparkSession.createDataFrame(offsets, "_part int, _off long")
    ranked = local.join(F.broadcast(off_df), "_part").select(
        "__id", (F.col("_off") + F.col("_rn")).cast("long").alias("rank")
    )
    w = int(window)
    left = ranked.select(
        F.col("__id").alias("id_a"),
        F.col("rank").alias("ra"),
        F.explode(
            F.array(F.expr(f"rank DIV {w}"), F.expr(f"rank DIV {w} + 1"))
        ).alias("__g"),
    )
    right = ranked.select(
        F.col("__id").alias("id_b"),
        F.col("rank").alias("rb"),
        F.expr(f"rank DIV {w}").alias("__g"),
    )
    return (
        left.join(right, "__g")
        .filter((F.col("rb") > F.col("ra")) & (F.col("rb") - F.col("ra") <= w))
        .select("id_a", "id_b", (F.col("rb") - F.col("ra")).alias("dist"))
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    key_cols: list,
    id_col: str,
    text_col: str,
    window: int = 5,
    max_dist: int = 2,
    max_len: int = 64,
) -> DataFrame:
    """Merge/purge with an edit-distance verifier: sorted-neighborhood
    candidates (see sorted_neighborhood_pairs) scored by Levenshtein
    distance on a length-capped surface string, keeping pairs within
    ``max_dist`` — the classic fuzzy-match ER composition (blocking bounds
    the candidate set to ~window·n, the O(len²) DP runs only on
    candidates, never all pairs). Complements ed1_pairs (exact distance-1
    on a VOCABULARY via deletion variants): this scores arbitrary
    distances on RECORD surfaces inside blocks.

    ``max_len`` truncates the compared surface (substring, not hash) so
    the per-pair DP cost is bounded at max_len² regardless of record
    size — the distance is then over the truncated surface, documented.

    Both engines implement textbook unit-cost Levenshtein over unicode
    codepoints (Spark `levenshtein`, DuckDB `levenshtein`), so the gate
    replays scores exactly.

    Returns (id_a, id_b, dist, lev) — dist is the rank gap from blocking,
    lev the edit distance.
    """
    keyed = df.select(
        *key_cols, F.col(id_col), F.substring(F.col(text_col), 1, max_len).alias("__t")
    )
    pairs = sorted_neighborhood_pairs(
        keyed.select(*key_cols, id_col), key_cols, id_col, window=window
    )
    t = keyed.select(F.col(id_col), F.col("__t"))
    ta = t.select(F.col(id_col).alias("id_a"), F.col("__t").alias("__ta"))
    tb = t.select(F.col(id_col).alias("id_b"), F.col("__t").alias("__tb"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("lev", F.levenshtein("__ta", "__tb").cast("long"))
        .filter(F.col("lev") <= int(max_dist))
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"), "lev")
    )


def soundex_key(
    df: DataFrame, col: str = "name", id_col: str = "id"
) -> DataFrame:
    """Portable simplified-Soundex phonetic blocking key — the classic ER
    blocker for name-ish attributes (Christen 2012 ch.4 lists it first):
    letter + 3 consonant-class digits, so spelling variants (Robert /
    Rupert -> R163) land in the same block and the pair space shrinks by
    orders of magnitude before any string-distance join.

    Neither engine's builtin is used (DuckDB has none; relying on
    Spark's would make the oracle unreplayable): the key is rebuilt from
    CODEPOINT arithmetic both sides — upper, keep A-Z, map to the
    Russell classes (BFPV=1 CGJKQSXZ=2 DT=3 L=4 MN=5 R=6, vowels+HWY=0),
    collapse adjacent equal codes, drop zeros after the lead letter,
    rpad to 3 digits. The 'simplified' part: H/W separating equal codes
    break the run like vowels do (American-census Soundex merges them) —
    documented, deterministic, and replayed verbatim by the oracle.
    Array lambdas only (transform/filter with index) — per-row, no
    explode, whole-stage codegen.

    Returns (id_col, col, sdx); rows with no A-Z letters read NULL.
    Compose with a groupBy(sdx) for the block census or a self-join on
    sdx for candidate pairs (the blocking_quality evaluator scores the
    result)."""
    letters = (
        f"filter(split(upper({col}), ''),"
        " c -> ascii(c) >= 65 AND ascii(c) <= 90)"
    )
    codes = (
        "transform(__ltr, c -> CASE"
        " WHEN ascii(c) IN (66,70,80,86) THEN 1"
        " WHEN ascii(c) IN (67,71,74,75,81,83,88,90) THEN 2"
        " WHEN ascii(c) IN (68,84) THEN 3"
        " WHEN ascii(c) = 76 THEN 4"
        " WHEN ascii(c) IN (77,78) THEN 5"
        " WHEN ascii(c) = 82 THEN 6"
        " ELSE 0 END)"
    )
    # (x, i) lambda: i is 0-based, element_at is 1-based -> element_at(.., i)
    # is the PREVIOUS element; keep run heads only
    collapsed = (
        "filter(__cod, (x, i) -> i = 0 OR x <> element_at(__cod, i))"
    )
    tail = (
        "filter(slice(__col, 2, greatest(size(__col) - 1, 0)),"
        " d -> d <> 0)"
    )
    sdx = (
        "CASE WHEN size(__ltr) = 0 THEN CAST(NULL AS STRING)"
        " ELSE concat(element_at(__ltr, 1),"
        "  substring(concat(concat_ws('',"
        "   transform(__tl, d -> CAST(d AS STRING))), '000'), 1, 3)) END"
    )
    return (
        df.select(F.col(id_col), F.col(col))
        .withColumn("__ltr", F.expr(letters))
        .withColumn("__cod", F.expr(codes))
        .withColumn("__col", F.expr(collapsed))
        .withColumn("__tl", F.expr(tail))
        .select(id_col, col, F.expr(sdx).alias("sdx"))
    )
