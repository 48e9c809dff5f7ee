"""Fuzzy (edit-distance) string matching for entity-name canonicalization.

The reference links mentions to entities by exact string/URI match only
(alias dict, reference: src/get_equivalent_url.py:13-35); a typo'd surface
form ("Pitsburgh") never reaches its canonical entity. This module adds the
standard production pre-pass: an edit-distance-1 self-join over the distinct
surface-form vocabulary, whose output pairs feed the same alias-edge
connected-components stage as exact redirects (linking/canonicalize.py).

Candidate generation is SymSpell-style deletion-variant blocking
(Garbe 2012; also FastSS, Bocek et al. 2007): each token t is expanded to
{t} ∪ del1(t) (every single-character deletion). Two tokens s, t with
ED(s,t) <= 1 MUST share a variant:

  - deletion:     t ∈ del1(s)                     -> variant t
  - insertion:    s ∈ del1(t)                     -> variant s
  - substitution: deleting the substituted char from each gives the same
                  string                          -> shared variant

so the blocking is LOSSLESS (recall 1.0) and the final `levenshtein <= 1`
verify only removes false positives. No all-pairs product is ever formed.

Scale shape (100 TB / 10^9-token vocab):
  - fan-out per token = len(t) + 1 variants, bounded by max token length
    (cap long tokens upstream; entity surface forms are short);
  - one shuffle on the variant key; variant frequency is bounded by the
    vocabulary's length distribution, and AQE skew-split covers hot
    variants of very short tokens;
  - verify is a JVM `levenshtein` on candidate pairs only (candidates
    ~ O(vocab * avg_len), not O(vocab^2)).

For ED <= d, the production extension is PassJoin segment blocking (Li et
al., VLDB 2011): partition each string into d+1 segments; pigeonhole
guarantees a matching string contains one segment exactly. d=1 deletion
variants are the degenerate case and need no substring-position alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ed1_pairs"]

_DEL1 = (
    "transform(sequence(1, length({c})), i -> "
    "concat(substring({c}, 1, i - 1), substring({c}, i + 1, length({c}))))"
)


def ed1_pairs(
    vocab: DataFrame,
    col: str = "tok",
    max_len: int = 64,
) -> DataFrame:
    """All unordered pairs of distinct vocabulary tokens with edit distance
    exactly 1 (identical tokens are already collapsed by `distinct`).

    vocab: DataFrame with a string column `col`; deduplicated internally.
    max_len: tokens longer than this are dropped (bounds the deletion
        fan-out; surface forms past 64 chars are junk in practice).

    Returns columns (tok1, tok2, dist) with tok1 < tok2, dist = 1L.
    """
    toks = (
        vocab.select(F.col(col).alias("tok"))
        .filter(F.col("tok").isNotNull() & (F.length("tok") <= max_len))
        .distinct()
    )
    # {t} ∪ del1(t): array_union also dedups repeated variants ("aa" -> "a").
    # Eager localCheckpoint: the variant table feeds BOTH sides of the
    # self-join — without it the dedup+explode subtree executes twice (the
    # tf/df re-execution family, CLAUDE.md).
    variants = toks.select(
        "tok",
        F.explode(
            F.array_union(
                F.array(F.col("tok")),
                F.expr(_DEL1.format(c="tok")),
            )
        ).alias("variant"),
    ).localCheckpoint(eager=True)
    left = variants.select(F.col("tok").alias("tok1"), "variant")
    right = variants.select(F.col("tok").alias("tok2"), "variant")
    cand = (
        left.join(right, "variant")
        .filter(F.col("tok1") < F.col("tok2"))
        .select("tok1", "tok2")
        .distinct()
    )
    return cand.filter(F.levenshtein("tok1", "tok2") <= 1).select(
        "tok1",
        "tok2",
        F.levenshtein("tok1", "tok2").cast("long").alias("dist"),
    )


def _grams(df: DataFrame, side: str) -> DataFrame:
    """Distinct character trigrams per token (whole token when len < 3)."""
    toks = df.select(F.col("tok").alias(side))
    long = toks.filter(F.length(side) >= 3).select(
        side,
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, length({side}) - 2),"
                f" i -> substring({side}, i, 3)))"
            )
        ).alias("gram"),
    )
    short = toks.filter(F.length(side) < 3).select(side, F.col(side).alias("gram"))
    return long.unionByName(short)


def mutual_best_trigram_match(
    left_vocab: DataFrame,
    right_vocab: DataFrame,
    col: str = "tok",
    max_len: int = 64,
) -> DataFrame:
    """Align two vocabularies by MUTUAL best trigram-Jaccard match — the
    surface-form alignment step when reconciling entity names across KBs
    (the multi-KB DatasetProfile surface, cf. reference
    dataset-config/wikidata.yaml:1-44: per-KB URI vocabularies that name
    the same entities differently).

    Candidates come from a shared-trigram join (no all-pairs product);
    similarity is exact-integer Jaccard over distinct trigram sets
    (jac_x1e6 = n_common * 10^6 DIV (n_a + n_b - n_common)); each side
    then arg-maxes its candidates (highest jac, tie -> lexicographically
    smallest partner) and only pairs that are each other's best survive.
    Mutual-best is the standard high-precision alignment filter: a hub
    name that is "best" for many partners can be kept by at most one.

    Scale shape: one shuffle on the gram key (posting lists; a stop-gram
    cap upstream bounds hot grams), one (tok_a, tok_b) count, two
    map-side-combinable arg-max aggs, one equi-join for mutuality. All
    similarity arithmetic is integral — no cross-engine float discipline
    needed.

    Returns (tok_a, tok_b, n_common, n_a, n_b, jac_x1e6).
    """

    def _prep(v: DataFrame) -> DataFrame:
        return (
            v.select(F.col(col).cast("string").alias("tok"))
            .filter(F.col("tok").isNotNull() & (F.length("tok") <= max_len))
            .filter(F.col("tok") != "")
            .distinct()
        )

    # each gram table feeds its degree count AND the candidate join
    ga = _grams(_prep(left_vocab), "tok_a").localCheckpoint(eager=True)
    gb = _grams(_prep(right_vocab), "tok_b").localCheckpoint(eager=True)
    na = ga.groupBy("tok_a").agg(F.count(F.lit(1)).alias("n_a"))
    nb = gb.groupBy("tok_b").agg(F.count(F.lit(1)).alias("n_b"))
    common = (
        ga.join(gb, "gram")
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # scored feeds three consumers (best_a, best_b, the final re-join);
    # eager checkpoint executes the gram join once instead of three times
    scored = (
        common.join(na, "tok_a")
        .join(nb, "tok_b")
        .withColumn(
            "jac_x1e6",
            F.expr(
                "CAST(n_common * 1000000 DIV (n_a + n_b - n_common) AS BIGINT)"
            ),
        )
        .localCheckpoint(eager=True)
    )
    # arg-max per side as min_by on (-jac, partner): highest jac wins,
    # ties go to the lexicographically smallest partner
    payload = F.struct("tok_a", "tok_b", "n_common", "n_a", "n_b", "jac_x1e6")
    best_a = (
        scored.groupBy("tok_a")
        .agg(
            F.min_by(
                payload, F.struct((-F.col("jac_x1e6")).alias("nj"), F.col("tok_b"))
            ).alias("m")
        )
        .select("m.tok_a", F.col("m.tok_b").alias("tok_b"))
    )
    best_b = (
        scored.groupBy("tok_b")
        .agg(
            F.min_by(
                payload, F.struct((-F.col("jac_x1e6")).alias("nj"), F.col("tok_a"))
            ).alias("m")
        )
        .select(F.col("m.tok_a").alias("tok_a"), "m.tok_b")
    )
    mutual = best_a.join(best_b, ["tok_a", "tok_b"])
    return mutual.join(scored, ["tok_a", "tok_b"]).select(
        "tok_a", "tok_b", "n_common", "n_a", "n_b", "jac_x1e6"
    )
