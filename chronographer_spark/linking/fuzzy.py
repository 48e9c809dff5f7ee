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
    # {t} ∪ del1(t): array_union also dedups repeated variants ("aa" -> "a")
    variants = toks.select(
        "tok",
        F.explode(
            F.array_union(
                F.array(F.col("tok")),
                F.expr(_DEL1.format(c="tok")),
            )
        ).alias("variant"),
    )
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
