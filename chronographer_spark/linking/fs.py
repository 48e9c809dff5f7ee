"""Fellegi-Sunter probabilistic record linkage with exact-integer weights.

The classic probabilistic ER scorer (Fellegi & Sunter 1969, the model behind
Splink): each comparison field k carries a match weight log2(m_k/u_k) when a
candidate pair agrees on it and log2((1-m_k)/(1-u_k)) when it disagrees; a
pair's score is the sum over fields. This is the principled upgrade over
``blocked_match_scores``'s hand-tuned integer weights (linking/blocking.py) —
here the weights are ESTIMATED from the data:

- ``u_k`` (P(agree | non-match)) uses the random-pairing closed form
  u_k = sum_v n_a(v) * n_b(v) / (N_a * N_b) over the field's value
  frequencies — an exact BIGINT rational from ONE Zipf-small value join per
  field (the standard Splink u-estimation recipe; no pair sampling, no RNG).
- ``m_k`` (P(agree | match)) is counted on a labeled seed-pair sample in ONE
  pass: k conditional sums over the seed join.

Weights are exact integers in 16*log2 units via the msb16 device
(operators/sampling._msb16_sql): w = msb16((m_num * 2^20 DIV m_den) * u_den
DIV u_num) - 320. Both engines replay the staged quotient bit-for-bit — no
float log anywhere. Zero-probability edges floor at -320 (the device's >=1
clamp), documented rather than special-cased.

Scale shape: the per-field value joins and the single seed pass are the only
shuffles in estimation (value tables are Zipf-small); scoring is map-side
over the blocked candidate pairs with the one-row weight scalars broadcast.
The staged quotient keeps every intermediate <= 2^20 * N_a * N_b — at cluster
scale estimate m/u on a fixed-size sampled slice (the weights are global
scalars; they do not need the full corpus).

Reference parity: the reference links mentions by exact-URI equivalence only
(/root/reference/src/get_equivalent_url.py:13-35); probabilistic field-weight
linkage is LLM-pipeline ER surface beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import _msb16_sql


def _w_expr(m_num: str, m_den: str, u_num: str, u_den: str) -> str:
    """16*log2((m_num/m_den) / (u_num/u_den)) as an exact staged-quotient
    BIGINT: msb16((m_num * 2^20 DIV m_den) * u_den DIV u_num) - 320."""
    q = (
        f"(({m_num}) * 1048576 DIV greatest({m_den}, CAST(1 AS BIGINT)))"
        f" * ({u_den}) DIV greatest({u_num}, CAST(1 AS BIGINT))"
    )
    return f"CAST({_msb16_sql(q)} - 320 AS BIGINT)"


def _fs_scalars(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    fields: list[str],
    seed: DataFrame,
) -> DataFrame:
    """One-row DataFrame of every estimation scalar: na, nb, m_den, and per
    field f: u_num_<f>, m_num_<f>. All 1-row crossJoins (broadcast NLJ with
    a single-row build side)."""
    scal = a.agg(F.count("*").cast("long").alias("na")).crossJoin(
        b.agg(F.count("*").cast("long").alias("nb"))
    )
    for f in fields:
        va = (
            a.where(F.col(f).isNotNull())
            .groupBy(f)
            .agg(F.count("*").cast("long").alias("__ca"))
        )
        vb = (
            b.where(F.col(f).isNotNull())
            .groupBy(f)
            .agg(F.count("*").cast("long").alias("__cb"))
        )
        u = va.join(vb, f).agg(
            F.coalesce(F.sum(F.col("__ca") * F.col("__cb")), F.lit(0))
            .cast("long")
            .alias(f"u_num_{f}")
        )
        scal = scal.crossJoin(u)
    sa = a.select(
        F.col(id_col).alias("__aid"), *[F.col(f).alias(f"a_{f}") for f in fields]
    )
    sb = b.select(
        F.col(id_col).alias("__bid"), *[F.col(f).alias(f"b_{f}") for f in fields]
    )
    sp = (
        seed.select(F.col("a_id").alias("__aid"), F.col("b_id").alias("__bid"))
        .join(sa, "__aid")
        .join(sb, "__bid")
    )
    magg = sp.agg(
        F.count("*").cast("long").alias("m_den"),
        *[
            F.sum(F.when(F.col(f"a_{f}") == F.col(f"b_{f}"), 1).otherwise(0))
            .cast("long")
            .alias(f"m_num_{f}")
            for f in fields
        ],
    )
    return scal.crossJoin(magg)


def fs_field_weights(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    fields: list[str],
    seed: DataFrame,
) -> DataFrame:
    """Per-field Fellegi-Sunter estimates and integer weights.

    ``seed`` carries labeled match pairs as columns (a_id, b_id). NULLs never
    agree (they are excluded from both u counting and m agreement). Returns
    one row per field: (field, m_num, m_den, u_num, u_den, w_agree_x16,
    w_disagree_x16) where w_* are 16*log2 units.
    """
    scal = _fs_scalars(a, b, id_col, fields, seed)
    structs = []
    for f in fields:
        w_a = _w_expr(f"m_num_{f}", "m_den", f"u_num_{f}", "na * nb")
        w_d = _w_expr(
            f"(m_den - m_num_{f})",
            "m_den",
            f"(na * nb - u_num_{f})",
            "na * nb",
        )
        structs.append(
            F.struct(
                F.lit(f).alias("field"),
                F.col(f"m_num_{f}").alias("m_num"),
                F.col("m_den").alias("m_den"),
                F.col(f"u_num_{f}").alias("u_num"),
                F.expr("na * nb").cast("long").alias("u_den"),
                F.expr(w_a).alias("w_agree_x16"),
                F.expr(w_d).alias("w_disagree_x16"),
            )
        )
    return scal.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def fs_score_pairs(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    fields: list[str],
    seed: DataFrame,
    block_cols: list[str],
) -> DataFrame:
    """Score blocked a x b candidate pairs with FS weights estimated from
    the same inputs. Candidates = equi-join on ``block_cols`` (one hash
    join); scoring is map-side with the one-row weight scalars broadcast.
    Returns (a_id, b_id, n_agree, score_x16); ties broken downstream.
    """
    # Evaluate every field weight ONCE on the one-row scalar side BEFORE
    # broadcasting: the msb16 staged quotient expands to a bin()-string
    # expression tree, and evaluating it per candidate row was measured
    # ~100x slower than per-pair column references (9.2M-pair soak:
    # 57s -> see BENCH). The broadcast row carries plain BIGINT weights.
    scal = _fs_scalars(a, b, id_col, fields, seed)
    wcols = []
    for f in fields:
        wcols.append(
            F.expr(
                _w_expr(f"m_num_{f}", "m_den", f"u_num_{f}", "na * nb")
            ).alias(f"w_a_{f}")
        )
        wcols.append(
            F.expr(
                _w_expr(
                    f"(m_den - m_num_{f})",
                    "m_den",
                    f"(na * nb - u_num_{f})",
                    "na * nb",
                )
            ).alias(f"w_d_{f}")
        )
    wrow = scal.select(*wcols)
    cols = set(fields) | set(block_cols)
    pa = a.select(
        F.col(id_col).alias("a_id"), *[F.col(c).alias(f"a_{c}") for c in sorted(cols)]
    )
    pb = b.select(
        F.col(id_col).alias("b_id"), *[F.col(c).alias(f"b_{c}") for c in sorted(cols)]
    )
    cond = None
    for c in block_cols:
        eq = pa[f"a_{c}"] == pb[f"b_{c}"]
        cond = eq if cond is None else (cond & eq)
    cands = pa.join(pb, cond).crossJoin(F.broadcast(wrow))
    score = None
    n_agree = None
    for f in fields:
        agree = F.col(f"a_{f}") == F.col(f"b_{f}")
        term = F.when(agree, F.col(f"w_a_{f}")).otherwise(F.col(f"w_d_{f}"))
        ind = F.when(agree, F.lit(1)).otherwise(F.lit(0))
        score = term if score is None else (score + term)
        n_agree = ind if n_agree is None else (n_agree + ind)
    return cands.select(
        "a_id",
        "b_id",
        n_agree.cast("long").alias("n_agree"),
        score.cast("long").alias("score_x16"),
    )
