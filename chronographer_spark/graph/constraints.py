"""Predicate domain/range constraint extraction — the reference's
pre-search pass (src/extract_domain_range.py) re-expressed as declarative
joins over a triple DataFrame instead of per-predicate HDT requests.

Reference behavior mirrored:
- dbpedia/yago/coda path (extract_domain_range.py:92-101 get_pred): scan
  triples whose predicate is the profile's domain/range predicate; the
  pred -> values dict becomes distinct (predicate, kind, value) rows.
- YAGO union templates (extract_domain_range.py:63-90 pre_process_yago):
  blank-node objects `_:schema-...-owl-unionOf-a-b-xsd-c` expand to one
  row per constraint with the short prefix rewritten
  (schema -> http://schema.org/, xsd -> XMLSchema#).
- wikidata path (extract_domain_range.py:103-134 get_type_wikidata): the
  2-hop walk pred -[P2302 direct, object = domain/range Q-id]-> pred
  -[P2302 prop]-> statement -[P2308 qualifier]-> class type. The
  reference loops per predicate and per statement (one HDT request
  each); here both hops are hash joins, so the walk is two shuffles at
  any KB size and hub predicates (thousands of statements) ride AQE.

The reference materializes these as JSON dicts keyed by predicate
(__call__, extract_domain_range.py:155-175); distinct rows are the
relational, mergeable form — `ordering.annotate_superclasses` consumes
them as a lookup join either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHORT_PREFIX = {
    "schema": "http://schema.org/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def extract_domain_range(
    triples: DataFrame,
    domain_pred: str,
    range_pred: str,
    expand_yago_unions: bool = False,
) -> DataFrame:
    """Direct declared constraints: (predicate, kind in ('domain','range'),
    value). One predicate-pushdown scan per kind, unioned; with
    ``expand_yago_unions`` the YAGO blank-node union template explodes to
    one row per member (reference pre_process_yago semantics)."""
    base = triples.filter(
        F.col("predicate").isin([domain_pred, range_pred])
    ).select(
        F.col("subject").alias("pred"),
        F.when(F.col("predicate") == domain_pred, F.lit("domain"))
        .otherwise(F.lit("range"))
        .alias("kind"),
        F.col("object").alias("value"),
    )
    if not expand_yago_unions:
        return base.dropDuplicates()
    parts = F.split(
        F.element_at(F.split(F.col("value"), F.lit("owl-unionOf-")), 2), "-"
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.floor(F.size(parts) / 2).cast("int") - 1),
        lambda i: F.concat(
            # short prefix -> full URI; unknown prefixes kept verbatim
            F.coalesce(
                F.element_at(
                    F.create_map(
                        *[
                            F.lit(x)
                            for kv in _SHORT_PREFIX.items()
                            for x in kv
                        ]
                    ),
                    F.element_at(parts, i * 2 + 1),
                ),
                F.element_at(parts, i * 2 + 1),
            ),
            F.element_at(parts, i * 2 + 2),
        ),
    )
    expanded = base.select(
        "pred",
        "kind",
        F.explode(
            F.when(F.col("value").startswith("_:"), pairs).otherwise(
                F.array(F.col("value"))
            )
        ).alias("value"),
    )
    return expanded.dropDuplicates()


def extract_constraint_classes(
    triples: DataFrame,
    constraint_kind_obj: str,
    constraint_direct: str,
    constraint_prop: str,
    class_qualifier: str,
) -> DataFrame:
    """Wikidata 2-hop constraint walk: predicates carrying a P2302 direct
    constraint whose object is ``constraint_kind_obj`` (the domain or
    range Q-id), joined to their P2302 statement nodes, joined to the
    statements' P2308 class qualifiers. Returns distinct
    (pred, class_type) — the reference's pred_to_class dict as rows."""
    flagged = (
        triples.filter(
            (F.col("predicate") == constraint_direct)
            & (F.col("object") == constraint_kind_obj)
        )
        .select(F.col("subject").alias("pred"))
        .dropDuplicates()
    )
    statements = triples.filter(F.col("predicate") == constraint_prop).select(
        F.col("subject").alias("pred"), F.col("object").alias("statement")
    )
    classes = triples.filter(F.col("predicate") == class_qualifier).select(
        F.col("subject").alias("statement"), F.col("object").alias("class_type")
    )
    return (
        flagged.join(statements, "pred")
        .join(classes, "statement")
        .select("pred", "class_type")
        .dropDuplicates()
    )


def induce_subclass_candidates(
    typed: DataFrame,
    min_support: int = 5,
    min_containment_x1e6: int = 900000,
) -> DataFrame:
    """Subclass-of induction from instance data (ontology learning over
    the built KG — Völker & Niepert 2011 statistical schema induction):
    propose `sub rdfs:subClassOf sup` whenever sup's extension nearly
    contains sub's: |ext(sub) ∩ ext(sup)| / |ext(sub)| >= threshold, as an
    exact integer quotient. The inductive complement of the DECLARED
    domain/range extraction above (the reference only reads declared
    schema, src/extract_domain_range.py; at transcript scale the schema
    must be induced because none is declared).

    typed: (instance, type) pairs; duplicates are collapsed first, so
    multiplicity never inflates containment.

    Plan shape: one instance-keyed self-join builds co-typed pairs
    (fan-out bounded by types-per-instance squared — type assertions per
    instance are bounded in any real KG); the pair count and the
    per-type extension count are both map-side-combinable aggs; the
    extension-size table is dimension-sized (one row per TYPE) and
    broadcast back onto the pairs. `mutual` marks candidate equivalences
    (both directions pass) via a self-join on the candidate table itself
    — also dimension-sized.

    Returns (sub, sup, n_sub, n_both, containment_x1e6, mutual).
    """
    t = typed.select(
        F.col("instance").alias("i"), F.col("type").alias("ty")
    ).dropDuplicates(["i", "ty"])
    ext = t.groupBy("ty").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        t.join(t.select(F.col("i"), F.col("ty").alias("ty2")), "i")
        .filter(F.col("ty") != F.col("ty2"))
        .groupBy("ty", "ty2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    cand = (
        pairs.join(
            F.broadcast(ext.select(F.col("ty"), F.col("n").alias("n_sub"))), "ty"
        )
        .select(
            F.col("ty").alias("sub"),
            F.col("ty2").alias("sup"),
            "n_sub",
            "n_both",
            F.expr("n_both * 1000000 DIV n_sub").alias("containment_x1e6"),
        )
        .filter(
            (F.col("n_sub") >= min_support)
            & (F.col("containment_x1e6") >= min_containment_x1e6)
        )
    )
    rev = cand.select(
        F.col("sub").alias("sup"), F.col("sup").alias("sub"), F.lit(1).alias("m")
    )
    return cand.join(F.broadcast(rev), ["sub", "sup"], "left").select(
        "sub",
        "sup",
        "n_sub",
        "n_both",
        "containment_x1e6",
        F.col("m").isNotNull().cast("long").alias("mutual"),
    )


def induce_disjointness_candidates(
    typed: DataFrame,
    min_support: int = 5,
    max_overlap_x1e6: int = 0,
) -> DataFrame:
    """owl:disjointWith induction — the negative complement of
    induce_subclass_candidates: propose (a, b) disjoint when both
    extensions meet the support floor and their overlap ratio
    |ext(a) ∩ ext(b)| * 10^6 DIV min(|ext(a)|, |ext(b)|) is at most
    max_overlap_x1e6 (0 = strictly never co-typed). Disjointness axioms
    are what make downstream ER/fusion able to REJECT merges, so mining
    them matters as much as mining subsumptions.

    Plan shape: the per-type extension table has one row per TYPE — two
    broadcast-sized inputs cross-joined (types² pairs, a dimension-scale
    product by construction), left-joined against the same co-typed pair
    counts the subclass induction uses; no corpus-scale shuffle beyond
    the two aggs.

    Returns (type_a, type_b, n_a, n_b, n_both, overlap_x1e6) with
    type_a < type_b (each unordered pair once).
    """
    t = typed.select(
        F.col("instance").alias("i"), F.col("type").alias("ty")
    ).dropDuplicates(["i", "ty"])
    ext = t.groupBy("ty").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        t.join(t.select(F.col("i"), F.col("ty").alias("ty2")), "i")
        .filter(F.col("ty") < F.col("ty2"))
        .groupBy("ty", "ty2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    a = ext.select(F.col("ty").alias("type_a"), F.col("n").alias("n_a"))
    b = ext.select(F.col("ty").alias("type_b"), F.col("n").alias("n_b"))
    grid = (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .filter((F.col("n_a") >= min_support) & (F.col("n_b") >= min_support))
    )
    return (
        grid.join(
            pairs.select(
                F.col("ty").alias("type_a"),
                F.col("ty2").alias("type_b"),
                "n_both",
            ),
            ["type_a", "type_b"],
            "left",
        )
        .withColumn("n_both", F.coalesce("n_both", F.lit(0)))
        .withColumn(
            "overlap_x1e6",
            F.expr("n_both * 1000000 DIV least(n_a, n_b)"),
        )
        .filter(F.col("overlap_x1e6") <= max_overlap_x1e6)
        .select("type_a", "type_b", "n_a", "n_b", "n_both", "overlap_x1e6")
    )


def discover_unary_inds(attrs) -> DataFrame:
    """Unary inclusion-dependency discovery (Binder/SPIDER family): for
    every ordered pair of candidate attributes, measure value containment
    dep ⊆ ref — the foreign-key discovery pass that tells a
    KG-construction pipeline which columns are join-able into edges
    (complements induce_fd_candidates: FDs find keys, INDs find the
    references between them; the reference hardcodes its join graph).

    ``attrs`` is a list of (attr_name, DataFrame, col_name). Returns one
    row per ordered pair with shared values: dep, ref, n_dep (distinct
    non-null dep values), n_common (of those, how many also occur in
    ref), holds (1 iff n_common == n_dep), containment_x1e6 =
    n_common · 10^6 DIV n_dep (exact integer).

    Scale shape: per-attribute single-column projections union into one
    (attr, value) stream; ONE groupBy(value) with collect_set(attr)
    collapses duplicates and yields each value's attribute set (hot
    values are ordinary agg skew; the set is bounded by |attrs|, which
    is small by construction). The pair fan-out explodes that set twice
    — O(|attrs|²) per value, never per row — and keeps self-pairs so the
    per-attribute distinct totals fall out of the SAME aggregate
    (cnt(a,a)): the big value table is consumed exactly once. The
    resulting ≤|attrs|² pair-count rows feed two consumers (totals +
    cross pairs), so THEY are eager-localCheckpointed — the scan never
    re-executes. Values are cast to string so heterogeneous columns
    share one schema.
    """
    parts = [
        df.where(F.col(col).isNotNull()).select(
            F.lit(name).alias("attr"),
            F.col(col).cast("string").alias("value"),
        )
        for name, df, col in attrs
    ]
    raw = parts[0]
    for p in parts[1:]:
        raw = raw.unionByName(p)
    by_val = raw.groupBy("value").agg(F.collect_set("attr").alias("attrs"))
    pair_counts = (
        by_val.select(F.explode("attrs").alias("dep"), "attrs")
        .select("dep", F.explode("attrs").alias("ref"))
        .groupBy("dep", "ref")
        .agg(F.count(F.lit(1)).alias("n_common"))
        # two consumers below (totals + cross pairs): materialize the
        # ≤|attrs|² rows once so the scan+agg subtree never re-executes
        .localCheckpoint(eager=True)
    )
    totals = pair_counts.where(F.col("dep") == F.col("ref")).select(
        F.col("dep").alias("t_attr"), F.col("n_common").alias("n_dep")
    )
    return (
        pair_counts.where(F.col("dep") != F.col("ref"))
        .join(totals, F.col("dep") == F.col("t_attr"))
        .select(
            "dep",
            "ref",
            "n_dep",
            "n_common",
            F.when(F.col("n_common") == F.col("n_dep"), 1)
            .otherwise(0)
            .cast("int")
            .alias("holds"),
            F.expr("CAST(n_common * 1000000 DIV n_dep AS BIGINT)").alias(
                "containment_x1e6"
            ),
        )
    )


def induce_fd_candidates(df: DataFrame, fds) -> DataFrame:
    """Approximate functional-dependency profiling: for each candidate FD
    det -> dep in ``fds`` (a list of (fd_name, det_col, dep_col)), measure
    how far the data is from satisfying it — the schema-discovery pass a
    KG-construction pipeline runs to decide which column pairs are
    key-like enough to become graph constraints (TANE/ Kivinen-Mannila's
    g3: the minimum fraction of rows to delete so the FD holds exactly;
    the reference hardcodes its schema, so this is induction the same way
    induce_subclass_candidates is).

    Returns one row per candidate: fd, total (rows), n_groups (distinct
    determinant values), viol_groups (determinants seeing >1 dependent),
    g3_x1e6 = (total - Σ per-group max value count) · 10^6 DIV total —
    exact integer, 0 iff the FD holds.

    Scale shape: one explode fans each row into |fds| (fd, det, dep)
    structs — map-only, no N-branch UNION over the scan (the shared-
    subtree re-execution trap) — then two map-side-combinable aggregates:
    (fd, det, dep) value counts, then per-(fd, det) group stats, then a
    |fds|-row final agg. Hot determinant values are ordinary groupBy skew
    (AQE splits); nothing is collected driver-side. Columns are cast to
    string so heterogeneous candidate pairs share one exploded schema.
    """
    structs = [
        F.struct(
            F.lit(name).alias("fd"),
            F.col(det).cast("string").alias("det"),
            F.col(dep).cast("string").alias("dep"),
        )
        for name, det, dep in fds
    ]
    pairs = df.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    vc = pairs.groupBy("fd", "det", "dep").agg(F.count(F.lit(1)).alias("cnt"))
    per_det = vc.groupBy("fd", "det").agg(
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("keep"),
        F.count(F.lit(1)).alias("n_vals"),
    )
    return per_det.groupBy("fd").agg(
        F.sum("n_rows").alias("total"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n_vals") > 1, 1).otherwise(0))
        .cast("long")
        .alias("viol_groups"),
        F.expr(
            "CAST((sum(n_rows) - sum(keep)) * 1000000 DIV sum(n_rows) AS BIGINT)"
        ).alias("g3_x1e6"),
    )


def gk_lambda(df: DataFrame, pairs) -> DataFrame:
    """Goodman-Kruskal lambda association profile: for each candidate pair
    (name, x_col, y_col) in ``pairs``, the proportional reduction in error
    when predicting y from x — λ = (Σ_x max_y O_xy − max_y c_y) /
    (N − max_y c_y). The error-reduction complement to g3 FD profiling
    (induce_fd_candidates): g3 asks "how many rows break determinism",
    λ asks "how much better than the majority-class guess does knowing x
    make you" — the measure that stays informative when no FD is close to
    holding. PURE integers (counts and one exact quotient): unlike χ²/
    Cramér's V (squared float expectations) or Theil's U (logs), λ needs
    no float discipline at all, which is why it is the association measure
    this engine profiles.

    Returns one row per candidate: assoc (name), total, n_x (distinct x),
    s_max (Σ per-x majority), maxcol (global y majority),
    lambda_x1e6 = (s_max − maxcol)·1e6 DIV (total − maxcol); a constant y
    column (total == maxcol, λ undefined) reads 0 by convention.

    Scale shape: one explode fans each row into |pairs| structs over a
    SINGLE scan (the fd-profile pattern — never an N-branch UNION); the
    (assoc, x, y) cell table is eagerly checkpointed (it feeds both the
    per-x majority rollup and the y-marginal rollup); everything after is
    dimension-scale and the final join is |pairs| rows broadcast.
    """
    structs = [
        F.struct(
            F.lit(name).alias("assoc"),
            F.col(x).cast("string").alias("x"),
            F.col(y).cast("string").alias("y"),
        )
        for name, x, y in pairs
    ]
    p = df.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    vc = (
        p.groupBy("assoc", "x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    per_x = vc.groupBy("assoc", "x").agg(
        F.max("cnt").alias("keep"), F.sum("cnt").alias("n_rows")
    )
    top = per_x.groupBy("assoc").agg(
        F.sum("n_rows").alias("total"),
        F.count(F.lit(1)).alias("n_x"),
        F.sum("keep").alias("s_max"),
    )
    col_max = (
        vc.groupBy("assoc", "y")
        .agg(F.sum("cnt").alias("c"))
        .groupBy("assoc")
        .agg(F.max("c").alias("maxcol"))
    )
    return (
        top.join(F.broadcast(col_max), "assoc")
        .select(
            "assoc",
            F.col("total").cast("long").alias("total"),
            F.col("n_x").cast("long").alias("n_x"),
            F.col("s_max").cast("long").alias("s_max"),
            F.col("maxcol").cast("long").alias("maxcol"),
            F.when(F.col("total") == F.col("maxcol"), F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(s_max - maxcol) * 1000000 DIV (total - maxcol)"
                ).cast("long")
            )
            .alias("lambda_x1e6"),
        )
    )


def induce_domain_range(
    triples: DataFrame,
    types: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    node_col: str = "node",
    type_col: str = "type",
) -> DataFrame:
    """rdfs:domain / rdfs:range induction per predicate: the most common
    subject type and object type with exact support quotients — the
    schema-induction pass that completes the constraints family
    (subclass containment, disjointness overlap, FD/λ column association)
    on the TRIPLE level: transcript-scale KGs declare no schema, so
    domain/range must be mined before validation rules can fire
    (the reference hardcodes its FRED/SEM signatures; this induces them).

    Multi-typed nodes contribute one observation per type (standard
    extensional counting); share_x1e6 = top-type observations ·1e6 DIV
    typed observations on that side, the usual exact quotient. Tie pin:
    max (count, type) struct — largest count then largest type string,
    replayed by the oracle's (cnt DESC, type DESC) rank.

    Scale shape: two triples→types hash joins (the type table is
    entity-count-scale; broadcast when dimensional), per-(p, side, type)
    combinable counts, max_by arg-max on the collapsed table, one |p|-row
    join to stitch sides. Untyped subjects/objects fall out of their
    side's quotient (absent, not zero-weighted).

    Returns (p, n_triples, domain_type, domain_share_x1e6, range_type,
    range_share_x1e6); a predicate whose side has NO typed nodes reads
    NULL type and 0 share on that side.
    """
    t = types.select(
        F.col(node_col).alias("__n"), F.col(type_col).alias("__t")
    ).distinct()
    base = triples.select(
        F.col(s_col).alias("__s"), F.col(p_col).alias("__p"), F.col(o_col).alias("__o")
    )
    n_tr = base.groupBy("__p").agg(F.count(F.lit(1)).alias("n_triples"))

    def side(col: str, prefix: str) -> DataFrame:
        typed = (
            base.join(t, base[col] == t["__n"])
            .groupBy("__p", "__t")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return typed.groupBy("__p").agg(
            F.sum("cnt").alias(f"{prefix}_typed"),
            F.max_by(F.col("__t"), F.struct("cnt", "__t")).alias(f"{prefix}_type"),
            F.max(F.struct("cnt", "__t"))["cnt"].alias(f"{prefix}_cnt"),
        )
    dom = side("__s", "domain")
    rng = side("__o", "range")
    return (
        n_tr.join(dom, "__p", "left")
        .join(rng, "__p", "left")
        .select(
            F.col("__p").alias("p"),
            F.col("n_triples").cast("long").alias("n_triples"),
            F.col("domain_type").alias("domain_type"),
            F.coalesce(
                F.expr("domain_cnt * 1000000 DIV domain_typed"), F.lit(0)
            ).cast("long").alias("domain_share_x1e6"),
            F.col("range_type").alias("range_type"),
            F.coalesce(
                F.expr("range_cnt * 1000000 DIV range_typed"), F.lit(0)
            ).cast("long").alias("range_share_x1e6"),
        )
    )


def validate_constraints(
    triples: DataFrame,
    types: DataFrame,
    rules,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    node_col: str = "node",
    type_col: str = "type",
) -> DataFrame:
    """SHACL-lite constraint validation — the enforcement half of the
    constraints family (induce_* mines domain/range, subclass,
    disjointness, FD; this VALIDATES a declared rule set and counts the
    violators, the pass a KG pipeline runs per build to catch extraction
    regressions).

    ``rules``: tuples (rule_name, kind, a, b) with kinds
      - ("r", "domain",   p, T): every subject of p must carry type T
      - ("r", "range",    p, T): every object of p must carry type T
      - ("r", "max_card", p, k): at most k objects per subject for p
      - ("r", "disjoint", T1, T2): no node carries both types

    Returns one row per rule: (rule, kind, n_checked, n_violations,
    viol_x1e6 — exact quotient, 0 when nothing checked — and
    example_node, the MINIMUM violating subject/node, pinned so the gate
    hashes deterministically; NULL when clean).

    Scale shape: each kind is one pass — domain/range join triples against
    the BROADCAST rule table on p then left-anti-check type membership
    with ONE (node, type) join; max_card is a (p, s) combinable count
    against broadcast caps; disjoint is a type-filtered self-join on node.
    Per-rule rollups are rule-count-scale; the final union is rows of
    results, never re-executed corpus branches.
    """
    if not rules:
        raise ValueError("validate_constraints: rules must be non-empty")
    spark = triples.sparkSession
    base = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    t = types.select(
        F.col(node_col).alias("node"), F.col(type_col).alias("type")
    ).distinct()
    out = []

    def _typed_check(side: str, kind: str) -> DataFrame:
        kr = [(name, p, a) for name, k, p, a in rules if k == kind]
        if not kr:
            return None
        rt = spark.createDataFrame(kr, "rule string, p string, req string")
        checked = base.join(F.broadcast(rt), "p").select(
            "rule", F.col(side).alias("nd"), "req"
        )
        ok = t.select(F.col("node").alias("nd"), F.col("type").alias("req"))
        flagged = checked.join(ok, ["nd", "req"], "left_semi").select(
            "rule", "nd"
        ).withColumn("__v", F.lit(0)).unionAll(
            checked.join(ok, ["nd", "req"], "left_anti").select(
                "rule", "nd"
            ).withColumn("__v", F.lit(1))
        )
        return flagged.groupBy("rule").agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum("__v").alias("n_violations"),
            F.min(F.when(F.col("__v") == 1, F.col("nd"))).alias("example_node"),
        ).withColumn("kind", F.lit(kind))

    dom = _typed_check("s", "domain")
    rng = _typed_check("o", "range")
    if dom is not None:
        out.append(dom)
    if rng is not None:
        out.append(rng)

    card = [(name, p, int(a)) for name, k, p, a in rules if k == "max_card"]
    if card:
        rt = spark.createDataFrame(card, "rule string, p string, cap int")
        per_s = (
            base.join(F.broadcast(rt), "p")
            .groupBy("rule", "cap", "s")
            .agg(F.countDistinct("o").alias("__n"))
        )
        out.append(
            per_s.groupBy("rule").agg(
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(F.when(F.col("__n") > F.col("cap"), 1).otherwise(0))
                .alias("n_violations"),
                F.min(F.when(F.col("__n") > F.col("cap"), F.col("s")))
                .alias("example_node"),
            ).withColumn("kind", F.lit("max_card"))
        )

    dis = [(name, a, b) for name, k, a, b in rules if k == "disjoint"]
    if dis:
        rt = spark.createDataFrame(dis, "rule string, t1 string, t2 string")
        either = (
            t.join(
                F.broadcast(
                    rt.select("rule", F.col("t1").alias("type"))
                    .unionAll(rt.select("rule", F.col("t2").alias("type")))
                ),
                "type",
            )
            .groupBy("rule", "node")
            .agg(F.countDistinct("type").alias("__k"))
        )
        out.append(
            either.groupBy("rule").agg(
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(F.when(F.col("__k") > 1, 1).otherwise(0))
                .alias("n_violations"),
                F.min(F.when(F.col("__k") > 1, F.col("node")))
                .alias("example_node"),
            ).withColumn("kind", F.lit("disjoint"))
        )

    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.select(
        "rule",
        "kind",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.when(F.col("n_checked") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("n_violations * 1000000 DIV n_checked").cast("long"))
        .alias("viol_x1e6"),
        "example_node",
    )


def discover_uccs(df: DataFrame, combos) -> DataFrame:
    """Unique-column-combination discovery (Heise/Papenbrock DUCC/HyUCC
    family): for each candidate combination in ``combos`` (a list of
    (name, [col, ...])), decide whether it is a KEY of the table — the
    third leg of the profiling suite beside FD (induce_fd_candidates) and
    IND (discover_unary_inds): FDs say which columns determine others,
    INDs say which columns reference others, UCCs say which column sets
    identify rows. A KG pipeline runs this to pick entity keys before
    canonicalization and merge_upsert.

    Returns one row per candidate: combo, n_rows, n_distinct, max_group
    (largest duplicate class; 1 iff unique), is_unique, and
    is_minimal_unique — unique with NO unique proper single-column subset
    among the candidates (the DUCC minimality pruning, evaluated on the
    tiny combo-level result by a broadcast join against the singleton
    verdicts, never on row data).

    Scale shape: one explode fans each row into |combos| (combo, rendered
    value) structs — map-only, no N-branch UNION over the scan — then a
    (combo, value)-keyed count and a |combos|-row rollup. NULLs render as
    'NULL' inside the canonical '|'-joined rendering (the
    partition_checksums convention, io/catalog.py:441): SQL NULL
    semantics would make NULL != NULL and declare a column of NULLs
    unique, which is not what a key check wants.
    """
    structs = [
        F.struct(
            F.lit(name).alias("combo"),
            F.concat_ws(
                "|",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
                    for c in cols
                ],
            ).alias("val"),
        )
        for name, cols in combos
    ]
    vals = df.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    vc = vals.groupBy("combo", "val").agg(F.count(F.lit(1)).alias("cnt"))
    per = vc.groupBy("combo").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("cnt").cast("long").alias("max_group"),
    ).withColumn(
        "is_unique",
        F.when(F.col("n_distinct") == F.col("n_rows"), 1).otherwise(0).cast("long"),
    ).localCheckpoint(eager=True)  # singleton verdicts + main path share it

    single_names = {name: cols[0] for name, cols in combos if len(cols) == 1}
    col_unique = per.filter(
        F.col("combo").isin(*single_names) if single_names else F.lit(False)
    ).select(
        F.col("combo").alias("_sc"), F.col("is_unique").alias("_su")
    )
    # map each combo to the candidate singleton NAMES covering its columns
    sub_rows = [
        (name, sname)
        for name, cols in combos
        for sname, scol in single_names.items()
        if scol in cols and name != sname
    ]
    if sub_rows:
        subs = df.sparkSession.createDataFrame(sub_rows, "combo string, _sc string")
        dominated = (
            subs.join(F.broadcast(col_unique), "_sc")
            .filter(F.col("_su") == 1)
            .select("combo")
            .distinct()
            .withColumn("_dom", F.lit(1))
        )
        per = per.join(F.broadcast(dominated), "combo", "left")
    else:
        per = per.withColumn("_dom", F.lit(None).cast("int"))
    return per.select(
        "combo",
        "n_rows",
        "n_distinct",
        "max_group",
        "is_unique",
        F.when(
            (F.col("is_unique") == 1) & F.col("_dom").isNull(), 1
        ).otherwise(0).cast("long").alias("is_minimal_unique"),
    )
