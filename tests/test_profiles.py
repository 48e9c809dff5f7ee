"""Multi-KB DatasetProfile tests.

Golden behavior mirrors the reference's per-KB branches:
- interface.py:141-143 — dbpedia drops Category: nodes only when filter_kb,
- interface.py:144-146 — wikidata drops statement/reference nodes always,
- ordering.py:152 — wikidata rewrites wdt:Pnnn -> wd:Pnnn before the
  domain/range constraint lookup,
- filtering.py dataset_type branch — F6 regex discard only for dbpedia.
"""

from pyspark.sql import functions as F

from chronographer_spark.operators.filtering import compute_discards
from chronographer_spark.operators.ordering import (
    annotate_superclass,
    build_pred_closure,
)
from chronographer_spark.profiles import DBPEDIA, PROFILES, WIKIDATA, YAGO, DatasetProfile

WDT = "http://www.wikidata.org/prop/direct/"
WD = "http://www.wikidata.org/entity/"


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )


def test_wikidata_scan_chain_drops_statement_and_reference_nodes(spark):
    rows = [
        # in-namespace fact, kept
        (WD + "Q1", WDT + "P361", WD + "Q2"),
        # statement node endpoint: dropped regardless of filter_kb
        (WD + "Q1", WDT + "P361", WD + "statement/Q1-abc"),
        ("http://www.wikidata.org/reference/xyz", WDT + "P361", WD + "Q2"),
        # predicate on the drop list (P910), dropped
        (WD + "Q1", WDT + "P910", WD + "Q3"),
        # out-of-namespace endpoint, dropped by F2
        (WD + "Q1", WDT + "P361", "http://dbpedia.org/resource/Thing"),
        # quoted literal: dropped by F2 exactly as the reference's
        # _filter_namespace drops '"'-prefixed nodes (interface.py:78-80)
        (WD + "Q4", WDT + "P585", '"1802-01-01"^^<http://www.w3.org/2001/XMLSchema#date>'),
    ]
    out = WIKIDATA.apply_scan_filters(_triples(spark, rows)).collect()
    got = {(r.subject, r.predicate, r.object) for r in out}
    assert got == {(WD + "Q1", WDT + "P361", WD + "Q2")}
    # with the namespace filter off, the literal survives and F4 normalizes
    # it to the ISO day slice
    lit = (
        WIKIDATA.apply_scan_filters(_triples(spark, rows), filter_kb=False)
        .filter(F.col("subject") == WD + "Q4")
        .collect()
    )
    assert [r.object for r in lit] == ["1802-01-01"]
    # statement/reference drops are NOT gated on filter_kb (interface.py:144-146)
    out_nofkb = WIKIDATA.apply_scan_filters(
        _triples(spark, rows), filter_kb=False
    ).collect()
    assert not any(
        "statement/" in r.subject + r.object or "/reference/" in r.subject + r.object
        for r in out_nofkb
    )


def test_dbpedia_category_drop_gated_on_filter_kb(spark):
    cat = "http://dbpedia.org/resource/Category:Battles"
    rows = [
        ("http://dbpedia.org/resource/Valmy", "http://example.org/p", cat),
        (
            "http://dbpedia.org/resource/Valmy",
            "http://example.org/p",
            "http://dbpedia.org/resource/Paris",
        ),
    ]
    with_kb = DBPEDIA.apply_scan_filters(_triples(spark, rows))
    assert with_kb.filter(F.col("object") == cat).count() == 0
    # filter_kb=False keeps category nodes but also skips the namespace
    # filter (interface.py:141-143)
    without = DBPEDIA.apply_scan_filters(_triples(spark, rows), filter_kb=False)
    assert without.filter(F.col("object") == cat).count() == 1


def test_yago_profile_keeps_schema_org_facts(spark):
    rows = [
        (
            "http://yago-knowledge.org/resource/X",
            "http://schema.org/birthPlace",
            "http://yago-knowledge.org/resource/Paris",
        ),
        # label predicate is on yago's drop list
        (
            "http://yago-knowledge.org/resource/X",
            "http://www.w3.org/2000/01/rdf-schema#label",
            '"X"@en',
        ),
    ]
    out = YAGO.apply_scan_filters(_triples(spark, rows)).collect()
    assert len(out) == 1 and out[0].predicate == "http://schema.org/birthPlace"


def test_wikidata_constraint_rewrite_in_superclass_lookup(spark):
    # Constraint tables key on the entity form wd:P361 (ordering.py:152);
    # the pending triple carries the direct form wdt:P361.
    pred_classes = spark.createDataFrame(
        [(WD + "P361", [WD + "Q1656682"])],
        "predicate string, classes array<string>",
    )
    superclasses = spark.createDataFrame(
        [(WD + "Q1656682", [WD + "Q26907166"])],
        "class string, ancestors array<string>",
    )
    closure = build_pred_closure(pred_classes, superclasses)
    pending = _triples(spark, [(WD + "Q362", WDT + "P361", WD + "Q2")])

    plain = annotate_superclass(pending, closure).collect()[0]
    assert plain.superclass == []  # no rewrite -> no match

    rewritten = annotate_superclass(
        pending, closure, pred_rewrite=WIKIDATA.constraint_pred_rewrite
    ).collect()[0]
    assert rewritten.superclass == [WD + "Q26907166"]
    # the emitted predicate column is untouched by the join-key rewrite
    assert rewritten.predicate == WDT + "P361"


def test_regex_year_discard_only_for_dbpedia(spark):
    # A 1066 URI outside the window is discarded under dbpedia's config but
    # not under wikidata's (filtering.py dataset_type branch).
    node = "http://dbpedia.org/resource/Battle_of_Hastings_1066"
    ingoing = _triples(spark, [(node, "http://example.org/p", "http://example.org/o")])
    outgoing = _triples(spark, [("http://example.org/s", "http://example.org/p", node)])
    type_date = _triples(spark, [])
    dates = ("1789-01-01", "1815-12-31")

    db = compute_discards(
        ingoing, outgoing, type_date, DBPEDIA.filtering_config(), dates
    )
    assert {r.node for r in db.collect()} == {node}

    wd = compute_discards(
        ingoing, outgoing, type_date, WIKIDATA.filtering_config(), dates
    )
    assert wd.count() == 0


def test_from_dict_mirrors_builtin_wikidata():
    cfg = {
        "config_type": "wikidata",
        "predicate_filter": list(WIKIDATA.predicate_filter),
        "rdf_type": WIKIDATA.rdf_type,
        "point_in_time": list(WIKIDATA.point_in_time),
        "start_dates": list(WIKIDATA.start_dates),
        "end_dates": list(WIKIDATA.end_dates),
        "places": list(WIKIDATA.places),
        "person": list(WIKIDATA.persons),
        "sub_class_of": list(WIKIDATA.sub_class_of),
        "owl_thing": WIKIDATA.owl_thing,
        "category": "",
        "start_uri": "http://www.wikidata",
        "start_stop_uri": list(WIKIDATA.drop_node_prefixes),
        "prefix_constraint_direct": WDT,
        "prefix_entity": WD,
        "domain": WIKIDATA.domain_pred,
        "range": WIKIDATA.range_pred,
    }
    assert DatasetProfile.from_dict(cfg) == WIKIDATA
    assert set(PROFILES) == {"dbpedia", "wikidata", "yago"}


def test_profile_temporal_predicates_feed_filtering_config():
    fc = WIKIDATA.filtering_config()
    assert fc.temporal == WIKIDATA.temporal_predicates
    assert WDT + "P585" in fc.point_in_time and WDT + "P570" in fc.end_dates


def test_graphsearch_with_wikidata_profile_ranks_priority_one(spark, tmp_path):
    """End-to-end C6: on a wikidata-shaped KG the constraint tables key on
    the ENTITY form (wd:P361) while triples carry the direct form
    (wdt:P361). With profile=WIKIDATA the driver's superclass annotation
    matches through the rewrite, so target-type-relevant paths enter the
    occurrence table at priority 1 (the reference's priority-class
    restriction); without a profile nothing matches and every path sits at
    priority 3."""
    from chronographer_spark.operators.filtering import FilteringConfig
    from chronographer_spark.search.driver import GraphSearch, SearchConfig

    kg = spark.createDataFrame(
        [
            (WD + "QStorming", WDT + "P361", WD + "QFrenchRev"),
            (WD + "QBattle", WDT + "P361", WD + "QFrenchRev"),
            (WD + "QFrenchRev", WDT + "P276", WD + "QParis"),
            (WD + "QStorming", WDT + "P31", WD + "QConflict"),
            (WD + "QStorming", WDT + "P585", "1789-07-14"),
            (WD + "QBattle", WDT + "P31", WD + "QConflict"),
            (WD + "QBattle", WDT + "P585", "1792-09-20"),
            (WD + "QParis", WDT + "P31", WD + "QCity"),
        ],
        ["subject", "predicate", "object"],
    )
    # constraint tables in ENTITY form, as Wikidata publishes them
    pred_domain = spark.createDataFrame(
        [(WD + "P361", [WD + "QConflict"])],
        "predicate string, classes array<string>",
    )
    superclasses = spark.createDataFrame(
        [(WD + "QConflict", [WD + "QEvent"])],
        "class string, ancestors array<string>",
    )
    cfg = SearchConfig(
        start=WD + "QFrenchRev",
        iterations=1,
        target_types=[WD + "QEvent"],
        type_ranking="entropy_pred_object_freq",
        dates=("1789-01-01", "1800-12-31"),
        max_uri=100,
        rdf_type_pred=WIKIDATA.rdf_type,
    )
    filt = WIKIDATA.filtering_config()

    def chosen_priority(profile):
        gs = GraphSearch(
            spark, kg, cfg, filt,
            pred_domain=pred_domain, superclasses=superclasses,
            checkpoint_dir=str(tmp_path), run_id=f"wd-{profile is not None}",
            profile=profile,
        )
        gs.run()
        assert gs.to_expand is not None
        return gs.to_expand["priority"]

    # the ranker restricts to the best priority class first: with the
    # rewrite the P361 path is annotated relevant (priority 1) and wins;
    # without it nothing matches the wd:-keyed table, all paths are 3
    assert chosen_priority(WIKIDATA) == 1
    assert chosen_priority(None) == 3
