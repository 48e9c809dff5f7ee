"""Multi-KB dataset profiles.

The reference parameterizes every KB-specific constant — predicate drop
lists, the rdf:type predicate, temporal predicates, place/person classes,
namespace roots, per-KB node-drop prefixes, and the Wikidata
constraint-prefix rewrite — through per-dataset YAML configs
(reference: dataset-config/dbpedia.yaml:1-46, wikidata.yaml:1-44,
yago.yaml:1-37) consumed by the interface and ordering layers
(reference: src/interface.py:36-43,141-146; src/ordering.py:43-46,152-160).

This module is the Spark-side equivalent: a frozen :class:`DatasetProfile`
carrying those constants, three built-in profiles mirroring the reference's
YAMLs line-for-line, and helpers that thread the profile into the existing
operators:

- :meth:`DatasetProfile.filtering_config` -> `FilteringConfig` for the
  narrative-dimension discard filters (F5-F7),
- :meth:`DatasetProfile.apply_scan_filters` -> the per-KB post-scan chain
  (F1-F4 plus the KB-specific node drops of interface.py:141-146:
  DBpedia drops `Category:`-prefixed nodes, Wikidata drops
  statement/reference nodes, YAGO drops nothing extra),
- :meth:`DatasetProfile.constraint_pred_rewrite` -> the C6 prefix rewrite
  (ordering.py:152: Wikidata domain/range constraints key on the *entity*
  form `wd:Pnnn` while triples carry the *direct-property* form `wdt:Pnnn`;
  the rewrite maps one onto the other before the closure join).

Everything stays declarative: the profile only chooses which native column
expressions are built, so Catalyst still pushes the predicate parts into the
scan regardless of KB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .operators.filtering import FilteringConfig
from .operators.scan_filters import (
    filter_namespace,
    filter_node_affixes,
    filter_predicates,
    normalize_literals,
)


@dataclass(frozen=True)
class DatasetProfile:
    """One KB's worth of configuration (dataset-config/*.yaml)."""

    name: str
    predicate_filter: tuple[str, ...]
    rdf_type: str
    point_in_time: tuple[str, ...]
    start_dates: tuple[str, ...]
    end_dates: tuple[str, ...]
    places: tuple[str, ...]
    persons: tuple[str, ...]
    sub_class_of: tuple[str, ...]
    owl_thing: str
    start_uri: str
    # KB-specific node-drop prefixes (interface.py:141-146): dbpedia's
    # Category: namespace, wikidata's statement/reference subtrees.
    drop_node_prefixes: tuple[str, ...] = ()
    # C6 rewrite pair (ordering.py:43-46); None/None disables the rewrite.
    prefix_constraint_direct: str | None = None
    prefix_entity: str | None = None
    # Whether F6 (URI-year regex discard) applies: the reference only runs
    # it for dbpedia-shaped URIs (filtering.py dataset_type branch).
    regex_year_filter: bool = True
    domain_pred: str = "http://www.w3.org/2000/01/rdf-schema#domain"
    range_pred: str = "http://www.w3.org/2000/01/rdf-schema#range"

    # -- construction -------------------------------------------------------

    @classmethod
    def from_dict(cls, cfg: dict) -> "DatasetProfile":
        """Build a profile from a parsed dataset-config mapping (the same
        key names as the reference's YAML files)."""
        name = cfg["config_type"]
        return cls(
            name=name,
            predicate_filter=tuple(cfg.get("predicate_filter", ())),
            rdf_type=cfg["rdf_type"],
            point_in_time=tuple(cfg.get("point_in_time", ())),
            start_dates=tuple(cfg.get("start_dates", ())),
            end_dates=tuple(cfg.get("end_dates", ())),
            places=tuple(cfg.get("places", ())),
            persons=tuple(cfg.get("person", ())),
            sub_class_of=tuple(cfg.get("sub_class_of", ())),
            owl_thing=cfg.get("owl_thing", ""),
            start_uri=cfg.get("start_uri", ""),
            drop_node_prefixes=tuple(
                ([cfg["category"]] if cfg.get("category") else [])
                + list(cfg.get("start_stop_uri", ()))
            ),
            prefix_constraint_direct=cfg.get("prefix_constraint_direct"),
            prefix_entity=cfg.get("prefix_entity"),
            regex_year_filter=name in ("dbpedia", "generic"),
            domain_pred=cfg.get(
                "domain", "http://www.w3.org/2000/01/rdf-schema#domain"
            ),
            range_pred=cfg.get(
                "range", "http://www.w3.org/2000/01/rdf-schema#range"
            ),
        )

    # -- threading into operators ------------------------------------------

    def filtering_config(
        self, where: bool = True, when: bool = True, who: bool = True
    ) -> FilteringConfig:
        """Narrative-dimension filter config (F5-F7) for this KB."""
        return FilteringConfig(
            where=where,
            when=when,
            who=who,
            point_in_time=list(self.point_in_time),
            start_dates=list(self.start_dates),
            end_dates=list(self.end_dates),
            places=list(self.places),
            people=list(self.persons),
            # compute_discards applies F6 only for ("dbpedia", "generic");
            # wikidata/yago names fall outside that set, matching
            # regex_year_filter.
            dataset_type=self.name,
        )

    def apply_scan_filters(
        self, triples: DataFrame, filter_kb: bool = True
    ) -> DataFrame:
        """The per-KB post-scan chain (interface.py:44-117,141-146):

        1. drop `predicate_filter` predicates (F1),
        2. keep only in-namespace/`start_uri` endpoints (F2) when
           `filter_kb`,
        3. drop KB-specific node prefixes (F3) — Category: for dbpedia
           (only under `filter_kb`, interface.py:141-143), statement/
           reference for wikidata (always, interface.py:144-146),
        4. normalize literals (F4).
        """
        out = filter_predicates(triples, list(self.predicate_filter), keep=False)
        if filter_kb and self.start_uri:
            out = filter_namespace(out, self.start_uri)
        drops = [
            p
            for p in self.drop_node_prefixes
            # dbpedia's category drop is gated on filter_kb; wikidata's
            # statement/reference drop is unconditional (interface.py:141-146)
            if filter_kb or self.name == "wikidata"
        ]
        if drops:
            out = filter_node_affixes(out, drop_prefixes=drops)
        return normalize_literals(out)

    def constraint_pred_rewrite(self, pred: Column) -> Column:
        """C6 — rewrite a direct-property URI to its entity form before the
        domain/range constraint lookup (ordering.py:152). Identity when the
        profile declares no rewrite pair (dbpedia, yago)."""
        if self.prefix_constraint_direct and self.prefix_entity:
            return F.replace(
                pred,
                F.lit(self.prefix_constraint_direct),
                F.lit(self.prefix_entity),
            )
        return pred

    @property
    def temporal_predicates(self) -> list[str]:
        return list(self.point_in_time + self.start_dates + self.end_dates)


# ---------------------------------------------------------------------------
# Built-in profiles — constants mirror the reference's YAMLs verbatim.
# ---------------------------------------------------------------------------

_DBO = "http://dbpedia.org/ontology/"
_DBP = "http://dbpedia.org/property/"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"
_FOAF = "http://xmlns.com/foaf/0.1/"

#: reference: dataset-config/dbpedia.yaml:1-46
DBPEDIA = DatasetProfile(
    name="dbpedia",
    predicate_filter=(
        _DBO + "wikiPageWikiLink",
        _DBO + "wikiPageRedirects",
        _DBO + "wikiPageDisambiguates",
        _RDFS + "seeAlso",
        _FOAF + "depiction",
        _FOAF + "isPrimaryTopicOf",
        _DBO + "thumbnail",
        _DBO + "wikiPageExternalLink",
        _DBO + "wikiPageID",
        _DBO + "wikiPageLength",
        _DBO + "wikiPageRevisionID",
        _DBP + "wikiPageUsesTemplate",
        "http://www.w3.org/2002/07/owl#sameAs",
        "http://www.w3.org/ns/prov#wasDerivedFrom",
        _DBO + "wikiPageWikiLinkText",
        _DBO + "wikiPageOutDegree",
        _DBO + "abstract",
        _RDFS + "comment",
        _RDFS + "label",
    ),
    rdf_type="http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    point_in_time=(_DBO + "date",),
    start_dates=(_DBO + "startDate", _DBP + "birthDate"),
    end_dates=(_DBO + "endDate", _DBP + "deathDate"),
    places=(_DBO + "Place", _DBO + "Location"),
    persons=(_DBO + "Person",),
    sub_class_of=(_RDFS + "subClassOf",),
    owl_thing="http://www.w3.org/2002/07/owl#Thing",
    start_uri="http://dbpedia",
    drop_node_prefixes=("http://dbpedia.org/resource/Category:",),
    regex_year_filter=True,
)

_WDT = "http://www.wikidata.org/prop/direct/"
_WD = "http://www.wikidata.org/entity/"

#: reference: dataset-config/wikidata.yaml:1-44
WIKIDATA = DatasetProfile(
    name="wikidata",
    predicate_filter=(
        _WDT + "P910",
        _WDT + "P1343",
        _WDT + "P5008",
        _WDT + "P2184",
    ),
    rdf_type=_WDT + "P31",
    point_in_time=(_WDT + "P585",),
    start_dates=(_WDT + "P580", _WDT + "P569"),
    end_dates=(_WDT + "P582", _WDT + "P570"),
    places=(_WDT + "P17", _WDT + "P276", _WDT + "Q6256"),
    persons=(_WD + "Q5",),
    sub_class_of=(_WDT + "P279",),
    owl_thing=_WDT + "Q35120",
    start_uri="http://www.wikidata",
    drop_node_prefixes=(
        "http://www.wikidata.org/entity/statement/",
        "http://www.wikidata.org/reference/",
    ),
    prefix_constraint_direct=_WDT,
    prefix_entity=_WD,
    regex_year_filter=False,
    domain_pred=_WD + "Q21503250",
    range_pred=_WD + "Q21510865",
)

_SCHEMA = "http://schema.org/"

#: reference: dataset-config/yago.yaml:1-37
YAGO = DatasetProfile(
    name="yago",
    predicate_filter=(
        _RDFS + "label",
        _SCHEMA + "sameAs",
        _SCHEMA + "alternateName",
        _RDFS + "comment",
        _RDFS + "seeAlso",
        "http://www.w3.org/ns/prov#wasDerivedFrom",
        _SCHEMA + "image",
        _SCHEMA + "about",
    ),
    rdf_type="http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    point_in_time=(),
    start_dates=(
        _SCHEMA + "birthDate",
        _SCHEMA + "foundingDate",
        _SCHEMA + "startDate",
    ),
    end_dates=(
        _SCHEMA + "deathDate",
        _SCHEMA + "dissolutionDate",
        _SCHEMA + "endDate",
    ),
    places=(_SCHEMA + "Place",),
    persons=(_SCHEMA + "Person",),
    sub_class_of=(_RDFS + "subClassOf",),
    owl_thing=_SCHEMA + "Thing",
    start_uri="http://yago",
    regex_year_filter=False,
)

PROFILES: dict[str, DatasetProfile] = {
    "dbpedia": DBPEDIA,
    "wikidata": WIKIDATA,
    "yago": YAGO,
}
