"""SEM-ontology vocabulary and broadcast dimension tables.

Mirrors the reference's fixed narrative-dimension maps
(reference: src/build_ng/generic_kb_to_ng.py:55-80) and the dataset-config
vocab lists (reference: dataset-config/dbpedia.yaml). The SEM namespace is
the public Simple Event Model ontology (van Hage et al., 2011).

All of these are tiny dimension tables — in Spark they are broadcast-joined
(`F.broadcast`) against the billion-row fact side, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

FULL_NS_SEM = "http://semanticweb.cs.vu.nl/2009/11/sem/"
FULL_NS_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
FULL_NS_NG = "http://chronographer-spark.local/ng/"  # engine-local namespace
FULL_NS_ENT = "http://chronographer-spark.local/ent/"
NS_XSD = "http://www.w3.org/2001/XMLSchema#"
# frame-annotation vocabularies (public Framester / NIF / SKOS namespaces,
# the ones kglab.helpers.variables supplies to the reference's text path,
# frame_semantics.py:23-28)
FULL_NS_WSJ = "https://w3id.org/framester/wsj/"
FULL_NS_FRAME = "https://w3id.org/framester/data/framesterabox/"
FULL_NS_GFE = "https://w3id.org/framester/framenet/abox/gfe/"
FULL_NS_SKOS = "http://www.w3.org/2004/02/skos/core#"
FULL_NS_NIF = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"

# Triples are emitted with compact CURIE prefixes (standard RDF practice,
# declared in PREFIXES and expanded at TTL export). At 10^11-triple scale the
# long-form URIs quadruple the string bytes moved through every operator —
# CURIEs cut shuffle and memory traffic ~4x for identical semantics.
NS_SEM = "sem:"
NS_RDF = "rdf:"
NS_NG = "ng:"
NS_ENT = "ent:"
NS_WSJ = "wsj:"
NS_FRAME = "frame:"
NS_GFE = "gfe:"
NS_SKOS = "skos:"
NS_NIF = "nif:"

PREFIXES: dict[str, str] = {
    NS_SEM: FULL_NS_SEM,
    NS_RDF: FULL_NS_RDF,
    NS_NG: FULL_NS_NG,
    NS_ENT: FULL_NS_ENT,
    NS_WSJ: FULL_NS_WSJ,
    NS_FRAME: FULL_NS_FRAME,
    NS_GFE: FULL_NS_GFE,
    NS_SKOS: FULL_NS_SKOS,
    NS_NIF: FULL_NS_NIF,
}

RDF_TYPE = NS_RDF + "type"
RDF_VALUE = NS_RDF + "value"
SEM_EVENT = NS_SEM + "Event"

# narrative-dimension -> SEM predicate
# (reference: src/build_ng/generic_kb_to_ng.py:55-65)
NF_TO_PRED: dict[str, str] = {
    "who": NS_SEM + "hasActor",
    "what": NS_SEM + "eventType",
    "when": NS_SEM + "hasTimeStamp",
    "when_bts": NS_SEM + "hasBeginTimeStamp",
    "when_ets": NS_SEM + "hasEndTimeStamp",
    "where": NS_SEM + "hasPlace",
    "part_of": NS_SEM + "subEventOf",
    "part_of_inverse": NS_SEM + "hasSubEvent",
}

# label-substring -> narrative dimension
# (reference: src/build_ng/generic_kb_to_ng.py:66-76)
NF_TO_STR: dict[str, list[str]] = {
    "who": ["person", "combatant", "commander", "participant"],
    "what": ["type"],
    "when_bts": ["start time", "date", "point in time"],
    "when_ets": ["end time"],
    "where": ["place", "location", "country"],
    "part_of": ["partof", "part of"],
    "part_of_inverse": ["has part", "significant event"],
}

STR_TO_NF: dict[str, str] = {
    s: nf for nf, strings in NF_TO_STR.items() for s in strings
}

TEMPORAL_FILTERS: list[str] = NF_TO_STR["when_bts"] + NF_TO_STR["when_ets"]

# Engine-local predicates for the transcript graft.
NEXT_EVENT = NS_NG + "nextEvent"
USED_TOOL = NS_NG + "usedTool"
IN_CONVERSATION = NS_NG + "inConversation"
HAS_SENTENCE = NS_NG + "hasSentence"

# ---------------------------------------------------------------------------
# Frame-annotation layer (reference frame_semantics.py:73-144): deterministic
# trigger-lemma -> frame map for the transcript graft, narrative-dimension ->
# generic frame element (role) map, and the causal frame set the reference's
# QUERY_INFO_CAUSES_CONSEQUENCES restricts to
# (experiments_run/usage_ng/sparql_queries.py:58 VALUES ?frame {...}).
# ---------------------------------------------------------------------------

FRAME_TRIGGERS: dict[str, str] = {
    "recorded": "Recording",
    "purchase": "Commerce_buy",
    "signup": "Becoming_a_member",
    "error": "Cause_harm",
    "click": "Cause_motion",
    "view": "Perception_active",
}

CAUSAL_FRAMES: list[str] = [
    "Causation", "Cause_harm", "Process_end", "Cause_to_end",
]

DIM_TO_ROLE: dict[str, str] = {
    "who": "Agent",
    "where": "Place",
    "when": "Time",
    "tool": "Instrument",
}

# ---------------------------------------------------------------------------
# Deterministic fixture vocabulary for synthetic transcripts (FIXTURES.md §1/§4)
# ---------------------------------------------------------------------------

PERSONS = [
    "Alice Duvall", "Bruno Keller", "Chen Wei", "Daria Novak",
    "Elias Okafor", "Farah Haddad", "General Marceau", "Hana Sato",
    "Igor Petrov", "Julia Mendes", "Captain Reyes", "Liam Byrne",
]

PLACES = [
    "Paris", "Lyon", "Marseille", "Toulon", "Nantes", "Bordeaux",
    "Versailles", "Avignon", "Grenoble", "Valmy",
]

TOOLS = ["search", "calculator", "retrieval", "code_exec", "translator"]

# A hub entity appearing in a large fraction of turns (skew fixture).
HUB_ENTITY = "Paris"


def _array_table(
    spark: SparkSession, rows: list[tuple], key: str, arr: str
) -> DataFrame:
    schema = StructType(
        [
            StructField(key, StringType(), False),
            StructField(arr, ArrayType(StringType()), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def persons_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(p,) for p in PERSONS], ["mention"]).withColumn(
        "dimension", F.lit("who")
    )


def places_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(p,) for p in PLACES], ["mention"]).withColumn(
        "dimension", F.lit("where")
    )


def mention_vocab_df(spark: SparkSession) -> DataFrame:
    """Union of all mention vocab with dimension tags — the broadcast dim."""
    return persons_df(spark).unionByName(places_df(spark))


def nf_vocab_df(spark: SparkSession) -> DataFrame:
    """(dimension, sem_predicate, labels array) — generic_kb_to_ng.py:55-76."""
    rows = [
        (nf, NF_TO_PRED[nf], NF_TO_STR[nf]) for nf in NF_TO_STR
    ]
    schema = StructType(
        [
            StructField("dimension", StringType(), False),
            StructField("sem_predicate", StringType(), False),
            StructField("labels", ArrayType(StringType()), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def str_to_nf_df(spark: SparkSession) -> DataFrame:
    """Exploded (label, dimension, sem_predicate) lookup table."""
    rows = [(s, nf, NF_TO_PRED[nf]) for s, nf in STR_TO_NF.items()]
    return spark.createDataFrame(rows, ["label", "dimension", "sem_predicate"])


# ---------------------------------------------------------------------------
# Synthetic generic-KB vocab (stage-2 emission fixtures, FIXTURES.md §4)
# ---------------------------------------------------------------------------

FIX = "http://example.org/"


def pred_domain_df(spark: SparkSession) -> DataFrame:
    """predicate -> [domain classes] (cf. domain-range-pred/*-domain.json)."""
    rows = [
        (FIX + "prop/commander", [FIX + "class/MilitaryPerson"]),
        (FIX + "prop/location", [FIX + "class/Settlement"]),
        (FIX + "prop/partof", [FIX + "class/MilitaryConflict"]),
    ]
    return _array_table(spark, rows, "predicate", "classes")


def pred_range_df(spark: SparkSession) -> DataFrame:
    """predicate -> [range classes] (cf. domain-range-pred/*-range.json)."""
    rows = [
        (FIX + "prop/commander", [FIX + "class/Person"]),
        (FIX + "prop/location", [FIX + "class/Place"]),
        (FIX + "prop/country", [FIX + "class/Country"]),
        (FIX + "prop/partof", [FIX + "class/Event"]),
    ]
    return _array_table(spark, rows, "predicate", "classes")


def superclasses_df(spark: SparkSession) -> DataFrame:
    """class -> [superclasses] (cf. domain-range-pred/*-superclasses.json)."""
    rows = [
        (FIX + "class/MilitaryPerson", [FIX + "class/Person"]),
        (FIX + "class/Settlement", [FIX + "class/Place"]),
        (FIX + "class/Country", [FIX + "class/Place"]),
        (FIX + "class/MilitaryConflict", [FIX + "class/Event"]),
    ]
    return _array_table(spark, rows, "class", "ancestors")


def pred_labels_df(spark: SparkSession) -> DataFrame:
    """predicate -> rdfs:label (cf. generic_kb_to_ng.py:130-141)."""
    rows = [
        (FIX + "prop/commander", "commander"),
        (FIX + "prop/location", "location"),
        (FIX + "prop/country", "country"),
        (FIX + "prop/partof", "partof"),
        (FIX + "prop/startDate", "start time"),
        (FIX + "prop/endDate", "end time"),
        (FIX + "prop/date", "date"),
    ]
    return spark.createDataFrame(rows, ["predicate", "label"])
