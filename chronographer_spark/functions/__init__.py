"""Scalar expression helpers (SURVEY.md §2.8 C1-C14).

Each mirrors a reference string/date/math idiom as a native Column
expression (whole-stage codegen; no Python)."""

from .scalars import (
    entropy_term,
    iso_day_slice,
    label_contains_any,
    last_path_segment,
    lexical_in_window,
    uri_encode,
    wikidata_prop_to_entity,
    year_of_uri,
)

__all__ = [
    "entropy_term",
    "iso_day_slice",
    "label_contains_any",
    "last_path_segment",
    "lexical_in_window",
    "uri_encode",
    "wikidata_prop_to_entity",
    "year_of_uri",
]
