"""Native Column expressions for the reference's scalar idioms (§2.8).

| here | reference |
|---|---|
| iso_day_slice | `x[1:11]` date slicing (interface.py:93-98, generic_kb_to_ng.py:147) |
| year_of_uri | `\\d{4}` regex year with default (filtering.py:65-72) |
| last_path_segment | `uri.split("/")[-1].lower()` (generic_kb_to_ng.py:102, 245) |
| uri_encode | percent-encoding for graph-safe URIs (generic_kb_to_ng.py:146) |
| wikidata_prop_to_entity | prop->entity namespace replace (ordering.py:152) |
| label_contains_any | label-substring containment vs ~20 vocab strings (generic_kb_to_ng.py:244-249) |
| lexical_in_window | ISO-string date compare (filtering.py:56-63) |
| entropy_term | -(c/t)*ln(c/t) (ranker.py:58-64) |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iso_day_slice(col) -> Column:
    """`x[1:11]` on a quoted literal == substring(2, 10)."""
    return F.substring(col, 2, 10)


def year_of_uri(col, default_year: str) -> Column:
    """First 4-digit run in the URI, else `default_year`."""
    return F.coalesce(
        F.nullif(F.regexp_extract(col, r"(\d{4})", 1), F.lit("")),
        F.lit(default_year),
    )


def last_path_segment(col) -> Column:
    return F.lower(F.substring_index(col, "/", -1))


def uri_encode(col, safe: str = "/") -> Column:
    """Percent-encode with EXACT `urllib.parse.quote(s, safe=safe)` parity —
    the encoder the reference applies to every resource URI
    (frame_semantics.py:16, np_encoding.py:8, generic_kb_to_ng.py:30).

    Built from the JVM's url_encode (form encoding) plus byte-exact
    fix-ups, all inside whole-stage codegen:
      '+' -> '%20'   (URLEncoder encodes space as '+'; a literal '+' was
                      already escaped to '%2B', so any remaining '+' IS a space)
      '*' -> '%2A'   (URLEncoder keeps '*'; quote encodes it)
      '%7E' -> '~'   (URLEncoder encodes '~'; quote keeps it — 0x7E can only
                      arise from a literal '~': UTF-8 continuation bytes are
                      >= 0x80, so no multi-byte sequence contains it)
      each safe char's escape -> itself (quote's `safe`, default '/')
    Both encoders emit uppercase hex over UTF-8 bytes, so no case fixing."""
    out = F.url_encode(col)
    out = F.replace(out, F.lit("+"), F.lit("%20"))
    out = F.replace(out, F.lit("*"), F.lit("%2A"))
    out = F.replace(out, F.lit("%7E"), F.lit("~"))
    for ch in safe:
        out = F.replace(out, F.lit("%%%02X" % ord(ch)), F.lit(ch))
    return out


def wikidata_prop_to_entity(col) -> Column:
    """prop/direct/P -> entity/P namespace rewrite (ordering.py:152)."""
    return F.regexp_replace(
        col, "http://www.wikidata.org/prop/direct/", "http://www.wikidata.org/entity/"
    )


def label_contains_any(col, needles: list[str]) -> Column:
    cond = F.lit(False)
    for n in needles:
        cond = cond | col.contains(n)
    return cond


def lexical_in_window(col, start_d: str, end_d: str) -> Column:
    """ISO-8601 strings compare correctly as strings — identical semantics
    to the reference's lexical compares, and stays in codegen."""
    return (col >= start_d) & (col <= end_d)


def entropy_term(count_col, total_col) -> Column:
    p = count_col.cast("double") / total_col.cast("double")
    return -p * F.log(p)


# American Soundex letter->digit map for A..Z (vowels + H/W/Y -> 0).
_SOUNDEX_FROM = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SOUNDEX_TO = "01230120022455012623010202"


def soundex_expr(col) -> Column:
    """Simplified American Soundex, built ONLY from expressions both Spark
    and DuckDB evaluate identically (upper/regexp_replace/translate/
    substr/rpad) — deliberately NOT Spark's built-in `soundex()`, whose
    JVM edge-case behavior (non-ASCII, h/w transparency) has no DuckDB
    twin to replay. Simplification: H and W break duplicate runs like
    vowels do (full Soundex treats them as transparent); everything else
    is the textbook algorithm — keep the first letter, map the rest to
    digits, collapse adjacent duplicate digits, drop zeros, pad to 4.
    RE2-safe: the duplicate collapse is six per-digit patterns ('11+'...)
    because DuckDB's RE2 has no backreferences.

    The classic phonetic BLOCKING key for entity resolution (the third
    blocking scheme beside sorted-neighborhood and ED-1 deletion
    variants): names that sound alike land in one block regardless of
    spelling distance, so 'Robert'/'Rupert' pair up where ED-1 cannot.
    Empty / non-alphabetic input yields ''.
    """
    s = F.upper(F.regexp_replace(col.cast("string"), "[^A-Za-z]", ""))
    code = F.translate(s, _SOUNDEX_FROM, _SOUNDEX_TO)
    for d in "123456":
        code = F.regexp_replace(code, f"{d}{d}+", d)
    tail = F.regexp_replace(F.substring(code, 2, 1000000), "0", "")
    return F.when(s == "", F.lit("")).otherwise(
        F.concat(F.substring(s, 1, 1), F.rpad(F.substring(tail, 1, 3), 3, "0"))
    )
