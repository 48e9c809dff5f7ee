"""Aggregated entry-query registry.

Per-family modules each define a QUERIES/ORACLE_SQL subset; this
aggregator merges them and FAILS AT IMPORT TIME on any key collision
(round-4 shadow incident: a silent re-definition repointed a registry
key and passed every behavioral gate — collisions are now structural
errors, not test findings).
"""

from . import _shared as _shared_mod
from . import core as _core
from . import curation as _curation
from . import dedup as _dedup
from . import dialogue as _dialogue
from . import graph as _graph
from . import kgq as _kgq
from . import linking as _linking
from . import stats as _stats
from . import temporal as _temporal
from . import text as _text

QUERIES = {}
ORACLE_SQL = {}
_mods = [_core, _curation, _dedup, _dialogue, _graph, _kgq, _linking, _stats, _temporal, _text]
for _m in _mods:
    for _k, _v in _m.QUERIES.items():
        if _k in QUERIES:
            raise RuntimeError(
                f'registry key collision: {_k!r} defined in multiple modules')
        QUERIES[_k] = _v
    for _k, _v in _m.ORACLE_SQL.items():
        if _k in ORACLE_SQL:
            raise RuntimeError(
                f'registry key collision (oracle): {_k!r}')
        ORACLE_SQL[_k] = _v

# Backward-compatible re-exports: every top-level name of the old
# monolith is importable from the package root.
_seen = {}
for _m in [_shared_mod] + _mods:
    for _n in dir(_m):
        if _n.startswith('__') or _n in ('QUERIES', 'ORACLE_SQL'):
            continue
        _o = getattr(_m, _n)
        if _n in _seen and _seen[_n] is not _o:
            raise RuntimeError(f'name collision across registry modules: {_n!r}')
        _seen[_n] = _o
        globals()[_n] = _o

