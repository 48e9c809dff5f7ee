"""Split entry_queries.py (25k lines) into a per-family registry package.

Round-5 judge item 1: per-family modules + aggregator with import-time
key-collision detection. Preserves all 428 keys and every top-level name
(re-exported from the package __init__) so existing imports keep working.
"""
import ast, collections, os, re, sys

SRC = "chronographer_spark/entry_queries.py"
OUT = "chronographer_spark/entry_queries"
src = open(SRC).read()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)

# ---------------------------------------------------------------- families
FAMILY_BY_MODULE = [
    # (module substring, family) — first match wins
    ("operators.classifier", "stats"),
    ("operators.temporal", "temporal"),
    ("operators.text", "text"),
    ("operators.graph_algos", "graph"),
    ("linking.canonicalize", "graph"),
    ("graph.constraints", "kgq"),
    ("graph.ng_queries", "kgq"),
    ("graph.bgp", "kgq"),
    ("graph.materialize", "core"),
    ("operators.dedup", "dedup"),
    ("operators.similarity", "dedup"),
    ("operators.sketches", "dedup"),
    ("operators.pq", "dedup"),
    ("operators.clustering", "dedup"),
    ("operators.dialogue", "dialogue"),
    ("data.transcripts", "dialogue"),
    ("extraction.", "dialogue"),
    ("operators.sampling", "curation"),
    ("operators.packing", "curation"),
    ("operators.bpe", "curation"),
    ("operators.retrieval", "curation"),
    ("operators.sequence", "curation"),
    ("operators.baskets", "curation"),
    ("operators.multimodal", "curation"),
    ("linking.", "linking"),
    ("operators.", "core"),
    ("search.", "core"),
    ("io.", "core"),
    ("metrics", "core"),
    ("profiles", "core"),
]
KEYWORD_FAMILY = [
    (re.compile(r"(pagerank|_cc|component|graph|degree|triangle|motif|walk|bfs|sssp|scc|core|truss|clique)"), "graph"),
    (re.compile(r"(entropy|test|anova|fdr|auc|rank|median|chi|moment)"), "stats"),
]

def family_of(fn_node):
    mods = []
    for sub in ast.walk(fn_node):
        if isinstance(sub, ast.ImportFrom) and sub.module:
            mods.append(sub.module)
    for pat, fam in FAMILY_BY_MODULE:
        for m in mods:
            if pat in m:
                return fam
    for rx, fam in KEYWORD_FAMILY:
        if rx.search(fn_node.name):
            return fam
    return "core"

# ------------------------------------------------------------- collect items
header_imports = []   # source segments for import stmts
docstring = None
items = []            # dicts: names, node, seg, order
name_to_item = {}
queries_node = oracle_node = None

def seg(node):
    # include preceding comment block (contiguous comment/blank lines directly above)
    start = node.lineno - 1
    i = start - 1
    grabbed = []
    while i >= 0:
        s = lines[i]
        if s.strip().startswith("#") or s.strip() == "":
            grabbed.append(i); i -= 1
        else:
            break
    # trim leading blanks of grabbed region
    while grabbed and lines[grabbed[-1]].strip() == "":
        grabbed.pop()
    lo = min(grabbed) if grabbed else start
    return "".join(lines[lo:node.end_lineno])

for i, node in enumerate(tree.body):
    if i == 0 and isinstance(node, ast.Expr):
        docstring = "".join(lines[node.lineno-1:node.end_lineno]); continue
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        header_imports.append("".join(lines[node.lineno-1:node.end_lineno])); continue
    names = []
    if isinstance(node, ast.FunctionDef):
        names = [node.name]
    elif isinstance(node, ast.Assign):
        names = []
        for t in node.targets:
            if isinstance(t, ast.Name):
                names.append(t.id)
            elif isinstance(t, (ast.Tuple, ast.List)):
                names.extend(e.id for e in t.elts if isinstance(e, ast.Name))
    if names == ["QUERIES"]:
        queries_node = node; continue
    if names == ["ORACLE_SQL"]:
        oracle_node = node; continue
    it = dict(order=i, names=names, node=node, seg=seg(node))
    items.append(it)
    for n in names:
        assert n not in name_to_item, f"duplicate top-level def {n}"
        name_to_item[n] = it

topnames = set(name_to_item)

# dict key -> value name
def dict_map(node):
    d = node.value
    assert isinstance(d, ast.Dict)
    out = {}
    for k, v in zip(d.keys, d.values):
        assert isinstance(k, ast.Constant), ast.dump(k)
        if isinstance(v, ast.Name):
            out[k.value] = ("name", v.id)
        else:
            assert isinstance(v, ast.Constant), ast.dump(v)
            out[k.value] = ("lit", v.value)
    return out

qmap = dict_map(queries_node)      # key -> q_func name
omap = dict_map(oracle_node)       # key -> SQL const name
print(f"{len(qmap)} QUERIES keys, {len(omap)} ORACLE_SQL keys")

# ------------------------------------------------------------- dependencies
def refs(it):
    out = set()
    for sub in ast.walk(it["node"]):
        if isinstance(sub, ast.Name) and sub.id in topnames:
            out.add(sub.id)
    return out - set(it["names"])

for it in items:
    it["refs"] = refs(it)

# seed families: q funcs by import heuristics
fam_of_name = {}
for it in items:
    for n in it["names"]:
        if n.startswith("q_") and isinstance(it["node"], ast.FunctionDef):
            fam_of_name[n] = family_of(it["node"])

# oracle SQL consts + anything else: families = set of q families reaching them
# build reverse reachability: start from each q func (+ its oracle const), walk refs
reach_fams = collections.defaultdict(set)   # name -> set of families
def walk_from(start_names, fam):
    seen = set()
    stack = list(start_names)
    while stack:
        n = stack.pop()
        if n in seen or n not in name_to_item:
            continue
        seen.add(n)
        reach_fams[n].add(fam)
        stack.extend(name_to_item[n]["refs"])

for key, (kind, qn) in qmap.items():
    assert kind == "name"
    fam = fam_of_name.get(qn, "core")
    walk_from([qn], fam)
    if key in omap and omap[key][0] == "name":
        walk_from([omap[key][1]], fam)

for it in items:
    for n in it["names"]:
        fams = reach_fams.get(n, set())
        if n in fam_of_name:
            continue
        if len(fams) == 1:
            fam_of_name[n] = next(iter(fams))
        else:
            fam_of_name[n] = "_shared"   # 0 or >=2 families

# multi-name items: all names must share a family else _shared
item_fam = {}
for it in items:
    fams = {fam_of_name[n] for n in it["names"]} if it["names"] else {"_shared"}
    item_fam[id(it)] = next(iter(fams)) if len(fams) == 1 else "_shared"
    for n in it["names"]:
        fam_of_name[n] = item_fam[id(it)]

# closure: if a _shared item references a family item, pull it into _shared
changed = True
while changed:
    changed = False
    for it in items:
        if item_fam[id(it)] != "_shared":
            continue
        for r in it["refs"]:
            rit = name_to_item[r]
            if item_fam[id(rit)] != "_shared":
                item_fam[id(rit)] = "_shared"
                for n in rit["names"]:
                    fam_of_name[n] = "_shared"
                changed = True

# ------------------------------------------------------------- report sizes
fam_lines = collections.Counter()
fam_items = collections.defaultdict(list)
for it in items:
    f = item_fam[id(it)]
    fam_items[f].append(it)
    fam_lines[f] += it["seg"].count("\n")
fam_q = collections.Counter(fam_of_name[qn] for _, qn in qmap.values())
print("\nfamily  lines  queries")
for f in sorted(fam_lines):
    print(f"  {f:10s} {fam_lines[f]:6d} {fam_q.get(f,0):4d}")

if "--dry" in sys.argv:
    sys.exit(0)

# ------------------------------------------------------------- emit package
def absify(code):
    return re.sub(r"\bfrom \.(?=\w)", "from chronographer_spark.", code)

HEADER = absify("".join(header_imports))

os.makedirs(OUT, exist_ok=True)
MAXL = 4500
emitted = {}   # module name -> list of top-level names defined

def emit_module(modname, fam, its, doc):
    """Write one module; split into parts if too long. Returns mapping name->module."""
    # order by original position
    its = sorted(its, key=lambda it: it["order"])
    parts, cur, cur_lines = [], [], 0
    for it in its:
        n = it["seg"].count("\n")
        if cur and cur_lines + n > MAXL:
            parts.append(cur); cur, cur_lines = [], 0
        cur.append(it); cur_lines += n
    if cur:
        parts.append(cur)
    names_of = {}
    prev_defined = []   # (module, [names]) of earlier parts
    for pi, part in enumerate(parts):
        mn = modname if len(parts) == 1 else f"{modname}_{pi+1}"
        defined = [n for it in part for n in it["names"]]
        qkeys = [k for k in qmap if fam_of_name[qmap[k][1]] == fam and qmap[k][1] in defined]
        needed = set()
        for it in part:
            needed |= it["refs"]
        for k in qkeys:
            if k in omap and omap[k][0] == "name":
                needed.add(omap[k][1])
        needed -= set(defined)
        imports = []
        # names from _shared
        shared_needed = sorted(n for n in needed if fam_of_name[n] == "_shared")
        if shared_needed and fam != "_shared":
            imports.append("from ._shared import (\n" +
                "".join(f"    {n},\n" for n in shared_needed) + ")\n")
        # names from earlier parts of same family
        for pm, pnames in prev_defined:
            want = sorted(n for n in needed if n in pnames)
            if want:
                imports.append(f"from .{pm} import (\n" +
                    "".join(f"    {n},\n" for n in want) + ")\n")
        body = "\n\n".join(it["seg"].rstrip("\n") for it in part)
        qd = "\nQUERIES = {\n" + "".join(f'    "{k}": {qmap[k][1]},\n' for k in qkeys) + "}\n"
        def _oval(k):
            kind, v = omap[k]
            return v if kind == "name" else repr(v)
        od = "\nORACLE_SQL = {\n" + "".join(
            f'    "{k}": {_oval(k)},\n' for k in qkeys if k in omap) + "}\n"
        tail = (qd + od) if (fam != "_shared" and qkeys) else ""
        text = (f'"""{doc} (part {pi+1})."""\n\n' if len(parts) > 1
                else f'"""{doc}."""\n\n')
        text += HEADER + "\n" + "".join(imports) + "\n" + absify(body) + "\n" + tail
        open(f"{OUT}/{mn}.py", "w").write(text)
        names_of[mn] = defined
        prev_defined.append((mn, set(defined)))
        emitted[mn] = defined
    return names_of

DOCS = {
    "_shared": "Shared fixtures/helpers for the entry-query registry",
    "core": "Core scan/filter/search/KG-pipeline queries",
    "kgq": "KG constraint/BGP/named-graph queries",
    "graph": "Graph-algorithm queries (PageRank, CC, walks, DAG DP, ...)",
    "stats": "Statistical-test / classifier-eval queries",
    "temporal": "Temporal / forecasting / monitoring queries",
    "text": "Text-analysis / quality / tokenization queries",
    "dedup": "Dedup / similarity / sketch / clustering queries",
    "dialogue": "Transcript / dialogue / preference-pair queries",
    "curation": "Curation sampling / packing / retrieval / BPE queries",
    "linking": "Entity-resolution / blocking / matching queries",
}

for fam, its in sorted(fam_items.items()):
    emit_module(fam if fam != "_shared" else "_shared", fam, its, DOCS.get(fam, fam))

# ------------------------------------------------------------- __init__.py
fam_modules = sorted(m for m in emitted if m != "_shared")
init = ['"""Aggregated entry-query registry.',
        "",
        "Per-family modules each define a QUERIES/ORACLE_SQL subset; this",
        "aggregator merges them and FAILS AT IMPORT TIME on any key collision",
        "(round-4 shadow incident: a silent re-definition repointed a registry",
        "key and passed every behavioral gate — collisions are now structural",
        "errors, not test findings).",
        '"""', "",
        "from . import _shared as _shared_mod"]
for m in fam_modules:
    init.append(f"from . import {m} as _{m}")
init += ["", "QUERIES = {}", "ORACLE_SQL = {}",
         "_mods = [" + ", ".join(f"_{m}" for m in fam_modules) + "]",
         "for _m in _mods:",
         "    for _k, _v in _m.QUERIES.items():",
         "        if _k in QUERIES:",
         "            raise RuntimeError(",
         "                f'registry key collision: {_k!r} defined in multiple modules')",
         "        QUERIES[_k] = _v",
         "    for _k, _v in _m.ORACLE_SQL.items():",
         "        if _k in ORACLE_SQL:",
         "            raise RuntimeError(",
         "                f'registry key collision (oracle): {_k!r}')",
         "        ORACLE_SQL[_k] = _v",
         "", "# Backward-compatible re-exports: every top-level name of the old",
         "# monolith is importable from the package root.",
         "_seen = {}"]
init += ["for _m in [_shared_mod] + _mods:",
         "    for _n in dir(_m):",
         "        if _n.startswith('__') or _n in ('QUERIES', 'ORACLE_SQL'):",
         "            continue",
         "        _o = getattr(_m, _n)",
         "        if _n in _seen and _seen[_n] is not _o:",
         "            raise RuntimeError(f'name collision across registry modules: {_n!r}')",
         "        _seen[_n] = _o",
         "        globals()[_n] = _o",
         ""]
open(f"{OUT}/__init__.py", "w").write("\n".join(init) + "\n")
print("\nemitted modules:")
os.system(f"wc -l {OUT}/*.py")
