"""Analyze entry_queries.py structure for the registry split (round-5 item 1)."""
import ast, collections, json, re, sys

SRC = "chronographer_spark/entry_queries.py"
src = open(SRC).read()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)

items = []  # (idx, kind, names_defined, lineno, end_lineno)
for i, node in enumerate(tree.body):
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        kind = "import"
        names = []
    elif isinstance(node, ast.FunctionDef):
        kind = "func"
        names = [node.name]
    elif isinstance(node, ast.Assign):
        names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        kind = "assign"
    elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        names = [node.target.id]
        kind = "assign"
    elif isinstance(node, ast.Expr) and i == 0:
        kind = "docstring"; names = []
    else:
        kind = "other"; names = []
    items.append(dict(idx=i, kind=kind, names=names, lineno=node.lineno,
                      end_lineno=node.end_lineno))

kinds = collections.Counter(it["kind"] for it in items)
print("top-level stmt kinds:", dict(kinds))
print("n items:", len(items))

# which are the dict assignments
for it in items:
    if "QUERIES" in it["names"] or "ORACLE_SQL" in it["names"]:
        print("dict:", it["names"], it["lineno"], it["end_lineno"])

# non-q, non-SQL top-level defs (helpers)
helpers = [n for it in items for n in it["names"]
           if not n.startswith("q_") and not n.endswith("_SQL")
           and n not in ("QUERIES", "ORACLE_SQL")]
print("helpers (%d):" % len(helpers), helpers[:80])

# operator-module usage per q function
q_mods = {}
for node in tree.body:
    if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
        mods = set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.ImportFrom) and sub.module:
                mods.add(sub.module)
        q_mods[node.name] = sorted(mods)
modcount = collections.Counter(m for ms in q_mods.values() for m in ms)
print("\nmodule-import freq across q funcs:")
for m, c in modcount.most_common(40):
    print(f"  {c:4d}  {m}")
noimp = [q for q, ms in q_mods.items() if not ms]
print(f"\nq funcs with no local import: {len(noimp)}")
json.dump(q_mods, open("/tmp/q_mods.json", "w"))
