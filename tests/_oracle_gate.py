#!/usr/bin/env python3
"""Run the full DuckDB correctness gate at an arbitrary scale factor.

Usage: python tests/_oracle_gate.py [/root/testdata/sf0.01] [query ...]
Thin wrapper over scripts/gate_check.py (same comparison as the driver's
gate and tests/test_oracle_queries.py) so the documented verify flow has a
stable entry point.
"""

import importlib.util
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

_spec = importlib.util.spec_from_file_location(
    "gate_check", os.path.join(_ROOT, "scripts", "gate_check.py")
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

if __name__ == "__main__":
    raise SystemExit(_mod.main())
