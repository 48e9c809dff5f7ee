"""chronographer_spark — a PySpark-native event-centric KG-construction engine.

A from-scratch re-expression of the capabilities of the reference
ChronoGrapher pipeline (muhai-project/chronographer) on Apache Spark:

- batched per-turn triple extraction from multi-turn conversation/agent
  transcripts (vectorized pandas/Arrow UDFs),
- semantically-informed candidate-event search as iterative DataFrame
  self-joins (reference: src/framework.py),
- entity linking + canonicalization via salted hash joins and
  connected components (reference: src/get_equivalent_url.py, src/metrics.py),
- event-centric graph materialization with SEM-ontology emission rules
  (reference: src/build_ng/generic_kb_to_ng.py) and temporal ordering edges,
- evaluation metrics (reference: src/metrics.py, src/build_ng/sem_comparison.py).

Everything is DataFrame-first: Catalyst handles pushdown/pruning/AQE; Python
touches data only through Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
