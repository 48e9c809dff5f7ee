"""Worked example: a HEAVYWEIGHT model behind the mention-extractor seam.

The reference loads spaCy + a DBpedia-Spotlight client once per process and
then serves every document from that warm object (reference:
src/build_ng/dbpedia_spotlight.py:25-44 builds the pipeline at module setup,
not per call; src/build_ng/frame_semantics.py:125-144 does the same for the
frame transformer). The Spark-native translation of that pattern:

* the model is constructed LAZILY inside the `mapInPandas` generator, on
  first use in a Python worker process;
* the constructed model is parked in a MODULE-LEVEL cache keyed by model id
  — module globals live for the lifetime of the worker process, and Spark
  reuses worker processes across tasks and jobs (`spark.python.worker.reuse`,
  default true), so the expensive load happens once per WORKER, not once per
  task, batch, or row;
* only the cheap, picklable `loader` callable ships in the task closure —
  never the model weights.

No real NLP package is installable in this sandbox, so the model here is a
deterministic stand-in with a genuinely expensive `__init__` (it builds a
large lookup structure) and vectorized batch inference implementing exactly
the built-in rule semantics — swap `StandInNerModel` for
`spacy.load("en_core_web_lg")` (or a Spotlight client) and
`predict_batch` for its pipe() call and the plumbing is unchanged. The
init-count accounting (a Spark accumulator bumped once per cold load) is
test-pinned: inits ≤ distinct worker processes << number of Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

# Per-worker-process model cache. Lives in the Python WORKER that imports
# this module, not on the driver: each worker materializes its own entry on
# first use and keeps it across tasks/jobs for as long as the worker lives.
_WORKER_MODELS: dict[str, object] = {}


class StandInNerModel:
    """Deterministic stand-in for a heavyweight NER/linking model.

    __init__ is intentionally expensive (simulating weight loading /
    pipeline warm-up) so a per-batch or per-row re-init would be visibly
    catastrophic; inference is vectorized over the whole batch, mirroring
    spaCy's `nlp.pipe(batch)` usage in the reference.
    """

    def __init__(
        self,
        persons: list[str] | None = None,
        places: list[str] | None = None,
        init_cost_items: int = 300_000,
    ):
        import re

        from ..vocab import PERSONS, PLACES
        from .mentions import DATE_RE, _vocab_regex

        # simulated weight load: build a large deterministic table the way a
        # real model materializes embeddings/weights on load
        acc, table = 0x9E3779B1, {}
        for i in range(init_cost_items):
            acc = (acc * 0x01000193 ^ i) & 0xFFFFFFFF
            table[i] = acc
        self._weights = table
        self.person_re = re.compile(f"({_vocab_regex(persons or PERSONS)})")
        self.place_re = re.compile(f"({_vocab_regex(places or PLACES)})")
        self.date_re = re.compile(f"({DATE_RE})")

    def predict_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        from .mentions import _extract_batch

        return _extract_batch(pdf, self.person_re, self.place_re, self.date_re)


def make_model_extractor(
    model_key: str,
    loader,
    init_counter=None,
):
    """Build a `mapInPandas` extractor around a lazily-loaded model.

    ``model_key``: cache key — one warm model per (worker process, key).
    ``loader``: zero-arg picklable callable returning the model (a top-level
    function or functools.partial of one; never pass the model itself, only
    its recipe).
    ``init_counter``: optional Spark accumulator bumped once per cold load —
    production jobs surface it as a "models loaded" metric; tests assert
    once-per-worker semantics with it.

    Usage through the seam::

        acc = spark.sparkContext.accumulator(0)
        extractor = make_model_extractor("ner-v1", load_my_model, acc)
        mentions = extract_mentions(transcripts, extractor=extractor)
        graph = build_event_graph(transcripts, extractor=extractor)
    """

    def extractor(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # resolve the cache through a real import, NOT a lexical global:
        # cloudpickle ships nested closures with a per-task COPY of their
        # captured globals, so a lexically captured dict would be fresh every
        # task. The import goes through the worker's sys.modules and returns
        # the one module object that outlives tasks in this worker process.
        from chronographer_spark.extraction import model_extractor as _mod

        model = _mod._WORKER_MODELS.get(model_key)
        if model is None:
            model = loader()
            _mod._WORKER_MODELS[model_key] = model
            if init_counter is not None:
                init_counter.add(1)
        for pdf in batches:
            yield model.predict_batch(pdf)

    return extractor
