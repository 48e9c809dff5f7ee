"""Semantically-informed candidate-event search — the iterative driver.

Re-expression of the reference GraphSearchFramework loop (reference:
src/framework.py:704-857) as a driver `for` loop over DataFrame
transformations: per iteration, ONE set-oriented expansion (three hash
joins) replaces the reference's node-at-a-time HDT lookups
(framework.py:546-556); occurrence counting and ranking are aggregations
(framework.py:571-597, src/ranker.py); pending-vs-visited pruning is a
left-anti join (framework.py:630-633).

Checkpointing & lineage (the reference writes per-iteration CSVs,
framework.py:740-766): every iteration writes its state tables as parquet
under {checkpoint_dir}/{run_id}/iter=N/ with a _meta.json commit marker
carrying lineage + metrics (rows in/out, wall ms, chosen path). Reading
state back from parquet each iteration both truncates lineage (the
iterative-loop blowup in SURVEY.md §7.4) and makes the loop resumable:
`GraphSearch.resume()` restarts from the last complete iteration and
reproduces byte-identical state, because every tie-break and sample is
deterministic (operators/sampling.py, operators/ranking.py).
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..operators.expansion import expand_frontier, split_subgraph_pending
from ..operators.filtering import FilteringConfig, compute_discards
from ..operators.ordering import annotate_superclass, build_pred_closure
from ..operators.ranking import (
    merge_occurrences,
    occurrence_delta,
    rank_top1,
    remove_chosen_path,
)
from ..operators.sampling import deterministic_sample

RDF_TYPE_PRED = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

STATE_TABLES = ("subgraph", "pending_in", "pending_out", "occurrences", "visited")

OCC_SCHEMA = (
    "priority int, direction string, predicate string, endpoint string, count long"
)
TRIPLE_ITER_SCHEMA = "subject string, predicate string, object string, iteration int"


@dataclass
class SearchConfig:
    """Mirror of the reference's search config JSON (framework.py:272-385)."""

    start: str
    iterations: int = 10
    target_types: list[str] = field(default_factory=list)
    predicate_filter: list[str] = field(default_factory=list)
    type_ranking: str = "entropy_pred_object_freq"
    mode: str = "pred_object"  # occurrence keying; 'pred' for *_pred_freq
    dates: tuple[str, str] | None = None
    max_uri: int = 1000
    low_threshold: int = 1
    high_threshold: int = 200
    rdf_type_pred: str = RDF_TYPE_PRED
    walk: str = "informed"  # or "random" (framework.py:469-514)
    uri_limit: int | None = None  # per-iteration cap in random mode

    RANKINGS = (
        "pred_freq",
        "inverse_pred_freq",
        "entropy_pred_freq",
        "pred_object_freq",
        "inverse_pred_object_freq",
        "entropy_pred_object_freq",
    )

    def validate(self) -> None:
        """Shape/type validation mirroring the reference's `_check_config`
        (framework.py:272-385, messages doc/check_config_framework.py:6):
        same constraints, fail-fast with an actionable message."""
        if not isinstance(self.start, str) or not self.start:
            raise ValueError(
                "`start` must be a non-empty string URI of the seed node"
            )
        if not isinstance(self.iterations, int) or self.iterations < 1:
            raise ValueError("`iterations` must be an int >= 1")
        if self.type_ranking not in self.RANKINGS:
            raise ValueError(
                f"`type_ranking` must be one of {', '.join(self.RANKINGS)}"
            )
        expected_mode = (
            "pred"
            if self.type_ranking in ("pred_freq", "inverse_pred_freq", "entropy_pred_freq")
            else "pred_object"
        )
        if self.mode != expected_mode:
            raise ValueError(
                f"`mode` {self.mode!r} inconsistent with type_ranking "
                f"{self.type_ranking!r} (expected {expected_mode!r})"
            )
        if self.dates is not None:
            start_d, end_d = self.dates
            iso = r"^\d{4}-\d{2}-\d{2}$"
            if not (re.match(iso, start_d) and re.match(iso, end_d)):
                raise ValueError("`dates` must be ISO yyyy-mm-dd strings")
            if start_d > end_d:
                raise ValueError("`dates` start must be <= end")
        if not isinstance(self.max_uri, int) or self.max_uri < 1:
            raise ValueError("`max_uri` must be an int >= 1")
        if self.uri_limit is not None and (
            not isinstance(self.uri_limit, int) or self.uri_limit < 1
        ):
            raise ValueError("`uri_limit` must be an int >= 1 or None")
        if self.walk not in ("informed", "random"):
            raise ValueError("`walk` must be 'informed' or 'random'")
        if not (0 <= self.low_threshold < self.high_threshold):
            raise ValueError(
                "`low_threshold` must be >= 0 and < `high_threshold`"
            )


class GraphSearch:
    def __init__(
        self,
        spark: SparkSession,
        triples: DataFrame,
        config: SearchConfig,
        filtering: FilteringConfig,
        pred_domain: DataFrame | None = None,
        pred_range: DataFrame | None = None,
        superclasses: DataFrame | None = None,
        checkpoint_dir: str = "/tmp/chronographer_ckpt",
        run_id: str = "run-0",
        gold_events: DataFrame | None = None,
        profile=None,
    ):
        self.spark = spark
        config.validate()
        self.cfg = config
        self.filt = filtering
        self.triples = triples.select("subject", "predicate", "object").cache()
        self.superclasses = superclasses
        self.ckpt = os.path.join(checkpoint_dir, run_id)
        self.run_id = run_id
        self.gold = gold_events
        # Optional multi-KB DatasetProfile (profiles.py): supplies the C6
        # constraint-prefix rewrite for the superclass lookup
        # (reference ordering.py:43-46,152).
        self.pred_rewrite = (
            profile.constraint_pred_rewrite if profile is not None else None
        )
        self.default_preds = [config.rdf_type_pred] + filtering.temporal

        empty_arr = spark.createDataFrame(
            [], "class string, ancestors array<string>"
        )
        sup = superclasses if superclasses is not None else empty_arr
        empty_pc = spark.createDataFrame(
            [], "predicate string, classes array<string>"
        )
        self.closure_in = build_pred_closure(
            pred_domain if pred_domain is not None else empty_pc, sup
        ).cache()
        self.closure_out = build_pred_closure(
            pred_range if pred_range is not None else empty_pc, sup
        ).cache()

        self.metrics: list[dict] = []
        self.to_expand: Row | None = None

    # -- state persistence ---------------------------------------------------

    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self.ckpt, f"iter={iteration:05d}")

    def _write_state(self, iteration: int, state: dict, meta: dict) -> dict:
        d = self._iter_dir(iteration)
        rows = {}
        for name in STATE_TABLES:
            # lineage columns prefixed to avoid colliding with data columns
            # (subgraph carries its own `iteration` tag per triple)
            df = state[name].withColumn("lineage_run_id", F.lit(self.run_id)).withColumn(
                "lineage_iteration", F.lit(iteration)
            )
            df.write.mode("overwrite").parquet(os.path.join(d, name))
            rows[name] = self.spark.read.parquet(os.path.join(d, name)).count()
        meta = {**meta, "rows": rows, "run_id": self.run_id, "iteration": iteration}
        # meta written last = commit marker (resume only sees complete iters)
        with open(os.path.join(d, "_meta.json"), "w", encoding="utf-8") as fh:
            json.dump(meta, fh)
        return meta

    def _read_state(self, iteration: int) -> dict:
        d = self._iter_dir(iteration)
        state = {}
        for name in STATE_TABLES:
            state[name] = self.spark.read.parquet(os.path.join(d, name)).drop(
                "lineage_run_id", "lineage_iteration"
            )
        return state

    def last_complete_iteration(self) -> int:
        if not os.path.isdir(self.ckpt):
            return 0
        its = []
        for entry in os.listdir(self.ckpt):
            if entry.startswith("iter=") and os.path.exists(
                os.path.join(self.ckpt, entry, "_meta.json")
            ):
                its.append(int(entry.split("=")[1]))
        return max(its, default=0)

    def _empty_state(self) -> dict:
        s = self.spark
        empty_triples = s.createDataFrame([], TRIPLE_ITER_SCHEMA)
        return {
            "subgraph": empty_triples,
            "pending_in": s.createDataFrame(
                [], "subject string, predicate string, object string, superclass array<string>"
            ),
            "pending_out": s.createDataFrame(
                [], "subject string, predicate string, object string, superclass array<string>"
            ),
            "occurrences": s.createDataFrame([], OCC_SCHEMA),
            "visited": s.createDataFrame([], "node string"),
        }

    # -- node selection (D2, framework.py:424-488) ----------------------------

    def _select_nodes(self, iteration: int, state: dict) -> DataFrame:
        s = self.spark
        if iteration == 1:
            return s.createDataFrame([(self.cfg.start,)], ["node"])
        if self.cfg.walk == "random":
            # candidates = all pending endpoints minus visited; deterministic
            # xxhash64 sample replaces random.seed(23) (framework.py:476-482)
            cand = (
                state["pending_in"].select(F.col("subject").alias("node"))
                .unionByName(state["pending_out"].select(F.col("object").alias("node")))
                .dropDuplicates()
                .join(state["visited"], "node", "left_anti")
            )
            visited_n = state["visited"].count()
            budget = self.cfg.max_uri - visited_n
            if budget <= 0:
                return s.createDataFrame([], "node string")
            k = min(budget, self.cfg.uri_limit) if self.cfg.uri_limit else budget
            return deterministic_sample(cand, k)
        path = self.to_expand
        if path is None:
            return s.createDataFrame([], "node string")
        pin, pout = state["pending_in"], state["pending_out"]
        if path["endpoint"] is not None and path["direction"] == "ingoing":
            nodes = pin.filter(
                (F.col("predicate") == path["predicate"])
                & (F.col("object") == path["endpoint"])
            ).select(F.col("subject").alias("node"))
        elif path["endpoint"] is not None and path["direction"] == "outgoing":
            nodes = pout.filter(
                (F.col("predicate") == path["predicate"])
                & (F.col("subject") == path["endpoint"])
            ).select(F.col("object").alias("node"))
        else:  # predicate-only path
            nodes = pin.filter(F.col("predicate") == path["predicate"]).select(
                F.col("subject").alias("node")
            ).unionByName(
                pout.filter(F.col("predicate") == path["predicate"]).select(
                    F.col("object").alias("node")
                )
            )
        nodes = nodes.dropDuplicates().join(state["visited"], "node", "left_anti")
        # cap at max_uri - |visited| (framework.py:460-463), deterministic
        visited_n = state["visited"].count()
        budget = self.cfg.max_uri - visited_n
        if budget <= 0:
            return self.spark.createDataFrame([], "node string")
        return deterministic_sample(nodes, budget)

    # -- one iteration (D1/D3/D4) ---------------------------------------------

    def run_one_iteration(self, iteration: int, state: dict) -> tuple[dict, dict]:
        t0 = time.monotonic()
        frontier = self._select_nodes(iteration, state).cache()
        n_frontier = frontier.count()
        if n_frontier == 0:
            return state, {"stop": "empty_frontier", "nodes_expanded": 0}

        ingoing, outgoing, type_date = expand_frontier(
            self.triples,
            frontier,
            predicate_filter=self.cfg.predicate_filter,
            default_preds=self.default_preds,
        )
        ingoing = ingoing.cache()
        outgoing = outgoing.cache()
        type_date = type_date.cache()

        to_discard = compute_discards(
            ingoing, outgoing, type_date, self.filt, self.cfg.dates
        ).cache()

        sub_in, pend_in, sub_out, pend_out = split_subgraph_pending(
            ingoing,
            outgoing,
            type_date,
            to_discard,
            self.cfg.target_types,
            self.superclasses,
        )

        # superclass annotation on the pending deltas (J4)
        pend_in = annotate_superclass(
            pend_in, self.closure_in, pred_rewrite=self.pred_rewrite
        )
        pend_out = annotate_superclass(
            pend_out, self.closure_out, pred_rewrite=self.pred_rewrite
        )

        # occurrence update (A1)
        occ = state["occurrences"]
        occ = merge_occurrences(
            occ, occurrence_delta(pend_in, "ingoing", self.cfg.target_types, self.cfg.mode)
        )
        occ = merge_occurrences(
            occ, occurrence_delta(pend_out, "outgoing", self.cfg.target_types, self.cfg.mode)
        )

        # rank next path (A2/A3) and drop it from the occurrence table (D5);
        # random walk keeps occurrences for audit but never ranks
        if self.cfg.walk == "informed":
            chosen = rank_top1(
                occ, self.cfg.type_ranking, self.cfg.low_threshold, self.cfg.high_threshold
            )
            self.to_expand = chosen
            if chosen is not None:
                occ = remove_chosen_path(occ, chosen)
        else:
            chosen = None

        # accumulate state
        visited = state["visited"].unionByName(frontier).dropDuplicates()
        subgraph = state["subgraph"].unionByName(
            sub_in.withColumn("iteration", F.lit(iteration))
        ).unionByName(sub_out.withColumn("iteration", F.lit(iteration)))
        pending_in = (
            state["pending_in"]
            .unionByName(pend_in)
            .join(visited, F.col("subject") == F.col("node"), "left_anti")
            .dropDuplicates(["subject", "predicate", "object"])
        )
        pending_out = (
            state["pending_out"]
            .unionByName(pend_out)
            .join(visited, F.col("object") == F.col("node"), "left_anti")
            .dropDuplicates(["subject", "predicate", "object"])
        )

        new_state = {
            "subgraph": subgraph,
            "pending_in": pending_in,
            "pending_out": pending_out,
            "occurrences": occ,
            "visited": visited,
        }
        meta = {
            "nodes_expanded": n_frontier,
            "chosen_path": dict(chosen.asDict()) if chosen is not None else None,
            "wall_ms": int((time.monotonic() - t0) * 1000),
        }
        return new_state, meta

    # -- found events + metrics (A4/A6) ---------------------------------------

    def found_events(self, state: dict) -> DataFrame:
        sub = state["subgraph"]
        return (
            sub.select(F.col("subject").alias("event"))
            .unionByName(sub.select(F.col("object").alias("event")))
            .dropDuplicates()
        )

    def _metrics(self, state: dict) -> dict | None:
        if self.gold is None:
            return None
        found = self.found_events(state)
        gold = self.gold.select(F.col("event")).dropDuplicates()
        tp = found.join(gold, "event", "inner").count()
        fp = found.join(gold, "event", "left_anti").count()
        fn = gold.join(found, "event", "left_anti").count()
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        return {"tp": tp, "fp": fp, "fn": fn, "precision": p, "recall": r, "f1": f1}

    # -- main loop (D1/D6) -----------------------------------------------------

    def run(self, resume: bool = False) -> dict:
        start_iter = self.last_complete_iteration() if resume else 0
        if start_iter > 0:
            state = self._read_state(start_iter)
            with open(
                os.path.join(self._iter_dir(start_iter), "_meta.json"), encoding="utf-8"
            ) as fh:
                prev_meta = json.load(fh)
            cp = prev_meta.get("chosen_path")
            self.to_expand = Row(**cp) if cp else None
        else:
            state = self._empty_state()

        stop_reason = "iterations_exhausted"
        for it in range(start_iter + 1, self.cfg.iterations + 1):
            state, meta = self.run_one_iteration(it, state)
            if meta.get("stop"):
                stop_reason = meta["stop"]
                break
            m = self._metrics(state)
            if m:
                meta["metrics"] = m
                self.metrics.append({"iteration": it, **m})
            meta = self._write_state(it, state, meta)
            state = self._read_state(it)  # reload: truncate lineage
            if state["visited"].count() >= self.cfg.max_uri:
                stop_reason = "max_uri"
                break
            if self.cfg.walk == "informed" and self.to_expand is None:
                stop_reason = "no_best_path"
                break

        return {
            "stop_reason": stop_reason,
            "last_iteration": self.last_complete_iteration(),
            "metrics": self.metrics,
        }

    def final_state(self) -> dict:
        return self._read_state(self.last_complete_iteration())
